"""D2-D4: denormalizing joins and rowid semi-joins (SURVEY §2.D).

The reference generates SQL strings and lets SQLite execute the multi-way
left join (utils.py:389-432). Here the same shape is a chain of BROADCAST
hash left joins — dimensions are small by construction, so the fact table
never shuffles: each join is map-side, the whole chain is one codegen'd
stage. At 100 TB this is the only join strategy that doesn't move the
fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def denormalize(
    fact: DataFrame,
    columns: list[str],
    foreign_keys: dict[str, tuple[DataFrame, str]],
    keep: list[str] | None = None,
) -> DataFrame:
    """Replace each fk column with its dimension label (D2), aliasing dims
    joined more than once (D3, reference utils.py:402-425; golden
    tests:232-281 joins one ``actors`` dim through both actor_1/actor_2)."""
    out = fact
    exprs: dict[str, F.Column] = {}
    for i, col in enumerate(columns):
        if col in foreign_keys:
            dim, label_col = foreign_keys[col]
            a = f"__dim_{i}__"
            dim_aliased = F.broadcast(
                dim.select(
                    F.col("id").alias(f"{a}_id"), F.col(label_col).alias(f"{a}_label")
                )
            )
            out = out.join(dim_aliased, out[col] == F.col(f"{a}_id"), "left")
            exprs[col] = F.col(f"{a}_label").alias(col)
        else:
            exprs[col] = F.col(col)
    final_cols = keep if keep is not None else columns
    return out.select(*[exprs.get(c, F.col(c)) for c in final_cols])


def semi_join_row_ids(fact: DataFrame, matches: DataFrame, row_id_col: str) -> DataFrame:
    """D4: ``rowid IN (subquery)`` — the canonical FTS query idiom
    (reference tests:179-187) as a left-semi join (no fact-side data
    movement beyond the shuffle-free broadcast when matches are small)."""
    return fact.join(F.broadcast(matches.select(row_id_col).distinct()), row_id_col, "left_semi")
