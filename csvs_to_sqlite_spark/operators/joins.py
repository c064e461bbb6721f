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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join (D5 extension — Spark has no native one): for each left
    row, the right row with the greatest ``right_ts`` <= ``left_ts`` within
    the same ``key``.

    Implementation is the union-and-carry-forward composition: tag both
    sides, union on a common schema, and let ``last(..., ignorenulls)``
    over a (key, ts)-ordered running window carry the latest right values
    onto each left row. One shuffle on ``key``, sort within partitions —
    the same cost profile as a sort-merge join, no per-group Python. Right
    rows sort before left rows at equal timestamps (inclusive semantics,
    matching DuckDB's ASOF JOIN).
    """
    from pyspark.sql.window import Window

    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__src__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}__") for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != key else F.col(key) for c in lcols],
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__src__"),
        *[F.col(c).alias(f"__r_{c}__") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts__", "__src__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        F.col("__src__"),
        *[
            F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__src__") == 1).drop("__src__")


def semi_join_row_ids(fact: DataFrame, matches: DataFrame, row_id_col: str) -> DataFrame:
    """D4: ``rowid IN (subquery)`` — the canonical FTS query idiom
    (reference tests:179-187) as a left-semi join. No broadcast hint
    (broadcast-audit r8): a MATCH set can be fact-sized (a common token
    matches most rows), so the hint would force an unbuildable hash
    table at scale; AQE broadcasts small match sets from runtime
    sizes, and the join stays LeftSemi either way (plan-asserted)."""
    return fact.join(matches.select(row_id_col).distinct(), row_id_col, "left_semi")
