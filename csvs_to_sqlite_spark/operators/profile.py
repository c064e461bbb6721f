"""ANALYZE-style table profiling: per-column stats in long format.

The metadata layer every engine needs before planning — row counts,
null counts, NDV, min/max per column — computed as ONE relational job
(reference has no equivalent; cf. its per-column type probing in
csvs_to_sqlite/utils.py:290-303 which drives DDL from pandas dtypes).

Plan shape: the table is unpivoted to (col_name, value) long format
(scan-stage, no shuffle; rows × n_cols but each row is two fields wide),
then ONE groupBy(col_name) computes all stats — Spark plans the exact
NDV as a two-phase distinct aggregate, so the shuffle is keyed
(col_name, value) then (col_name): well-distributed regardless of table
width. Numeric and string columns profile in separate branches (typed
min/max semantics) and union — the union is of 2 already-aggregated
~n_cols-row sides, so it's free.

Exact NDV is the default because it's oracle-checkable; at 100 TB flip
``approx=True`` to HLL (`approx_count_distinct`), which drops the
distinct pre-shuffle entirely — the standard trade every warehouse's
ANALYZE makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions import qmath


def _branch(
    df: DataFrame, cols: list[str], numeric: bool, approx: bool
) -> DataFrame:
    cast_to = "double" if numeric else "string"
    long = df.select(
        [F.col(c).cast(cast_to).alias(c) for c in cols]
    ).unpivot([], cols, "col_name", "v")
    ndv = (
        F.approx_count_distinct("v") if approx else F.count_distinct(F.col("v"))
    ).alias("n_distinct")
    aggs = [
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("v")).alias("n_nulls"),
        ndv,
        (F.min("v") if numeric else F.lit(None).cast("double")).alias("min_num"),
        (F.max("v") if numeric else F.lit(None).cast("double")).alias("max_num"),
        (F.lit(None).cast("string") if numeric else F.min("v")).alias("min_str"),
        (F.lit(None).cast("string") if numeric else F.max("v")).alias("max_str"),
    ]
    return long.groupBy("col_name").agg(*aggs)


def profile(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str). Numerics are
    profiled as doubles, everything else as strings — callers pre-format
    timestamps/dates so the rendered value is what gets profiled."""
    branches = []
    if numeric_cols:
        branches.append(_branch(df, numeric_cols, numeric=True, approx=approx))
    if string_cols:
        branches.append(_branch(df, string_cols, numeric=False, approx=approx))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def profile_sql(
    table_expr: str, numeric_cols: list[str], string_cols: list[str]
) -> str:
    """DuckDB twin, derived from the SAME column lists (one UNION ALL
    branch per column; exact NDV)."""
    parts = []
    for c in numeric_cols:
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" count(*) - count({c}) AS n_nulls,"
            f" count(DISTINCT cast({c} AS double)) AS n_distinct,"
            f" min(cast({c} AS double)) AS min_num,"
            f" max(cast({c} AS double)) AS max_num,"
            f" cast(NULL AS varchar) AS min_str, cast(NULL AS varchar) AS max_str"
            f" FROM {table_expr}"
        )
    for c in string_cols:
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" count(*) - count({c}) AS n_nulls,"
            f" count(DISTINCT cast({c} AS varchar)) AS n_distinct,"
            f" cast(NULL AS double) AS min_num, cast(NULL AS double) AS max_num,"
            f" min(cast({c} AS varchar)) AS min_str,"
            f" max(cast({c} AS varchar)) AS max_str"
            f" FROM {table_expr}"
        )
    return "\nUNION ALL\n".join(parts)


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the ``top_k`` heaviest key values
    with each one's share of all rows — the number that predicts whether
    a shuffle on this key will straggle (one key at 5% of a 100 TB table
    is a 5 TB partition). Top-k via orderBy().limit() =
    TakeOrderedAndProject; the total is a scalar aggregate, broadcast as
    a literal-free cross join of one row. Deterministic tie-break on the
    key value."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("n")
    )
    # the total really is the broadcast one-row cross join the docstring
    # promises — it previously paid a dedicated df.count() driver
    # round-trip and shipped the number back as a literal
    # (optimization r11); sum over the count table == corpus rows, and
    # exchange reuse computes `counts` once for both consumers.
    total = counts.agg(F.sum("n").alias("__total__"))
    return (
        counts.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            qmath.qdiv_count(
                F.col("n") * F.lit(1_000_000), F.col("__total__"), 1, 6
            ).alias("share"),
        )
    )
