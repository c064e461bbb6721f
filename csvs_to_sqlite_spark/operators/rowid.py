"""Stable row identity (SURVEY.md §4.3).

SQLite ``rowid`` (1..N in insert order) is load-bearing in the reference:
FTS external-content tables address rows by rowid (utils.py:386,428) and
the canonical query idiom is ``rowid IN (…)`` (reference tests:179-187).
Spark DataFrames have no stable row order, so we materialize ``row_id``
explicitly.

Implementation: ``monotonically_increasing_id`` + a per-partition offset
correction. mid is ``(partition_id << 33) | seq`` with ``seq`` consecutive
from 0 within each partition, and the CSV/parquet readers emit records in
file order within a partition with partitions indexed in file-offset
order — so ``offset[pid] + seq`` reproduces global scan order exactly.
The per-partition counts are one tiny metadata aggregate (collected to the
driver, broadcast back as a CASE expression); everything else stays in
whole-stage codegen. No Python RDD round-trip (an earlier zipWithIndex
version serialized every row through pickle — ~10× slower end-to-end).

For pipelines whose data carries its own total order (e.g. TPC-H
(l_orderkey, l_linenumber)) use ``row_id_from_order`` instead: zero extra
jobs, but a global window — fine for small/dim-sized inputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROW_ID = "__row_id__"
_MID_PARTITION_SHIFT = 33  # monotonically_increasing_id packs pid << 33 | seq


def with_row_id(
    df: DataFrame, start: int = 1, partition_counts: dict[int, int] | None = None
) -> DataFrame:
    """Append ROW_ID = start..start+N-1 in current (scan) order.

    ``partition_counts`` ({scan_partition_id: rows}) skips the counting
    job when the caller already has the numbers (e.g. from the type-
    inference pass over the same scan)."""
    mid = F.monotonically_increasing_id()
    tagged = df.withColumn("__mid__", mid)
    if partition_counts is None:
        rows = (
            tagged.groupBy(F.shiftright("__mid__", _MID_PARTITION_SHIFT).alias("pid"))
            .count()
            .collect()
        )
        partition_counts = {r["pid"]: r["count"] for r in rows}
    offsets: dict[int, int] = {}
    acc = start
    for pid_key in sorted(partition_counts):
        offsets[pid_key] = acc
        acc += partition_counts[pid_key]
    pid = F.shiftright("__mid__", _MID_PARTITION_SHIFT)
    seq = F.col("__mid__").bitwiseAND(F.lit((1 << _MID_PARTITION_SHIFT) - 1))
    if len(offsets) <= 64:
        offset_expr = F.lit(start)
        for p, off in offsets.items():
            offset_expr = F.when(pid == p, F.lit(off)).otherwise(offset_expr)
        out = tagged.withColumn(ROW_ID, (offset_expr + seq).cast("long"))
    else:
        # thousands of partitions: broadcast-join the offset table instead of
        # a deep CASE chain
        spark = df.sparkSession
        offs = spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid__ long, __off__ long"
        )
        out = (
            tagged.withColumn("__pid__", pid.cast("long"))
            .join(F.broadcast(offs), "__pid__")
            .withColumn(ROW_ID, (F.col("__off__") + seq).cast("long"))
            .drop("__pid__", "__off__")
        )
    return out.drop("__mid__")


def row_id_from_order(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """ROW_ID via row_number() over an explicit total-order key.

    Preferred at scale when the data carries its own order (e.g. TPC-H
    (l_orderkey, l_linenumber)): no RDD round-trip, stays in codegen.
    A single unpartitioned window is a bottleneck at 100 TB — callers
    needing global ids at that scale should use with_row_id (zipWithIndex)
    or a two-phase rank (per-partition rank + offset). For dim numbering
    (small distinct sets) this is the right tool.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(ROW_ID, F.row_number().over(w).cast("long"))
