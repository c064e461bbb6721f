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
    inference pass over the same scan).

    Fail-loud drift guard (the compute-then-reuse audit, VERDICT_r06
    item 1): the counts come from an earlier job over the same lineage,
    and the id projection assumes this pass sees the SAME partition
    layout. For the file scans this is fed (CSV/parquet), the layout is
    a pure function of (file bytes, maxPartitionBytes-family confs) and
    task retries/speculative copies re-run identical splits — but if the
    assumption is ever violated (conf changed between the jobs, file
    mutated, a shuffle introduced upstream), rows now hit an unknown
    partition id or overrun their partition's claimed count and the scan
    RAISES instead of silently duplicating/skipping ids. (A partition
    shrinking below its claimed count leaves a detectable gap in the id
    sequence but cannot raise row-side; drift in practice moves split
    boundaries, which perturbs both directions and trips the guard.)"""
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
    drift_err = F.raise_error(
        F.concat(
            F.lit(
                "with_row_id: partition layout drifted between the "
                "counting job and the id projection (unknown pid or seq "
                "beyond the claimed count) at (pid, seq) = ("
            ),
            pid.cast("string"),
            F.lit(", "),
            seq.cast("string"),
            F.lit(")"),
        )
    )
    if len(offsets) <= 64:
        offset_expr = drift_err
        for p, off in offsets.items():
            offset_expr = F.when(
                (pid == p) & (seq < partition_counts[p]), F.lit(off)
            ).otherwise(offset_expr)
        out = tagged.withColumn(ROW_ID, (offset_expr + seq).cast("long"))
    else:
        # thousands of partitions: broadcast-join the offset table instead of
        # a deep CASE chain (left join so an unknown pid reaches the guard
        # instead of being dropped by an inner join)
        spark = df.sparkSession
        offs = spark.createDataFrame(
            [(p, o, partition_counts[p]) for p, o in offsets.items()],
            "__pid__ long, __off__ long, __cnt__ long",
        )
        out = (
            tagged.withColumn("__pid__", pid.cast("long"))
            .join(F.broadcast(offs), "__pid__", "left")
            .withColumn(
                ROW_ID,
                F.when(
                    F.col("__off__").isNotNull() & (seq < F.col("__cnt__")),
                    F.col("__off__") + seq,
                )
                .otherwise(drift_err)
                .cast("long"),
            )
            .drop("__pid__", "__off__", "__cnt__")
        )
    return out.drop("__mid__")


def global_rank(
    df: DataFrame, order_cols, rank_col: str = "rnk", start: int = 1
) -> DataFrame:
    """Global ``start``-based row_number by ``order_cols`` WITHOUT a
    single-partition window: range-partition by the keys, sort within
    partitions, then per-partition offset row ids (the same two-phase
    machinery as dim numbering — two tiny metadata jobs, scales to any
    cardinality). ``order_cols`` may carry ``.desc()`` / ``.asc()``; the
    key list must be a total order for the rank to be deterministic.

    The range-partitioned frame is localCheckpointed BEFORE the two
    jobs: RangePartitioner samples with a per-execution seed, so without
    the pin the counting job and the final projection can land on
    DIFFERENT partition boundaries once partitions exceed the reservoir
    size — silently duplicating/skipping ids (reproduced at 2M rows;
    small frames escape because the reservoir keeps the full
    population). The checkpoint makes both jobs read the same blocks."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ordered = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .localCheckpoint(eager=False)
    )
    return with_row_id(ordered, start=start).withColumnRenamed(ROW_ID, rank_col)


def ntile_from_rank(rank_col: str, n_rows: int, n_buckets: int):
    """The exact SQL ``ntile(n_buckets)`` bucket as a scan-stage expression
    over a precomputed global rank: with n rows the first ``n mod b``
    buckets hold ``n div b + 1`` rows, the rest ``n div b`` — integer
    ``div`` arithmetic only, so it is bit-identical to the window
    function without ever funneling rows through one partition."""
    q, rem = divmod(n_rows, n_buckets)
    if q == 0:
        return F.col(rank_col).cast("long")
    cut = rem * (q + 1)
    return (
        F.when(
            F.col(rank_col) <= cut,
            F.expr(f"({rank_col} - 1) div {q + 1} + 1"),
        )
        .otherwise(F.expr(f"{rem} + ({rank_col} - 1 - {cut}) div {q} + 1"))
        .cast("long")
    )


def global_cumsum(
    df: DataFrame, order_cols, value_col: str, out_col: str = "cum"
) -> DataFrame:
    """Inclusive running total of ``value_col`` in ``order_cols`` order
    WITHOUT a single-partition window: range-partition by the keys,
    localCheckpoint to pin the partitioning (the per-partition totals job
    and the final pass must see identical boundaries), per-partition
    running sums via a pid-partitioned window (partition-sized state,
    never global), plus per-partition offsets collected in one tiny job
    and broadcast back (CASE chain up to 64 partitions, broadcast join
    beyond — same fallback as ``with_row_id``).

    ``order_cols`` must be a TOTAL ORDER over the rows (as for
    ``global_rank``): the window uses an explicit ROWS frame, so with
    duplicate full key tuples the within-tie order — and hence each tied
    row's individual running value — is partition-layout-dependent even
    though every complete tie group's boundary sum is exact."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = {
        r["__pid__"]: r["t"] or 0
        for r in part.groupBy("__pid__").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]
    w = (
        Window.partitionBy("__pid__")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if len(offsets) <= 64:
        off = F.lit(0).cast("long")
        for p, o in offsets.items():
            off = F.when(F.col("__pid__") == p, F.lit(o)).otherwise(off)
        out = part.withColumn(
            out_col, (F.sum(value_col).over(w) + off).cast("long")
        )
    else:
        # thousands of partitions: broadcast-join the offset table instead
        # of a deep CASE chain (mirrors with_row_id's fallback)
        spark = df.sparkSession
        offs = spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid__ int, __off__ long"
        )
        out = (
            part.join(F.broadcast(offs), "__pid__")
            .withColumn(out_col, (F.sum(value_col).over(w) + F.col("__off__")).cast("long"))
            .drop("__off__")
        )
    return out.drop("__pid__")


def row_id_from_order(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """ROW_ID via an explicit total-order key — global_rank under the
    hood, so even this convenience wrapper never plans a
    single-partition window (the suite-wide plan assert in
    tests/test_plans.py bans them everywhere)."""
    return global_rank(df, order_cols, ROW_ID)
