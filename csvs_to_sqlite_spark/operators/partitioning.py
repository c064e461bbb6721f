"""Partitioning strategies for 100 TB joins (SURVEY §4 / brief).

- bucketed_write / bucketed tables: co-locate both sides of a recurring
  equi-join at write time so the join runs with NO exchange — the only
  way a fact-fact join (lineitem ⋈ orders) avoids reshuffling terabytes
  on every query.
- salted_join: hot-key mitigation when one side has pathological key
  skew AQE can't fix alone — explode the hot side's key space by a salt
  factor, replicate the small side per salt, join, drop the salt.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# scan_fanout floor: below this input size a fan-out shuffle's fixed cost
# (one extra stage + round-robin exchange of the rows) exceeds what
# parallelizing the scan stage can recover. Env-overridable for cluster
# profiles with different task-launch latencies.
_FANOUT_MIN_BYTES = int(os.environ.get("SPARK_GRAFT_FANOUT_MIN_BYTES", str(512 * 1024)))


def effective_scan_parallelism(paths: list[str], max_partition_bytes: int) -> int:
    """How many tasks can actually produce rows when scanning these
    parquet files: Spark assigns a parquet ROW GROUP to the split that
    contains its starting byte, so a file's scan parallelism is capped by
    its row-group count no matter how small ``maxPartitionBytes`` is.
    The effective bound is min(splits, row groups) summed over files."""
    import pyarrow.parquet as pq

    total = 0
    for p in paths:
        size = os.path.getsize(p)
        splits = max(1, (size + max_partition_bytes - 1) // max_partition_bytes)
        groups = pq.ParquetFile(p).metadata.num_row_groups
        total += min(splits, groups)
    return total


def scan_fanout(df: DataFrame, *paths: str) -> DataFrame:
    """Guide §2.2/§6: spread a row-group-bound scan across the cluster.

    A parquet file written as ONE row group scans as ONE task regardless
    of split configs, so every scan-stage expression over it (tokenize,
    md5, cosine math, regex filters) runs on a single core — locally AND
    on a 1000-executor cluster. When the input's effective scan
    parallelism is well below the session's, ONE round-robin repartition
    of the (small, by the row-group-count precondition) input buys full
    parallelism for everything downstream of the scan.

    Scale-adaptive by construction, not a local[32] tune:
    - inputs under ``SPARK_GRAFT_FANOUT_MIN_BYTES`` (default 512 KiB) are
      left alone — the shuffle's fixed latency beats any win;
    - inputs whose row-group/split structure already yields at least half
      the session's default parallelism are left alone — at real scale
      (many files / many row groups) this is always true, so the
      repartition vanishes exactly where it would be a scale-killer.

    Only order-free consumers may sit downstream (every queries() entry
    is, by the oracle-hash contract); ROW_ID/scan-order machinery (the
    CSV ingest path) must never pass through this."""
    sizes = [os.path.getsize(p) for p in paths if os.path.isfile(p)]
    if len(sizes) != len(paths) or sum(sizes) < _FANOUT_MIN_BYTES:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        mpb_bytes = _parse_bytes(mpb)
    except Exception:
        mpb_bytes = 128 * 1024 * 1024
    if effective_scan_parallelism(list(paths), mpb_bytes) >= max(2, target // 2):
        return df
    return df.repartition(target)


def _parse_bytes(v: str) -> int:
    v = v.strip().lower()
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if v.endswith(suffix):
            v = v[: -len(suffix)]
            mult = m
            break
    return int(float(v) * mult)


def bucketed_write(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed (and sorted) table; subsequent equi-joins on
    ``key`` between tables bucketed the same way need no shuffle."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_l] == right[key_r])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``salt``
    sub-keys. The right side is replicated ``salt``× (explode of a small
    literal array), so each (key, salt_i) bucket holds 1/salt of the hot
    key's rows. Use when a handful of keys dominate; for uniform keys the
    plain join is cheaper.
    """
    salt_col = (F.rand(seed=42) * salt).cast("int")
    l = left.withColumn("__salt__", salt_col)
    r = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "__salt__"], how)
    return out.drop("__salt__")


def zorder_key(cols: list[F.Column], bits: int = 8) -> F.Column:
    """Morton (Z-order) address over ``len(cols)`` pre-quantized integer
    columns: bit b of column i lands at position b·n + i. Pure integer
    column expressions — scan-stage, no shuffle, whole-stage codegen.

    Z-ordering is the data-layout lever for multi-column range scans at
    100 TB (Delta/Iceberg OPTIMIZE ZORDER): sorting or bucketing files by
    this address makes every z-prefix bucket cover a narrow hyper-
    rectangle of the key space, so a predicate on ANY indexed column
    prunes most buckets (min/max file stats), where a lexicographic sort
    only prunes on its leading column."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z + (F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
                     * F.lit(1 << (b * n + i))).cast("long")
    return z


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB twin of zorder_key — same bit placement via integer
    division/modulo (exact at any width ≤ 62 bits total)."""
    n = len(exprs)
    terms = []
    for b in range(bits):
        for i, e in enumerate(exprs):
            terms.append(
                f"(((CAST({e} AS BIGINT) // {1 << b}) % 2) * {1 << (b * n + i)})"
            )
    return "(" + " + ".join(terms) + ")"


def range_quantize(col: F.Column, vmin: F.Column, vmax: F.Column, bits: int = 8) -> F.Column:
    """Scale a value into [0, 2^bits) by its column range (min/max come
    from a 1-row broadcast aggregate). The division runs in double
    (mirrored by the DuckDB twin — identical operands, identical bits);
    for spans beyond ~2^52 the rounded quotient can reach exactly
    2^bits at x = vmax, which would bleed into the neighboring
    dimension's Morton bit positions, so the result is clamped to
    2^bits - 1 (both engines)."""
    span = (vmax - vmin + 1).cast("long")
    q = F.floor(
        ((col.cast("long") - vmin.cast("long")) * F.lit(1 << bits)) / span
    ).cast("long")
    return F.least(q, F.lit((1 << bits) - 1))


def range_quantize_sql(expr: str, vmin: str, vmax: str, bits: int = 8) -> str:
    q = (
        f"CAST(floor(((CAST({expr} AS BIGINT) - CAST({vmin} AS BIGINT)) * {1 << bits})"
        f" / CAST(CAST({vmax} AS BIGINT) - CAST({vmin} AS BIGINT) + 1 AS DOUBLE)) AS BIGINT)"
    )
    return f"least({q}, {(1 << bits) - 1})"


def salted_distinct_count(
    df: DataFrame, key: str, val: str, n_salt: int = 16
) -> DataFrame:
    """Skew-safe exact count-distinct: two-phase aggregation with a salt
    DERIVED FROM THE VALUE, so each distinct value lands in exactly one
    (key, salt) bucket and the per-salt distinct counts sum exactly.

    Why: count(DISTINCT val) keyed by a low-cardinality hot key is the
    aggregation Spark's map-side partial combine can NOT bound — the
    distinct state itself is per-key and lands on one reducer. Salting
    by md5(val) % n_salt splits a hot key's distinct-set n_salt ways:
    phase 1 aggregates on (key, salt) (each reducer holds 1/n_salt of
    the hot key's values), phase 2 combines n_salt bounded partials per
    key. count(*) rides along (plain sum of partials). At 100 TB this
    is the difference between one executor holding a 10B-value hash set
    and 16 executors holding ~600M each.

    Returns (key, n_rows, n_distinct) — provably equal to the plain
    ``GROUP BY key`` with count(*)/count(DISTINCT val), which is exactly
    what the DuckDB oracle runs."""
    from csvs_to_sqlite_spark.functions.hashing import md5_long

    salt = (md5_long(F.col(val).cast("string"), seed="dsalt") % n_salt).alias(
        "__salt__"
    )
    phase1 = (
        df.select(F.col(key), F.col(val), salt)
        .groupBy(key, "__salt__")
        .agg(
            F.count("*").alias("part_rows"),
            F.count_distinct(F.col(val)).alias("part_distinct"),
        )
    )
    return (
        phase1.groupBy(key)
        .agg(
            F.sum("part_rows").cast("long").alias("n_rows"),
            F.sum("part_distinct").cast("long").alias("n_distinct"),
        )
        .orderBy(key)
    )


# assert_dimension_sized default: per-partition row cap for frames the
# caller is about to broadcast or funnel through a 1-row/tiny aggregate.
# 2^21 (~2M) rows is far above any real dimension (dates x types, sources
# x langs, log2-length buckets) and far below anything corpus-shaped.
_DIM_SIZED_CAP = int(os.environ.get("SPARK_GRAFT_DIM_SIZED_CAP", str(1 << 21)))


def assert_dimension_sized(
    df: DataFrame, what: str, cap: int | None = None
) -> DataFrame:
    """Fail-loud precondition for 'this frame is dimension-sized' — wire
    it onto any frame about to be BROADCAST or crossJoined as a tiny
    aggregate (VERDICT r11 item 6: the precondition used to be a
    docstring claim with nothing enforcing it).

    Rides the consumer's own job — no extra action, no shuffle, no plan
    re-derivation: ``monotonically_increasing_id()``'s low 33 bits are
    the row's index WITHIN its partition, so ``assert_true(idx < cap)``
    evaluated per row bounds every partition at ``cap`` rows. The guard
    is attached as a row-preserving Filter (``assert_true`` returns NULL
    on success, so ``isNull`` keeps every row; on violation the task
    fails loudly with ``what`` in the message instead of feeding an
    oversized broadcast/OOM). It is a best-effort EARLY trip: a frame
    spread over many partitions can stay under the per-partition cap yet
    exceed cap in total — Spark's own 512M-row/8GB broadcast hard cap
    remains the backstop; this guard converts the common failure (an
    aggregate that silently stopped being dimension-sized) into a named
    error at the first oversized partition.

    The added Filter is identical in every plan-copy of the guarded
    frame, so AQE stage reuse (the MI/PSI total-dedup machinery) is
    unaffected."""
    limit = _DIM_SIZED_CAP if cap is None else cap
    idx = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    chk = F.assert_true(
        idx < F.lit(limit),
        F.lit(
            f"{what}: dimension-sized precondition violated "
            f"(>= {limit} rows in one partition)"
        ),
    )
    return df.where(chk.isNull())
