"""Native large-scale sink: partitioned Parquet.

The SQLite sink is the parity/compat path; at 100 TB the engine's real
output is Parquet (SURVEY §4.4). Facts are written partitioned; dims are
small single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.rowid import ROW_ID


def write_fact(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    cols = [c for c in df.columns if c != ROW_ID]
    writer = df.select(*cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_dim(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.coalesce(1).write.mode(mode).parquet(path)


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: str = "shard",
    sort_within: list[str] | None = None,
) -> None:
    """Deterministic sharded training-data export: assign each row its
    md5-based shard (operators/splits.shard_assignment), land one
    directory per shard (parquet partitioned by ``shard``), optionally
    sorted within shards for locality-sensitive consumers.

    ONE shuffle (repartition on the shard column) so each shard is a
    single contiguous write; at 100 TB pick n_shards so a shard fits a
    writer task (corpus_bytes / ~512 MB). Re-running over a grown corpus
    moves no existing row between shards (stable hash), so downstream
    consumers can cache per-shard state.
    """
    from csvs_to_sqlite_spark.operators.splits import shard_assignment

    out = df.withColumn("shard", shard_assignment(F.col(id_col), n_shards, seed))
    out = out.repartition(n_shards, "shard")
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    id_col: str | None = None,
    n_shards: int | None = None,
    seed: str = "shard",
) -> None:
    """JSONL export — the interchange format training pipelines emit
    (completes the round-trip with sources/jsonl_source.load_jsonl).
    Plain write: one line-delimited JSON file per input partition, no
    shuffle. With ``id_col`` + ``n_shards``: md5-stable shard column +
    one repartition so each shard lands contiguously, same layout
    contract as write_shards."""
    if (id_col is None) != (n_shards is None):
        raise ValueError("id_col and n_shards must be given together")
    if id_col is not None:
        from csvs_to_sqlite_spark.operators.splits import shard_assignment

        df = df.withColumn("shard", shard_assignment(F.col(id_col), n_shards, seed))
        df = df.repartition(n_shards, "shard")
        df.write.mode("overwrite").partitionBy("shard").json(path)
    else:
        df.write.mode("overwrite").json(path)


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame (optimized-plan stats).
    For parquet-backed frames this is the scan's file-size statistic
    scaled by the plan's selectivity guesses — the same number the
    optimizer uses for broadcast decisions, available without running
    the job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def plan_output_partitions(df: DataFrame, target_bytes: int = 512 * 1024 * 1024) -> int:
    """Output-file count for a compacted write: ceil(estimated size /
    target file size), floor 1. At 100 TB the small-files problem is the
    sink-side killer (a 32-task job writing 10 MB each per partition dir
    makes millions of unreadable files); sizing writes by bytes, not by
    upstream task count, keeps file counts sane as data grows."""
    est = estimated_bytes(df)
    return max(1, -(-est // target_bytes))


def write_compacted(
    df: DataFrame,
    path: str,
    target_bytes: int = 512 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Compacting writer: repartition to ~target-sized output files
    before landing. Uses round-robin repartition (no key) so rows spread
    evenly regardless of upstream partitioning skew. Returns the file
    count it chose. coalesce() is deliberately NOT used when shrinking:
    it would also shrink the parallelism of every upstream stage fused
    into the write."""
    n = plan_output_partitions(df, target_bytes)
    df.repartition(n).write.mode(mode).parquet(path)
    return n
