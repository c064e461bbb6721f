"""Fault-injection tests for the compute-then-reuse boundaries
(VERDICT_r06 item 1 — the RangePartitioner-seed bug class).

Every two-job pattern in the engine (job A computes metadata, job B
reuses it against the same lineage) must either pin the lineage
(localCheckpoint) or fail LOUDLY when the assumption breaks — silent id
corruption is the one failure mode proven to pass every test SF while
corrupting data at scale. NONDETERMINISM.md is the written inventory;
these tests inject the faults.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.rowid import ROW_ID, global_rank, with_row_id


def _unpersist_everything(spark):
    """Drop every persisted/checkpointed block — simulates executor loss
    taking all cached partitions with it."""
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        it.next()._2().unpersist(True)
        n += 1
    return n


def test_with_row_id_raises_on_unknown_partition_id(spark):
    """Counts keyed by pids the projection never sees (simulated layout
    drift between the counting job and the id pass) must RAISE, not
    silently fall back to a shared offset (the old behavior numbered
    every unknown-pid row from `start`, duplicating ids)."""
    df = spark.range(1000).repartition(4).select(F.col("id").alias("v"))
    real = {
        r["pid"]: r["count"]
        for r in df.withColumn("m", F.monotonically_increasing_id())
        .groupBy(F.shiftright("m", 33).alias("pid"))
        .count()
        .collect()
    }
    shifted = {pid + 1000: c for pid, c in real.items()}  # all pids wrong
    with pytest.raises(Exception, match="partition layout drifted"):
        with_row_id(df, partition_counts=shifted).collect()


def test_with_row_id_raises_when_partition_exceeds_claimed_count(spark):
    """A partition holding MORE rows than the counting job claimed
    (boundary drift moved rows into it) overruns its id range — the seq
    guard must raise before ids bleed into the next partition's range."""
    df = spark.range(1000).repartition(4).select(F.col("id").alias("v"))
    real = {
        r["pid"]: r["count"]
        for r in df.withColumn("m", F.monotonically_increasing_id())
        .groupBy(F.shiftright("m", 33).alias("pid"))
        .count()
        .collect()
    }
    short = {pid: max(1, c - 10) for pid, c in real.items()}
    with pytest.raises(Exception, match="partition layout drifted"):
        with_row_id(df, partition_counts=short).collect()


def test_with_row_id_correct_counts_still_exact(spark):
    """The guard is free when the contract holds: exact 1..N ids."""
    df = spark.range(10_000).repartition(8).select(F.col("id").alias("v"))
    out = with_row_id(df)
    s = out.agg(
        F.count("*").alias("n"),
        F.countDistinct(ROW_ID).alias("d"),
        F.min(ROW_ID).alias("lo"),
        F.max(ROW_ID).alias("hi"),
    ).collect()[0]
    assert (s["n"], s["d"], s["lo"], s["hi"]) == (10_000, 10_000, 1, 10_000)


def test_with_row_id_broadcast_path_raises_on_unknown_pid(spark):
    """The >64-partition broadcast-join path uses a LEFT join so an
    unknown pid reaches the raise_error guard — an inner join would
    silently DROP those rows, the worst possible failure."""
    df = spark.range(20_000).repartition(100).select(F.col("id").alias("v"))
    real = {
        r["pid"]: r["count"]
        for r in df.withColumn("m", F.monotonically_increasing_id())
        .groupBy(F.shiftright("m", 33).alias("pid"))
        .count()
        .collect()
    }
    assert len(real) > 64  # exercises the broadcast branch
    dropped = dict(real)
    dropped.pop(sorted(dropped)[0])  # one pid's metadata goes missing
    with pytest.raises(Exception, match="partition layout drifted"):
        with_row_id(df, partition_counts=dropped).collect()
    # and with complete counts the broadcast path is exact
    out = with_row_id(df, partition_counts=real)
    s = out.agg(
        F.count("*").alias("n"), F.countDistinct(ROW_ID).alias("d")
    ).collect()[0]
    assert (s["n"], s["d"]) == (20_000, 20_000)


def test_global_rank_checkpoint_loss_fails_loud_not_silent(spark):
    """global_rank pins its range-partitioned frame with a
    localCheckpoint so the counting job and the id projection read the
    SAME blocks. If those blocks vanish (executor loss), Spark must
    refuse to silently recompute the lineage — a recompute would
    re-sample RangePartitioner boundaries and corrupt ids, the exact r6
    bug. Inject the fault: drop every persisted block between the two
    phases' first and second consumption, then assert the next action
    raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than returning."""
    df = spark.range(200_000).select(
        ((F.col("id") * 2654435761) % 1_000_003).alias("v"),
        F.col("id").alias("k"),
    )
    out = global_rank(df, [F.col("v"), F.col("k")], "r")
    # first consumption materializes the checkpoint + offsets
    assert out.count() == 200_000
    assert _unpersist_everything(spark) > 0
    with pytest.raises(Exception, match="CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND|Checkpoint block"):
        out.collect()
