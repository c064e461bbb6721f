"""Skew handling: AQE skew-join split and salted-join equivalence on a
synthetically skewed key distribution (one key holding ~90% of rows)."""

import pytest
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.partitioning import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 carries 180k rows; keys 1..999 carry 20 each
    hot = spark.range(180_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = (
        spark.range(20_000)
        .select((F.col("id") % 999 + 1).alias("k"), F.col("id").alias("v"))
    )
    return hot.unionByName(cold)


def test_salted_join_under_skew(spark, skewed):
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = skewed.join(dim, "k").count()
    salted = salted_join(skewed, dim, "k", salt=8).count()
    assert salted == plain == 200_000


def test_aqe_skew_join_enabled(spark, skewed):
    """AQE's skew-join optimizer is on (adaptive + skewJoin configs) so a
    sort-merge join against a skewed build side can split hot partitions
    at runtime."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true") == "true"
    big = skewed.unionByName(skewed)
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = big.join(dim, "k")
        assert joined.count() == 400_000
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in executed or "ShuffledHashJoin" in executed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_aqe_actually_splits_the_hot_partition(spark, skewed):
    """The real skew-join demo (NOTES backlog 6): with thresholds scaled
    to the fixture, AQE's OptimizeSkewedJoin must SPLIT the hot key's
    partition at runtime — the final adaptive plan marks the join
    ``skew=true`` — and the result stays identical to the unsplit join."""
    big = skewed.unionByName(skewed)
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the hot partition (~360k of 400k rows) dwarfs these thresholds
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        joined = big.join(dim, "k")
        # drive THIS DataFrame's own query execution (count() would spawn
        # a separate one whose adaptive plan we couldn't inspect)
        assert len(joined.collect()) == 400_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
