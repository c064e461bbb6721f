"""Approximate aggregates: bounded-error checks against exact values
(cross-engine hashing can't verify these — sketches are engine-specific)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_percentile_approx_near_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01
