"""Scale-strategy tests: bucketed joins eliminate the exchange, salted
joins produce correct results, the stateful streaming operator matches a
batch oracle."""

import pytest
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.partitioning import (
    bucketed_join,
    bucketed_write,
    salted_join,
)

SF = "/root/testdata/sf0.001"


def explain_str(df, mode="simple"):
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # bucketed tables land in the default spark-warehouse dir (static conf)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    bucketed_write(li, "li_bucketed", "l_orderkey", n_buckets=8)
    bucketed_write(orders, "orders_bucketed", "o_orderkey", n_buckets=8)
    # disable broadcast so the join strategy is decided by bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_bucketed", "orders_bucketed", "l_orderkey", "o_orderkey")
        plan = explain_str(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_salted_join_correctness(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    plain = li.join(orders, "k").count()
    salted = salted_join(li, orders, "k", salt=4).count()
    assert salted == plain


def test_stateful_user_totals_matches_batch(spark):
    from csvs_to_sqlite_spark.streaming.stateful import running_user_totals
    from csvs_to_sqlite_spark.streaming.windows import load_events

    out = running_user_totals(spark, f"{SF}/events.parquet")
    batch = (
        load_events(spark, f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 4).alias("sum_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in out.collect()}
    want = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in batch.collect()}
    assert got == want
