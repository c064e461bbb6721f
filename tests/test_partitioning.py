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


def test_zorder_bucket_locality(spark):
    """Every top-8-bit z bucket must cover at most a 16x16 quantized
    rectangle, and a single 16-wide strip predicate on EITHER dimension
    must touch at most 16 of the 256 buckets + boundary slack — the
    pruning property that makes z-order better than a lexicographic sort
    for the non-leading column."""
    import __spark_entry__ as E

    rows = E.q_zorder_layout(spark, SF).collect()
    assert 0 < len(rows) <= 256
    assert all(0 <= r["bucket"] < 256 for r in rows)
    assert all(r["area"] <= 256 for r in rows)
    # strip predicate on pq (the leading-ish dim) and on sq (non-leading)
    for lo in (0, 64, 240):
        touched_p = [r for r in rows if not (r["pq_max"] < lo or r["pq_min"] > lo + 15)]
        touched_s = [r for r in rows if not (r["sq_max"] < lo or r["sq_min"] > lo + 15)]
        assert len(touched_p) <= 32
        assert len(touched_s) <= 32
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n_rows"] for r in rows) == li.count()


def test_zorder_key_is_morton_interleave(spark):
    from pyspark.sql import functions as F
    from csvs_to_sqlite_spark.operators.partitioning import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key([F.col("x"), F.col("y")], 8).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y)


def test_zorder_plan_scan_stage(spark):
    """The z address must be computed scan-stage: the only joins are the
    broadcast 1-row stats cross join; no sort-merge anywhere."""
    import __spark_entry__ as E

    plan = E.q_zorder_layout(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_zorder_pruning_beats_lexicographic_on_nonleading_key(spark):
    """The quantified payoff: for the same strip predicate, the
    lexicographic layout must touch EVERY file on the non-leading key
    while z-order touches a bounded fraction on BOTH keys."""
    import __spark_entry__ as E

    rows = {r["layout"]: r for r in E.q_zorder_pruning(spark, SF).collect()}
    z, lex = rows["zorder"], rows["lexicographic"]
    assert lex["touched_suppkey_strip"] == lex["n_files"]  # full scan
    assert lex["touched_partkey_strip"] <= lex["n_files"] // 8
    assert z["touched_partkey_strip"] <= z["n_files"] // 8
    assert z["touched_suppkey_strip"] <= z["n_files"] // 8


def test_scan_fanout_fires_only_on_rowgroup_bound_scans(spark, tmp_path, monkeypatch):
    """scan_fanout (optimization r11): a single-row-group parquet file
    above the size floor gains a round-robin repartition to session
    parallelism; below the floor, or when the file structure already
    yields enough scan tasks, the frame passes through untouched."""
    from csvs_to_sqlite_spark.operators import partitioning as P

    df = spark.range(20_000).withColumn("pad", F.lit("x" * 64))
    single = str(tmp_path / "single")
    df.coalesce(1).write.mode("overwrite").parquet(single)
    import glob

    [f_single] = glob.glob(f"{single}/part-*.parquet")

    # above the floor + one row group -> fan-out to defaultParallelism
    monkeypatch.setattr(P, "_FANOUT_MIN_BYTES", 1024)
    out = P.scan_fanout(spark.read.parquet(f_single), f_single)
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
    assert "partial_repartition" not in out.columns  # frame contents intact
    assert out.count() == 20_000

    # same file below the floor -> untouched
    monkeypatch.setattr(P, "_FANOUT_MIN_BYTES", 1 << 60)
    out2 = P.scan_fanout(spark.read.parquet(f_single), f_single)
    assert "Exchange" not in explain_str(out2)

    # many-file input (real scan parallelism) -> untouched
    monkeypatch.setattr(P, "_FANOUT_MIN_BYTES", 1024)
    many = str(tmp_path / "many")
    df.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(many)
    files = glob.glob(f"{many}/part-*.parquet")
    out3 = P.scan_fanout(spark.read.parquet(many), *files)
    assert "Exchange" not in explain_str(out3)


def test_assert_dimension_sized_fail_loud_and_row_preserving(spark):
    """r12 (VERDICT r11 item 6): the dimension-sized precondition on
    broadcast/crossJoin'd aggregates is ENFORCED, not a docstring claim.
    Under the cap the guard is row-preserving (assert_true -> NULL ->
    isNull keeps every row); over the cap the task fails loudly with the
    site name in the error instead of feeding an oversized broadcast."""
    import pytest as _pytest

    from csvs_to_sqlite_spark.operators import partitioning as P

    small = spark.range(100).coalesce(1)
    ok = P.assert_dimension_sized(small, "test.small")
    assert ok.count() == 100  # nothing filtered, no extra shuffle
    assert "Exchange" not in explain_str(ok)

    big = spark.range(100).coalesce(1)
    bad = P.assert_dimension_sized(big, "test.big", cap=10)
    with _pytest.raises(Exception, match="test.big.*precondition violated"):
        bad.count()
