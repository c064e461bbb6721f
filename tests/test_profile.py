"""Units for the ANALYZE-style column profiler (operators/profile.py)."""

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.profile import profile


def _df(spark):
    return spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (2, 7.0, None), (3, 7.0, "y")],
        "k long, v double, s string",
    )


def test_profile_hand_computed(spark):
    out = {r.col_name: r for r in profile(_df(spark), ["k", "v"], ["s"]).collect()}
    k = out["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct, k.min_num, k.max_num) == (4, 0, 3, 1.0, 3.0)
    assert k.min_str is None and k.max_str is None
    v = out["v"]
    assert (v.n_rows, v.n_nulls, v.n_distinct, v.min_num, v.max_num) == (4, 1, 2, 2.5, 7.0)
    s = out["s"]
    assert (s.n_rows, s.n_nulls, s.n_distinct, s.min_str, s.max_str) == (4, 1, 2, "x", "y")
    assert s.min_num is None and s.max_num is None


def test_profile_approx_path_same_shape(spark):
    exact = profile(_df(spark), ["k"], ["s"])
    approx = profile(_df(spark), ["k"], ["s"], approx=True)
    assert exact.columns == approx.columns
    got = {r.col_name: r.n_distinct for r in approx.collect()}
    # HLL is exact at these cardinalities
    assert got == {"k": 3, "s": 2}


def test_profile_plan_single_shuffle_per_branch(spark):
    # exact-NDV branch: distinct pre-agg then final agg; no extra exchanges
    plan = (
        profile(_df(spark), ["k", "v"], [])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # (col_name, v) pre-distinct + (col_name)
