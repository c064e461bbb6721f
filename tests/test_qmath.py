"""qmath: exact integer half-up rounding — the fix for the class where
Spark's round() (shortest-repr HALF_UP via BigDecimal.valueOf) and
DuckDB/CPython's round() (exact double value) disagree on quotients of
integers, e.g. 3078435950/10000: Spark said 307843.6, DuckDB 307843.59
(the r4 tpch_q10 driver-style hash-fail, caught by the local gate)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions import qmath


def spark_val(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def duck_val(expr):
    return duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]


def py_ref(num, den, dp):
    # exact decimal half-up of num/(den·10^dp) to dp digits
    from decimal import Decimal, ROUND_HALF_UP

    q = Decimal(num) / (Decimal(den) * (10 ** dp))
    return float(q.quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP))


@pytest.mark.parametrize(
    "num,div,dp",
    [
        (3078435950, 100, 2),   # THE tpch_q10 case (sum of 1e-4 units, 2dp)
        (3078435850, 100, 2),   # tie rounding up to ...59
        (-3078435950, 100, 2),  # negative tie: away from zero
        (12345, 10, 3),
        (50, 100, 2),           # 0.005 -> 0.01
        (-50, 100, 2),
        (0, 100, 2),
        (999999999999999, 100, 2),
    ],
)
def test_qround_matches_exact_decimal_and_duckdb(spark, num, div, dp):
    got_spark = spark_val(spark, qmath.qround_long(F.lit(num).cast("long"), div, dp))
    got_duck = duck_val(qmath.sql_qround(f"CAST({num} AS BIGINT)", div, dp))
    want = py_ref(num, div, dp)
    assert got_spark == got_duck == want


@pytest.mark.parametrize(
    "num,cnt,div,dp",
    [
        (3078435950, 1, 100, 2),
        (1000001, 3, 1, 6),      # odd denominator (count=3, div=1)
        (-1000001, 3, 1, 6),
        (123456789, 7, 100, 4),
        (15, 2, 1, 0),           # 7.5 -> 8 (half-up)
        (-15, 2, 1, 0),          # -7.5 -> -8 (away from zero)
    ],
)
def test_qdiv_count_matches_exact_decimal_and_duckdb(spark, num, cnt, div, dp):
    got_spark = spark_val(
        spark,
        qmath.qdiv_count(F.lit(num).cast("long"), F.lit(cnt).cast("long"), div, dp),
    )
    got_duck = duck_val(
        qmath.sql_qdiv_count(f"CAST({num} AS BIGINT)", f"CAST({cnt} AS BIGINT)", div, dp)
    )
    from decimal import Decimal, ROUND_HALF_UP

    q = Decimal(num) / (Decimal(div) * cnt * 10 ** dp)
    want = float(q.quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP))
    assert got_spark == got_duck == want


def test_py_half_up():
    assert qmath.py_half_up(15, 2) == 8
    assert qmath.py_half_up(-15, 2) == -8
    assert qmath.py_half_up(14, 2) == 7
    assert qmath.py_half_up(3078435950 + 50, 100) == 30784360  # carries the tie


def test_spark_round_divergence_documented(spark):
    """The motivating divergence itself: keep a live proof that
    F.round(3078435950/10000.0, 2) and DuckDB's round disagree, so this
    class of expression must never appear in an oracle pair."""
    s = spark_val(spark, F.round(F.lit(3078435950).cast("long") / F.lit(10000.0), 2))
    d = duck_val("round(CAST(3078435950 AS BIGINT) / CAST(10000 AS DOUBLE), 2)")
    assert s == 307843.6 and d == 307843.59  # they really do differ


# Oracle strings that embed a machine-expanded qmath.sql_qdiv_count text
# (their enclosing strings mix f-strings and concatenation, so they paste
# the expansion rather than interpolate). This table keeps them honest:
# if qmath's SQL form ever changes, each pasted site must be regenerated,
# and this test turns silent Spark/oracle drift into a loud failure.
PASTED_QDIV_SITES = [
    ("dedup_jaccard_pairs", "(i * 1000000)", "(sa.sz + sb.sz - i)", 1, 6),
    ("minhash_calibration", "(coalesce(i.i, 0) * 1000000)",
     "(sa.sz + sb.sz - coalesce(i.i, 0))", 1, 6),
    ("assoc_rules", "(n_ab * 1000000)", "n_baskets_total", 1, 6),
    ("assoc_rules", "(n_ab * 1000000)", "ia.n_item", 1, 6),
    ("assoc_rules", "(n_ab * n_baskets_total * 1000000)",
     "(ia.n_item * ic.n_item)", 1, 6),
    ("classifier_eval", "((tp + tn) * 1000000)", "n", 1, 6),
    ("classifier_eval", "(tp * 1000000)", "(tp + fp)", 1, 6),
    ("classifier_eval", "(tp * 1000000)", "(tp + fn)", 1, 6),
    ("skew_report", "(n * 1000000)", "t.total", 1, 6),
    ("corpus_stats", "(count(*) * 1000000)", "sum(c)", 1, 6),
    ("retention_cohorts", "(n_active * 1000000)", "cohort_size", 1, 6),
    ("shingle_novelty", "(n_unique * 1000000)", "n_shingles", 1, 6),
    ("fuzzy_link", "(inter * 1000000)", "(sz_l + sz_r - inter)", 1, 6),
    ("vocab_overlap", "(n_common * 1000000)", "(sa.n + sb.n - n_common)", 1, 6),
    ("centroid_classifier_eval",
     "(sum(CASE WHEN c_label = label THEN 1 ELSE 0 END) * 1000000)",
     "count(*)", 1, 6),
    ("contamination_report",
     "(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bad) THEN 1 ELSE 0 END)"
     " * 1000000)", "count(*)", 1, 6),
]


def test_pasted_qdiv_expansions_match_current_helper():
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    for name, num, cnt, div, dp in PASTED_QDIV_SITES:
        expansion = qmath.sql_qdiv_count(num, cnt, div, dp)
        assert expansion in oracles[name], (
            f"{name}: pasted sql_qdiv_count expansion is stale — "
            f"regenerate it from qmath.sql_qdiv_count({num!r}, {cnt!r}, {div}, {dp})"
        )


def test_decayed_engagement_term_survives_large_values(spark):
    """cents * 2^40 overflows int64 for cents >= 2^23 ($83,886.08 on the
    anchor day). The term must widen BEFORE multiplying (decimal(38,0)
    in Spark, HUGEINT in DuckDB) — a silent int64 wrap produced a
    corrupt negative score while the oracle raised (review finding)."""
    from pyspark.sql import functions as F

    cents = 1 << 23
    row = (
        spark.range(1)
        .select(
            (F.lit(cents).cast("decimal(38,0)")
             * F.expr("shiftleft(CAST(1 AS BIGINT), 40)")).alias("term")
        )
        .collect()[0]
    )
    assert int(row["term"]) == cents << 40  # exact, positive
    got = duckdb.sql(
        f"SELECT CAST({cents} AS HUGEINT) * (CAST(1 AS BIGINT) << 40) AS t"
    ).fetchone()[0]
    assert int(got) == cents << 40
