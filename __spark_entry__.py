"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator family from SURVEY.md §2
plus the large-scale pipeline extensions (dedup, similarity, text,
streaming). Each has a DuckDB ``oracle_sql()`` twin unless the operator is
not SQL-expressible (streaming session_window, mapInPandas multimodal) —
those are rows-only checks, flagged in the docstring.

Determinism notes: every float aggregate is rounded identically on both
sides; all hashing is MD5 (bit-identical in Spark/DuckDB/Python); ranks
always carry a unique tie-break; timestamps are compared as formatted UTC
strings (prep_session pins the session timezone).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csvs_to_sqlite_spark.operators import (
    dedup,
    packing,
    similarity,
    splits,
    terms,
    text,
)
from csvs_to_sqlite_spark.operators.dims import build_dims, fmt_g
from csvs_to_sqlite_spark.operators.partitioning import (
    assert_dimension_sized,
    scan_fanout,
)
from csvs_to_sqlite_spark.operators.rowid import ROW_ID
from csvs_to_sqlite_spark.plans.specs import DimSpec, Table
from csvs_to_sqlite_spark.session import prep_session
from csvs_to_sqlite_spark.streaming.windows import (
    load_events,
    sessionize,
    windowed_event_counts,
)
from csvs_to_sqlite_spark.functions.hashing import md5_long_sql, shingles_sql, tokens_sql
from csvs_to_sqlite_spark.functions import qmath
from csvs_to_sqlite_spark.functions.cols import byte_view

# shared oracle CTE: per-doc shingle posting list (tokens bound once)
_SHINGLE_TOK_CTE = (
    "tokd AS (SELECT doc_id, "
    + tokens_sql("text", distinct=False)
    + " AS toks FROM documents),\n"
    "tok AS (SELECT doc_id, unnest("
    + shingles_sql("toks", 3)
    + ") AS token FROM tokd)"
)


# tables whose scan-stage work is expensive per byte — see _t's docstring
_FANOUT_TABLES = {"documents"}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table loader for every queries() entry, wrapped in scan_fanout:
    single-row-group parquet files scan as ONE task no matter the split
    configs, serializing every scan-stage expression (tokenize, md5,
    cosine, regex) on one core. The fan-out is size/structure-gated and
    vanishes on inputs with real scan parallelism — see
    partitioning.scan_fanout. Safe here because every query is order-free
    by the oracle-hash contract (sorted collect_lists, keyed windows,
    explicit rank keys).

    Gated to the tables whose scan stage is CPU-heavy per byte (measured
    A/B, median of 3, paired in one session): documents (tokenize /
    shingle / md5 / regex chains) ran 0.44-0.73x with the fan-out, while
    lineitem/orders/events queries ran 1.7-2.5x SLOWER — for plain
    columnar scans feeding aggregates/joins, round-robin-shuffling the
    raw rows costs more than the single-core parse it parallelizes."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name in _FANOUT_TABLES:
        df = scan_fanout(df, path)
    return df


# ---------------------------------------------------------------------------
# Deterministic float aggregation (bit-stable by construction)
# ---------------------------------------------------------------------------
# Summing doubles is order-dependent: partial-aggregate merge order varies
# with scan splits, shuffle block arrival, and AQE — so round(sum(double), k)
# can flip its last digit between runs/sessions (the r3 driver's
# dataset_card hash-fail class). Fix by construction: quantize each row to
# integer units (exact — the testdata money/value columns are 2-dp decimals,
# quality scores 6-dp), sum as long integers (associative ⇒ order-free), then
# perform ONE mirrored double division. Both engines compute identical bits
# under ANY partitioning. Scale note: sums of cents fit int64 up to ~9e16
# dollars; beyond that cast the quantized value to decimal before summing.


def _qcol(col, q):
    """Integer-quantized column: round(col*q) as long, exact for fixed-dp data."""
    return F.round(col * F.lit(q)).cast("long")


def _pow10_div(q, dp):
    """q expressed as D·10^dp. Returns D (int) when q = 10^p with
    p >= dp (the tie-prone case needing integer rounding); "exact" when
    q = 10^p with p < dp (the quotient already has <= dp decimals — no
    tie possible, one plain mirrored division suffices); None when q is
    not a power of ten (binary quantum, legacy path)."""
    d, p = q, 0
    while d % 10 == 0:
        d //= 10
        p += 1
    if d != 1:
        return None  # binary quantum (EMB_Q): handled by the legacy path
    return q // 10 ** dp if p >= dp else "exact"


def qsum(col, q, dp):
    """Order-free sum of a fixed-dp double column, rounded to dp digits.

    The final rounding is done in INTEGER space (qmath.qround_long):
    round()-on-double diverges between Spark (shortest-repr HALF_UP) and
    DuckDB/CPython (exact-value) exactly at short-decimal ties like
    3078435950/10000 — the tpch_q10 hash-fail class."""
    D = _pow10_div(q, dp)
    assert D is not None, f"qsum expects a power-of-ten quantum, got {q}"
    if D == "exact":  # quotient already has <= dp decimals: tie-free
        return F.sum(_qcol(col, q)).cast("double") / F.lit(float(q))
    return qmath.qround_long(F.sum(_qcol(col, q)), D, dp)


def qavg(col, q, dp):
    """Order-free mean of a fixed-dp double column, rounded to dp digits.

    Power-of-ten quanta round in integer space (exact ties — see qsum).
    Binary quanta (EMB_Q) keep the legacy mirrored (s/q)/n double path:
    a tie there needs the exact rational to terminate within dp+1
    decimal digits, which requires a 2^(40-dp')-divisible sum —
    astronomically rare, and the path is shared with the kmeans/PQ CTE
    chains frozen into many oracles."""
    D = _pow10_div(q, dp)
    if D is None:
        return F.round((F.sum(_qcol(col, q)) / F.lit(float(q))) / F.count(col), dp)
    if D == "exact":
        # dividing by the count reintroduces arbitrary digits, so the
        # integer path still applies — express s/(q·n) to dp decimals as
        # half_up(s·10^(dp-p) / n) / 10^dp with the numerator pre-scaled
        scale = 10 ** dp // q
        return qmath.qdiv_count(F.sum(_qcol(col, q)) * F.lit(scale), F.count(col), 1, dp)
    return qmath.qdiv_count(F.sum(_qcol(col, q)), F.count(col), D, dp)


def sql_qsum(expr, q, dp):
    num = f"sum(CAST(round(({expr}) * {q}) AS BIGINT))"
    D = _pow10_div(q, dp)
    assert D is not None, f"sql_qsum expects a power-of-ten quantum, got {q}"
    if D == "exact":
        return f"(CAST({num} AS DOUBLE) / CAST({q} AS DOUBLE))"
    return qmath.sql_qround(num, D, dp)


def sql_qavg(expr, q, dp):
    num = f"sum(CAST(round(({expr}) * {q}) AS BIGINT))"
    D = _pow10_div(q, dp)
    if D is None:
        # legacy mirrored double path (EMB_Q) — CAST(q AS DOUBLE), not a
        # q.0 literal: `100.0` parses as DECIMAL and silently switches
        # the division to decimal arithmetic
        return (
            f"round(({num} / CAST({q} AS DOUBLE))"
            f" / count({expr}), {dp})"
        )
    if D == "exact":
        scale = 10 ** dp // q
        return qmath.sql_qdiv_count(f"({num} * {scale})", f"count({expr})", 1, dp)
    return qmath.sql_qdiv_count(num, f"count({expr})", D, dp)


# quantum for embedding components: 2^40 is EXACT for float32-origin values
# (ulp ≥ 2^-40 at these magnitudes), so quantization loses nothing while
# making component sums integer ⇒ order-free (single source of truth in
# operators/similarity.py so the kmeans oracle CTEs stay in lockstep)
EMB_Q = similarity.EMB_Q


# ---------------------------------------------------------------------------
# A/B: scans, projection, filter pushdown
# ---------------------------------------------------------------------------

def q_scan_filter_project(spark, sf_dir):
    """A1/B2: projection + filter, pushed into the parquet scan."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


SQL_SCAN = """
SELECT l_orderkey, l_linenumber, l_extendedprice AS price,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
"""

# ---------------------------------------------------------------------------
# E1/D1: dimension extraction with first-appearance ids + fk rewrite
# ---------------------------------------------------------------------------
# first-appearance order key: (l_orderkey, l_linenumber) is a total order;
# l_linenumber ∈ 1..7 so ok*10+ln is an equivalent scalar key.

def _dim_returnflag(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").withColumn(
        ROW_ID, F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    tables, dims = build_dims([Table("lineitem", li)], [DimSpec("l_returnflag", "returnflag_dim")])
    return tables[0].df, dims["returnflag_dim"]


def q_dim_extract_first_appearance(spark, sf_dir):
    """E1: distinct + dense first-appearance numbering."""
    prep_session(spark)
    _, dim = _dim_returnflag(spark, sf_dir)
    return dim.select(F.col("id"), F.col("value"))


SQL_DIM = """
SELECT CAST(row_number() OVER (ORDER BY fs) AS BIGINT) AS id, value
FROM (SELECT l_returnflag AS value, min(l_orderkey*10 + l_linenumber) AS fs
      FROM lineitem GROUP BY 1)
"""


def q_fk_rewrite_broadcast(spark, sf_dir):
    """D1: value→id rewrite as a broadcast hash left join."""
    prep_session(spark)
    fact, _ = _dim_returnflag(spark, sf_dir)
    return fact.select(
        "l_orderkey", "l_linenumber", F.col("l_returnflag").alias("returnflag_id")
    )


SQL_FK = """
WITH dim AS (
  SELECT CAST(row_number() OVER (ORDER BY fs) AS BIGINT) AS id, value
  FROM (SELECT l_returnflag AS value, min(l_orderkey*10 + l_linenumber) AS fs
        FROM lineitem GROUP BY 1))
SELECT l_orderkey, l_linenumber, dim.id AS returnflag_id
FROM lineitem LEFT JOIN dim ON lineitem.l_returnflag = dim.value
"""


def q_incremental_dim_growth(spark, sf_dir):
    """E4: second batch extends the dim, preserving first-batch ids."""
    prep_session(spark)
    orders = _t(spark, sf_dir, "orders")
    o1 = orders.where(F.col("o_orderdate") < "1998-01-01").withColumn(ROW_ID, F.col("o_orderkey"))
    o2 = orders.where(F.col("o_orderdate") >= "1998-01-01").withColumn(ROW_ID, F.col("o_orderkey"))
    spec = [DimSpec("o_orderpriority", "priority_dim")]
    _, dims1 = build_dims([Table("orders", o1)], spec)
    _, dims2 = build_dims([Table("orders", o2)], spec, existing=dims1)
    return dims2["priority_dim"]


SQL_DIM_INCR = """
WITH d1 AS (
  SELECT CAST(row_number() OVER (ORDER BY fs) AS BIGINT) AS id, value
  FROM (SELECT o_orderpriority AS value, min(o_orderkey) AS fs FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1)),
novel AS (
  SELECT p.value, p.fs FROM
    (SELECT o_orderpriority AS value, min(o_orderkey) AS fs FROM orders
     WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1) p
  LEFT JOIN d1 ON d1.value = p.value WHERE d1.id IS NULL)
SELECT id, value FROM d1
UNION ALL
SELECT (SELECT max(id) FROM d1) + CAST(row_number() OVER (ORDER BY fs) AS BIGINT), value
FROM novel
"""

# ---------------------------------------------------------------------------
# D2/D3: star denormalization with a twice-joined dim
# ---------------------------------------------------------------------------

def q_denormalize_star(spark, sf_dir):
    """D2/D3: fact → dims left joins, nation joined twice (alias demo).

    Broadcast posture (VERDICT_r07 "What's wrong" #1): only the tables
    that are dimension-sized BY CONSTRUCTION carry an explicit
    ``F.broadcast`` hint — nation (25 rows at every SF). orders,
    customer, and supplier all scale with the fact side (orders is
    fact-sized outright; an explicit hint would override AQE's size
    check and OOM a 1000-executor run at 100 TB), so those joins are
    left to AQE: at bench SFs AQE broadcasts them from runtime sizes;
    at scale they become keyed shuffle joins, which is the correct
    plan. The engine's real D2 path (operators/joins.py) only ever
    broadcasts genuine extracted dims for the same reason."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(supp, li.l_suppkey == supp.s_suppkey, "left")
        .join(
            F.broadcast(nation.alias("cn")),
            cust.c_nationkey == F.col("cn.n_nationkey"),
            "left",
        )
        .join(
            F.broadcast(nation.alias("sn")),
            supp.s_nationkey == F.col("sn.n_nationkey"),
            "left",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_orderpriority").alias("priority"),
            F.col("c_mktsegment").alias("segment"),
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )


SQL_STAR = """
SELECT l_orderkey, l_linenumber, o_orderpriority AS priority,
       c_mktsegment AS segment, cn.n_name AS cust_nation, sn.n_name AS supp_nation
FROM lineitem
LEFT JOIN orders ON l_orderkey = o_orderkey
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN supplier ON l_suppkey = s_suppkey
LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey
LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey
"""

# ---------------------------------------------------------------------------
# D4/D5: semi/anti joins
# ---------------------------------------------------------------------------

def q_semi_join_urgent(spark, sf_dir):
    """D4: rowid-IN-subquery idiom as a left-semi join."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    return li.join(urgent, "l_orderkey", "left_semi").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SQL_SEMI = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey
              AND o_orderpriority = '1-URGENT')
"""


def q_anti_join_customers(spark, sf_dir):
    """Left-anti join: customers with no orders (E4's novelty detection)."""
    prep_session(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(orders, "c_custkey", "left_anti").select("c_custkey", "c_name")


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

# ---------------------------------------------------------------------------
# C1/E2: type narrowing and %g canonicalization
# ---------------------------------------------------------------------------

def q_int_downcast_detect(spark, sf_dir):
    """C1: one aggregate deciding, per float column, integral-ness."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [
        F.max(F.when(F.col(c) != F.floor(F.col(c)), 1).otherwise(0)).alias(c)
        for c in cols
    ]
    row = li.agg(*aggs)
    pieces = [
        row.select(F.lit(c).alias("col_name"), (F.col(c) == 0).alias("all_integral"))
        for c in cols
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


SQL_DOWNCAST = """
SELECT 'l_quantity' AS col_name,
       sum(CASE WHEN l_quantity <> floor(l_quantity) THEN 1 ELSE 0 END) = 0 AS all_integral FROM lineitem
UNION ALL SELECT 'l_extendedprice',
       sum(CASE WHEN l_extendedprice <> floor(l_extendedprice) THEN 1 ELSE 0 END) = 0 FROM lineitem
UNION ALL SELECT 'l_discount',
       sum(CASE WHEN l_discount <> floor(l_discount) THEN 1 ELSE 0 END) = 0 FROM lineitem
UNION ALL SELECT 'l_tax',
       sum(CASE WHEN l_tax <> floor(l_tax) THEN 1 ELSE 0 END) = 0 FROM lineitem
"""


# one tuple drives BOTH the Spark query and the SQL oracle — editing the
# scale set in one place cannot silently desynchronize the other (ADVICE r2)
# 1e-322 pushes quantities into the SUBNORMAL range, exercising the
# exact-%g fallback (Java's %g works from the shortest repr there and
# diverges from CPython/C/DuckDB — differential fuzz seed 12001)
GFMT_SCALES = (1e4, 1e5, 1e-2, 1e-322)


def q_canonical_g_format(spark, sf_dir):
    """E2: %g float canonicalization (the lookup-value string form).

    Exercises every %g regime: small integral (1..50), integral in
    [1e5, 1e6) where Java prints NO fraction (the trailing-zero-strip
    hazard — ADVICE r1), scientific notation ≥ 1e6, and sub-unity
    fractions."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(F.col("l_quantity").alias("q")).distinct()
    v = base.select(F.col("q").alias("v"))
    for scale in GFMT_SCALES:
        v = v.unionByName(base.select((F.col("q") * F.lit(scale)).alias("v")))
    return v.distinct().select("v", fmt_g(F.col("v")).alias("canon"))


def _sql_gfmt() -> str:
    branches = "\n           ".join(
        f"UNION SELECT q * {scale!r} FROM q" for scale in GFMT_SCALES
    )
    return f"""
WITH q AS (SELECT DISTINCT l_quantity AS q FROM lineitem),
     v AS (SELECT q AS v FROM q
           {branches})
SELECT DISTINCT v, format('{{:g}}', v) AS canon FROM v
"""

# ---------------------------------------------------------------------------
# B10: ISO date serialization
# ---------------------------------------------------------------------------

def q_date_iso_format(spark, sf_dir):
    """B10/B11 output form: ISO dates/datetimes as TEXT."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("order_datetime"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
    )


SQL_DATE = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS order_datetime,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month
FROM orders
"""

# ---------------------------------------------------------------------------
# E5/E6/H: aggregation, rollup, windows, set ops
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark, sf_dir):
    """E6: TPC-H Q1 shape — groupBy + multi-agg, map-side partials."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            qsum(F.col("l_extendedprice"), 100, 2).alias("sum_base_price"),
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias("sum_disc_price"),
            qavg(F.col("l_quantity"), 100, 4).alias("avg_qty"),
            qavg(F.col("l_discount"), 100, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {sql_qsum("l_extendedprice", 100, 2)} AS sum_base_price,
       {sql_qsum("l_extendedprice * (1 - l_discount)", 10000, 2)} AS sum_disc_price,
       {sql_qavg("l_quantity", 100, 4)} AS avg_qty,
       {sql_qavg("l_discount", 100, 4)} AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): two fact tables joined on
    orderkey + a selective dim filter, revenue top-10. The customer dim
    broadcasts; lineitem↔orders is the one keyed shuffle; revenue is an
    order-free integer-cent sum; top-10 is TakeOrdered (no global sort)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    cutoff = "1996-03-15"
    j = (
        li.where(F.col("l_shipdate") > cutoff)
        .join(
            o.where(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3 = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
       {sql_qsum("l_extendedprice * (1 - l_discount)", 10000, 2)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < '1996-03-15'
  AND l_shipdate > '1996-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): the six-table star-ish
    join with the c_nationkey = s_nationkey co-location constraint.
    lineitem↔orders is the only fact shuffle; supplier, customer,
    nation, region all broadcast; revenue per nation is an integer-cent
    sum."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


SQL_TPCH_Q5 = f"""
SELECT n_name,
       {sql_qsum("l_extendedprice * (1 - l_discount)", 10000, 2)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): one quarter of orders
    joined to returned lineitems, revenue per customer, top-20. The
    customer and nation dims broadcast; lineitem↔orders is the only
    keyed shuffle; revenue is an order-free integer-cent sum; top-20 is
    TakeOrdered."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_qsum("l_extendedprice * (1 - l_discount)", 10000, 2)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    self-aggregate of the fact feeds the main join. The big-order key
    set is produced by one orderkey-keyed aggregate whose HAVING
    compares EXACT integer centi-quantities (no float threshold
    wobble); orders join it on the same key (AQE broadcasts the
    filtered side), customer broadcasts."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"))
        .where(F.col("qty_c") > 180 * 100)
        .select(F.col("l_orderkey").alias("bigkey"))
    )
    j = (
        li.join(big, F.col("l_orderkey") == F.col("bigkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
        )
        .agg(qsum(F.col("l_quantity"), 100, 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       o_totalprice, {sql_qsum("l_quantity", 100, 2)} AS sum_qty
FROM lineitem
JOIN (SELECT l_orderkey AS bigkey FROM lineitem GROUP BY 1
      HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 18000) big
  ON l_orderkey = bigkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H completion (Q2..Q22 adapted to the driver schema)
# ---------------------------------------------------------------------------
# The driver testdata has no partsupp table and omits l_commitdate /
# l_receiptdate / l_shipmode / l_shipinstruct / p_container / p_mfgr /
# c_phone / *_comment, so the remaining TPC-H queries are ADAPTED: each
# keeps the original's plan shape (the part that matters for Spark) and
# swaps the missing column for the closest available proxy, documented
# per-query. With Q1 (agg_pricing_summary) and Q3/Q5/Q10/Q18 above, all
# 22 query shapes are covered.


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): correlated-min subquery
    over a part↔supplier relation. Adapted: the relation is the DISTINCT
    (l_partkey, l_suppkey) pairs from lineitem (no partsupp), and the
    cost is s_acctbal (no ps_supplycost). The distinct is the one fact
    shuffle (constant-width keys); part and the region-filtered supplier
    side broadcast; the per-part winner is a windowless min-struct on
    (cost_cents, s_suppkey) — no global window at any scale."""
    prep_session(spark)
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sup = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            "s_acctbal",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("cost_c"),
        )
    )
    best = (
        ps.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name")
        .agg(
            F.min(
                F.struct("cost_c", "s_suppkey", "s_name", "n_name", "s_acctbal")
            ).alias("w")
        )
    )
    return (
        best.select(
            F.col("w.s_acctbal").alias("s_acctbal"),
            F.col("w.s_name").alias("s_name"),
            F.col("w.n_name").alias("n_name"),
            "p_partkey",
            "p_name",
        )
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc())
        .limit(100)
    )


SQL_TPCH_Q2 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, p_name, s_acctbal, s_name, n_name, s_suppkey,
         CAST(round(s_acctbal * 100) AS BIGINT) AS cost_c
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY cost_c ASC, s_suppkey ASC) AS rn
  FROM cand
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM rk WHERE rn = 1
ORDER BY s_acctbal DESC, p_partkey ASC
LIMIT 100
"""


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS semi-join from
    orders into lineitem with a cross-table residual predicate. Adapted:
    'l_commitdate < l_receiptdate' becomes 'shipped more than 30 days
    after the order date'. The semi-join is the one keyed shuffle; the
    residual (datediff > 30) rides on the equi-join, never a cartesian."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    j = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 30),
        "left_semi",
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o.o_orderkey
                AND date_diff('day', o.o_orderdate, l_shipdate) > 30)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): pure scan-stage filter +
    one global sum — the pushdown showcase. All three predicates reach
    the parquet scan; revenue is an order-free integer
    basis-point-cent sum (extprice 2dp × discount 2dp = 4dp exact)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            qsum(F.col("l_extendedprice") * F.col("l_discount"), 10000, 2).alias(
                "revenue"
            )
        )
    )


SQL_TPCH_Q6 = f"""
SELECT {sql_qsum("l_extendedprice * l_discount", 10000, 2)} AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two nations): the
    two-path nation pair filter ((supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A)).
    lineitem↔orders is the only fact shuffle; supplier+nation and
    customer+nation broadcast; revenue per (supp, cust, year) is an
    integer-cent sum."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_qsum("volume", 10000, 2)} AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
    AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): part-name pattern filter
    drives a five-table join, profit per (nation, year). Adapted: profit
    omits the ps_supplycost term (no partsupp) — it is the plain
    discounted revenue. part and supplier+nation broadcast (the p_name
    LIKE filter prunes the broadcast side early); lineitem↔orders is
    the one fact shuffle."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias(
                "sum_profit"
            )
        )
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {sql_qsum("l_extendedprice * (1 - l_discount)", 10000, 2)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority counts): conditional
    aggregation over a fact join. Adapted: l_shipmode becomes a derived
    ship-speed class from datediff(shipdate, orderdate) (no
    commit/receipt dates). high/low counts are CASE sums riding the
    single lineitem↔orders shuffle."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "NORMAL").otherwise("SLOW")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        j.groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


SQL_TPCH_Q12 = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
GROUP BY 1
ORDER BY ship_speed
"""


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): left outer join
    customer→orders with an ON-clause filter, then a two-level
    aggregate (orders per customer, customers per order count).
    Adapted: the o_comment NOT LIKE filter becomes an o_orderpriority
    exclusion. Both aggregates shuffle on narrowing keys
    (custkey → c_count); the left join preserves zero-order customers."""
    prep_session(spark)
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): a share-of-total ratio
    per year — two conditional integer-cent sums divided exactly.
    Adapted: market = customers in region ASIA, target supplier nation
    NATION_2, part type PROMO (no p_mfgr). The ratio is computed with
    qmath (exact half-up in integer space) so Spark/DuckDB agree
    bit-for-bit; lineitem↔orders is the one fact shuffle."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    vol_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
    )
    g = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", vol_c).otherwise(0)).alias(
            "num_c"
        ),
        F.sum(vol_c).alias("den_c"),
    )
    # scaled numerator in decimal(38,0): num_c·10^6 can pass 2^63 on big
    # money sums (DuckDB's sum(BIGINT) is already HUGEINT) — the final
    # division re-enters double range, mirrored on both sides
    return g.select(
        "o_year",
        qmath.qdiv_count(
            F.col("num_c").cast("decimal(38,0)") * 1000000, F.col("den_c"), 1, 6
        ).alias("mkt_share"),
    ).orderBy("o_year")


SQL_TPCH_Q8 = f"""
WITH g AS (
  SELECT year(o_orderdate) AS o_year,
         sum(CASE WHEN ns.n_name = 'NATION_2'
                  THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                  ELSE 0 END) AS num_c,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS den_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  GROUP BY 1
)
SELECT o_year, {qmath.sql_qdiv_count("(num_c * 1000000)", "den_c", 1, 6)} AS mkt_share
FROM g ORDER BY o_year
"""


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-key value with a HAVING
    threshold derived from a global scalar aggregate of the SAME
    grouped result. Adapted: value = discounted revenue per part for
    lineitems shipped by NATION_3 suppliers (no partsupp
    supplycost·availqty). The grouped integer-cent result is computed
    once; the scalar total broadcasts back as a 1-row cross join and
    the threshold compare (value·1000 > total) stays in exact longs."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    vol_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    g = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(vol_c).alias("value_c"))
        # feeds both the per-part output and the global total; localCheckpoint
        # (not persist) so the blocks are ContextCleaner-released when the
        # frame is GC'd — no cache accumulation in long-lived host sessions
        .localCheckpoint(eager=False)
    )
    total = g.agg(F.sum("value_c").alias("total_c"))
    return (
        g.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * 1000 > F.col("total_c"))
        .select(
            "l_partkey",
            qmath.qround_long(F.col("value_c"), 100, 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


SQL_TPCH_Q11 = f"""
WITH g AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, {qmath.sql_qround("value_c", 100, 2)} AS value
FROM g
WHERE value_c * 1000 > (SELECT sum(value_c) FROM g)
ORDER BY value DESC, l_partkey ASC
"""


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): 100·promo/total ratio over one
    month — two conditional integer-cent sums, divided exactly via
    qmath (the broadcast part join prunes to the month's lineitems
    first)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = _t(spark, sf_dir, "part")
    vol_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    g = li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", vol_c).otherwise(0)).alias("num_c"),
        F.sum(vol_c).alias("den_c"),
    )
    # decimal(38,0) numerator: see q_tpch_q8's overflow note
    return g.select(
        qmath.qdiv_count(
            F.col("num_c").cast("decimal(38,0)") * 1000000, F.col("den_c"), 1, 4
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14 = f"""
WITH g AS (
  SELECT sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                  ELSE 0 END) AS num_c,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS den_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'
)
SELECT {qmath.sql_qdiv_count("(num_c * 1000000)", "den_c", 1, 4)} AS promo_revenue_pct
FROM g
"""


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): the revenue 'view' is one
    supplier-keyed aggregate; the max-revenue selection is an exact
    integer-cent compare against a broadcast 1-row max (ties would all
    surface, as in the spec). No window, no second fact scan."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    vol_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(vol_c).alias("rev_c"))
        # feeds both the max scalar and the final select; localCheckpoint so
        # blocks are GC-released (see tpch_q11)
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("rev_c").alias("max_c"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_c") == F.col("max_c"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            qmath.qround_long(F.col("rev_c"), 100, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS rev_c
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, {qmath.sql_qround("rev_c", 100, 2)} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT max(rev_c) FROM rev)
ORDER BY s_suppkey
"""


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): NOT-IN anti-join
    into a supplier exclusion set + count(DISTINCT suppkey) per part
    attribute triple. Adapted: the relation is DISTINCT (l_partkey,
    l_suppkey) from lineitem (no partsupp); the 'complaints' exclusion
    set is suppliers with negative acctbal (no s_comment). part and
    both supplier sides broadcast; the distinct-pair shuffle and the
    triple-keyed count-distinct are the only exchanges."""
    prep_session(spark)
    ps = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    j = (
        ps.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    per-part average-quantity subquery. Adapted: p_container is dropped
    (brand filter only). The threshold compare 'qty < 0.2·avg(qty)'
    is cross-multiplied into exact integers (qty·5·n < sum_qty) so no
    float threshold wobble; the per-part stats ride one partkey
    aggregate joined back broadcast (brand prunes part to ~70 keys).
    avg_yearly = round(sum_cents/100/7, 2) goes through
    qmath.qdiv_count — exact integer half-up of sum_c/7, then one
    mirrored /100 — so no per-query tie-freeness proof is needed."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    lp = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    qty_i = F.round(F.col("l_quantity")).cast("long")
    stats = lp.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum(qty_i).alias("sum_q"), F.count("*").alias("n_q")
    )
    j = lp.join(stats, F.col("l_partkey") == F.col("sk")).where(
        qty_i * 5 * F.col("n_q") < F.col("sum_q")
    )
    ext_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    return j.agg(
        qmath.qdiv_count(F.sum(ext_c), F.lit(7), 1, 2).alias("avg_yearly")
    )


SQL_TPCH_Q17 = f"""
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
stats AS (
  SELECT l_partkey AS sk, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_q,
         count(*) AS n_q
  FROM lp GROUP BY 1
)
SELECT {qmath.sql_qdiv_count("sum(CAST(round(l_extendedprice * 100) AS BIGINT))", "7", 1, 2)} AS avg_yearly
FROM lp JOIN stats ON l_partkey = sk
WHERE CAST(round(l_quantity) AS BIGINT) * 5 * n_q < sum_q
"""


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    (brand ∧ size-range ∧ qty-range) disjuncts evaluated on the
    broadcast lineitem↔part join — one fact scan, no shuffle beyond
    the final 1-row aggregate. Adapted: p_container/l_shipmode/
    l_shipinstruct predicates dropped (columns absent)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return j.where(cond).agg(
        qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000, 2).alias(
            "revenue"
        )
    )


SQL_TPCH_Q19 = f"""
SELECT {sql_qsum("l_extendedprice * (1 - l_discount)", 10000, 2)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (excess-inventory suppliers): nested semi-join
    chain — suppliers ← (part, supplier) pairs ← part-name pattern.
    Adapted: 'availqty > half the year's shipments' becomes 'shipped
    more than 10 units of a small% part in 1996' (no partsupp), and
    the nation filter widens to region AMERICA so every SF is
    non-trivial. The (partkey, suppkey) aggregate is the one fact
    shuffle; the part filter broadcasts into it; the final supplier
    semi-join broadcasts the qualifying pair set."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    qty_i = F.round(F.col("l_quantity")).cast("long")
    heavy = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_i).alias("shipped"))
        .where(F.col("shipped") > 10)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 10
  )
ORDER BY s_suppkey
"""


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    exists/not-exists double-correlation — multi-supplier orders where
    EXACTLY the candidate supplier was late. Adapted: 'late' =
    shipped > 90 days after the order date (no commit/receipt dates).
    Expressed as one (orderkey, suppkey)-level aggregate + one
    orderkey-level aggregate carrying (n_suppliers, n_late_suppliers)
    — the correlated subqueries collapse into grouped counts, no
    per-row re-scans; supplier broadcasts at the end."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    ).cast("int")
    per_os = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("was_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("was_late").alias("n_late")
    )
    culprits = (
        per_os.where(F.col("was_late") == 1)
        .join(
            per_o.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        culprits.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


SQL_TPCH_Q21 = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                  THEN 1 ELSE 0 END) AS was_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(was_late) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s_name, count(*) AS numwait
FROM per_os
JOIN per_o USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE per_os.was_late = 1 AND per_o.n_supp >= 2 AND per_o.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): scalar-average
    subquery + anti-join. Adapted: cntrycode = c_nationkey % 10 (no
    c_phone); 'no orders in 7 years' becomes an anti-join to orders
    placed since 1999. The positive-balance average broadcasts as a
    1-row cross join; the 'above average' compare is cross-multiplied
    into exact integer cents (bal_c·n > sum_c); totacctbal is an exact
    integer-cent sum."""
    prep_session(spark)
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    codes = (1, 3, 5, 7, 9)
    cc = c.where(F.col("cntrycode").isin(*codes))
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_pos = cc.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal_c).alias("sum_c"), F.count("*").alias("n_pos")
    )
    return (
        cc.crossJoin(F.broadcast(avg_pos))
        .where(bal_c * F.col("n_pos") > F.col("sum_c"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            qsum(F.col("c_acctbal"), 100, 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


SQL_TPCH_Q22 = f"""
WITH cc AS (
  SELECT *, CAST(c_nationkey % 10 AS INTEGER) AS cntrycode,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
  WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
),
avg_pos AS (
  SELECT sum(bal_c) AS sum_c, count(*) AS n_pos FROM cc WHERE c_acctbal > 0
)
SELECT cntrycode, count(*) AS numcust,
       {sql_qsum("c_acctbal", 100, 2)} AS totacctbal
FROM cc, avg_pos
WHERE bal_c * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= '1999-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


def q_rollup_returnflag(spark, sf_dir):
    """E6: rollup with subtotal rows."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_topk_per_group(spark, sf_dir):
    """H: top-3 orders by totalprice per priority (window + row_number)."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


SQL_TOPK = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3
"""


def q_running_revenue(spark, sf_dir):
    """H: running sum window per customer over order dates."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_qcol(F.col("o_totalprice"), 100)).over(w) / 100.0, 2).alias(
            "running_total"
        ),
    )


# cumulative frames: integer cents make the window sum associative, so
# Spark's sequential accumulation and DuckDB's segment tree agree bit-wise
SQL_RUNNING = """
SELECT o_custkey, o_orderkey,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS running_total
FROM orders
"""


def q_window_functions(spark, sf_dir):
    """H: the window-function family — lag/lead/first/last/rank/dense_rank/
    ntile over a deterministic per-customer order."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(wall).alias("first_order"),
        F.last("o_orderkey").over(wall).alias("last_order"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


SQL_WINDOW_FNS = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       first_value(o_orderkey) OVER wall AS first_order,
       last_value(o_orderkey) OVER wall AS last_order,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wall AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_string_functions(spark, sf_dir):
    """Scalar string-function surface: case, trim/pad, substring, concat,
    replace, length, levenshtein against a fixed probe. Levenshtein runs
    over ``cols.byte_view`` (UTF-8 octets) so it matches DuckDB's
    byte-based builtin on ANY text, not just ASCII."""
    prep_session(spark)
    c = _t(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.length(name).cast("long").alias("name_len"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat_ws("-", F.lit("cust"), F.col("c_custkey").cast("string")).alias("slug"),
        F.regexp_replace(name, "[0-9]", "#").alias("digits_masked"),
        F.levenshtein(byte_view(name), F.lit("Customer#000000001"))
        .cast("long")
        .alias("lev_to_probe"),
    )


SQL_STRING_FNS = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_name) AS lower_name,
       length(c_name) AS name_len,
       substring(c_name, 1, 8) AS prefix8,
       lpad(c_custkey::VARCHAR, 8, '0') AS padded_key,
       concat_ws('-', 'cust', c_custkey::VARCHAR) AS slug,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS digits_masked,
       levenshtein(c_name, 'Customer#000000001') AS lev_to_probe
FROM customer
"""


def q_array_agg(spark, sf_dir):
    """Nested-type surface: per-order sorted array of line quantities +
    array ops (size, sum via aggregate)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    qty = F.sort_array(F.collect_list(F.col("l_quantity"))).alias("quantities")
    return li.groupBy("l_orderkey").agg(qty).select(
        "l_orderkey",
        F.size("quantities").cast("long").alias("n_lines"),
        F.round(
            F.aggregate("quantities", F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("total_qty"),
        F.element_at("quantities", 1).alias("min_qty"),
        F.element_at("quantities", -1).alias("max_qty"),
    )


SQL_ARRAY_AGG = """
SELECT l_orderkey, len(qs) AS n_lines,
       round(list_sum(qs), 2) AS total_qty,
       qs[1] AS min_qty, qs[-1] AS max_qty
FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
      FROM lineitem GROUP BY 1)
"""


def q_full_outer_join(spark, sf_dir):
    """Join-type breadth: full outer join of per-segment customer counts
    vs per-priority order counts keyed by first letter (contrived key to
    force both unmatched sides)."""
    prep_session(spark)
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.substring("c_mktsegment", 1, 1).alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.substring("o_orderpriority", 1, 1).alias("k"))
        .agg(F.count("*").alias("n_ord"))
    )
    return c.join(o, "k", "full_outer").select("k", "n_cust", "n_ord")


SQL_FULL_OUTER = """
WITH c AS (SELECT substring(c_mktsegment, 1, 1) AS k, count(*) AS n_cust
           FROM customer GROUP BY 1),
o AS (SELECT substring(o_orderpriority, 1, 1) AS k, count(*) AS n_ord
      FROM orders GROUP BY 1)
SELECT coalesce(c.k, o.k) AS k, n_cust, n_ord
FROM c FULL OUTER JOIN o ON c.k = o.k
"""


def q_union_segments(spark, sf_dir):
    """G5/G6 union-append semantics + distinct."""
    prep_session(spark)
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING")
    b = c.where(F.col("c_acctbal") > 5000)
    return a.unionByName(b).distinct().select("c_custkey", "c_mktsegment")


SQL_UNION = """
SELECT c_custkey, c_mktsegment FROM (
  SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT * FROM customer WHERE c_acctbal > 5000)
"""


def q_distinct_counts(spark, sf_dir):
    """E5: exact distinct counts per group."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


SQL_DISTINCT = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY 1
"""

# ---------------------------------------------------------------------------
# events: sessionization, JSON, streaming windows
# ---------------------------------------------------------------------------

def q_sessionize_events(spark, sf_dir):
    """Sessionization: 30-min gap rule via lag + running sum."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    out = sessionize(e, gap_minutes=30)
    return out.select(
        "user_id", F.col("session_id").cast("long").alias("session_id"),
        "n_events", "session_start",
    )


SQL_SESSIONS = """
WITH m AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM m)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM s GROUP BY 1, 2
"""


def q_json_props(spark, sf_dir):
    """JSON extraction from the events props column."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


SQL_JSON = """
SELECT event_type, CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       count(json_extract_string(props, '$.k')) AS n_with_k
FROM events GROUP BY 1
"""


def q_windowed_event_counts(spark, sf_dir):
    """Structured Streaming: tumbling 1h event-time windows + watermark,
    driven to completion on the events parquet (batch-equivalent oracle)."""
    prep_session(spark)
    return windowed_event_counts(spark, f"{sf_dir}/events.parquet", streaming=True)


SQL_WINDOWED = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS sum_value
FROM events GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# CSV round-trip through our source (A1 + inference)
# ---------------------------------------------------------------------------

def q_csv_roundtrip_inference(spark, sf_dir):
    """A1/C1: parquet → CSV → our loader with reference type inference."""
    prep_session(spark)
    import tempfile

    from csvs_to_sqlite_spark.sources.csv_source import load_csv

    nation = _t(spark, sf_dir, "nation").orderBy("n_nationkey")
    with tempfile.NamedTemporaryFile(mode="w", suffix=".csv", delete=False) as f:
        pdf = nation.toPandas()
        pdf.to_csv(f.name, index=False)
        path = f.name
    return load_csv(spark, path)


SQL_ROUNDTRIP = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
       CAST(n_regionkey AS BIGINT) AS n_regionkey
FROM nation
"""

# ---------------------------------------------------------------------------
# dedup family (documents table)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "text", "doc_id")


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_jaccard_pairs(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.8)


# mirrors ngram_jaccard_pairs' default max_df="auto" cap: drop shingles with
# document frequency above max(1000, 1% of corpus). int() in the Spark path
# truncates, floor() here — identical for non-negative counts.
SQL_JACCARD = (
    "WITH "
    + _SHINGLE_TOK_CTE
    + """,
dfreq AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
tokc AS (
  SELECT tok.doc_id, tok.token FROM tok JOIN dfreq USING (token)
  WHERE dfreq.c <= greatest(1000,
        CAST(floor(0.01 * (SELECT count(*) FROM documents)) AS BIGINT))),
sizes AS (SELECT doc_id, count(*) AS sz FROM tokc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM tokc a JOIN tokc b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, (CAST((CASE WHEN ((i * 1000000)) < 0 THEN -CAST(round(((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) - ((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) % ((((sa.sz + sb.sz - i)) * 1) * 2))) / CAST(((((sa.sz + sb.sz - i)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) - ((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) % ((((sa.sz + sb.sz - i)) * 1) * 2))) / CAST(((((sa.sz + sb.sz - i)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE (CAST((CASE WHEN ((i * 1000000)) < 0 THEN -CAST(round(((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) - ((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) % ((((sa.sz + sb.sz - i)) * 1) * 2))) / CAST(((((sa.sz + sb.sz - i)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) - ((abs((i * 1000000)) * 2 + (((sa.sz + sb.sz - i)) * 1)) % ((((sa.sz + sb.sz - i)) * 1) * 2))) / CAST(((((sa.sz + sb.sz - i)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.8
"""
)


def q_dedup_index_recall(spark, sf_dir):
    """Recall companion to dedup_index_precision: of the TRUE near-dup
    pairs (exact shingle Jaccard ≥ 0.8, the ground truth the inverted
    index computes), what fraction does the MinHash/LSH candidate set
    surface? One-row (n_truth, n_hit, recall) — together the two
    reports bound the index's decision quality from both sides, the
    text-dedup analog of ann_recall_eval. Truth and candidates are both
    index-bounded (inverted-index join / banded equi-join — no
    all-pairs anywhere); the final fold is one pair-keyed left join over
    the threshold-bounded truth set. Truth and candidates share ONE
    persisted tokenize/shingle stage via postings= (optimization r11)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    tok = dedup.token_posting(d, "text", "doc_id", 3).persist()
    truth = dedup.ngram_jaccard_pairs(
        d, "text", "doc_id", threshold=0.8, postings=tok
    ).select("id_a", "id_b")
    cand = dedup.minhash_lsh_pairs(d, "text", "doc_id", postings=tok).withColumn(
        "__c__", F.lit(1).cast("long")
    )
    j = truth.join(cand, ["id_a", "id_b"], "left")
    return j.agg(
        F.count("*").cast("long").alias("n_truth"),
        F.sum(F.coalesce(F.col("__c__"), F.lit(0))).alias("n_hit"),
        qmath.qdiv_count(
            F.sum(F.coalesce(F.col("__c__"), F.lit(0))) * F.lit(1_000_000),
            F.greatest(F.count("*").cast("long"), F.lit(1)),
            1,
            6,
        ).alias("recall"),
    )


def _sql_dedup_index_recall() -> str:
    rate = qmath.sql_qdiv_count("(n_hit * 1000000)", "greatest(n_truth, 1)", 1, 6)
    return f"""
WITH truth AS MATERIALIZED (SELECT id_a, id_b FROM ({SQL_JACCARD})),
cand AS MATERIALIZED ({_sql_minhash_pairs()})
SELECT n_truth, n_hit, {rate} AS recall FROM (
  SELECT CAST(count(*) AS BIGINT) AS n_truth,
         CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b)
"""


def q_dedup_ensemble(spark, sf_dir):
    """Near-dup method consensus: one row per candidate pair flagged by
    ANY of the four dedup families (exact md5, MinHash-LSH bands,
    SimHash pigeonhole, shingle-Jaccard inverted index), with per-method
    membership booleans and the agreement count. The production pattern:
    cheap methods vote, disagreement triggers review — and the report
    itself measures each index's recall against the others. One
    pair-keyed aggregate over the tagged union; every family is
    bucketed/banded (no all-pairs anywhere).

    One tokenize/shingle stage (optimization r11): minhash, simhash and
    jaccard all consume the SAME persisted (doc_id, 3-gram) postings
    frame via each operator's ``postings`` parameter instead of each
    shingling the corpus independently (3 tokenize passes -> 1)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    tok = dedup.token_posting(d, "text", "doc_id", 3).persist()
    hx = d.select("doc_id", F.md5("text").alias("h"))
    a, b = hx.alias("a"), hx.alias("b")
    exact = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    mm = dedup.minhash_lsh_pairs(d, "text", "doc_id", postings=tok).select(
        "id_a", "id_b"
    )
    ms = dedup.simhash_pairs(d, "text", "doc_id", postings=tok).select("id_a", "id_b")
    mj = dedup.ngram_jaccard_pairs(
        d, "text", "doc_id", threshold=0.8, postings=tok
    ).select("id_a", "id_b")
    tagged = (
        exact.withColumn("m", F.lit("exact"))
        .unionByName(mm.withColumn("m", F.lit("minhash")))
        .unionByName(ms.withColumn("m", F.lit("simhash")))
        .unionByName(mj.withColumn("m", F.lit("jaccard")))
    )
    flags = {
        name: F.max(F.when(F.col("m") == name, 1).otherwise(0))
        for name in ("exact", "minhash", "simhash", "jaccard")
    }
    agg = tagged.groupBy("id_a", "id_b").agg(
        *[v.alias(f"__{k}") for k, v in flags.items()]
    )
    n_methods = sum(F.col(f"__{k}") for k in flags).cast("long")
    return agg.select(
        "id_a",
        "id_b",
        (F.col("__exact") == 1).alias("in_exact"),
        (F.col("__minhash") == 1).alias("in_minhash"),
        (F.col("__simhash") == 1).alias("in_simhash"),
        (F.col("__jaccard") == 1).alias("in_jaccard"),
        n_methods.alias("n_methods"),
    )


def _sql_dedup_ensemble() -> str:
    return f"""
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
tagged AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, 'exact' AS m
  FROM hx a JOIN hx b ON a.h = b.h AND a.doc_id < b.doc_id
  UNION ALL
  SELECT id_a, id_b, 'minhash' AS m FROM ({_sql_minhash_pairs()})
  UNION ALL
  SELECT id_a, id_b, 'simhash' AS m FROM ({_sql_simhash_pairs()})
  UNION ALL
  SELECT id_a, id_b, 'jaccard' AS m FROM ({SQL_JACCARD})
)
SELECT id_a, id_b,
       max(CASE WHEN m = 'exact' THEN 1 ELSE 0 END) = 1 AS in_exact,
       max(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END) = 1 AS in_minhash,
       max(CASE WHEN m = 'simhash' THEN 1 ELSE 0 END) = 1 AS in_simhash,
       max(CASE WHEN m = 'jaccard' THEN 1 ELSE 0 END) = 1 AS in_jaccard,
       CAST(max(CASE WHEN m = 'exact' THEN 1 ELSE 0 END)
          + max(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END)
          + max(CASE WHEN m = 'simhash' THEN 1 ELSE 0 END)
          + max(CASE WHEN m = 'jaccard' THEN 1 ELSE 0 END) AS BIGINT) AS n_methods
FROM tagged GROUP BY id_a, id_b
"""


def q_minhash_signatures(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_signatures(d, "text", "doc_id")


def _sql_minhash_sig() -> str:
    mins = ",\n       ".join(
        f"min(({a} * h + {b}) % {dedup.MINHASH_P}) AS s{i}"
        for i, (a, b) in enumerate(dedup.minhash_params())
    )
    return (
        "WITH "
        + _SHINGLE_TOK_CTE
        + ",\nhashed AS (SELECT doc_id, "
        + md5_long_sql("token")
        + f" AS h FROM tok)\nSELECT doc_id, {mins} FROM hashed GROUP BY doc_id"
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "text", "doc_id")


def _sql_minhash_band_rows() -> str:
    """UNION ALL of per-band (doc_id, band, key) selects over a ``sig``
    CTE — shared by the pairs and incremental-dedup oracles."""
    rows = dedup.MINHASH_K // dedup.MINHASH_BANDS
    band_selects = []
    for bi in range(dedup.MINHASH_BANDS):
        parts = ", ".join(f"s{bi * rows + j}::VARCHAR" for j in range(rows))
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, md5(concat_ws('-', {parts})) AS key FROM sig"
        )
    return "\nUNION ALL\n".join(band_selects)


def _sql_minhash_pairs() -> str:
    return (
        "WITH sig AS (\n"
        + _sql_minhash_sig()
        + "\n), bands AS (\n"
        + _sql_minhash_band_rows()
        + """
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""
    )


def q_dedup_pairs_bounded(spark, sf_dir):
    """Bounded candidate edges (dedup.minhash_lsh_edges): per LSH
    bucket, min-id representative → member star edges instead of the
    C(m,2) clique — output linear in docs×bands where the pair-complete
    path is quadratic per duplicate family (VERDICT_r07 #1). Connected
    components over these edges equal components over
    minhash_lsh_pairs; the pair path stays for calibration."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_edges(d, "text", "doc_id")


def _sql_dedup_pairs_bounded() -> str:
    return (
        "WITH sig AS (\n"
        + _sql_minhash_sig()
        + "\n), bands AS (\n"
        + _sql_minhash_band_rows()
        + """
), reps AS (
  SELECT band, key, min(doc_id) AS rep FROM bands GROUP BY band, key
)
SELECT DISTINCT r.rep AS id_a, b.doc_id AS id_b
FROM bands b JOIN reps r ON b.band = r.band AND b.key = r.key
WHERE b.doc_id <> r.rep
"""
    )


def q_dedup_clusters_bounded(spark, sf_dir):
    """Connected components routed through the LINEAR-output candidate
    path (dedup.minhash_lsh_edges → dedup_clusters): the destructive-
    dedup route at 100 TB, where the pair-complete path's C(n,2)-per-
    family output is the blowup the sf1 decade measured. The oracle
    re-derives the same star edges and runs the converged recursive-CTE
    components over them — so the clusters-over-edges equivalence is
    hash-checked cross-engine, not just unit-asserted."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    edges = dedup.minhash_lsh_edges(d, "text", "doc_id")
    return dedup.dedup_clusters(d, edges, "doc_id")


def _sql_dedup_clusters_bounded() -> str:
    bounded = _sql_dedup_pairs_bounded().strip()
    # reuse the bounded-edges SQL verbatim as the pair source: strip its
    # leading WITH and nest it as a CTE chain under WITH RECURSIVE
    assert bounded.startswith("WITH ")
    ctes, _, final_select = bounded.partition("\nSELECT DISTINCT")
    return (
        "WITH RECURSIVE "
        + ctes[len("WITH ") :]
        + ",\npairs AS MATERIALIZED (SELECT DISTINCT"
        + final_select
        + """),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
 UNION ALL SELECT id_b, id_a FROM pairs),
reach(doc_id, r) AS (
 SELECT doc_id, doc_id FROM documents
 UNION
 SELECT e.a, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b)
SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
"""
    )


def q_split_leakage(spark, sf_dir):
    """Train/test contamination audit (dedup.split_leakage): per
    ordered split pair, the number of documents sharing an LSH bucket
    with the other split — eval leakage measured BEFORE trusting
    held-out numbers. Pair-free: bucket×split presence is a distinct
    aggregate, so the audit stays linear in docs×bands even through
    million-copy duplicate families."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.split_leakage(d, "text", "doc_id")


def _sql_split_leakage() -> str:
    from csvs_to_sqlite_spark.operators.splits import split_assignment_sql

    split = split_assignment_sql("doc_id")
    rate = qmath.sql_qdiv_count(
        "(n_leaked * 1000000)", "greatest(n_split_docs, 1)", 1, 6
    )
    return (
        "WITH sig AS (\n"
        + _sql_minhash_sig()
        + "\n), bands AS (\n"
        + _sql_minhash_band_rows()
        + f"""
), s AS (
  SELECT doc_id, band, key, {split} AS split FROM bands
), present AS (
  SELECT DISTINCT band, key, split AS other_split FROM s
), crossed AS (
  SELECT DISTINCT s.doc_id, s.split, p.other_split
  FROM s JOIN present p ON s.band = p.band AND s.key = p.key
  WHERE s.split <> p.other_split
), matrix AS (
  SELECT split, other_split, CAST(count(*) AS BIGINT) AS n_leaked
  FROM crossed GROUP BY split, other_split
), totals AS (
  SELECT {split} AS split, CAST(count(*) AS BIGINT) AS n_split_docs
  FROM documents GROUP BY 1
)
SELECT m.split, m.other_split, m.n_leaked, t.n_split_docs,
       {rate} AS leak_rate
FROM matrix m JOIN totals t ON m.split = t.split
"""
    )


def q_edit_distance_verify(spark, sf_dir):
    """Exact edit-distance verification tier over the LSH candidate
    set (dedup.edit_distance_verify): per candidate pair, BYTE-level
    (UTF-8 octet) Levenshtein distance + normalized similarity —
    byte-level because that is what both engines compute identically by
    construction (Spark via cols.byte_view, DuckDB natively). Completes
    the dedup verification story — minhash_calibration checks
    signature-vs-set-Jaccard, this checks the sets against the BYTES."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.edit_distance_verify(d, "text", "doc_id")


def _sql_edit_distance_verify() -> str:
    sim = qmath.sql_qdiv_count("((mx - lev) * 1000000)", "mx", 1, 6)
    return (
        "WITH sig AS (\n"
        + _sql_minhash_sig()
        + "\n), bands AS (\n"
        + _sql_minhash_band_rows()
        + """
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), scored AS (
  SELECT p.id_a, p.id_b,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
         greatest(CAST(greatest(strlen(da.text), strlen(db.text)) AS BIGINT), 1) AS mx
  FROM pairs p
  JOIN documents da ON p.id_a = da.doc_id
  JOIN documents db ON p.id_b = db.doc_id
)
"""
        + f"SELECT id_a, id_b, lev AS edit_distance, {sim} AS char_sim FROM scored"
    )


DEDUP_PRECISION_SIM = 0.8  # char_sim at/above which a candidate is a true near-dup


def q_dedup_index_precision(spark, sf_dir):
    """Index-precision report for the MinHash/LSH dedup tier: of the
    candidate pairs the index surfaces, how many survive exact
    character-level verification (char_sim ≥ 0.8)? The one-row summary
    a pipeline reads before trusting the index's candidates for
    DESTRUCTIVE dedup — calibration checks the estimator, this checks
    the DECISION. Candidate-bounded; one aggregate over the verify
    tier."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    v = dedup.edit_distance_verify(d, "text", "doc_id")
    return v.agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.sum((F.col("char_sim") >= DEDUP_PRECISION_SIM).cast("long")).alias(
            "n_verified"
        ),
        qmath.qdiv_count(
            F.sum((F.col("char_sim") >= DEDUP_PRECISION_SIM).cast("long"))
            * F.lit(1_000_000),
            F.greatest(F.count("*").cast("long"), F.lit(1)),
            1,
            6,
        ).alias("precision"),
    )


def _sql_dedup_index_precision() -> str:
    rate = qmath.sql_qdiv_count(
        "(n_verified * 1000000)", "greatest(n_candidates, 1)", 1, 6
    )
    # MATERIALIZED is load-bearing (NOTES.md bpe_merges lesson):
    # non-materialized CTEs inline in DuckDB and re-evaluate the whole
    # minhash/levenshtein chain per reference
    return (
        "WITH verify AS MATERIALIZED (\n"
        + _sql_edit_distance_verify()
        + f"""
)
SELECT n_candidates, n_verified, {rate} AS precision FROM (
  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN char_sim >= {DEDUP_PRECISION_SIM} THEN 1 ELSE 0 END) AS BIGINT) AS n_verified
  FROM verify)
"""
    )


def q_minhash_calibration(spark, sf_dir):
    """MinHash estimator calibration (dedup.minhash_calibration): per
    LSH candidate pair, signature-match count vs exact shingle
    intersection/union and both Jaccard forms — the harness that
    validates the k/bands budget against ground truth."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_calibration(d, "text", "doc_id")


def _sql_minhash_calibration() -> str:
    k = dedup.MINHASH_K
    terms = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return (
        "WITH sig AS (\n"
        + _sql_minhash_sig()
        + "\n), bands AS (\n"
        + _sql_minhash_band_rows()
        + "\n), pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b\n"
        "  FROM bands a JOIN bands b"
        " ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),\n"
        "m AS (SELECT p.id_a, p.id_b, CAST(" + terms + " AS BIGINT) AS n_match\n"
        "  FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a"
        " JOIN sig sb ON sb.doc_id = p.id_b),\n"
        + _SHINGLE_TOK_CTE
        + ",\nsizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),\n"
        "inter AS (SELECT p.id_a, p.id_b, count(*) AS i FROM pairs p\n"
        "  JOIN tok ta ON ta.doc_id = p.id_a\n"
        "  JOIN tok tb ON tb.doc_id = p.id_b AND tb.token = ta.token\n"
        "  GROUP BY 1, 2)\n"
        "SELECT m.id_a, m.id_b, m.n_match,\n"
        "  CAST(coalesce(i.i, 0) AS BIGINT) AS n_inter,\n"
        "  CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS BIGINT) AS n_union,\n"
        f"  round(m.n_match / CAST({k} AS DOUBLE), 6) AS est_jaccard,\n"
        "  (CAST((CASE WHEN ((coalesce(i.i, 0) * 1000000)) < 0 THEN -CAST(round(((abs((coalesce(i.i, 0) * 1000000)) * 2 + (((sa.sz + sb.sz - coalesce(i.i, 0))) * 1)) - ((abs((coalesce(i.i, 0) * 1000000)) * 2 + (((sa.sz + sb.sz - coalesce(i.i, 0))) * 1)) % ((((sa.sz + sb.sz - coalesce(i.i, 0))) * 1) * 2))) / CAST(((((sa.sz + sb.sz - coalesce(i.i, 0))) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((coalesce(i.i, 0) * 1000000)) * 2 + (((sa.sz + sb.sz - coalesce(i.i, 0))) * 1)) - ((abs((coalesce(i.i, 0) * 1000000)) * 2 + (((sa.sz + sb.sz - coalesce(i.i, 0))) * 1)) % ((((sa.sz + sb.sz - coalesce(i.i, 0))) * 1) * 2))) / CAST(((((sa.sz + sb.sz - coalesce(i.i, 0))) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " AS true_jaccard\n"
        "FROM m LEFT JOIN inter i ON i.id_a = m.id_a AND i.id_b = m.id_b\n"
        "JOIN sizes sa ON sa.doc_id = m.id_a JOIN sizes sb ON sb.doc_id = m.id_b"
    )


def q_simhash_fingerprints(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d, "text", "doc_id")


def _sql_simhash() -> str:
    h = md5_long_sql("token", seed="simhash")
    votes = ",\n       ".join(
        f"sum(CASE WHEN (({h}) >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(dedup.SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN v{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END"
        for j in range(dedup.SIMHASH_BITS)
    )
    return (
        "WITH "
        + _SHINGLE_TOK_CTE
        + f",\nvotes AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)\n"
        + f"SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes"
    )


def q_simhash_pairs(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, "text", "doc_id", max_hamming=3)


def _sql_simhash_pairs() -> str:
    band_selects = []
    for bi in range(dedup.SIMHASH_BANDS):
        band_selects.append(
            f"SELECT doc_id, simhash, {bi} AS band, (simhash >> {bi * 8}) & 255 AS key FROM sh"
        )
    bands = "\nUNION ALL\n".join(band_selects)
    return (
        "WITH sh AS (\n"
        + _sql_simhash()
        + "\n), bands AS (\n"
        + bands
        + """
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""
    )

# ---------------------------------------------------------------------------
# similarity search (embeddings table)
# ---------------------------------------------------------------------------

def q_knn_bruteforce(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id < 10."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rnk")
    )


SQL_KNN = """
WITH q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, list_transform(embedding, x -> x::DOUBLE) AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_sum(list_transform(list_zip(qv, cv), p -> p[1]*p[2])) /
               (sqrt(list_sum(list_transform(qv, x -> x*x))) *
                sqrt(list_sum(list_transform(cv, x -> x*x)))), 6) AS cos_sim
  FROM q, c WHERE query_id <> neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
"""


def q_knn_lsh(spark, sf_dir):
    """LSH-bucketed ANN: deterministic md5-derived hyperplanes."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5, n_planes=4, dim=64)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rnk")
    )


def _sql_knn_lsh() -> str:
    planes = similarity.hyperplanes(64, 4)
    bits = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(f"{x}::DOUBLE" for x in plane) + "]"
        bits.append(
            f"CASE WHEN list_sum(list_transform(list_zip(v, {arr}), p -> p[1]*p[2])) > 0 "
            f"THEN {2 ** j} ELSE 0 END"
        )
    bucket = " + ".join(bits)
    return f"""
WITH base AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
bucketed AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM base),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM bucketed),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_sum(list_transform(list_zip(qv, cv), p -> p[1]*p[2])) /
               (sqrt(list_sum(list_transform(qv, x -> x*x))) *
                sqrt(list_sum(list_transform(cv, x -> x*x)))), 6) AS cos_sim
  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
"""

# ---------------------------------------------------------------------------
# text analysis (documents table)
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 8
IVF_PROBE = 2
IVF_KMEANS_ITERS = 2
SEMDEDUP_THRESHOLD = 0.95


def q_knn_ivf(spark, sf_dir):
    """IVF ANN: k-means centroid cells (2 deterministic seeded Lloyd
    rounds), multi-probe (P=2) candidate set, exact cosine re-rank."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        n_centroids=IVF_CENTROIDS,
        n_probe=IVF_PROBE,
        kmeans_iters=IVF_KMEANS_ITERS,
    )
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rnk")
    )


IVF_INC_TRAIN_PRED = "vec_id % 5 != 0"  # initial corpus; multiples of 5 arrive later

# one cached index dir per sf_dir: repeated invocations in a long-lived
# session (correctness sweeps, dump_plans) rebuild in place instead of
# accumulating O(corpus) mkdtemp dirs per call
_IVF_INC_PATHS: dict = {}


def q_ivf_index_incremental(spark, sf_dir):
    """Index maintenance at scale: build the persisted cell-partitioned
    IVF index on the initial corpus (vec_id % 5 != 0), then
    ``ivf_index_append`` the late arrivals under the FROZEN centroids —
    only the receiving cells grow files (O(delta) maintenance, the FAISS
    add() contract) — and query top-5 over the union. The oracle trains
    its unrolled-Lloyd k-means on the same initial subset and assigns
    the full corpus, so the append path is hash-compared end to end."""
    prep_session(spark)
    import atexit
    import shutil as _shutil
    import tempfile as _tempfile

    emb = _t(spark, sf_dir, "embeddings")
    path = _IVF_INC_PATHS.get(sf_dir)
    if path is None:
        path = _tempfile.mkdtemp(prefix="q_ivf_inc_")
        _IVF_INC_PATHS[sf_dir] = path
        atexit.register(_shutil.rmtree, path, ignore_errors=True)
    else:
        # rebuild in place — the query must exercise write+append each run
        _shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_write(
        emb.where(IVF_INC_TRAIN_PRED),
        path,
        n_centroids=IVF_CENTROIDS,
        kmeans_iters=IVF_KMEANS_ITERS,
    )
    similarity.ivf_index_append(spark, path, emb.where("vec_id % 5 = 0"))
    out = similarity.ivf_index_topk(
        spark, path, emb.where(F.col("vec_id") < 10), k=5, n_probe=IVF_PROBE
    )
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rnk")
    )


def _sql_ivf_index_incremental() -> str:
    """_sql_knn_ivf with the k-means TRAINING restricted to the initial
    corpus (IVF_INC_TRAIN_PRED) — assignment/probing/scoring run over
    the full union, mirroring write-then-append."""
    parts = _sql_kmeans_parts(
        IVF_CENTROIDS, IVF_KMEANS_ITERS, train_pred=IVF_INC_TRAIN_PRED
    )
    final = f"cents{IVF_KMEANS_ITERS}"
    parts.append(
        f"""corpus AS (
  SELECT vec_id AS neighbor_id, v AS cv2, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c)
  WHERE rn = 1)"""
    )
    parts.append(
        f"""q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c WHERE b.vec_id < 10)
  WHERE rn <= {IVF_PROBE})"""
    )
    parts.append(
        f"""scored AS (
  SELECT query_id, neighbor_id, {_dd_cos('qv', 'cv2')} AS cos_sim
  FROM corpus JOIN q USING (cell) WHERE query_id <> neighbor_id)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT query_id, neighbor_id, cos_sim, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM scored)
WHERE rnk <= 5
"""
    )


def _dd_cos(a: str, b: str) -> str:
    """DuckDB rounded-cosine expression between two DOUBLE list columns."""
    return (
        f"round(list_sum(list_transform(list_zip({a}, {b}), p -> p[1]*p[2])) /"
        f" (sqrt(list_sum(list_transform({a}, x -> x*x))) *"
        f" sqrt(list_sum(list_transform({b}, x -> x*x)))), 6)"
    )


def _sql_kmeans_parts(n_centroids: int, iters: int, train_pred: str | None = None) -> list[str]:
    """CTE list unrolling the deterministic seeded Lloyd rounds of
    ``similarity.kmeans_centroids`` (assign, recompute-6dp-rounded
    means, per iteration). Shared by every oracle that needs k-means
    cells so the Spark constants and the SQL stay in lockstep; the
    final centroid CTE is named ``cents{iters}``. ``train_pred``
    restricts the TRAINING corpus (seeds + Lloyd assignments) — the
    incremental-index oracle trains on the initial corpus only, exactly
    like ``ivf_index_write`` before an ``ivf_index_append``."""
    tbase = f"(SELECT * FROM base WHERE {train_pred})" if train_pred else "base"
    parts = [
        "WITH base AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)",
        f"tbase AS (SELECT * FROM {tbase})",
        f"cents0 AS (SELECT vec_id AS centroid_id, v AS cv FROM tbase WHERE vec_id < {n_centroids})",
    ]
    for it in range(iters):
        parts.append(
            f"""asg{it} AS (
  SELECT vec_id, v, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM tbase b CROSS JOIN cents{it} c)
  WHERE rn = 1)"""
        )
        parts.append(
            f"""cents{it + 1} AS (
  SELECT cell AS centroid_id, list(m ORDER BY pos) AS cv FROM (
    SELECT cell, pos, {sql_qavg("x", EMB_Q, 6)} AS m FROM (
      SELECT cell, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM asg{it})
    GROUP BY cell, pos)
  GROUP BY cell)"""
        )
    return parts


def _sql_knn_ivf() -> str:
    """Mirror of ivf_topk: the Lloyd rounds are unrolled into one CTE
    pair (assign, recompute-means) per iteration, generated from the
    same IVF_* constants the Spark query uses. Centroid components are
    rounded to 6 dp on both sides, which erases cross-engine float
    summation-order differences."""
    parts = _sql_kmeans_parts(IVF_CENTROIDS, IVF_KMEANS_ITERS)
    final = f"cents{IVF_KMEANS_ITERS}"
    parts.append(
        f"""corpus AS (
  SELECT vec_id AS neighbor_id, v AS cv2, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c)
  WHERE rn = 1)"""
    )
    parts.append(
        f"""q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c WHERE b.vec_id < 10)
  WHERE rn <= {IVF_PROBE})"""
    )
    parts.append(
        f"""scored AS (
  SELECT query_id, neighbor_id, {_dd_cos('qv', 'cv2')} AS cos_sim
  FROM corpus JOIN q USING (cell) WHERE query_id <> neighbor_id)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT query_id, neighbor_id, cos_sim, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM scored)
WHERE rnk <= 5
"""
    )


def q_ivf_rebalance(spark, sf_dir):
    """IVF hot-list maintenance plan (similarity.ivf_rebalance_plan):
    cells above the mean list size get a deterministic kd-style split
    prescription — max-exact-variance dimension + type-1 median in
    EMB_Q integer units. The plan a maintenance job applies without
    retraining the coarse quantizer (FAISS 'split big lists')."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_rebalance_plan(
        emb, n_centroids=IVF_CENTROIDS, kmeans_iters=IVF_KMEANS_ITERS
    )


def _sql_ivf_rebalance() -> str:
    from csvs_to_sqlite_spark.operators.similarity import EMB_Q

    parts = _sql_kmeans_parts(IVF_CENTROIDS, IVF_KMEANS_ITERS)
    final = f"cents{IVF_KMEANS_ITERS}"
    parts.append(
        f"""corpus AS MATERIALIZED (
  SELECT vec_id, v, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c)
  WHERE rn = 1)"""
    )
    parts.append(
        "sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors FROM corpus GROUP BY cell)"
    )
    parts.append(
        "total AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS n_total FROM sizes)"
    )
    parts.append(
        f"""hot AS (SELECT cell, n_vectors FROM sizes CROSS JOIN total
  WHERE n_vectors * {IVF_CENTROIDS} > n_total)"""
    )
    parts.append(
        f"""expl AS MATERIALIZED (
  SELECT c.cell, h.n_vectors, c.vec_id,
         generate_subscripts(c.v, 1) - 1 AS pos,
         CAST(round(unnest(c.v) * {EMB_Q}) AS HUGEINT) AS q
  FROM corpus c JOIN hot h USING (cell))"""
    )
    parts.append(
        """stats AS (
  SELECT cell, pos, max(n_vectors) AS n_vectors,
         sum(q) AS s, sum(q * q) AS ss
  FROM expl GROUP BY cell, pos)"""
    )
    parts.append(
        """sd AS (
  SELECT cell, n_vectors, pos AS split_dim FROM (
    SELECT cell, n_vectors, pos,
           row_number() OVER (PARTITION BY cell
             ORDER BY (n_vectors * ss - s * s) DESC, pos) AS rn
    FROM stats) WHERE rn = 1)"""
    )
    parts.append(
        """member AS MATERIALIZED (
  SELECT e.cell, e.n_vectors, e.vec_id, e.q
  FROM expl e JOIN sd ON e.cell = sd.cell AND e.pos = sd.split_dim)"""
    )
    parts.append(
        """med AS (
  SELECT cell, q AS split_q FROM (
    SELECT cell, q, n_vectors,
           row_number() OVER (PARTITION BY cell ORDER BY q, vec_id) AS rn
    FROM member) WHERE rn = (n_vectors + 1) // 2)"""
    )
    parts.append(
        """counts AS (
  SELECT m.cell, CAST(max(med.split_q) AS BIGINT) AS split_q,
         CAST(sum(CASE WHEN m.q <= med.split_q THEN 1 ELSE 0 END) AS BIGINT) AS n_left
  FROM member m JOIN med USING (cell) GROUP BY m.cell)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT sd.cell, sd.n_vectors, CAST(sd.split_dim AS BIGINT) AS split_dim,
       counts.split_q, counts.n_left,
       sd.n_vectors - counts.n_left AS n_right
FROM sd JOIN counts USING (cell)
"""
    )


_IVF_REBAL_PATHS: dict = {}


def q_ivf_rebalance_apply(spark, sf_dir):
    """Execute the hot-list split plan against the persisted IVF index
    (similarity.ivf_index_rebalance_apply, VERDICT_r07 item 4): build
    the index, apply the plan — split cells' partitions rewritten in
    place via dynamic partition overwrite (left keeps the cell id,
    right gets max_id+1+rank), both sides get recomputed quantized-mean
    centroids, non-hot cells untouched — then return the POST-APPLY
    layout audit read back FROM DISK: (cell, n_vectors, centroid). The
    oracle recomputes the same layout from the plan math, so the
    mutation itself is hash-compared end to end."""
    prep_session(spark)
    import atexit
    import shutil as _shutil
    import tempfile as _tempfile

    emb = _t(spark, sf_dir, "embeddings")
    path = _IVF_REBAL_PATHS.get(sf_dir)
    if path is None:
        path = _tempfile.mkdtemp(prefix="q_ivf_rebal_")
        _IVF_REBAL_PATHS[sf_dir] = path
        atexit.register(_shutil.rmtree, path, ignore_errors=True)
    else:
        _shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_write(
        emb, path, n_centroids=IVF_CENTROIDS, kmeans_iters=IVF_KMEANS_ITERS
    )
    similarity.ivf_index_rebalance_apply(spark, path, cap_num=1, cap_den=1)
    cells = (
        spark.read.parquet(f"{path}/cells")
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_vectors"))
    )
    cents = spark.read.parquet(f"{path}/centroids")
    return (
        cells.join(cents, cells.cell.cast("long") == cents.centroid_id)
        .select(
            F.col("centroid_id").alias("cell"),
            "n_vectors",
            F.col("cv").alias("centroid"),
        )
    )


def _sql_rebalance_apply_ctes() -> str:
    """The full CTE chain of the rebalance APPLY (plan + split +
    recomputed centroids + final assignment) with no final SELECT —
    composed by both the layout-audit oracle and the sibling-probe
    query oracle."""
    from csvs_to_sqlite_spark.operators.similarity import EMB_Q

    plan_sql = _sql_ivf_rebalance().strip()
    # reuse the full plan CTE chain: strip its final SELECT, keep the CTEs
    head, _, _ = plan_sql.rpartition("\nSELECT sd.cell")
    final = f"cents{IVF_KMEANS_ITERS}"
    return (
        head
        + f""",
new_ids AS (
  SELECT cell, CAST((SELECT max(centroid_id) FROM {final}) AS BIGINT)
         + CAST(row_number() OVER (ORDER BY cell) AS BIGINT) AS right_id
  FROM sd),
moved AS MATERIALIZED (
  SELECT CASE WHEN m.q <= c.split_q THEN m.cell ELSE n.right_id END AS cell,
         m.vec_id
  FROM member m JOIN counts c ON m.cell = c.cell
  JOIN new_ids n ON m.cell = n.cell),
final_assign AS MATERIALIZED (
  SELECT cell, vec_id FROM corpus WHERE cell NOT IN (SELECT cell FROM hot)
  UNION ALL
  SELECT cell, vec_id FROM moved),
split_cents AS (
  SELECT cell AS centroid_id, list(m ORDER BY pos) AS cv FROM (
    SELECT cell, pos, {sql_qavg("x", EMB_Q, 6)} AS m FROM (
      SELECT mv.cell, generate_subscripts(b.v, 1) AS pos, unnest(b.v) AS x
      FROM moved mv JOIN base b ON mv.vec_id = b.vec_id)
    GROUP BY cell, pos)
  GROUP BY cell),
final_cents AS (
  SELECT centroid_id, cv FROM {final}
  WHERE centroid_id NOT IN (SELECT cell FROM hot)
  UNION ALL
  SELECT centroid_id, cv FROM split_cents)"""
    )


def _sql_ivf_rebalance_apply() -> str:
    return (
        _sql_rebalance_apply_ctes()
        + """
SELECT fc.centroid_id AS cell,
       CAST(count(*) AS BIGINT) AS n_vectors,
       fc.cv AS centroid
FROM final_assign fa JOIN final_cents fc ON fa.cell = fc.centroid_id
GROUP BY fc.centroid_id, fc.cv
"""
    )


_IVF_REBALQ_PATHS: dict = {}


def q_ivf_rebalance_query(spark, sf_dir):
    """Query the REBALANCED index with sibling-expanded probes
    (similarity.ivf_index_topk(expand_siblings=True)): after a hot-list
    split a fixed n_probe scans fewer vectors, so each probe that lands
    on a split cell also probes the cell's split sibling — the
    maintenance-aware query path a production IVF service runs between
    rebuilds. The oracle replicates the whole chain: k-means → plan →
    split → recomputed centroids → probe assignment over the NEW
    centroid set → sibling expansion → exact-cosine rank."""
    prep_session(spark)
    import atexit
    import shutil as _shutil
    import tempfile as _tempfile

    emb = _t(spark, sf_dir, "embeddings")
    path = _IVF_REBALQ_PATHS.get(sf_dir)
    if path is None:
        path = _tempfile.mkdtemp(prefix="q_ivf_rebalq_")
        _IVF_REBALQ_PATHS[sf_dir] = path
        atexit.register(_shutil.rmtree, path, ignore_errors=True)
    else:
        _shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_write(
        emb, path, n_centroids=IVF_CENTROIDS, kmeans_iters=IVF_KMEANS_ITERS
    )
    similarity.ivf_index_rebalance_apply(spark, path, cap_num=1, cap_den=1)
    out = similarity.ivf_index_topk(
        spark,
        path,
        emb.where(F.col("vec_id") < 10),
        k=5,
        n_probe=IVF_PROBE,
        expand_siblings=True,
    )
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rnk")
    )


def _sql_ivf_rebalance_query() -> str:
    return (
        _sql_rebalance_apply_ctes()
        + f""",
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT b.vec_id AS query_id, b.v AS qv, fc.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'fc.cv')} DESC, fc.centroid_id) AS rn
    FROM base b CROSS JOIN final_cents fc WHERE b.vec_id < 10)
  WHERE rn <= {IVF_PROBE}),
sibs AS (
  SELECT cell, right_id AS sibling FROM new_ids
  UNION ALL
  SELECT right_id AS cell, new_ids.cell AS sibling FROM new_ids),
expanded AS (
  SELECT query_id, qv, cell FROM probes
  UNION
  SELECT p.query_id, p.qv, s.sibling AS cell
  FROM probes p JOIN sibs s ON p.cell = s.cell),
scored AS (
  SELECT e.query_id, fa.vec_id AS neighbor_id, {_dd_cos('e.qv', 'b.v')} AS cos_sim
  FROM expanded e
  JOIN final_assign fa ON e.cell = fa.cell
  JOIN base b ON fa.vec_id = b.vec_id
  WHERE e.query_id <> fa.vec_id)
SELECT query_id, neighbor_id, cos_sim, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM scored)
WHERE rnk <= 5
"""
    )


def q_pq_encode(spark, sf_dir):
    """Product-quantization codes (similarity.pq_encode, Jégou et al.
    2011): 8 subspaces × 16-centroid codebooks (seeded, one quantized
    Lloyd round), per-vector code word + reconstruction error. The
    codebook is an (m·k)-row broadcast; the corpus shuffles only through
    the constant-state (s, cell, pos) mean aggregate and the vid-keyed
    code collect."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_encode(emb)


def q_knn_ivfpq(spark, sf_dir):
    """IVF-PQ ANN (similarity.ivfpq_topk): coarse k-means cells route
    each query to its 2 nearest inverted lists; candidates are scored by
    ADC — the query's exact subvectors against each candidate's PQ code
    via a broadcast (|q|·m·k)-row lookup table. The production 100 TB
    index layout: candidate raw vectors are never touched, scores are
    exact integer micro-unit sums (order-free), ranking compares longs."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.ivfpq_topk(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        n_centroids=IVF_CENTROIDS,
        n_probe=IVF_PROBE,
        kmeans_iters=IVF_KMEANS_ITERS,
    )
    return out.select(
        "query_id", "neighbor_id", "adist", F.col("rank").cast("long").alias("rnk")
    )


def _sql_knn_ivfpq() -> str:
    """Twin of q_knn_ivfpq: the shared Lloyd-round CTEs give the coarse
    cells (corpus home cell, query n_probe cells); the shared PQ CTEs
    give per-subspace codes + final codebooks; the ADC lookup table and
    integer micro-unit score sum mirror the Spark op exactly."""
    parts = _sql_kmeans_parts(IVF_CENTROIDS, IVF_KMEANS_ITERS)
    final = f"cents{IVF_KMEANS_ITERS}"
    parts.append(
        f"""corpus AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT b.vec_id, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c)
  WHERE rn = 1)"""
    )
    parts.append(
        f"""probed AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT b.vec_id, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c WHERE b.vec_id < 10)
  WHERE rn <= {IVF_PROBE})"""
    )
    parts.append("pqb AS MATERIALIZED (SELECT vec_id AS vid, v FROM base)")
    pq_parts, code_tables, cent_tables = similarity._pq_sql_parts(base="pqb")
    parts += pq_parts
    parts.append(
        "codes_long AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT vid, {s} AS s, code FROM {t}" for s, t in enumerate(code_tables)
        )
        + ")"
    )
    dist = "list_sum(list_transform(list_zip(sv, cv), p -> (p[1]-p[2])*(p[1]-p[2])))"
    lut_selects = []
    for s, cent in enumerate(cent_tables):
        lo, hi = s * similarity.PQ_DSUB + 1, (s + 1) * similarity.PQ_DSUB
        lut_selects.append(
            f"SELECT query_id, {s} AS s, cid AS code, "
            f"CAST(round({dist} * {similarity.ADC_Q}) AS BIGINT) AS d2u "
            f"FROM (SELECT vec_id AS query_id, list_slice(v, {lo}, {hi}) AS sv "
            f"FROM base WHERE vec_id < 10) CROSS JOIN {cent}"
        )
    parts.append("lut AS MATERIALIZED (" + " UNION ALL ".join(lut_selects) + ")")
    parts.append(
        """scored AS (
  SELECT p.query_id, c.neighbor_id, sum(l.d2u) AS adu
  FROM corpus c JOIN probed p USING (cell)
  JOIN codes_long cl ON cl.vid = c.neighbor_id
  JOIN lut l ON l.query_id = p.query_id AND l.s = cl.s AND l.code = cl.code
  WHERE p.query_id <> c.neighbor_id
  GROUP BY p.query_id, c.neighbor_id)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT query_id, neighbor_id, round(adu / CAST({similarity.ADC_Q} AS DOUBLE), 6) AS adist, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY adu ASC, neighbor_id) AS rnk FROM scored)
WHERE rnk <= 5
"""
    )


def q_knn_ivfpq_residual(spark, sf_dir):
    """IVFADC — residual IVF-PQ (similarity.ivfpq_residual_topk, Jégou
    et al. 2011 §III): PQ codebooks learned on v − coarse_centroid(v),
    ADC lookup tables built per (query, probed cell). The codebooks only
    cover within-cell spread, so the same byte budget yields tighter
    codes than raw-vector PQ."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.ivfpq_residual_topk(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        n_centroids=IVF_CENTROIDS,
        n_probe=IVF_PROBE,
        kmeans_iters=IVF_KMEANS_ITERS,
    )
    return out.select(
        "query_id", "neighbor_id", "adist", F.col("rank").cast("long").alias("rnk")
    )


def _sql_knn_ivfpq_residual() -> str:
    """Twin of q_knn_ivfpq_residual: Lloyd CTEs → per-vector residuals →
    the shared PQ CTE chain over the residual base → per-(query, cell)
    ADC lookup → integer micro-unit score sum."""
    parts = _sql_kmeans_parts(IVF_CENTROIDS, IVF_KMEANS_ITERS)
    final = f"cents{IVF_KMEANS_ITERS}"
    parts.append(
        f"""cells AS (
  SELECT vec_id, v, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c)
  WHERE rn = 1)"""
    )
    parts.append(
        f"""rb AS MATERIALIZED (
  SELECT c.vec_id AS vid, c.cell,
         list_transform(list_zip(c.v, ct.cv), z -> z[1] - z[2]) AS v
  FROM cells c JOIN {final} ct ON ct.centroid_id = c.cell)"""
    )
    pq_parts, code_tables, cent_tables = similarity._pq_sql_parts(base="rb")
    parts += pq_parts
    parts.append(
        "codes_long AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT vid, {s} AS s, code FROM {t}" for s, t in enumerate(code_tables)
        )
        + ")"
    )
    parts.append(
        f"""probed AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c WHERE b.vec_id < 10)
  WHERE rn <= {IVF_PROBE})"""
    )
    parts.append(
        f"""qres AS (
  SELECT query_id, pr.cell,
         list_transform(list_zip(qv, ct.cv), z -> z[1] - z[2]) AS rv
  FROM probed pr JOIN {final} ct ON ct.centroid_id = pr.cell)"""
    )
    dist = "list_sum(list_transform(list_zip(sv, cv), p -> (p[1]-p[2])*(p[1]-p[2])))"
    lut_selects = []
    for s, cent in enumerate(cent_tables):
        lo, hi = s * similarity.PQ_DSUB + 1, (s + 1) * similarity.PQ_DSUB
        lut_selects.append(
            f"SELECT query_id, cell, {s} AS s, cid AS code, "
            f"CAST(round({dist} * {similarity.ADC_Q}) AS BIGINT) AS d2u "
            f"FROM (SELECT query_id, cell, list_slice(rv, {lo}, {hi}) AS sv "
            f"FROM qres) CROSS JOIN {cent}"
        )
    parts.append("lut AS MATERIALIZED (" + " UNION ALL ".join(lut_selects) + ")")
    parts.append(
        """scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, sum(l.d2u) AS adu
  FROM cells c JOIN probed p USING (cell)
  JOIN codes_long cl ON cl.vid = c.vec_id
  JOIN lut l ON l.query_id = p.query_id AND l.cell = c.cell
            AND l.s = cl.s AND l.code = cl.code
  WHERE p.query_id <> c.vec_id
  GROUP BY p.query_id, c.vec_id)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT query_id, neighbor_id, round(adu / CAST({similarity.ADC_Q} AS DOUBLE), 6) AS adist, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY adu ASC, neighbor_id) AS rnk FROM scored)
WHERE rnk <= 5
"""
    )


def q_mmr_rerank(spark, sf_dir):
    """MMR diversified rerank (similarity.mmr_rerank, Carbonell &
    Goldstein 1998): distributed cosine top-25 retrieval (broadcast
    query, corpus never shuffles), then the inherently-sequential greedy
    over the BOUNDED candidate set on the driver with engine-exact
    HALF_UP rounding. Oracle = the greedy unrolled as one MATERIALIZED
    CTE per selection round."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.mmr_rerank(emb, query_id=0, n_candidates=25, k=10)


def q_semdedup_prune(spark, sf_dir):
    """SemDeDup over the embeddings table (similarity.semdedup_prune):
    k-means cells (same seeded Lloyd rounds as knn_ivf), then within
    each cell drop every vector with a lower-id cluster-mate at cosine
    >= 0.95. Returns every vector with its cell and kept flag."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.semdedup_prune(
        emb,
        n_centroids=IVF_CENTROIDS,
        threshold=SEMDEDUP_THRESHOLD,
        kmeans_iters=IVF_KMEANS_ITERS,
    )


def _sql_semdedup() -> str:
    """Twin of q_semdedup_prune: shared Lloyd-round CTEs, final-centroid
    assignment, then a cell-keyed self-join marking every vector that
    has a lower-id cluster-mate at cosine >= threshold."""
    parts = _sql_kmeans_parts(IVF_CENTROIDS, IVF_KMEANS_ITERS)
    final = f"cents{IVF_KMEANS_ITERS}"
    parts.append(
        f"""cells AS (
  SELECT vec_id, v, cell FROM (
    SELECT b.vec_id, b.v, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_dd_cos('b.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM base b CROSS JOIN {final} c)
  WHERE rn = 1)"""
    )
    parts.append(
        f"""drops AS (
  SELECT DISTINCT b.vec_id AS vid
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_dd_cos('a.v', 'b.v')} >= {SEMDEDUP_THRESHOLD})"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT c.vec_id, c.cell, (d.vid IS NULL) AS kept
FROM cells c LEFT JOIN drops d ON c.vec_id = d.vid
"""
    )


def q_ann_recall_eval(spark, sf_dir):
    """ANN quality harness: recall@5 of the LSH index against exact
    brute force, per query — the evaluation loop every approximate
    index needs before it replaces the exact path. Reuses the exact
    cosine_topk / lsh_topk operators with the knn_lsh parameters; the
    only added work is one broadcast-sized join of two 5-row-per-query
    result sets."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    brute = similarity.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = similarity.lsh_topk(emb, queries, k=5, n_planes=4, dim=64).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    joined = brute.join(approx, ["query_id", "neighbor_id"], "left")
    hits = F.coalesce(F.sum("hit"), F.lit(0))
    return joined.groupBy("query_id").agg(
        hits.cast("long").alias("hits"),
        F.round(hits / 5.0, 6).alias("recall"),
    )


def _sql_ann_recall() -> str:
    return f"""
WITH brute AS ({SQL_KNN}),
approx AS ({_sql_knn_lsh()})
SELECT b.query_id, count(a.neighbor_id) AS hits,
       round(count(a.neighbor_id) / 5.0, 6) AS recall
FROM brute b LEFT JOIN approx a
  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
GROUP BY b.query_id
"""


def q_ann_recall_matrix(spark, sf_dir):
    """Index-quality matrix: recall@5 against exact brute force for ALL
    THREE approximate tiers (hyperplane LSH, multi-probe IVF, IVF-PQ
    ADC) per query — the side-by-side every index-selection decision
    needs. The brute-force truth is computed ONCE and reused; each
    approximate result is a 5-row-per-query broadcast join."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    # no persist: brute is read by three cheap broadcast joins, and a
    # persisted frame would outlive the query (review finding); the
    # coarse k-means centroids ARE shared — ivf and ivfpq would
    # otherwise each rerun the most expensive stage on identical inputs
    brute = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    base = emb.select(F.col("vec_id"), similarity._as_double(F.col("embedding")).alias("v"))
    coarse = similarity.kmeans_centroids(
        base, "vec_id", IVF_CENTROIDS, IVF_KMEANS_ITERS
    )
    tiers = {
        "lsh": similarity.lsh_topk(emb, queries, k=5, n_planes=4, dim=64),
        "ivf": similarity.ivf_topk(
            emb, queries, k=5, n_centroids=IVF_CENTROIDS,
            n_probe=IVF_PROBE, kmeans_iters=IVF_KMEANS_ITERS, coarse=coarse,
        ),
        "ivfpq": similarity.ivfpq_topk(
            emb, queries, k=5, n_centroids=IVF_CENTROIDS,
            n_probe=IVF_PROBE, kmeans_iters=IVF_KMEANS_ITERS, coarse=coarse,
        ),
    }
    outs = []
    for name, approx in tiers.items():
        a = approx.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        hits = F.coalesce(F.sum("hit"), F.lit(0))
        outs.append(
            brute.join(a, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(
                hits.cast("long").alias("hits"),
                F.round(hits / 5.0, 6).alias("recall"),
            )
            .select(F.lit(name).alias("index_name"), "query_id", "hits", "recall")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _sql_ann_recall_matrix() -> str:
    """Twin of q_ann_recall_matrix: the three index twins run as nested
    CTEs (each carries its own WITH scope) against one brute CTE."""
    arms = []
    for name, sub in (
        ("lsh", _sql_knn_lsh()),
        ("ivf", _sql_knn_ivf()),
        ("ivfpq", _sql_knn_ivfpq()),
    ):
        arms.append(
            f"""SELECT '{name}' AS index_name, b.query_id,
       count(a.neighbor_id) AS hits,
       round(count(a.neighbor_id) / 5.0, 6) AS recall
FROM brute b LEFT JOIN ({sub}) a
  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
GROUP BY b.query_id"""
        )
    return (
        f"WITH brute AS ({SQL_KNN})\n" + "\nUNION ALL\n".join(arms)
    )


def q_decayed_engagement(spark, sf_dir):
    """Recency-weighted engagement score per user: each event
    contributes value · 2^(-days_old) (one-day half-life, anchored at
    the corpus' last day). Powers of two make the decay EXACT in binary:
    the per-event term is value_cents · 2^(40 - dt) — an exact integer —
    summed in decimal(38,0) (order-free), with one mirrored double
    rescale at the end. No libm pow/exp anywhere, so the score is
    bit-stable under any partitioning AND across engines. Plan: one
    1-row anchor broadcast + one user-keyed aggregate."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    anchor = e.agg(F.max(F.to_date("ts")).alias("anchor"))
    j = e.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("anchor"), F.to_date("ts")).alias("dt"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    dt = F.col("dt")
    # shiftleft's bit count must be a column here, so spell it in SQL
    w = F.expr(
        "CASE WHEN dt <= 40 THEN shiftleft(CAST(1 AS BIGINT), CAST(40 - dt AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    # widen BEFORE the product: cents * 2^40 overflows int64 for events
    # >= $83,886.08 on the anchor day (silent wrap in Spark under ansi
    # off, Out of Range error in DuckDB)
    term = F.col("cents").cast("decimal(38,0)") * w
    return j.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(dt).cast("long").alias("days_since_last"),
        F.round(
            (F.sum(term).cast("double") / F.lit(float(1 << 40))) / 100.0, 6
        ).alias("decayed_value"),
    )


SQL_DECAYED_ENGAGEMENT = """
WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
terms AS (
  SELECT user_id,
         date_diff('day', CAST(ts AS DATE), anchor) AS dt,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events, anchor)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(dt) AS BIGINT) AS days_since_last,
       round((CAST(sum(CAST(cents AS HUGEINT) * (CASE WHEN dt <= 40
                 THEN (CAST(1 AS BIGINT) << (40 - dt)) ELSE 0 END))
              AS DOUBLE) / 1099511627776.0) / 100.0, 6) AS decayed_value
FROM terms GROUP BY user_id
"""


COMPACT_SHARDS = 16
COMPACT_BINS = 12


def compaction_plan_frame(d):
    """Frame-level body of q_compaction_plan (shared with the scale-
    stress harness)."""
    from csvs_to_sqlite_spark.operators.splits import shard_assignment

    files = (
        d.select(
            "source",
            shard_assignment(F.col("doc_id"), COMPACT_SHARDS, "compact").alias("shard"),
            F.length("text").cast("long").alias("b"),
        )
        .groupBy("source", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("b").alias("bytes"),
        )
    )
    total = files.agg(F.sum("bytes").alias("total_bytes"))
    j = files.crossJoin(F.broadcast(total))
    # exclusive running total in size-descending next-fit order via the
    # two-phase distributed cumsum (rowid.global_cumsum) minus the row's
    # own bytes — no single-partition window over the file inventory
    from csvs_to_sqlite_spark.operators.rowid import global_cumsum

    j = global_cumsum(
        j,
        [F.col("bytes").desc(), F.col("source"), F.col("shard")],
        "bytes",
        "__cum_incl__",
    )
    cum_before = F.col("__cum_incl__") - F.col("bytes")
    target = F.expr(f"(total_bytes + {COMPACT_BINS - 1}) DIV {COMPACT_BINS}")
    planned = j.select(
        "source",
        "shard",
        "n_docs",
        "bytes",
        cum_before.alias("cum_before"),
        target.alias("target"),
    )
    # exact long integer division (no double quotient in the plan path)
    return planned.select(
        "source",
        "shard",
        "n_docs",
        "bytes",
        F.expr("cum_before DIV target").cast("long").alias("bin"),
    )


def q_compaction_plan(spark, sf_dir):
    """Small-files compaction planner: the document corpus' (source,
    shard) export files are binned into ~12 merge groups by a
    deterministic size-descending next-fit — bin = cum_bytes_before //
    target — the plan a table-maintenance job (OPTIMIZE/compact) would
    execute. All integer math; the running total over the file inventory
    uses the two-phase distributed cumsum, so there is no
    single-partition window anywhere — not even over the bounded
    inventory."""
    prep_session(spark)
    return compaction_plan_frame(_t(spark, sf_dir, "documents"))


SQL_COMPACTION_PLAN = f"""
WITH files AS (
  SELECT source, {{shard_expr}} AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS bytes
  FROM documents GROUP BY 1, 2),
tot AS (SELECT sum(bytes) AS total_bytes FROM files),
planned AS (
  SELECT source, shard, n_docs, bytes,
         coalesce(sum(bytes) OVER (ORDER BY bytes DESC, source, shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         CAST((total_bytes + {COMPACT_BINS - 1}) // {COMPACT_BINS} AS BIGINT) AS target
  FROM files, tot)
SELECT source, shard, n_docs, bytes,
       CAST(cum_before // target AS BIGINT) AS bin
FROM planned
"""


ZORDER_BITS = 8
ZORDER_PREFIX = 8  # bucket = top ZORDER_PREFIX bits of the 2*BITS-bit address


def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout audit over lineitem's (partkey, suppkey):
    range-quantize both keys to 8 bits, interleave into a 16-bit z
    address (pure scan-stage integer exprs), bucket by the top 8 z bits,
    and report each bucket's row count + per-dimension bounding box. The
    z-prefix property bounds every bucket to a 16×16 quantized rectangle
    (area ≤ 256 of 65536) — the file-stat locality that lets a 100 TB
    scan prune on EITHER key column, where a lexicographic sort prunes
    only on its leading column. Cost: one 1-row stats broadcast + one
    bucket-keyed aggregate."""
    prep_session(spark)
    return zorder_layout_frame(
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    )


def zorder_quant_frame(li):
    """(pq, sq, zv) quantized frame shared by the layout audit and the
    pruning report."""
    from csvs_to_sqlite_spark.operators.partitioning import (
        range_quantize,
        zorder_key,
    )

    stats = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    j = li.crossJoin(F.broadcast(stats))
    pq = range_quantize(F.col("l_partkey"), F.col("pmin"), F.col("pmax"), ZORDER_BITS)
    sq = range_quantize(F.col("l_suppkey"), F.col("smin"), F.col("smax"), ZORDER_BITS)
    z = zorder_key([pq, sq], ZORDER_BITS)
    return j.select(pq.alias("pq"), sq.alias("sq"), z.alias("zv"))


def zorder_layout_frame(li):
    """Frame-level body of q_zorder_layout (shared with the scale-stress
    harness)."""
    quant = zorder_quant_frame(li)
    bucket = F.shiftright(F.col("zv"), 2 * ZORDER_BITS - ZORDER_PREFIX)
    return (
        quant.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("pq").alias("pq_min"),
            F.max("pq").alias("pq_max"),
            F.min("sq").alias("sq_min"),
            F.max("sq").alias("sq_max"),
            (
                (F.max("pq") - F.min("pq") + 1) * (F.max("sq") - F.min("sq") + 1)
            ).alias("area"),
        )
    )


def _sql_zorder_layout() -> str:
    from csvs_to_sqlite_spark.operators.partitioning import (
        range_quantize_sql,
        zorder_key_sql,
    )

    pq = range_quantize_sql("l_partkey", "pmin", "pmax", ZORDER_BITS)
    sq = range_quantize_sql("l_suppkey", "smin", "smax", ZORDER_BITS)
    zv = zorder_key_sql(["pq", "sq"], ZORDER_BITS)
    shift = 1 << (2 * ZORDER_BITS - ZORDER_PREFIX)
    return f"""
WITH stats AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
quant AS (
  SELECT {pq} AS pq, {sq} AS sq FROM lineitem, stats),
zed AS (SELECT pq, sq, {zv} AS zv FROM quant)
SELECT zv // {shift} AS bucket, count(*) AS n_rows,
       min(pq) AS pq_min, max(pq) AS pq_max,
       min(sq) AS sq_min, max(sq) AS sq_max,
       (max(pq) - min(pq) + 1) * (max(sq) - min(sq) + 1) AS area
FROM zed GROUP BY 1
"""


MRL_DIMS = (64, 32, 16, 8)


def q_matryoshka_eval(spark, sf_dir):
    """Matryoshka-representation truncation eval (Kusupati et al. 2022):
    how much does cosine similarity drift when embeddings are truncated
    to prefix dims 32/16/8 (vs the full 64)? Per prefix dim: pair count,
    mean and max absolute cosine deviation over a bounded query×corpus
    pair set — the check run before shipping truncated indexes. Queries
    broadcast; deviations are micro-unit integers so the means are
    exact (qmath)."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.select(
        F.col("vec_id"), similarity._as_double(F.col("embedding")).alias("v")
    )
    q = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    c = base.where(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("qid") != F.col("cid"))

    def cos_at(d):
        a, b = F.slice("qv", 1, d), F.slice("cv", 1, d)
        return F.round(
            similarity._dot(a, b) / (similarity._norm(a) * similarity._norm(b)), 6
        )

    full = cos_at(MRL_DIMS[0])
    rows = pairs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        F.round(F.abs(cos_at(d) - full) * 1e6).cast("long").alias("dev_u"),
                    )
                    for d in MRL_DIMS[1:]
                ]
            )
        ).alias("e")
    ).select(F.col("e.dim").cast("long").alias("dim"), F.col("e.dev_u").alias("dev_u"))
    return rows.groupBy("dim").agg(
        F.count("*").cast("long").alias("n_pairs"),
        qmath.qdiv_count(F.sum("dev_u"), F.count("*"), 1, 6).alias("mean_abs_dev"),
        (F.max("dev_u").cast("double") / F.lit(1e6)).alias("max_abs_dev"),
    )


def _sql_matryoshka_eval() -> str:
    def cos_at(d, qv="qv", cv="cv"):
        a, b = f"list_slice({qv}, 1, {d})", f"list_slice({cv}, 1, {d})"
        return (
            f"round(list_sum(list_transform(list_zip({a}, {b}), p -> p[1]*p[2])) /"
            f" (sqrt(list_sum(list_transform({a}, x -> x*x))) *"
            f" sqrt(list_sum(list_transform({b}, x -> x*x)))), 6)"
        )

    arms = " UNION ALL ".join(
        f"SELECT {d} AS dim, CAST(round(abs({cos_at(d)} - {cos_at(MRL_DIMS[0])}) * 1e6)"
        f" AS BIGINT) AS dev_u FROM pairs"
        for d in MRL_DIMS[1:]
    )
    mean = qmath.sql_qdiv_count("sum(dev_u)", "count(*)", 1, 6)
    return f"""
WITH base AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings),
pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, q.v AS qv, c.v AS cv
  FROM base q, base c
  WHERE q.vec_id < 5 AND c.vec_id < 200 AND q.vec_id <> c.vec_id),
devs AS ({arms})
SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n_pairs,
       {mean} AS mean_abs_dev,
       CAST(max(dev_u) AS DOUBLE) / 1e6 AS max_abs_dev
FROM devs GROUP BY dim
"""


CURRICULUM_EPOCHS = 4


def q_curriculum_schedule(spark, sf_dir):
    """Curriculum mixture schedule: docs ranked into quality terciles;
    over 4 epochs the sampling weight anneals linearly from uniform
    (epoch 0) to token-mass-proportional (epoch 3) — the staged training
    schedule a curriculum-learning pipeline feeds its sampler. Weight =
    [(E-1-e)·total + (E-1)·e·3·tokens_t/3] over (3·(E-1)·total), kept as
    ONE exact integer ratio (qmath) so every cell is bit-stable. The
    tercile comes from the two-phase global rank + exact ntile
    arithmetic (rowid.global_rank / ntile_from_rank) — no
    single-partition window over the doc-cardinality score frame."""
    prep_session(spark)
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr
    from csvs_to_sqlite_spark.operators.rowid import global_rank, ntile_from_rank

    d = _t(spark, sf_dir, "documents")
    # pinned once: count + rank share the scored blocks (one corpus scan,
    # one tokenization) instead of re-deriving the lineage per job
    scored = d.select(
        "doc_id",
        F.size(tokens_expr(F.col("text"), distinct=False)).cast("long").alias("n_tok"),
        text.quality_score(F.col("text")).alias("q"),
    ).localCheckpoint(eager=False)
    n = scored.count()
    ranked = global_rank(
        scored, [F.col("q").desc(), F.col("doc_id").asc()], "__rnk__"
    )
    ter = ranked.withColumn("tercile", ntile_from_rank("__rnk__", n, 3))
    per_t = ter.groupBy("tercile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").alias("tokens"),
    )
    total = per_t.agg(F.sum("tokens").alias("total_tokens"))
    j = per_t.crossJoin(F.broadcast(total))
    E = CURRICULUM_EPOCHS
    out = j.select(
        "tercile",
        "n_docs",
        "tokens",
        F.explode(F.array(*[F.lit(e) for e in range(E)])).alias("epoch"),
        "total_tokens",
    )
    e_col = F.col("epoch")
    num = (
        (F.lit(E - 1) - e_col) * F.col("total_tokens")
        + F.lit(3) * e_col * F.col("tokens")
    ) * F.lit(1_000_000)
    den = F.col("total_tokens") * F.lit(3 * (E - 1))
    return out.select(
        e_col.cast("long").alias("epoch"),
        "tercile",
        "n_docs",
        "tokens",
        qmath.qdiv_count(num, den, 1, 6).alias("weight"),
    )


def _sql_curriculum_schedule() -> str:
    quality = SQL_QUALITY.strip().rstrip(";")
    toks = tokens_sql("text", distinct=False)
    E = CURRICULUM_EPOCHS
    wexpr = qmath.sql_qdiv_count(
        f"((({E - 1} - epoch) * total_tokens + 3 * epoch * tokens) * 1000000)",
        f"(total_tokens * {3 * (E - 1)})",
        1,
        6,
    )
    return f"""
WITH q AS ({quality}),
scored AS (SELECT d.doc_id, CAST(len({toks}) AS BIGINT) AS n_tok, q.quality AS qs
           FROM documents d JOIN q USING (doc_id)),
ter AS (SELECT *, ntile(3) OVER (ORDER BY qs DESC, doc_id ASC) AS tercile
        FROM scored),
per_t AS (SELECT CAST(tercile AS BIGINT) AS tercile,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS tokens
          FROM ter GROUP BY 1),
tot AS (SELECT sum(tokens) AS total_tokens FROM per_t),
grid AS (SELECT * FROM per_t, tot, (SELECT unnest(range(0, {E})) AS epoch))
SELECT CAST(epoch AS BIGINT) AS epoch, tercile, n_docs, tokens,
       {wexpr} AS weight
FROM grid
"""


ZPRUNE_LO = 96
ZPRUNE_HI = 111  # one 16-wide strip in the 256-level quantized space


def q_zorder_pruning(spark, sf_dir):
    """The payoff of z-ordering, quantified: for the SAME 16-wide strip
    predicate on each key, how many of the 256 files does min/max
    file-stat pruning touch under (a) a Z-order layout vs (b) a
    lexicographic (pq, sq) sort? Lexicographic prunes the leading key
    perfectly but touches EVERY file for a strip on the non-leading key;
    z-order touches ~16 files for either key. One scan + two bounded
    bucket aggregates; every output is an exact integer."""
    prep_session(spark)
    quant = zorder_quant_frame(
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    )
    zrep = (
        quant.groupBy(
            F.shiftright(F.col("zv"), 2 * ZORDER_BITS - ZORDER_PREFIX).alias("b")
        )
        .agg(
            F.min("pq").alias("pq_min"), F.max("pq").alias("pq_max"),
            F.min("sq").alias("sq_min"), F.max("sq").alias("sq_max"),
        )
        .select(F.lit("zorder").alias("layout"), "pq_min", "pq_max", "sq_min", "sq_max")
    )
    lrep = (
        quant.groupBy(F.col("pq").alias("b"))
        .agg(
            F.min("pq").alias("pq_min"), F.max("pq").alias("pq_max"),
            F.min("sq").alias("sq_min"), F.max("sq").alias("sq_max"),
        )
        .select(F.lit("lexicographic").alias("layout"), "pq_min", "pq_max", "sq_min", "sq_max")
    )
    files = zrep.unionByName(lrep)
    lo, hi = F.lit(ZPRUNE_LO), F.lit(ZPRUNE_HI)
    touch_p = (~((F.col("pq_max") < lo) | (F.col("pq_min") > hi))).cast("int")
    touch_s = (~((F.col("sq_max") < lo) | (F.col("sq_min") > hi))).cast("int")
    return files.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(touch_p).cast("long").alias("touched_partkey_strip"),
        F.sum(touch_s).cast("long").alias("touched_suppkey_strip"),
    )


def _sql_zorder_pruning() -> str:
    from csvs_to_sqlite_spark.operators.partitioning import (
        range_quantize_sql,
        zorder_key_sql,
    )

    pq = range_quantize_sql("l_partkey", "pmin", "pmax", ZORDER_BITS)
    sq = range_quantize_sql("l_suppkey", "smin", "smax", ZORDER_BITS)
    zv = zorder_key_sql(["pq", "sq"], ZORDER_BITS)
    shift = 1 << (2 * ZORDER_BITS - ZORDER_PREFIX)
    lo, hi = ZPRUNE_LO, ZPRUNE_HI
    return f"""
WITH stats AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
quant AS (SELECT {pq} AS pq, {sq} AS sq FROM lineitem, stats),
zed AS (SELECT pq, sq, {zv} AS zv FROM quant),
files AS (
  SELECT 'zorder' AS layout, zv // {shift} AS b,
         min(pq) AS pq_min, max(pq) AS pq_max,
         min(sq) AS sq_min, max(sq) AS sq_max
  FROM zed GROUP BY 2
  UNION ALL
  SELECT 'lexicographic' AS layout, pq AS b,
         min(pq) AS pq_min, max(pq) AS pq_max,
         min(sq) AS sq_min, max(sq) AS sq_max
  FROM zed GROUP BY 2)
SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN pq_max < {lo} OR pq_min > {hi} THEN 0 ELSE 1 END) AS BIGINT)
         AS touched_partkey_strip,
       CAST(sum(CASE WHEN sq_max < {lo} OR sq_min > {hi} THEN 0 ELSE 1 END) AS BIGINT)
         AS touched_suppkey_strip
FROM files GROUP BY layout
"""


MH_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def q_minhash_threshold_curve(spark, sf_dir):
    """Operating-point curve for the MinHash estimator: at each dedup
    threshold, how many LSH candidate pairs does the estimate keep, and
    what are its precision/recall against exact Jaccard? The sweep a
    pipeline runs once to pick its threshold before a 100 TB dedup.
    Reuses the calibration frame (bounded: LSH candidates only); each
    threshold row is a conditional count — one tiny aggregate."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    cal = dedup.minhash_calibration(d, "text", "doc_id").select(
        "est_jaccard", "true_jaccard"
    )
    grid = cal.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(t,) for t in MH_THRESHOLDS], "threshold double"
            )
        )
    )
    est_hit = (F.col("est_jaccard") >= F.col("threshold")).cast("int")
    true_hit = (F.col("true_jaccard") >= F.col("threshold")).cast("int")
    agg = grid.groupBy("threshold").agg(
        F.sum(est_hit).cast("long").alias("n_kept"),
        F.sum(est_hit * true_hit).cast("long").alias("tp"),
        F.sum(est_hit * (1 - true_hit)).cast("long").alias("fp"),
        F.sum((1 - est_hit) * true_hit).cast("long").alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        qmath.qdiv_count(
            F.col("tp") * F.lit(1_000_000), F.col("tp") + F.col("fp"), 1, 6
        ),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        qmath.qdiv_count(
            F.col("tp") * F.lit(1_000_000), F.col("tp") + F.col("fn"), 1, 6
        ),
    )
    return agg.select(
        "threshold", "n_kept", "tp", "fp", "fn",
        prec.alias("precision_"), rec.alias("recall_"),
    )


def _sql_minhash_threshold_curve() -> str:
    cal = _sql_minhash_calibration()
    ts = ", ".join(f"{t}::DOUBLE" for t in MH_THRESHOLDS)
    prec = qmath.sql_qdiv_count("(tp * 1000000)", "(tp + fp)", 1, 6)
    rec = qmath.sql_qdiv_count("(tp * 1000000)", "(tp + fn)", 1, 6)
    return f"""
WITH cal AS ({cal}),
grid AS (SELECT est_jaccard, true_jaccard, threshold
         FROM cal, (SELECT unnest([{ts}]) AS threshold)),
agg AS (
  SELECT threshold,
         CAST(sum(CASE WHEN est_jaccard >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN est_jaccard >= threshold AND true_jaccard >= threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN est_jaccard >= threshold AND true_jaccard < threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN est_jaccard < threshold AND true_jaccard >= threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM grid GROUP BY threshold)
SELECT threshold, n_kept, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN {prec} END AS precision_,
       CASE WHEN tp + fn > 0 THEN {rec} END AS recall_
FROM agg
"""


def q_dataset_card(spark, sf_dir):
    """One-row dataset card — the release-notes summary a corpus ships
    with: doc/source/lang counts, token totals, exact-dup rate, and the
    mean quality score. One pass over documents (all metrics are
    map-side-combinable aggregates over scan-stage expressions; the only
    exact-distinct is on md5(text), bounded-width)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr

    d = _t(spark, sf_dir, "documents")
    toks = F.size(tokens_expr(F.col("text"), distinct=False)).cast("long")
    base = d.select(
        "doc_id",
        "source",
        "lang",
        toks.alias("n_tok"),
        F.md5("text").alias("h"),
        text.quality_score(F.col("text")).alias("q"),
    )
    return base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tok").alias("total_tokens"),
        qavg(F.col("n_tok").cast("double"), 1, 6).alias("mean_tokens"),
        F.countDistinct("h").cast("long").alias("distinct_texts"),
        # integer half-up (qmath): (n - distinct)/n can terminate at
        # exactly 7 decimal digits, where round()-on-double ties diverge
        qmath.qdiv_count(
            (F.count("*") - F.countDistinct("h")) * F.lit(1_000_000),
            F.count("*"),
            1,
            6,
        ).alias("dup_rate"),
        # quality is 6-dp per doc: quantize to micro-units so the mean is
        # an exact integer sum — bit-stable under any partitioning (the
        # r3 driver hash-fail class)
        qavg(F.col("q"), 1000000, 6).alias("mean_quality"),
    )


def _sql_dataset_card() -> str:
    toks = tokens_sql("text", distinct=False)
    quality = SQL_QUALITY.strip().rstrip(";")
    return f"""
WITH q AS ({quality}),
base AS (SELECT d.doc_id, d.source, d.lang,
                CAST(len({toks}) AS BIGINT) AS n_tok,
                md5(d.text) AS h, q.quality AS q
         FROM documents d JOIN q USING (doc_id))
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       {sql_qavg("n_tok", 1, 6)} AS mean_tokens,
       CAST(count(DISTINCT h) AS BIGINT) AS distinct_texts,
       {qmath.sql_qdiv_count("((count(*) - count(DISTINCT h)) * 1000000)", "count(*)", 1, 6)} AS dup_rate,
       {sql_qavg("q", 1000000, 6)} AS mean_quality
FROM base
"""


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector (vec_id < 10), the top-3 most-similar vectors with a
    DIFFERENT label — the negatives that actually teach the model.
    Reuses the brute-force cosine sweep (queries broadcast, corpus
    never shuffles) with a label-inequality predicate pushed into the
    candidate filter before the per-query top-k window."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qv"),
        F.col("label").alias("q_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("cv"),
        F.col("label").alias("c_label"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        (F.col("q_label") != F.col("c_label"))
    )
    sim = F.round(
        F.expr(
            "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
            " / (sqrt(aggregate(qv, 0D, (a, x) -> a + x * x))"
            " * sqrt(aggregate(cv, 0D, (a, x) -> a + x * x)))"
        ),
        6,
    )
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


SQL_HARD_NEG = """
WITH q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS qv,
                  label AS q_label
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, list_transform(embedding, x -> x::DOUBLE) AS cv,
             label AS c_label
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_sum(list_transform(list_zip(qv, cv), p -> p[1]*p[2])) /
               (sqrt(list_sum(list_transform(qv, x -> x*x))) *
                sqrt(list_sum(list_transform(cv, x -> x*x)))), 6) AS cos_sim
  FROM q, c WHERE q_label <> c_label),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rnk FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 3
"""


def q_centroid_classifier_eval(spark, sf_dir):
    """Nearest-centroid classifier evaluation: class centroids from the
    labeled embeddings (posexplode + per-(label,pos) mean, 6-dp rounded),
    every vector assigned to its nearest centroid by cosine, and
    per-class accuracy reported — the zero-training baseline every
    embedding space gets measured with. Centroids are class-cardinality
    rows, broadcast back for the assignment sweep; the corpus never
    shuffles with its vectors."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    cents = (
        base.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(qavg(F.col("x"), EMB_Q, 6).alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(pm, s -> s.m)").alias("cv"),
        )
    )
    pairs = base.crossJoin(F.broadcast(cents))
    sim = F.round(
        F.expr(
            "aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
            " / (sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"
            " * sqrt(aggregate(cv, 0D, (a, x) -> a + x * x)))"
        ),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("c_label").asc())
    assigned = (
        pairs.select("vec_id", "label", "c_label", sim.alias("csim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return assigned.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("c_label") == F.col("label")).cast("int")).cast("long").alias("hits"),
        qmath.qdiv_count(
            F.sum((F.col("c_label") == F.col("label")).cast("int")).cast("long")
            * F.lit(1_000_000),
            F.count("*"),
            1,
            6,
        ).alias("accuracy"),
    )


SQL_CENTROID_EVAL = f"""
WITH base AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                     list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings),
cents AS (
  SELECT label AS c_label, list(m ORDER BY pos) AS cv FROM (
    SELECT label, pos, {sql_qavg("x", EMB_Q, 6)} AS m FROM (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM base)
    GROUP BY label, pos)
  GROUP BY label),
assigned AS (
  SELECT vec_id, label, c_label FROM (
    SELECT b.vec_id, b.label, c.c_label,
           row_number() OVER (PARTITION BY b.vec_id ORDER BY
             round(list_sum(list_transform(list_zip(b.v, c.cv), p -> p[1]*p[2])) /
                   (sqrt(list_sum(list_transform(b.v, x -> x*x))) *
                    sqrt(list_sum(list_transform(c.cv, x -> x*x)))), 6) DESC,
             c.c_label) AS rn
    FROM base b CROSS JOIN cents c)
  WHERE rn = 1)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       {qmath.sql_qdiv_count("(sum(CASE WHEN c_label = label THEN 1 ELSE 0 END) * 1000000)", "count(*)", 1, 6)} AS accuracy
FROM assigned GROUP BY label
"""


def q_text_token_stats(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        text.token_count(t).cast("long").alias("n_tokens"),
        text.stopword_ratio(t).alias("stop_ratio"),
        text.avg_token_len(t).alias("avg_tok_len"),
    )


_TOKENS = tokens_sql("text", distinct=False)
_STOPS = "', '".join(text.STOPWORDS)
SQL_TOKEN_STATS = f"""
SELECT doc_id,
  len({_TOKENS}) AS n_tokens,
  round(len(list_filter({_TOKENS}, t -> t IN ('{_STOPS}')))
        / greatest(len({_TOKENS}), 1), 6) AS stop_ratio,
  round(list_sum(list_transform({_TOKENS}, t -> length(t)))
        / greatest(len({_TOKENS}), 1), 6) AS avg_tok_len
FROM documents
"""


def q_text_quality(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.quality_score(F.col("text")).alias("quality"))


SQL_QUALITY = f"""
SELECT doc_id,
  round((least(len({_TOKENS}) / 50.0, 1.0)
       + least(round(len(list_filter({_TOKENS}, t -> t IN ('{_STOPS}')))
               / greatest(len({_TOKENS}), 1), 6) * 5.0, 1.0)
       + len(list_distinct({_TOKENS})) / greatest(len({_TOKENS}), 1)) / 3.0, 6) AS quality
FROM documents
"""


def q_text_langid(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        text.lang_id(F.col("text")).alias("predicted_lang"),
    )


def _sql_langid() -> str:
    score_cols = []
    for lang, markers in text.LANG_MARKERS.items():
        m = "', '".join(markers)
        score_cols.append(f"len(list_filter({_TOKENS}, t -> t IN ('{m}'))) AS sc_{lang}")
    langs = list(text.LANG_MARKERS)
    # strictly-greater argmax chain, earlier language wins ties
    expr = "'und'"
    best = "0"
    for lang in langs:
        expr = f"CASE WHEN sc_{lang} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({best}, sc_{lang})"
    return (
        "WITH scored AS (SELECT doc_id, lang, "
        + ", ".join(score_cols)
        + " FROM documents)\n"
        + f"SELECT doc_id, lang, {expr} AS predicted_lang FROM scored"
    )


def q_mixed_language(spark, sf_dir):
    """Mixed-language document detector: language-ID each HALF of the
    document (1-based char split, identical in both engines) and flag
    disagreement — the doc-level screen for embedded-translation /
    boilerplate-switch documents that a whole-doc langid averages away.
    Scan-stage marker argmax twice; no joins, no shuffle beyond the
    projection."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    half = F.floor(F.length(t) / 2).cast("int")
    left = F.substring(t, 1, half)
    right = t.substr(half + 1, F.length(t))
    return d.select(
        "doc_id",
        text.lang_id(left).alias("lang_left"),
        text.lang_id(right).alias("lang_right"),
        (text.lang_id(left) != text.lang_id(right)).alias("is_mixed"),
    )


def _sql_mixed_language() -> str:
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    def argmax(prefix: str) -> str:
        expr, best = "'und'", "0"
        for lang in text.LANG_MARKERS:
            expr = f"CASE WHEN {prefix}_{lang} > {best} THEN '{lang}' ELSE {expr} END"
            best = f"greatest({best}, {prefix}_{lang})"
        return expr

    cols = []
    for side, src in (("l", "lhalf"), ("r", "rhalf")):
        toks = tokens_sql(src, distinct=False)
        for lang, markers in text.LANG_MARKERS.items():
            m = "', '".join(markers)
            cols.append(
                f"len(list_filter({toks}, t -> t IN ('{m}'))) AS {side}_{lang}"
            )
    return (
        "WITH halves AS (SELECT doc_id,"
        " substr(text, 1, CAST(floor(len(text) / 2) AS INT)) AS lhalf,"
        " substr(text, CAST(floor(len(text) / 2) AS INT) + 1) AS rhalf"
        " FROM documents),\n"
        "scored AS (SELECT doc_id, " + ", ".join(cols) + " FROM halves)\n"
        + f"SELECT doc_id, {argmax('l')} AS lang_left, {argmax('r')} AS lang_right, "
        + f"({argmax('l')} <> {argmax('r')}) AS is_mixed FROM scored"
    )


def q_text_fingerprints(spark, sf_dir):
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        text.doc_fingerprint(t).alias("md5_fp"),
        text.rolling_fingerprint(t).alias("rolling_fp"),
    )


SQL_FINGERPRINT = f"""
SELECT doc_id,
  md5(array_to_string({_TOKENS}, ' ')) AS md5_fp,
  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform({_TOKENS},
      t -> {md5_long_sql('t', seed='fp')})),
      (acc, h) -> (acc * 31 + h) % 1000000007) AS rolling_fp
FROM documents
"""

# ---------------------------------------------------------------------------
# extension joins / aggs: as-of, pivot, cube, percentiles, centroids,
# FTS-style token match, inverted index, embedding near-dup
# ---------------------------------------------------------------------------

def q_asof_join(spark, sf_dir):
    """D5 extension: for each purchase event, the user's most recent prior
    click (union + carry-forward window; DuckDB ASOF JOIN oracle)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.joins import asof_join

    e = load_events(spark, f"{sf_dir}/events.parquet")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(purchases, clicks, "user_id", "ts", "ts", ["click_value"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round(F.col("asof_click_value"), 4).alias("prev_click_value"),
    )


SQL_ASOF = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       round(c.value, 4) AS prev_click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_pivot_status(spark, sf_dir):
    """H: pivot l_linestatus into columns."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_o"), F.col("F").alias("qty_f")
    )


SQL_PIVOT = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
FROM lineitem GROUP BY 1
"""


def q_cube_agg(spark, sf_dir):
    """E6: CUBE over two dimensions."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), qsum(F.col("o_totalprice"), 100, 2).alias("total")
    )


SQL_CUBE = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       {sql_qsum("o_totalprice", 100, 2)} AS total
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_percentiles(spark, sf_dir):
    """H: exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem GROUP BY 1
"""


def q_fts_token_match(spark, sf_dir):
    """F5 approximation Spark-side: AND-of-terms token match (terms are
    AND-ed, case-insensitive — the reference's FTS MATCH semantics)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != "")
    )
    return (
        d.withColumn("__toks__", toks)
        .where(
            F.array_contains("__toks__", "query") & F.array_contains("__toks__", "join")
        )
        .select("doc_id", "lang")
    )


SQL_FTS_MATCH = (
    """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, """
    + tokens_sql("text")
    + """ AS toks FROM documents)
WHERE list_contains(toks, 'query') AND list_contains(toks, 'join')
"""
)


def q_inverted_index(spark, sf_dir):
    """Spark-side inverted index (SURVEY F note): term → document frequency
    + first posting, for the 20 most frequent terms."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    tok = dedup.token_posting(d, "text", "doc_id")
    out = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"),
        F.min("doc_id").alias("first_doc"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-20
    # + driver merge) — a global row_number() window here would instead
    # sort the whole vocabulary in one task. The 20 survivors are then
    # ranked by the two-phase machinery (rowid.global_rank), so there is
    # no single-partition WindowExec anywhere in the plan.
    from csvs_to_sqlite_spark.operators.rowid import global_rank

    top = out.orderBy(F.col("df").desc(), F.col("token").asc()).limit(20)
    return global_rank(
        top, [F.col("df").desc(), F.col("token").asc()], "rnk"
    ).select("token", "df", "first_doc", "rnk")


SQL_INVERTED = (
    """
WITH tok AS (SELECT doc_id, unnest("""
    + tokens_sql("text")
    + """) AS token FROM documents),
agg AS (SELECT token, count(DISTINCT doc_id) AS df, min(doc_id) AS first_doc
        FROM tok GROUP BY 1)
SELECT token, df, first_doc, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY df DESC, token) AS rnk FROM agg)
WHERE rnk <= 20
"""
)


def q_embedding_centroids(spark, sf_dir):
    """Element-wise centroid per label: posexplode → avg per position.
    One shuffle keyed (label, pos); at scale this beats any UDAF."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    )
    return exploded.withColumn("pos", F.col("pos").cast("long")).groupBy("label", "pos").agg(
        qavg(F.col("v").cast("double"), EMB_Q, 6).alias("centroid_v")
    )


SQL_CENTROIDS = f"""
SELECT label, pos, {sql_qavg("v", EMB_Q, 6)} AS centroid_v FROM (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(list_transform(embedding, x -> x::DOUBLE)) AS v
  FROM embeddings)
GROUP BY 1, 2
"""


# Fixed band geometry + cap for the ORACLE-CHECKED near-dup query: explicit
# planes_per_band so the DuckDB twin can be generated statically (the API
# default planes_per_band=None derives band width from a corpus count, which
# a static SQL string can't mirror). threshold=0.3 because the synthetic
# embeddings top out at cos≈0.51 — a 0.95 threshold would make the oracle
# vacuously compare empty sets.
NEAR_DUP_BANDS = 2
NEAR_DUP_PLANES = 8
NEAR_DUP_CAP = 100
NEAR_DUP_THRESHOLD = 0.3


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (threshold form, no ranking):
    banded LSH self-equi-join (nothing broadcast, per-bucket cap), exact
    cosine filter within candidates."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_near_dup_pairs(
        emb,
        threshold=NEAR_DUP_THRESHOLD,
        n_bands=NEAR_DUP_BANDS,
        planes_per_band=NEAR_DUP_PLANES,
        dim=64,
        bucket_cap=NEAR_DUP_CAP,
    )


def _sql_embedding_near_dup() -> str:
    planes = similarity.hyperplanes(64, NEAR_DUP_BANDS * NEAR_DUP_PLANES)
    band_sel = []
    for b in range(NEAR_DUP_BANDS):
        bits = []
        for j in range(NEAR_DUP_PLANES):
            plane = planes[b * NEAR_DUP_PLANES + j]
            arr = "[" + ", ".join(f"{x}::DOUBLE" for x in plane) + "]"
            bits.append(
                f"CASE WHEN list_sum(list_transform(list_zip(v, {arr}), p -> p[1]*p[2])) > 0 "
                f"THEN {2 ** j} ELSE 0 END"
            )
        code = " + ".join(bits)
        band_sel.append(
            f"SELECT vec_id, v, {b} AS band, CAST({code} AS BIGINT) AS code FROM base"
        )
    coded = "\nUNION ALL\n".join(band_sel)
    return f"""
WITH base AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
coded AS ({coded}),
capped AS (
  SELECT vec_id, v, band, code FROM (
    SELECT *, row_number() OVER (PARTITION BY band, code ORDER BY vec_id) AS rn
    FROM coded)
  WHERE rn <= {NEAR_DUP_CAP}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.code = b.code AND a.vec_id < b.vec_id),
scored AS (
  SELECT id_a, id_b,
         round(list_sum(list_transform(list_zip(va, vb), p -> p[1]*p[2])) /
               (sqrt(list_sum(list_transform(va, x -> x*x))) *
                sqrt(list_sum(list_transform(vb, x -> x*x)))), 6) AS cos_sim
  FROM cand)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {NEAR_DUP_THRESHOLD}
"""


def q_bpe_ish_token_count(spark, sf_dir):
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    single punctuation), the pre-tokenizer shape GPT-style BPEs use."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0b\\f\\r]"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pattern), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


SQL_BPE = r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]', 0)) AS n_bpe_tokens
FROM documents
"""


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility by language: per labeled lang, exact doc /
    char / whitespace-word / BPE-ish-token totals plus fertility
    (subword tokens per word) and tokens-per-1k-chars — THE metric a
    multilingual pipeline reads to decide whether a tokenizer
    under-serves a language (high fertility = more compute per byte of
    that language). One scan + one lang-keyed aggregate; ratios are
    exact integer quotients through qmath."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0b\\f\\r]"
    per_doc = d.select(
        "lang",
        F.length("text").cast("long").alias("chars"),
        text.token_count(F.col("text")).cast("long").alias("words"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pattern), 0))
        .cast("long")
        .alias("bpe"),
    )
    g = per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("chars").alias("n_chars"),
        F.sum("words").alias("n_words"),
        F.sum("bpe").alias("n_bpe_tokens"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_chars",
        "n_words",
        "n_bpe_tokens",
        qmath.qdiv_count(
            F.col("n_bpe_tokens") * F.lit(1_000_000), F.col("n_words"), 1, 6
        ).alias("fertility"),
        qmath.qdiv_count(
            F.col("n_bpe_tokens") * F.lit(1_000_000_000), F.col("n_chars"), 1, 6
        ).alias("tokens_per_1k_chars"),
    ).orderBy("lang")


def _sql_tokenizer_fertility() -> str:
    toks = tokens_sql("text", distinct=False)
    fert = qmath.sql_qdiv_count("(n_bpe_tokens * 1000000)", "n_words", 1, 6)
    tpk = qmath.sql_qdiv_count("(n_bpe_tokens * 1000000000)", "n_chars", 1, 6)
    return rf"""
WITH per_doc AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS chars,
         CAST(len({toks}) AS BIGINT) AS words,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]', 0)) AS BIGINT) AS bpe
  FROM documents),
g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(chars) AS BIGINT) AS n_chars,
             CAST(sum(words) AS BIGINT) AS n_words,
             CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens
      FROM per_doc GROUP BY lang)
SELECT lang, n_docs, n_chars, n_words, n_bpe_tokens,
       {fert} AS fertility,
       {tpk} AS tokens_per_1k_chars
FROM g ORDER BY lang
"""


def q_dedup_clusters(spark, sf_dir):
    """Connected components over Jaccard near-dup pairs (min-label
    propagation with pointer doubling, run to the fixpoint) → canonical
    survivor per cluster."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.8)
    return dedup.dedup_clusters(d, pairs, "doc_id")


# the converged-components twin's final SELECT, shared between
# _sql_dedup_clusters and _sql_cluster_size_histogram so the histogram
# builder composes rather than string-slicing the clusters SQL
_SQL_CLUSTERS_FINAL = "SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id"


def _sql_dedup_clusters_ctes() -> str:
    # True converged connected components via a recursive reachability CTE
    # (edges are symmetric, so min reachable id == component minimum) —
    # derived from the fixpoint semantics, not an unrolled iteration count.
    jaccard_pairs = SQL_JACCARD.strip().rstrip(";")
    return (
        f"pairs AS ({jaccard_pairs}),\n"
        "edges AS (SELECT id_a AS a, id_b AS b FROM pairs"
        " UNION ALL SELECT id_b, id_a FROM pairs),\n"
        "reach(doc_id, r) AS ("
        " SELECT doc_id, doc_id FROM documents"
        " UNION"
        " SELECT e.a, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b)"
    )


def _sql_dedup_clusters() -> str:
    return "WITH RECURSIVE " + _sql_dedup_clusters_ctes() + "\n" + _SQL_CLUSTERS_FINAL


def q_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster size distribution — the release-notes view of
    the dedup graph (how much of the corpus sits in 2-, 3-, k-member
    duplicate families vs singletons, and the doc mass each size class
    holds). Rides the existing connected-components operator: one
    cluster-keyed count then one size-keyed rollup (both dimension-
    cardinality); the oracle nests the converged recursive-CTE
    components twin."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.8)
    clusters = dedup.dedup_clusters(d, pairs, "doc_id")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            (F.count("*") * F.col("size")).cast("long").alias("n_docs"),
        )
        .orderBy("size")
    )


def _sql_cluster_size_histogram() -> str:
    # compose the clusters twin's CTEs + final SELECT (shared constants —
    # no string slicing of the sibling oracle) and roll up sizes
    return f"""
WITH RECURSIVE {_sql_dedup_clusters_ctes()},
clusters AS ({_SQL_CLUSTERS_FINAL}),
sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
          FROM clusters GROUP BY cluster_id)
SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * size AS BIGINT) AS n_docs
FROM sizes GROUP BY size ORDER BY size
"""


def q_time_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: GROUPING SETS over
    (day) and (day, hour) buckets of event time."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    e.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "value",
    ).createOrReplaceTempView("__events_buckets__")
    return spark.sql(
        f"""
        SELECT day, hour, count(*) AS n,
               {sql_qsum("value", 100, 4)} AS sum_value
        FROM __events_buckets__
        GROUP BY GROUPING SETS ((day), (day, hour))
        """
    )


SQL_TIME_ROLLUP = f"""
SELECT day, hour, count(*) AS n, {sql_qsum("value", 100, 4)} AS sum_value
FROM (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             value FROM events)
GROUP BY GROUPING SETS ((day), (day, hour))
"""


def q_range_join(spark, sf_dir):
    """Range join via bucketization: events.value joined to value-band
    ranges. The scalable plan is bucket-id equi-join + residual filter —
    never a broadcast-nested-loop theta join over the fact table."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    bands = spark.createDataFrame(
        [(i, float(i * 10), float((i + 1) * 10), f"band_{i}") for i in range(10)],
        "bucket int, lo double, hi double, band string",
    )
    bucketed = e.withColumn("bucket", F.floor(F.col("value") / 10).cast("int"))
    out = bucketed.join(F.broadcast(bands), "bucket").where(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return out.groupBy("band").agg(
        F.count("*").alias("n"), qavg(F.col("value"), 100, 4).alias("avg_value")
    )


SQL_RANGE_JOIN = f"""
WITH bands AS (
  SELECT i AS bucket, i*10.0 AS lo, (i+1)*10.0 AS hi, 'band_' || i AS band
  FROM generate_series(0, 9) AS t(i))
SELECT band, count(*) AS n,
       {sql_qavg("value", 100, 4)} AS avg_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# rows-only checks (not SQL-expressible)
# ---------------------------------------------------------------------------

def q_multimodal_image_features(spark, sf_dir):
    """mapInPandas binary-decode over REAL image bytes: the synthetic
    payloads are actual binary PPMs and ``fake=False`` runs the genuine
    numpy decode (width/height from the header, Rec.601 mean luma from
    the pixels). Value-level oracle: the md5-seeded gradient images are
    closed-form, so the DuckDB twin re-derives pixels from md5 bytes,
    computes the same integer-milli luma mean, and rebuilds the exact
    PPM byte stream (header + raster hex → unhex → sha256) to verify
    payload_sha — the decode AND the binary round-trip are hash-checked."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        extract_image_features,
        synth_ppm_media,
    )

    media = synth_ppm_media(spark, n=64).coalesce(4).localCheckpoint()
    feats = extract_image_features(media, fake=False).drop("payload_sha")
    # digest over the hex encoding (bijective with the raw bytes) because
    # DuckDB 1.0 hash functions accept VARCHAR only; the operator itself
    # still emits sha256 of the raw payload for library users
    check = media.select(
        "media_id", F.sha2(F.lower(F.hex("payload")), 256).alias("payload_sha")
    )
    return feats.join(check, "media_id")


def q_multimodal_audio_features(spark, sf_dir):
    """mapInPandas audio decode over REAL PCM-WAV bytes (duration/rate
    from the RIFF header, RMS from the actual samples as an exact
    integer pcm² sum). Value-level oracle: the md5-seeded sine payloads
    are closed-form, so the DuckDB twin regenerates every pcm sample
    (same op order: trunc(0.5·sin(((2π)·f)·(k/rate))·32767)), computes
    the same integer RMS, and rebuilds the 44-byte RIFF header + LE
    pcm raster as hex to verify the payload digest."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        extract_audio_features,
        synth_wav_media,
    )

    media = synth_wav_media(spark, n=64).coalesce(4).localCheckpoint()
    feats = extract_audio_features(media, fake=False).drop("payload_sha")
    check = media.select(
        "media_id", F.sha2(F.lower(F.hex("payload")), 256).alias("payload_sha")
    )
    return feats.join(check, "media_id")


def q_multimodal_video_frames(spark, sf_dir):
    """REAL video frame sampling: mapInPandas over PV01 streams (the
    codec-free video container — concatenated self-describing P6
    frames), emitting every 2nd frame's dimensions, exact integer-milli
    Rec.601 luma, and a digest of the frame's PPM bytes. Value-level
    oracle: frames are md5-seeded gradients shifted per frame index, so
    the DuckDB twin regenerates every sampled frame byte-for-byte."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        extract_video_frames,
        synth_ppm_video_media,
    )

    return extract_video_frames(
        synth_ppm_video_media(spark, n=24).coalesce(4).localCheckpoint(),
        every_n=2,
        fake=False,
    )


def _sql_video_frames() -> str:
    b0, b1, b2, b3, b4, b5 = (_sql_hexbyte(k) for k in range(6))
    return f"""
WITH seed AS (
  SELECT i, md5('vid' || i) AS hh FROM (SELECT unnest(range(0, 24)) AS i)),
geom AS (
  SELECT i, 8 + {b0} % 5 AS w, 8 + {b1} % 5 AS h,
         1 + {b2} % 3 AS ca, 1 + {b3} % 3 AS cb, {b4} AS cc,
         4 + {b5} % 5 AS nf
  FROM seed),
fr AS (
  SELECT g.*, f.f FROM geom g
  JOIN LATERAL (SELECT unnest(range(0, g.nf, 2)) AS f) f ON true),
px AS (
  SELECT fr.i, fr.f, fr.w, fr.h, y.y, x.x,
         (x.x * fr.ca + y.y + fr.f) % 256 AS r,
         (y.y * fr.cb + x.x + fr.f) % 256 AS gg,
         (x.x + y.y + fr.cc + fr.f) % 256 AS b
  FROM fr
  JOIN LATERAL (SELECT unnest(range(0, fr.h)) AS y) y ON true
  JOIN LATERAL (SELECT unnest(range(0, fr.w)) AS x) x ON true),
feat AS (
  SELECT i, f, w, h,
         CAST((2 * sum(299 * r + 587 * gg + 114 * b) * 1000000
                + count(*) * 255000)
               // (2 * count(*) * 255000) AS DOUBLE) / 1000000.0 AS mean_luma,
         string_agg(printf('%02x%02x%02x', r, gg, b), '' ORDER BY y, x)
           AS raster_hex
  FROM px GROUP BY i, f, w, h)
SELECT CAST(i AS BIGINT) AS media_id, CAST(f AS INTEGER) AS frame_idx,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       mean_luma,
       sha256(lower(hex('P6' || chr(10) || w || ' ' || h || chr(10)
                        || '255' || chr(10))) || raster_hex) AS frame_sha
FROM feat
"""


def q_multimodal_resize(spark, sf_dir):
    """mapInPandas decode→nearest-neighbor-resize→re-encode over real
    binary PPMs (resize_images, fake=False). Value-level oracle: the
    index maps are pure integer arithmetic (src = dst·src_dim // 8), so
    the DuckDB twin rebuilds every resized 8×8 PPM byte-for-byte from
    the md5-seeded gradients and verifies the payload digest."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        resize_images,
        synth_ppm_media,
    )

    rz = resize_images(
        synth_ppm_media(spark, n=64).coalesce(4).localCheckpoint(), 8, 8, fake=False
    )
    return rz.select(
        "media_id",
        "width",
        "height",
        F.sha2(F.lower(F.hex("payload")), 256).alias("payload_sha"),
    )


def _sql_resize() -> str:
    """Mirror of resize_image's nearest-neighbor maps over the synth
    gradients: dst pixel (y, x) samples src (y·h//8, x·w//8)."""
    b0, b1, b2, b3, b4 = (_sql_hexbyte(k) for k in range(5))
    return f"""
WITH seed AS (
  SELECT i, md5('ppm' || i) AS hh FROM (SELECT unnest(range(0, 64)) AS i)),
geom AS (
  SELECT i, 8 + {b0} % 9 AS w, 8 + {b1} % 9 AS h,
         1 + {b2} % 5 AS ca, 1 + {b3} % 5 AS cb, {b4} AS cc
  FROM seed),
px AS (
  SELECT g.i, y.y, x.x,
         ((x.x * g.w // 8) * g.ca + (y.y * g.h // 8)) % 256 AS r,
         ((y.y * g.h // 8) * g.cb + (x.x * g.w // 8)) % 256 AS gg,
         ((x.x * g.w // 8) + (y.y * g.h // 8) + g.cc) % 256 AS b
  FROM geom g
  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) y
  CROSS JOIN (SELECT unnest(range(0, 8)) AS x) x),
feat AS (
  SELECT i, string_agg(printf('%02x%02x%02x', r, gg, b), '' ORDER BY y, x)
           AS raster_hex
  FROM px GROUP BY i)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       sha256(lower(hex('P6' || chr(10) || '8 8' || chr(10) || '255'
                        || chr(10))) || raster_hex) AS payload_sha
FROM feat
"""


def _u32le(v: str) -> str:
    return (
        f"printf('%02x%02x%02x%02x', ({v}) % 256, (({v}) // 256) % 256,"
        f" (({v}) // 65536) % 256, (({v}) // 16777216) % 256)"
    )


def _u16le(v: str) -> str:
    return f"printf('%02x%02x', ({v}) % 256, (({v}) // 256) % 256)"


def _sql_audio_features() -> str:
    """Mirror of synth_wav_media + decode_audio (operators/multimodal.py)."""
    b0, b1, b2 = (_sql_hexbyte(k) for k in range(3))
    hdr = (
        "lower(hex('RIFF')) || "
        + _u32le("36 + 2 * f.n")
        + " || lower(hex('WAVEfmt ')) || "
        + _u32le("16")
        + " || "
        + _u16le("1")
        + " || "
        + _u16le("1")
        + " || "
        + _u32le("g.rate")
        + " || "
        + _u32le("g.rate * 2")
        + " || "
        + _u16le("2")
        + " || "
        + _u16le("16")
        + " || lower(hex('data')) || "
        + _u32le("2 * f.n")
    )
    return f"""
WITH seed AS (
  SELECT i, md5('wav' || i) AS hh FROM (SELECT unnest(range(0, 64)) AS i)),
geom AS (
  SELECT i, ([8000, 16000, 22050, 44100])[1 + {b0} % 4] AS rate,
         110.0 * (1 + {b1} % 8) AS freq,
         0.05 + ({b2} % 10) / 100.0 AS dur
  FROM seed),
g2 AS (SELECT i, rate, freq,
              CAST(trunc(rate * dur) AS BIGINT) AS n FROM geom),
pcm AS (
  SELECT g.i, k.k,
         CAST(trunc((0.5 * sin(((2 * pi()) * g.freq)
                               * (k.k / CAST(g.rate AS DOUBLE))))
                    * 32767.0) AS BIGINT) AS v
  FROM g2 g JOIN LATERAL (SELECT unnest(range(0, g.n)) AS k) k ON true),
feat AS (
  SELECT i, count(*) AS n,
         round(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)) / 32768.0, 6) AS rms,
         string_agg(printf('%02x%02x', ((v + 65536) % 65536) % 256,
                           ((v + 65536) % 65536) // 256), '' ORDER BY k)
           AS pcm_hex
  FROM pcm GROUP BY i)
SELECT CAST(g.i AS BIGINT) AS media_id,
       CAST((2 * f.n * 1000000 + g.rate) // (2 * g.rate) AS DOUBLE)
         / 1000000.0 AS duration_s,
       CAST(g.rate AS INTEGER) AS sample_rate,
       f.rms,
       sha256({hdr} || f.pcm_hex) AS payload_sha,
       TRUE AS decode_ok
FROM g2 g JOIN feat f USING (i)
"""


def _sql_hexbyte(k: int) -> str:
    """DuckDB expr: byte k (0-based) of the md5 hex digest in column hh."""
    hexpos = "strpos('0123456789abcdef', substr(hh, {p}, 1)) - 1"
    hi = hexpos.format(p=2 * k + 1)
    lo = hexpos.format(p=2 * k + 2)
    return f"(({hi}) * 16 + ({lo}))"


def _sql_image_features() -> str:
    """Mirror of synth_ppm_media + decode_image (operators/multimodal.py):
    w/h/gradient coefficients from md5('ppm'||i) bytes, Rec.601 luma as an
    exact integer-milli mean, payload_sha by reconstructing the PPM bytes
    (header ASCII + row-major RGB raster) as hex and sha256-ing the blob."""
    b0, b1, b2, b3, b4 = (_sql_hexbyte(k) for k in range(5))
    return f"""
WITH seed AS (
  SELECT i, md5('ppm' || i) AS hh FROM (SELECT unnest(range(0, 64)) AS i)),
geom AS (
  SELECT i, 8 + {b0} % 9 AS w, 8 + {b1} % 9 AS h,
         1 + {b2} % 5 AS ca, 1 + {b3} % 5 AS cb, {b4} AS cc
  FROM seed),
px AS (
  SELECT g.i, g.w, g.h, y.y, x.x,
         (x.x * g.ca + y.y) % 256 AS r,
         (y.y * g.cb + x.x) % 256 AS gg,
         (x.x + y.y + g.cc) % 256 AS b
  FROM geom g
  JOIN LATERAL (SELECT unnest(range(0, g.h)) AS y) y ON true
  JOIN LATERAL (SELECT unnest(range(0, g.w)) AS x) x ON true),
feat AS (
  SELECT i, w, h,
         CAST((2 * sum(299 * r + 587 * gg + 114 * b) * 1000000
                + count(*) * 255000)
               // (2 * count(*) * 255000) AS DOUBLE) / 1000000.0 AS mean_luma,
         string_agg(printf('%02x%02x%02x', r, gg, b), '' ORDER BY y, x)
           AS raster_hex
  FROM px GROUP BY i, w, h)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       mean_luma,
       sha256(lower(hex('P6' || chr(10) || w || ' ' || h || chr(10)
                        || '255' || chr(10)) || raster_hex)) AS payload_sha,
       TRUE AS decode_ok
FROM feat
"""


def q_multimodal_corrupt_isolation(spark, sf_dir):
    """VERDICT_r08 #6 — the A13 per-record error contract applied to
    media: every media_id % 4 == 0 payload is truncated to its first 10
    bytes (a recognized P6 container with a malformed body), and the
    mapInPandas decode stage must FLAG those rows (decode_ok=false,
    null features) rather than fail the task. Oracle: counts and the
    ok-rows pixel total are closed-form from the md5-seeded geometry."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        extract_image_features,
        synth_ppm_media,
    )

    media = synth_ppm_media(spark, n=64).coalesce(4)
    media = media.withColumn(
        "payload",
        F.when(
            F.col("media_id") % 4 == 0, F.expr("substring(payload, 1, 10)")
        ).otherwise(F.col("payload")),
    ).localCheckpoint()
    feats = extract_image_features(media, fake=False)
    return feats.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(~F.col("decode_ok"), 1)).alias("n_bad"),
        F.count(F.when(F.col("decode_ok"), 1)).alias("n_ok"),
        F.sum(
            F.when(F.col("decode_ok"), F.col("width") * F.col("height"))
        ).cast("long").alias("ok_pixels"),
    )


SQL_MM_CORRUPT = """
WITH seed AS (
  SELECT i, md5('ppm' || i) AS hh FROM (SELECT unnest(range(0, 64)) AS i)),
geom AS (
  SELECT i,
         8 + ((strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1)) % 9 AS w,
         8 + ((strpos('0123456789abcdef', substr(hh, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hh, 4, 1)) - 1)) % 9 AS h
  FROM seed)
SELECT count(*) AS n_total,
       count(*) FILTER (WHERE i % 4 = 0) AS n_bad,
       count(*) FILTER (WHERE i % 4 <> 0) AS n_ok,
       CAST(sum(CAST(w AS BIGINT) * h) FILTER (WHERE i % 4 <> 0) AS BIGINT) AS ok_pixels
FROM geom
"""


def q_stateful_user_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user totals driven to completion; the final state matches the
    batch aggregate, so it oracle-checks against plain SQL."""
    prep_session(spark)
    from csvs_to_sqlite_spark.streaming.stateful import running_user_totals

    return running_user_totals(spark, f"{sf_dir}/events.parquet")


SQL_STATEFUL = """
SELECT user_id, count(*) AS n_events,
       round(sum(CAST(round(coalesce(value, 0.0) * 100) AS BIGINT)) / 100.0, 4)
         AS sum_value
FROM events GROUP BY 1
"""


def q_streaming_sessions(spark, sf_dir):
    """Stateful streaming sessionization via session_window. Value-level
    oracle: session_window's merge rule (an event extends a session while
    its time is STRICTLY inside [start, last + gap)) is the gap-and-island
    recurrence with a >= gap split, so the batch DuckDB twin reproduces
    the final complete-mode table exactly (the file source replays as one
    in-order batch, so the watermark drops nothing)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.streaming.windows import streaming_sessionize

    out = streaming_sessionize(spark, f"{sf_dir}/events.parquet", gap_minutes=30)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


SQL_STREAM_SESSIONS = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# training-pipeline curation: decontamination, splits, scrubbing, repetition
# ---------------------------------------------------------------------------

def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (dedup.decontaminate): docs with
    doc_id % 50 == 0 stand in for an eval/benchmark corpus; every other
    doc sharing a word 4-gram with them is dropped. n=4 (not the
    production 13) because the synthetic docs are 30-60 tokens from a
    small vocabulary — at sf0.01 this removes 19 of 490 train docs, so
    the oracle exercises real overlap, not a no-op."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    eval_docs = d.where(F.col("doc_id") % 50 == 0)
    train = d.where(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(train, eval_docs, n=4).select("doc_id", "lang", "source")


def _sql_decontaminate() -> str:
    h = md5_long_sql("s", hex_chars=15)
    return (
        "WITH tokd AS (SELECT doc_id, "
        + tokens_sql("text", distinct=False)
        + " AS toks FROM documents),\n"
        "sh AS (SELECT doc_id, " + h + " AS h FROM (SELECT doc_id, unnest("
        + shingles_sql("toks", 4)
        + ") AS s FROM tokd)),\n"
        "eval_h AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),\n"
        "bad AS (SELECT DISTINCT doc_id FROM sh JOIN eval_h USING (h)\n"
        "        WHERE doc_id % 50 <> 0)\n"
        "SELECT doc_id, lang, source FROM documents\n"
        "WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)"
    )


def q_train_val_split(spark, sf_dir):
    """Deterministic hash-based split (splits.hash_split): stable,
    engine-independent placement; checked per-row via the (split, lang)
    counts AND a per-split md5 id-set digest, so a single moved document
    changes the result."""
    prep_session(spark)
    d = splits.hash_split(_t(spark, sf_dir, "documents"), "doc_id")
    return (
        d.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
    )


def _sql_train_val_split() -> str:
    assign = splits.split_assignment_sql("doc_id")
    return (
        f"WITH assigned AS (SELECT doc_id, lang, {assign} AS split FROM documents)\n"
        "SELECT split, lang, count(*) AS n_docs,\n"
        "  md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) AS id_digest\n"
        "FROM assigned GROUP BY split, lang"
    )


def q_pii_redact(spark, sf_dir):
    """PII scrubbing (text.redact_pii). The corpus is synthetic word-soup
    with no real PII, so the query plants a deterministic contact line
    per doc (email + phone + IPv4, derived from doc_id) identically on
    both sides, then redacts — the hash check verifies the Java and RE2
    regex engines agree on every replacement."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    planted = F.concat_ws(
        " ",
        F.substring("text", 1, 40),
        F.lit("contact"),
        F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@mail.example.com")),
        F.lit("or"),
        F.concat(
            F.lit("555-"),
            (F.col("doc_id") % 900 + 100).cast("string"),
            F.lit("-"),
            (F.col("doc_id") % 9000 + 1000).cast("string"),
        ),
        F.lit("from"),
        F.concat(
            F.lit("10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 100).cast("string"),
        ),
    )
    return d.select("doc_id", text.redact_pii(planted).alias("redacted"))


def _sql_pii_redact() -> str:
    planted = (
        "concat_ws(' ', substr(text, 1, 40), 'contact', "
        "concat('user', cast(doc_id AS varchar), '@mail.example.com'), 'or', "
        "concat('555-', cast(doc_id % 900 + 100 AS varchar), '-', "
        "cast(doc_id % 9000 + 1000 AS varchar)), 'from', "
        "concat('10.', cast(doc_id % 256 AS varchar), '.0.', "
        "cast(doc_id % 100 AS varchar)))"
    )
    return (
        f"SELECT doc_id, {text.redact_pii_sql(planted)} AS redacted FROM documents"
    )


def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition/boilerplate metrics: duplicate 2-/3-gram
    fractions and the most-common-token share, plus the resulting keep
    flag. Tokens materialize once behind a projection boundary (the
    element_at-in-lambda contract); everything else is linear per-doc
    column expressions — zero shuffle, zero UDFs."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr

    toked = d.select(
        "doc_id", tokens_expr(F.col("text"), distinct=False).alias("toks")
    )
    t = F.col("toks")
    scored = toked.select(
        "doc_id",
        text.dup_ngram_fraction(t, 2).alias("dup_2gram_frac"),
        text.dup_ngram_fraction(t, 3).alias("dup_3gram_frac"),
        text.top_token_fraction(t).alias("top_token_frac"),
    )
    return scored.select(
        "*",
        (
            (F.col("dup_2gram_frac") < 0.5)
            & (F.col("dup_3gram_frac") < 0.3)
            & (F.col("top_token_frac") < 0.2)
        ).alias("keep"),
    )


def _sql_repetition_filter() -> str:
    def dup_frac_sql(n: int) -> str:
        parts = ", ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(n))
        win = (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"[concat_ws(' ', {parts}) for i in range(1, len(toks) - {n - 1} + 1)] "
            "ELSE [] END"
        )
        return (
            f"round(CASE WHEN len({win}) > 0 THEN "
            f"(len({win}) - len(list_distinct({win}))) / len({win}) "
            "ELSE 0.0 END, 6)"
        )

    # max token frequency as a pure list expression (O(distinct·n) per
    # row, fine at oracle scale) — mirrors the sorted-run-length result
    top = (
        "round(CASE WHEN len(toks) > 0 THEN "
        "list_max(list_transform(list_distinct(toks), "
        "t -> len(list_filter(toks, x -> x = t)))) "
        "/ len(toks) ELSE 0.0 END, 6)"
    )
    return (
        "WITH tokd AS (SELECT doc_id, "
        + tokens_sql("text", distinct=False)
        + " AS toks FROM documents),\n"
        "scored AS (SELECT doc_id, "
        f"{dup_frac_sql(2)} AS dup_2gram_frac, "
        f"{dup_frac_sql(3)} AS dup_3gram_frac, "
        f"{top} AS top_token_frac FROM tokd)\n"
        "SELECT *, (dup_2gram_frac < 0.5 AND dup_3gram_frac < 0.3 "
        "AND top_token_frac < 0.2) AS keep FROM scored"
    )


def q_weighted_mixture(spark, sf_dir):
    """Deterministic data mixing (splits.weighted_sample): down-sample
    three sources to fixed rates, keep the rest at 100%. The oracle
    compares a per-source id digest, so the check is per-row placement,
    not just surviving counts."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    mixed = splits.weighted_sample(d, "doc_id", _MIX_WEIGHTS)
    return mixed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            )
        ).alias("id_digest"),
    )


_MIX_WEIGHTS = {"src0": 0.25, "src1": 0.5, "src7": 0.0}


def _sql_weighted_mixture() -> str:
    keep = splits.weighted_sample_sql("doc_id", _MIX_WEIGHTS)
    return (
        f"SELECT source, count(*) AS n_docs,\n"
        "  md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) AS id_digest\n"
        f"FROM documents WHERE {keep} GROUP BY source"
    )


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup (streaming/windows.py::streaming_dedup_counts):
    watermark-bounded dropDuplicates on (user, type, minute), counts per
    type. Oracle = batch COUNT(DISTINCT key) — exact because only key
    survival is observable downstream."""
    prep_session(spark)
    from csvs_to_sqlite_spark.streaming.windows import streaming_dedup_counts

    return streaming_dedup_counts(spark, f"{sf_dir}/events.parquet")


SQL_STREAM_DEDUP = """
SELECT event_type, count(*) AS n_unique FROM (
  SELECT DISTINCT user_id, event_type,
         date_trunc('minute', ts) AS minute
  FROM events
) GROUP BY event_type
"""


def q_streaming_enrich(spark, sf_dir):
    """Stream-static enrichment (streaming/windows.py::streaming_enrich_counts):
    event stream joined map-side to a broadcast customer dim, aggregated
    per market segment. Oracle = the batch join+agg."""
    prep_session(spark)
    from csvs_to_sqlite_spark.streaming.windows import streaming_enrich_counts

    return streaming_enrich_counts(
        spark, f"{sf_dir}/events.parquet", f"{sf_dir}/customer.parquet"
    )


SQL_STREAM_ENRICH = """
SELECT c_mktsegment, count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


_JSONL_FIXTURE_DIRS: dict = {}


def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL source (sources/jsonl_source.py): documents → JSONL →
    load_jsonl with sampled schema inference + projection; oracle = the
    original documents view (lossless roundtrip). The fixture is written
    executor-side (``docs.write.json``) — no corpus ever funnels through
    the driver — and the directory is cached per sf_dir so repeated
    invocations in a long-lived session don't accumulate temp copies."""
    prep_session(spark)
    import atexit
    import shutil as _shutil
    import tempfile

    from csvs_to_sqlite_spark.sources.jsonl_source import load_jsonl

    docs = _t(spark, sf_dir, "documents")
    path = _JSONL_FIXTURE_DIRS.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="q_jsonl_rt_")
        _JSONL_FIXTURE_DIRS[sf_dir] = path
        atexit.register(_shutil.rmtree, path, ignore_errors=True)
    docs.write.mode("overwrite").json(path)
    return load_jsonl(
        spark, path, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_sequence_pack(spark, sf_dir):
    """Offset sequence packing (packing.pack_sequences): documents laid
    end-to-end within hash-derived worker groups, pack = floor(start /
    budget). Window partitioned by group — parallel across the cluster,
    never a global sort."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, budget=512, n_groups=8)


def _sql_sequence_pack() -> str:
    from csvs_to_sqlite_spark.operators.packing import pack_sequences_sql

    return pack_sequences_sql(budget=512, n_groups=8)


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (operators/terms.py): two
    aggregates + a broadcast of the per-token DF table + one
    doc-partitioned ranking window. Ranking uses the 6-dp-rounded score
    (identical in both engines) with token as tiebreak, so a last-ulp
    ln() divergence cannot reorder the oracle comparison."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.tfidf_top_terms(d, "text", "doc_id", k=3)


SQL_TFIDF = f"""
WITH tokd AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS token FROM tokd),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token,
         round((tf / (sum(tf) OVER (PARTITION BY doc_id)))
               * ln(n.n_docs / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token ASC) AS rank
  FROM scored)
SELECT doc_id, token, tfidf, rank FROM ranked WHERE rank <= 3
"""


def q_bigram_topk(spark, sf_dir):
    """Corpus-wide top-20 adjacent-token bigrams (operators/terms.py):
    one explode → one count aggregate with map-side partials → top-k via
    orderBy().limit() = TakeOrderedAndProject (per-partition heaps, no
    global sort). Unique tie-break (n desc, bigram asc)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.bigram_counts(d, "text", top_k=20)


SQL_BIGRAMS = f"""
WITH tokd AS (SELECT {_TOKENS} AS toks FROM documents),
big AS (SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM tokd)
SELECT bigram, count(*) AS n FROM big
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
"""


def q_dedup_survivors(spark, sf_dir):
    """End-to-end corpus dedup: Jaccard near-dup pairs → connected
    components → keep only each component's canonical (minimum-id)
    member, then report surviving docs per source with an md5 id-set
    digest (per-row placement check, not just counts). This is the
    operation a training pipeline actually runs — `dedup_clusters` is its
    diagnostic view."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.8)
    clusters = dedup.dedup_clusters(d, pairs, "doc_id")
    survivors = clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    return (
        d.join(survivors, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
    )


def _sql_dedup_survivors() -> str:
    return (
        "WITH clusters AS (" + _sql_dedup_clusters() + ")\n"
        "SELECT source, count(*) AS n_docs,\n"
        "  md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) AS id_digest\n"
        "FROM documents JOIN clusters USING (doc_id)\n"
        "WHERE doc_id = cluster_id GROUP BY source"
    )


def q_quality_topk_per_source(spark, sf_dir):
    """Curation selection: top-5 documents per source by the quality
    heuristic — the 'keep the best K per domain' primitive. One
    source-partitioned row_number window over the 6-dp-rounded score;
    doc_id breaks ties deterministically."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", text.quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


def _sql_quality_topk() -> str:
    quality = SQL_QUALITY.strip().rstrip(";")
    return (
        f"WITH q AS ({quality}),\n"
        "scored AS (SELECT q.doc_id, d.source, q.quality\n"
        "           FROM q JOIN documents d USING (doc_id)),\n"
        "ranked AS (SELECT doc_id, source, quality,\n"
        "                  row_number() OVER (PARTITION BY source\n"
        "                                     ORDER BY quality DESC, doc_id ASC) AS rank\n"
        "           FROM scored)\n"
        "SELECT doc_id, source, quality, rank FROM ranked WHERE rank <= 5"
    )


def q_minmax_normalize(spark, sf_dir):
    """Per-group min-max feature scaling: o_totalprice rescaled to [0,1]
    within its priority class — the ML-prep normalization primitive.
    Group stats are a group-cardinality aggregate broadcast back onto
    the facts (which never shuffle); all arithmetic is plain IEEE
    doubles, rounded to 6 dp for the comparison."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    norm = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")),
    ).otherwise(F.lit(0.0))
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(norm, 6).alias("price_norm"),
        )
    )


SQL_MINMAX_NORM = """
WITH stats AS (SELECT o_orderpriority, min(o_totalprice) AS lo,
                      max(o_totalprice) AS hi
               FROM orders GROUP BY o_orderpriority)
SELECT o_orderkey, o.o_orderpriority,
       round(CASE WHEN hi > lo THEN (o_totalprice - lo) / (hi - lo)
                  ELSE 0.0 END, 6) AS price_norm
FROM orders o JOIN stats USING (o_orderpriority)
"""


VOCAB_TOP_K = 100
TOKEN_BUDGET = 700


def q_vocab_encode(spark, sf_dir):
    """Vocabulary build + integer encoding (terms.build_vocab /
    terms.encode_docs): top-100 corpus tokens get dense ids 1..100 in
    (freq desc, token asc) order, documents become id sequences with
    OOV→0. The vocab is a TakeOrdered head collected driver-side and
    shipped as one map literal, so encoding is scan-stage array math —
    zero joins, zero shuffles on the corpus."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    vocab = terms.build_vocab(d, "text", top_k=VOCAB_TOP_K)
    return terms.encode_docs(d, "text", "doc_id", vocab)


def _sql_vocab_encode() -> str:
    toks = tokens_sql("text", distinct=False)
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS tk FROM documents),
counts AS (SELECT t AS token, count(*) AS cnt FROM (
             SELECT unnest(tk) AS t FROM toks) GROUP BY t),
vocab AS (SELECT token,
                 row_number() OVER (ORDER BY cnt DESC, token) AS tok_id
          FROM counts ORDER BY cnt DESC, token LIMIT {VOCAB_TOP_K}),
pos AS (SELECT doc_id, generate_subscripts(tk, 1) AS pos, unnest(tk) AS token
        FROM toks),
enc AS (SELECT doc_id, list(coalesce(v.tok_id, 0) ORDER BY pos) AS ids,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM pos LEFT JOIN vocab v USING (token) GROUP BY doc_id)
SELECT t.doc_id, coalesce(e.ids, []) AS ids,
       coalesce(e.n_tokens, 0) AS n_tokens
FROM toks t LEFT JOIN enc e USING (doc_id)
"""


def q_oov_rate(spark, sf_dir):
    """Tokenizer coverage by source (terms.oov_rate_by_group): per
    source, the exact OOV share of the token stream against the corpus
    top-100 vocabulary — the audit a pipeline reads next to fertility
    to find under-served slices. Scan-stage map-literal membership (no
    joins on the corpus) + one source-keyed aggregate."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    vocab = terms.build_vocab(d, "text", top_k=VOCAB_TOP_K)
    return terms.oov_rate_by_group(d, "text", "source", vocab)


def _sql_oov_rate() -> str:
    toks = tokens_sql("text", distinct=False)
    rate = qmath.sql_qdiv_count(
        "(n_oov * 1000000)", "greatest(n_tokens, 1)", 1, 6
    )
    return f"""
WITH toks AS (SELECT source, {toks} AS tk FROM documents),
counts AS (SELECT t AS token, count(*) AS cnt FROM (
             SELECT unnest(tk) AS t FROM toks) GROUP BY t),
vocab AS (SELECT token FROM counts ORDER BY cnt DESC, token LIMIT {VOCAB_TOP_K}),
pos AS (SELECT source, unnest(tk) AS token FROM toks),
agg AS (SELECT pos.source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        FROM pos LEFT JOIN vocab v USING (token) GROUP BY pos.source),
docs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
joined AS (SELECT d.source, d.n_docs,
                  coalesce(a.n_tokens, 0) AS n_tokens,
                  coalesce(a.n_oov, 0) AS n_oov
           FROM docs d LEFT JOIN agg a USING (source))
SELECT source, n_docs, n_tokens, n_oov, {rate} AS oov_rate FROM joined
"""


def q_vocab_update(spark, sf_dir):
    """Incremental vocabulary growth (terms.update_vocab): vocab built
    on 3/4 of the corpus, then grown with the held-out quarter — old
    ids immutable, the top-50 new tokens numbered after max(tok_id) in
    (freq desc, token asc) order."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    old = terms.build_vocab(d.where(F.col("doc_id") % 4 != 0), "text", top_k=VOCAB_TOP_K)
    return terms.update_vocab(old, d.where(F.col("doc_id") % 4 == 0), "text", top_k_new=50)


def _sql_vocab_update() -> str:
    toks = tokens_sql("text", distinct=False)
    return f"""
WITH old_toks AS (SELECT doc_id, {toks} AS tk FROM documents WHERE doc_id % 4 <> 0),
old_counts AS (SELECT t AS token, count(*) AS cnt FROM (
                 SELECT unnest(tk) AS t FROM old_toks) GROUP BY t),
vocab AS (SELECT token,
                 CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS tok_id
          FROM old_counts ORDER BY cnt DESC, token LIMIT {VOCAB_TOP_K}),
new_toks AS (SELECT doc_id, {toks} AS tk FROM documents WHERE doc_id % 4 = 0),
new_counts AS (SELECT t AS token, count(*) AS cnt FROM (
                 SELECT unnest(tk) AS t FROM new_toks) GROUP BY t),
fresh AS (SELECT token, cnt FROM new_counts
          WHERE token NOT IN (SELECT token FROM vocab)
          ORDER BY cnt DESC, token LIMIT 50),
numbered AS (SELECT token,
                    (SELECT coalesce(max(tok_id), 0) FROM vocab)
                    + CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS tok_id
             FROM fresh)
SELECT token, tok_id FROM vocab
UNION ALL SELECT token, tok_id FROM numbered
"""


def q_token_budget_cap(spark, sf_dir):
    """Token-budget mixture capping (splits.token_budget_cap): every
    source capped at 700 tokens, docs admitted in salted-hash order.
    The Spark plan is the two-phase bucket design (no source-sized
    window); the oracle is the naive single-window cumsum — matching
    hashes prove the plans equivalent."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return splits.token_budget_cap(
        d, "text", "doc_id", "source", budget=TOKEN_BUDGET
    )


PRIORITY_SOURCES = ["src7", "src3", "src1"]


def q_dedup_priority(spark, sf_dir):
    """Provenance-priority exact-dup survivors (dedup.
    survivors_by_priority): among copies of the same text keep the copy
    from the highest-priority source (src7 > src3 > src1 > the rest),
    then lowest doc_id — canonical-copy selection by curation policy
    instead of blind min(id). One md5(text)-keyed aggregate; the winner
    is a windowless min(struct(rank, id, source))."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.survivors_by_priority(d, "text", "doc_id", "source", PRIORITY_SOURCES)


def _sql_dedup_priority() -> str:
    rank = str(len(PRIORITY_SOURCES))
    for i, s in reversed(list(enumerate(PRIORITY_SOURCES))):
        rank = f"CASE WHEN source = '{s}' THEN {i} ELSE {rank} END"
    return f"""
WITH ranked AS (
  SELECT doc_id, source, md5(text) AS h, CAST({rank} AS BIGINT) AS r
  FROM documents),
win AS (
  SELECT h, doc_id, source,
         row_number() OVER (PARTITION BY h ORDER BY r, doc_id) AS rn,
         count(*) OVER (PARTITION BY h) AS n_copies
  FROM ranked)
SELECT doc_id, source, n_copies FROM win WHERE rn = 1
"""


# deliberately nasty: control char, curly quotes, em/en dash, ellipsis,
# no-break space, tabs and run-on spaces — one shared constant so the
# Spark query and the SQL twin plant byte-identical input
NORMALIZE_PLANT = "  \x01ctl “double” and ‘single’ …\tgap — dash nb  end  "


def q_text_normalize(spark, sf_dir):
    """Text canonicalization (text.normalize_text): control chars out,
    typographic punctuation folded to ASCII, whitespace collapsed. The
    corpus is clean synthetic text, so the query appends a deterministic
    nasty suffix on both sides — the hash check verifies the Java and
    RE2 regex engines agree on every fold."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    planted = F.concat(F.substring("text", 1, 40), F.lit(NORMALIZE_PLANT))
    norm = text.normalize_text(planted)
    return d.select(
        "doc_id",
        norm.alias("norm"),
        F.length(norm).cast("long").alias("n_chars"),
    )


def _sql_text_normalize() -> str:
    norm = text.normalize_text_sql(f"concat(substr(text, 1, 40), '{NORMALIZE_PLANT}')")
    return f"""
SELECT doc_id, {norm} AS norm, CAST(length({norm}) AS BIGINT) AS n_chars
FROM documents
"""


def q_winsorize(spark, sf_dir):
    """Per-group winsorization: clip l_extendedprice into its group's
    [p01, p99] within l_returnflag — the outlier-robust scaling prep
    that precedes normalization in a feature pipeline. The percentile
    pair is a 3-row aggregate broadcast back onto the facts (which
    never shuffle); the clip itself is scan-stage least/greatest."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("hi"),
    )
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("l_extendedprice")))
    return li.join(F.broadcast(stats), "l_returnflag").select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        F.round(clipped, 4).alias("price_winsor"),
    )


SQL_WINSORIZE = """
WITH stats AS (SELECT l_returnflag,
                      quantile_cont(l_extendedprice, 0.01) AS lo,
                      quantile_cont(l_extendedprice, 0.99) AS hi
               FROM lineitem GROUP BY 1)
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l.l_returnflag,
       round(greatest(lo, least(hi, l_extendedprice)), 4) AS price_winsor
FROM lineitem l JOIN stats USING (l_returnflag)
"""


def q_dup_rate_by_source(spark, sf_dir):
    """Per-source duplication-rate report: docs, distinct texts, and the
    dup rate — the first number a corpus health dashboard shows. One
    (source, md5(text))-keyed aggregate then a source rollup; text never
    shuffles, only its hash."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    per_text = (
        d.select("source", F.md5("text").alias("h"))
        .groupBy("source", "h")
        .agg(F.count("*").alias("c"))
    )
    return per_text.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_unique"),
        qmath.qdiv_count(
            (F.sum("c") - F.count("*")) * F.lit(1_000_000), F.sum("c"), 1, 6
        ).alias("dup_rate"),
    )


SQL_DUP_RATE = f"""
WITH per_text AS (SELECT source, md5(text) AS h, count(*) AS c
                  FROM documents GROUP BY 1, 2)
SELECT source, cast(sum(c) AS bigint) AS n_docs, count(*) AS n_unique,
       {qmath.sql_qdiv_count("((sum(c) - count(*)) * 1000000)", "sum(c)", 1, 6)} AS dup_rate
FROM per_text GROUP BY source
"""


def q_derived_column_conformance(spark, sf_dir):
    """Derived-column conformance audit: does documents.n_chars actually
    equal length(text)? Scan-stage predicate + one count — the
    generated-column consistency check every ingest pipeline should
    assert (a nonzero count means the upstream writer and the column
    drifted)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).cast("long").alias("n_mismatched"),
    )


SQL_CONFORMANCE = """
SELECT count(*) AS n_docs,
       cast(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS bigint)
         AS n_mismatched
FROM documents
"""


def q_key_uniqueness_audit(spark, sf_dir):
    """Candidate-key audit: for each declared key, how many key values
    occur more than once (0 = the key is unique). One count aggregate
    per key, each map-side combined; the HAVING side is duplicate-sized,
    not table-sized."""
    prep_session(spark)
    checks = [
        ("lineitem(l_orderkey,l_linenumber)",
         _t(spark, sf_dir, "lineitem").groupBy("l_orderkey", "l_linenumber")),
        ("orders(o_orderkey)", _t(spark, sf_dir, "orders").groupBy("o_orderkey")),
        ("events(event_id)",
         load_events(spark, f"{sf_dir}/events.parquet").groupBy("event_id")),
    ]
    out = None
    for name, grouped in checks:
        row = (
            grouped.agg(F.count("*").alias("c"))
            .where(F.col("c") > 1)
            .agg(
                F.lit(name).alias("candidate_key"),
                F.count("*").cast("long").alias("n_duplicated_keys"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_KEY_AUDIT = """
SELECT 'lineitem(l_orderkey,l_linenumber)' AS candidate_key, count(*) AS n_duplicated_keys
FROM (SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
UNION ALL
SELECT 'orders(o_orderkey)', count(*)
FROM (SELECT 1 FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'events(event_id)', count(*)
FROM (SELECT 1 FROM events GROUP BY event_id HAVING count(*) > 1)
"""


def q_embedding_health(spark, sf_dir):
    """Embedding-table health audit: per label, vector count, dimension
    consistency (min=max size), zero-vector count, and mean L2 norm —
    the sanity gate before building any ANN index over the column. All
    per-vector math is a JVM array fold; one label-keyed aggregate.
    Norms rounded to 4 dp before averaging so engine-order float-sum
    noise cannot reach the comparison."""
    prep_session(spark)
    e = _t(spark, sf_dir, "embeddings")
    sq = F.expr(
        "aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))"
    )
    per_vec = e.select(
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq), 4).alias("norm"),
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.sum(F.when(F.col("norm") == 0.0, 1).otherwise(0)).cast("long").alias(
            "n_zero_vecs"
        ),
        qavg(F.col("norm"), 10000, 4).alias("mean_norm"),
    )


SQL_EMBEDDING_HEALTH = f"""
WITH per_vec AS (
  SELECT label, len(embedding) AS dim,
         round(sqrt(list_sum(list_transform(embedding,
               x -> cast(x AS double) * cast(x AS double)))), 4) AS norm
  FROM embeddings)
SELECT label, count(*) AS n_vecs,
       cast(min(dim) AS bigint) AS dim_min, cast(max(dim) AS bigint) AS dim_max,
       cast(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS bigint) AS n_zero_vecs,
       {sql_qavg("norm", 10000, 4)} AS mean_norm
FROM per_vec GROUP BY label
"""


def q_argmax_per_group(spark, sf_dir):
    """Top-1-per-group WITHOUT a window: each customer's highest-value
    order via max(struct(price, key)) — one map-side-combined aggregate,
    no per-partition sort at all (the window top-k's shuffle+sort
    becomes shuffle-only; at 100 TB this is the cheaper plan whenever
    k=1). Struct comparison is lexicographic in both engines, so the
    (price, key) tuple is a deterministic total order."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    best = F.max(
        F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    )
    return (
        o.groupBy("o_custkey")
        .agg(best.alias("b"))
        .select(
            "o_custkey",
            F.col("b.k").alias("best_order"),
            F.round(F.col("b.p"), 4).alias("best_price"),
        )
    )


SQL_ARGMAX = """
SELECT o_custkey,
       (max({'p': o_totalprice, 'k': o_orderkey})).k AS best_order,
       round((max({'p': o_totalprice, 'k': o_orderkey})).p, 4) AS best_price
FROM orders GROUP BY o_custkey
"""


def q_length_histogram(spark, sf_dir):
    """Doc-length histogram in 100-char buckets (integer bucket math —
    no float log binning, so bucket edges cannot diverge between
    engines). One map-side-combined aggregate; the reporting primitive
    behind every corpus dashboard."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    return (
        d.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


SQL_LENGTH_HIST = """
SELECT (n_chars // 100) * 100 AS bucket_lo, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY 1
"""


def q_event_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence: which event-type pairs happen in the
    same (user, day) basket, with support counts. Distinct baskets
    first (one aggregate — kills within-basket multiplicity before the
    join), then a basket-keyed self-equi-join ordered a < b. Join
    fan-out is bounded by types-per-basket (≤ 5 distinct types), never
    raw event counts."""
    prep_session(spark)
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    baskets = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .distinct()
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_baskets"))
    )


SQL_COOCCURRENCE = """
WITH baskets AS (SELECT DISTINCT user_id, cast(ts AS date) AS day, event_type
                 FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_baskets
FROM baskets a JOIN baskets b
  ON a.user_id = b.user_id AND a.day = b.day
 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def q_assoc_rules(spark, sf_dir):
    """Association rules over (user, day) event baskets: every directed
    rule a→b with basket support, confidence n_ab/n_a, and lift
    conf/(n_b/N). Same bounded basket-keyed self-join as
    event_cooccurrence (fan-out ≤ types-per-basket); item counts and the
    basket total are type-cardinality aggregates broadcast into the
    final projection — the fact table never shuffles twice. All floats
    are single mirrored divisions of exact longs."""
    prep_session(spark)
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    baskets = (
        ev.select("user_id", F.to_date("ts").alias("day"), "event_type").distinct()
    ).persist()
    n_total = baskets.select("user_id", "day").distinct().agg(
        F.count("*").alias("n_baskets_total")
    )
    items = baskets.groupBy("event_type").agg(F.count("*").alias("n_item"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    directed = pairs.select(
        F.col("type_a").alias("antecedent"),
        F.col("type_b").alias("consequent"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("type_b").alias("antecedent"),
            F.col("type_a").alias("consequent"),
            "n_ab",
        )
    )
    out = (
        directed.join(
            F.broadcast(items.withColumnRenamed("event_type", "antecedent")), "antecedent"
        )
        .withColumnRenamed("n_item", "n_a")
        .join(
            F.broadcast(
                items.select(
                    F.col("event_type").alias("consequent"),
                    F.col("n_item").alias("n_b"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_total))
    )
    M = F.lit(1_000_000)
    return out.select(
        "antecedent",
        "consequent",
        "n_ab",
        # single-division integer ratios, rounded in integer space (qmath):
        # lift is expressed as the exact rational (n_ab·total)/(n_a·n_b)
        qmath.qdiv_count(F.col("n_ab") * M, F.col("n_baskets_total"), 1, 6).alias(
            "support"
        ),
        qmath.qdiv_count(F.col("n_ab") * M, F.col("n_a"), 1, 6).alias("confidence"),
        qmath.qdiv_count(
            F.col("n_ab") * F.col("n_baskets_total") * M,
            F.col("n_a") * F.col("n_b"),
            1,
            6,
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")


SQL_ASSOC = f"""
WITH baskets AS (SELECT DISTINCT user_id, cast(ts AS date) AS day, event_type
                 FROM events),
tot AS (SELECT count(*) AS n_baskets_total
        FROM (SELECT DISTINCT user_id, day FROM baskets)),
items AS (SELECT event_type, count(*) AS n_item FROM baskets GROUP BY 1),
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 count(*) AS n_ab
          FROM baskets a JOIN baskets b
            ON a.user_id = b.user_id AND a.day = b.day
           AND a.event_type < b.event_type
          GROUP BY 1, 2),
directed AS (SELECT type_a AS antecedent, type_b AS consequent, n_ab FROM pairs
             UNION ALL
             SELECT type_b, type_a, n_ab FROM pairs)
SELECT antecedent, consequent, n_ab,
       (CAST((CASE WHEN ((n_ab * 1000000)) < 0 THEN -CAST(round(((abs((n_ab * 1000000)) * 2 + ((n_baskets_total) * 1)) - ((abs((n_ab * 1000000)) * 2 + ((n_baskets_total) * 1)) % (((n_baskets_total) * 1) * 2))) / CAST((((n_baskets_total) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((n_ab * 1000000)) * 2 + ((n_baskets_total) * 1)) - ((abs((n_ab * 1000000)) * 2 + ((n_baskets_total) * 1)) % (((n_baskets_total) * 1) * 2))) / CAST((((n_baskets_total) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS support,
       (CAST((CASE WHEN ((n_ab * 1000000)) < 0 THEN -CAST(round(((abs((n_ab * 1000000)) * 2 + ((ia.n_item) * 1)) - ((abs((n_ab * 1000000)) * 2 + ((ia.n_item) * 1)) % (((ia.n_item) * 1) * 2))) / CAST((((ia.n_item) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((n_ab * 1000000)) * 2 + ((ia.n_item) * 1)) - ((abs((n_ab * 1000000)) * 2 + ((ia.n_item) * 1)) % (((ia.n_item) * 1) * 2))) / CAST((((ia.n_item) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS confidence,
       (CAST((CASE WHEN ((n_ab * n_baskets_total * 1000000)) < 0 THEN -CAST(round(((abs((n_ab * n_baskets_total * 1000000)) * 2 + (((ia.n_item * ic.n_item)) * 1)) - ((abs((n_ab * n_baskets_total * 1000000)) * 2 + (((ia.n_item * ic.n_item)) * 1)) % ((((ia.n_item * ic.n_item)) * 1) * 2))) / CAST(((((ia.n_item * ic.n_item)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((n_ab * n_baskets_total * 1000000)) * 2 + (((ia.n_item * ic.n_item)) * 1)) - ((abs((n_ab * n_baskets_total * 1000000)) * 2 + (((ia.n_item * ic.n_item)) * 1)) % ((((ia.n_item * ic.n_item)) * 1) * 2))) / CAST(((((ia.n_item * ic.n_item)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS lift
FROM directed
JOIN items ia ON ia.event_type = antecedent
JOIN items ic ON ic.event_type = consequent
CROSS JOIN tot
ORDER BY antecedent, consequent
"""


def q_interarrival_stats(spark, sf_dir):
    """Event-stream health: per event type, the median and p95
    inter-arrival gap in seconds (lag window per type partition, then a
    type-cardinality percentile aggregate). The gap computation sorts
    within type partitions only — no global ordering anywhere."""
    prep_session(spark)
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = (epoch - F.lag(epoch).over(w)).alias("gap_s")
    gaps = ev.select("event_type", gap).where(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 4).alias("p95_gap_s"),
    )


SQL_INTERARRIVAL = """
WITH gaps AS (
  SELECT event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events)
SELECT event_type, count(*) AS n_gaps,
       round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
       round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s
FROM gaps WHERE gap_s IS NOT NULL GROUP BY event_type
"""


def q_price_outliers(spark, sf_dir):
    """IQR outlier detection per group: orders whose total price exceeds
    p75 + 1.5·IQR of their priority class. Group stats are a
    priority-cardinality aggregate broadcast back onto the facts (the
    fact table never shuffles); exact interpolated percentiles for the
    oracle, approx_percentile the drop-in at scale. Returns per-group
    outlier counts + id digests."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
    )
    cutoff = F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .where(F.col("o_totalprice") > cutoff)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_outliers"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("o_orderkey")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
    )


SQL_PRICE_OUTLIERS = """
WITH stats AS (SELECT o_orderpriority,
                      quantile_cont(o_totalprice, 0.25) AS p25,
                      quantile_cont(o_totalprice, 0.75) AS p75
               FROM orders GROUP BY o_orderpriority)
SELECT o.o_orderpriority, count(*) AS n_outliers,
       md5(string_agg(cast(o_orderkey AS varchar), ',' ORDER BY o_orderkey))
         AS id_digest
FROM orders o JOIN stats s USING (o_orderpriority)
WHERE o.o_totalprice > s.p75 + 1.5 * (s.p75 - s.p25)
GROUP BY o.o_orderpriority
"""


def q_collocations(spark, sf_dir):
    """Top-20 PMI collocations with min_count=5 (terms.collocations):
    two token-keyed aggregates + broadcast unigram joins + TakeOrdered."""
    prep_session(spark)
    return terms.collocations(_t(spark, sf_dir, "documents"), "text")


SQL_COLLOCATIONS = f"""
WITH tokd AS (SELECT {_TOKENS} AS toks FROM documents),
pairs AS (SELECT unnest(list_transform(range(1, len(toks)),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS b FROM tokd),
c12 AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
uni AS (SELECT unnest(toks) AS w FROM tokd),
c1 AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
n AS (SELECT (SELECT count(*) FROM uni) AS n1, (SELECT count(*) FROM pairs) AS n2)
SELECT concat_ws(' ', w1, w2) AS bigram, c12 AS n,
       round(ln((c12 / cast(n.n2 AS double))
                / ((a.c / cast(n.n1 AS double)) * (b.c / cast(n.n1 AS double)))), 6) AS pmi
FROM c12
JOIN c1 a ON c12.w1 = a.w
JOIN c1 b ON c12.w2 = b.w
CROSS JOIN n
WHERE c12 >= 5
ORDER BY pmi DESC, bigram ASC LIMIT 20
"""


def q_char_health(spark, sf_dir):
    """C4-style character-class ratios (text.char_health): uppercase /
    digit / symbol fractions per doc — pure scan-stage regexp length
    diffs, zero shuffle."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    ratios = text.char_health(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in ratios.items()])


def _sql_char_health() -> str:
    return f"SELECT doc_id, {text.char_health_sql('text')} FROM documents"


def q_merge_upsert(spark, sf_dir):
    """SCD-1 merge/upsert: base orders + an updates batch (every 10th
    order re-priced, version 2) → latest version wins per key. One
    row_number window over the UNION, partitioned by the key — the
    relational MERGE that parquet-based pipelines run instead of
    in-place updates. Verified per-row via revenue sums and digests."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("version")
    )
    updates = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    merged = (
        base.unionByName(updates)
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
    )
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0)).cast("long").alias(
            "n_updated"
        ),
        qsum(F.col("o_totalprice"), 10000, 2).alias("total_revenue"),
    )


SQL_MERGE_UPSERT = f"""
WITH base AS (SELECT o_orderkey, o_totalprice, 1 AS version FROM orders),
updates AS (SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS o_totalprice,
                   2 AS version
            FROM orders WHERE o_orderkey % 10 = 0),
unioned AS (SELECT * FROM base UNION ALL SELECT * FROM updates),
merged AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                        ORDER BY version DESC) AS rn
           FROM unioned)
SELECT count(*) AS n_rows,
       cast(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS bigint) AS n_updated,
       {sql_qsum("o_totalprice", 10000, 2)}
         AS total_revenue
FROM merged WHERE rn = 1
"""


def q_fk_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star: for each fact→dim
    edge, how many fact rows have no matching dim key (broadcast
    anti-join per edge — the dim side is always the broadcast side, the
    fact is scanned once per edge and never shuffled)."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    edges = [
        ("lineitem.l_orderkey->orders", li.select(F.col("l_orderkey").alias("k")),
         o.select(F.col("o_orderkey").alias("k"))),
        ("orders.o_custkey->customer", o.select(F.col("o_custkey").alias("k")),
         c.select(F.col("c_custkey").alias("k"))),
        ("events.user_id->customer", ev.select(F.col("user_id").alias("k")),
         c.select(F.col("c_custkey").alias("k"))),
    ]
    out = None
    for name, fact, dim in edges:
        row = (
            fact.join(F.broadcast(dim.distinct()), "k", "left_anti")
            .agg(
                F.lit(name).alias("edge"),
                F.count("*").cast("long").alias("n_orphans"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_FK_AUDIT = """
SELECT 'lineitem.l_orderkey->orders' AS edge, count(*) AS n_orphans
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'orders.o_custkey->customer', count(*)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'events.user_id->customer', count(*)
FROM events WHERE user_id NOT IN (SELECT c_custkey FROM customer)
"""


def q_daily_dense_rollup(spark, sf_dir):
    """Calendar-spine gap filling: per-(day, event_type) totals with
    MISSING DAYS ZERO-FILLED — the sparse→dense densification every
    time-series consumer needs. The spine is generated (sequence ×
    distinct types, both tiny) and broadcast onto the aggregated facts;
    the fact table itself is only touched by one groupBy."""
    prep_session(spark)
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    lo, hi = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).collect()[0]
    days = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(lo), F.lit(hi), F.expr("interval 1 day"))
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"), qsum(F.col("value"), 100, 4).alias("v"))
    # broadcast the RIGHT side: a left-outer join can only broadcast-build
    # its right side, so the former F.broadcast(spine) hint was silently
    # ignored (HintErrorLogger) and the join ran as sort-merge. `daily`
    # is aggregate-bounded to |days|x|types| — same broadcast class as
    # the spine — and the join output is identical (optimization r11).
    # assert_dimension_sized (r12): that bound is now ENFORCED fail-loud
    # before the rows feed the broadcast build.
    daily = assert_dimension_sized(daily, "daily_dense_rollup.daily (|days| x |types|)")
    return (
        spine
        .join(F.broadcast(daily), ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("sum_value"),
        )
    )


SQL_DAILY_DENSE = """
WITH bounds AS (SELECT min(cast(ts AS date)) AS lo, max(cast(ts AS date)) AS hi
                FROM events),
days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::date AS day
         FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (SELECT cast(ts AS date) AS day, event_type,
                 count(*) AS n,
                 round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS v
          FROM events GROUP BY 1, 2)
SELECT strftime(d.day, '%Y-%m-%d') AS day, t.event_type,
       coalesce(daily.n, 0) AS n_events,
       coalesce(daily.v, 0.0) AS sum_value
FROM days d CROSS JOIN types t
LEFT JOIN daily ON daily.day = d.day AND daily.event_type = t.event_type
"""


def q_event_funnel(spark, sf_dir):
    """Ordered funnel: signup → first view AFTER the signup → first
    purchase AFTER that view, per user; one row per funnel step with the
    surviving-user count. Three user-keyed conditional aggregates chained
    by user-keyed equi-joins (no broadcast hint — user sets scale with
    the corpus; AQE broadcasts them when small) — the events fact is
    scanned per step (persisted, so the parquet decode happens once)
    but never shuffled beyond the user-keyed aggs."""
    prep_session(spark)
    ev = load_events(spark, f"{sf_dir}/events.parquet").persist()
    t1 = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        ev.where(F.col("event_type") == "view")
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    steps = [
        ("1_signup", t1),
        ("2_view_after_signup", t2),
        ("3_purchase_after_view", t3),
    ]
    out = None
    for name, d in steps:
        row = d.agg(
            F.lit(name).alias("step"), F.count("*").cast("long").alias("n_users")
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_FUNNEL = """
WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
SELECT '1_signup' AS step, count(*) AS n_users FROM t1
UNION ALL SELECT '2_view_after_signup', count(*) FROM t2
UNION ALL SELECT '3_purchase_after_view', count(*) FROM t3
"""


def q_corpus_diff(spark, sf_dir):
    """Snapshot diff via set operators: EXCEPT/INTERSECT between an 'old'
    corpus slice (doc_id % 7 != 0) and a 'new' one (doc_id % 3 != 0) —
    added/removed/kept doc-id sets, each summarized by count + digest.
    Set ops compile to the same keyed aggregates as joins, so the
    100 TB posture is a distinct-keyed shuffle per side."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 7 != 0).select("doc_id")
    new = d.where(F.col("doc_id") % 3 != 0).select("doc_id")
    sets = [
        ("added", new.exceptAll(old)),
        ("removed", old.exceptAll(new)),
        ("kept", new.intersect(old)),
    ]
    out = None
    for name, s in sets:
        row = s.agg(
            F.lit(name).alias("change"),
            F.count("*").cast("long").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_CORPUS_DIFF = """
WITH old AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0),
new AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
added AS (SELECT doc_id FROM new EXCEPT SELECT doc_id FROM old),
removed AS (SELECT doc_id FROM old EXCEPT SELECT doc_id FROM new),
kept AS (SELECT doc_id FROM new INTERSECT SELECT doc_id FROM old)
SELECT 'added' AS change, count(*) AS n_docs,
       md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) AS id_digest
FROM added
UNION ALL SELECT 'removed', count(*),
       md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) FROM removed
UNION ALL SELECT 'kept', count(*),
       md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) FROM kept
"""


def q_boilerplate_lines(spark, sf_dir):
    """RefinedWeb-style boilerplate line removal
    (dedup.boilerplate_line_filter): corpus-frequent lines dropped from
    every document, with the reconstructed kept-text digest verified.
    The synthetic docs are single-line, so a shared footer line is
    appended to every document — the oracle then checks BOTH paths: the
    footer is corpus-frequent (dropped everywhere) while the body lines
    survive and reconstruct."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.concat_ws("\n", F.col("text"), F.lit("-- shared footer --"))
    )
    return dedup.boilerplate_line_filter(d, "text", "doc_id", max_freq=2)


def q_gopher_rules(spark, sf_dir):
    """Gopher-style quality gate (text.gopher_rules): the MassiveText
    format/repetition heuristics as per-doc booleans + measurements,
    pure scan-stage expressions — zero shuffles, zero joins."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    rules = text.gopher_rules(F.col("text"))
    return d.select("doc_id", *[v.alias(k) for k, v in rules.items()])


def q_c4_line_rules(spark, sf_dir):
    """C4 line-level cleaning (text.c4_line_rules, Raffel et al. 2020
    §2.2): terminal-punctuation + min-words + javascript line filters,
    lorem-ipsum / curly-brace / min-kept page gates — scan-stage only.
    The synthetic corpus is single-line, so the query builds a
    deterministic multi-line page per doc (raw text: never kept; text
    + '.': kept; doc_id-conditioned lorem/brace/javascript/short
    lines) to exercise every rule on both engines."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    line2 = F.when(
        F.col("doc_id") % 7 == 0,
        F.lit("lorem ipsum dolor sit amet consectetur."),
    ).otherwise(F.lit("a fine second line for this document."))
    line3 = F.when(
        F.col("doc_id") % 11 == 0,
        F.lit("this { brace line is long enough to pass."),
    ).otherwise(F.lit("short one."))
    line4 = F.when(
        F.col("doc_id") % 13 == 0,
        F.lit("enable javascript to view this page today."),
    ).otherwise(F.lit("another perfectly reasonable closing sentence."))
    multi = F.concat_ws(
        "\n", F.col("text"), F.concat(F.col("text"), F.lit(".")), line2, line3, line4
    )
    cols = text.c4_line_rules(multi, min_words=5, min_kept=3)
    return d.select("doc_id", "source", *[v.alias(k) for k, v in cols.items()])


def _sql_c4_line_rules() -> str:
    mtext = (
        "concat_ws(chr(10), text, text || '.', "
        "CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum dolor sit amet consectetur.'"
        " ELSE 'a fine second line for this document.' END, "
        "CASE WHEN doc_id % 11 = 0 THEN 'this { brace line is long enough to pass.'"
        " ELSE 'short one.' END, "
        "CASE WHEN doc_id % 13 = 0 THEN 'enable javascript to view this page today.'"
        " ELSE 'another perfectly reasonable closing sentence.' END)"
    )
    return (
        "SELECT doc_id, source, "
        + text.c4_line_rules_sql("mtext", min_words=5, min_kept=3)
        + f" FROM (SELECT doc_id, source, {mtext} AS mtext FROM documents)"
    )


def q_quality_classifier(spark, sf_dir):
    """Hashed linear quality-classifier inference (text.hashed_classifier,
    fastText-style — Joulin et al. 2016): md5-hashed unigram+bigram
    features, integer-milli weights embedded as literals, per-doc logit as
    an exact integer fold. Scan-stage only — zero shuffles, zero joins;
    the logit is associative-sum-free (one in-row fold), so the result is
    identical under any partitioning."""
    prep_session(spark)
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source", tokens_expr(F.col("text"), distinct=False).alias("toks")
    )
    cols = text.hashed_classifier(F.col("toks"), dim=128)
    scored = base.select(
        "doc_id",
        "source",
        cols["n_terms"].alias("n_terms"),
        cols["logit_milli"].alias("logit_milli"),
    )
    return scored.withColumn("label_positive", F.col("logit_milli") > 0)


def _sql_quality_classifier() -> str:
    return (
        "SELECT doc_id, source, "
        + text.hashed_classifier_sql("toks", dim=128)
        + " FROM (SELECT doc_id, source, "
        + tokens_sql("text", distinct=False)
        + " AS toks FROM documents)"
    )


def q_classifier_eval(spark, sf_dir):
    """Confusion matrix of the hashed linear classifier against the
    heuristic quality gate (quality_score ≥ 0.5) as pseudo-truth — the
    model-vs-heuristic agreement check a curation pipeline runs before
    trusting a learned filter. One scan + one 1-row aggregate; the three
    rates are guarded mirrored divisions of exact longs."""
    prep_session(spark)
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        tokens_expr(F.col("text"), distinct=False).alias("toks"),
        (text.quality_score(F.col("text")) >= 0.5).alias("truth"),
    )
    cols = text.hashed_classifier(F.col("toks"), dim=128)
    s = base.select("truth", (cols["logit_milli"] > 0).alias("pred"))
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    agg = s.agg(
        F.count("*").alias("n"),
        cnt(F.col("pred") & F.col("truth")).alias("tp"),
        cnt(F.col("pred") & ~F.col("truth")).alias("fp"),
        cnt(~F.col("pred") & F.col("truth")).alias("fn"),
        cnt(~F.col("pred") & ~F.col("truth")).alias("tn"),
    )
    rate = lambda num, den: F.when(
        den > 0, qmath.qdiv_count(num.cast("long") * F.lit(1_000_000), den, 1, 6)
    )
    return agg.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        qmath.qdiv_count(
            (F.col("tp") + F.col("tn")) * F.lit(1_000_000), F.col("n"), 1, 6
        ).alias("accuracy"),
        rate(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_"),
        rate(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_"),
    )


def _sql_classifier_eval() -> str:
    # the identical quality expression SQL_QUALITY uses, over the bound toks
    quality = (
        "round((least(len(toks) / 50.0, 1.0)"
        " + least(round(len(list_filter(toks, t -> t IN ('" + _STOPS + "')))"
        " / greatest(len(toks), 1), 6) * 5.0, 1.0)"
        " + len(list_distinct(toks)) / greatest(len(toks), 1)) / 3.0, 6)"
    )
    return (
        "WITH scored AS (SELECT "
        + text.hashed_classifier_sql("toks", dim=128)
        + ", " + quality + " AS quality FROM (SELECT "
        + tokens_sql("text", distinct=False)
        + " AS toks FROM documents)),\n"
        "s AS (SELECT (logit_milli > 0) AS pred, (quality >= 0.5) AS truth"
        " FROM scored),\n"
        "agg AS (SELECT count(*) AS n,\n"
        "  CAST(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS tp,\n"
        "  CAST(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,\n"
        "  CAST(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS fn,\n"
        "  CAST(sum(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS tn\n"
        "  FROM s)\n"
        "SELECT n, tp, fp, fn, tn,\n"
        "  (CAST((CASE WHEN (((tp + tn) * 1000000)) < 0 THEN -CAST(round(((abs(((tp + tn) * 1000000)) * 2 + ((n) * 1)) - ((abs(((tp + tn) * 1000000)) * 2 + ((n) * 1)) % (((n) * 1) * 2))) / CAST((((n) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs(((tp + tn) * 1000000)) * 2 + ((n) * 1)) - ((abs(((tp + tn) * 1000000)) * 2 + ((n) * 1)) % (((n) * 1) * 2))) / CAST((((n) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS accuracy,\n"
        "  CASE WHEN tp + fp > 0 THEN (CAST((CASE WHEN ((tp * 1000000)) < 0 THEN -CAST(round(((abs((tp * 1000000)) * 2 + (((tp + fp)) * 1)) - ((abs((tp * 1000000)) * 2 + (((tp + fp)) * 1)) % ((((tp + fp)) * 1) * 2))) / CAST(((((tp + fp)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((tp * 1000000)) * 2 + (((tp + fp)) * 1)) - ((abs((tp * 1000000)) * 2 + (((tp + fp)) * 1)) % ((((tp + fp)) * 1) * 2))) / CAST(((((tp + fp)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) END AS precision_,\n"
        "  CASE WHEN tp + fn > 0 THEN (CAST((CASE WHEN ((tp * 1000000)) < 0 THEN -CAST(round(((abs((tp * 1000000)) * 2 + (((tp + fn)) * 1)) - ((abs((tp * 1000000)) * 2 + (((tp + fn)) * 1)) % ((((tp + fn)) * 1) * 2))) / CAST(((((tp + fn)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((tp * 1000000)) * 2 + (((tp + fn)) * 1)) - ((abs((tp * 1000000)) * 2 + (((tp + fn)) * 1)) % ((((tp + fn)) * 1) * 2))) / CAST(((((tp + fn)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) END AS recall_\n"
        "FROM agg"
    )


BLOCKLIST_TERMS = ("slow", "crash", "stale")


def q_blocklist_filter(spark, sf_dir):
    """C4-style blocklist gate (text.blocklist_hits): per-doc occurrence
    and distinct-type counts of blocklisted words plus the keep boolean
    — scan-stage only. The term list mixes present ('slow') and absent
    ('crash', 'stale') words so both match paths are exercised."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    cols = text.blocklist_hits(F.col("text"), BLOCKLIST_TERMS)
    return d.select("doc_id", "source", *[v.alias(k) for k, v in cols.items()])


def q_weighted_topk_sample(spark, sf_dir):
    """Exact-k weighted sampling without replacement (splits.
    es_weighted_topk, Efraimidis-Spirakis A-ES): a 50-doc budget drawn
    proportional to document length — scan-stage keys + TakeOrdered,
    no global sort. Output is the selected set (id, source, n_chars);
    no floats leave the operator."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return splits.es_weighted_topk(d, "doc_id", "n_chars", k=50).select(
        "doc_id", "source", "n_chars"
    )


def q_length_batches(spark, sf_dir):
    """Length-grouped batch assignment (packing.length_bucketed_batches,
    the HF group_by_length trainer pattern): log2-length buckets,
    deterministic batches within each bucket, and the exact per-batch
    padding waste the grouping minimizes — all integer arithmetic."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.packing import length_bucketed_batches

    return length_bucketed_batches(
        _t(spark, sf_dir, "documents"), "text", "doc_id", batch_size=8
    )


def q_ccnet_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per source,
    docs ranked by LM score into head/middle/tail terciles, with doc and
    bigram totals and the mean score per bucket — the rollup that decides
    which quality band of each domain enters the training mix. ntile
    carries a unique (score desc, doc_id) tiebreak so bucket assignment
    is deterministic in both engines. Scale note: the per-source window
    shuffles once on source; at extreme per-source cardinality swap the
    ntile for percentile-cutoff assignment (3 broadcast numbers) — same
    output contract."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    lm = terms.lm_score(d, "text", "doc_id")
    scored = lm.join(d.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("lm_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("bucket", F.ntile(3).over(w).cast("long"))
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bigrams").alias("total_bigrams"),
            qavg(F.col("lm_score"), 1000000, 6).alias("mean_lm"),
        )
    )


def _sql_ccnet_buckets() -> str:
    lm = SQL_LM_SCORE.strip().rstrip(";")
    return f"""
WITH lm AS (SELECT * FROM ({lm})),
s AS (SELECT l.doc_id, l.n_bigrams, l.lm_score, d.source
      FROM lm l JOIN documents d USING (doc_id)),
b AS (SELECT *, ntile(3) OVER (PARTITION BY source
        ORDER BY lm_score DESC, doc_id ASC) AS bucket FROM s)
SELECT source, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
       {sql_qavg("lm_score", 1000000, 6)} AS mean_lm
FROM b GROUP BY source, bucket
"""


def q_rolling_revenue_7d(spark, sf_dir):
    """RANGE-frame rolling window: each order's trailing-7-day revenue
    for its customer (event-time range frame, not row frame — the frame
    Spark expresses as rangeBetween over epoch seconds and DuckDB as
    RANGE BETWEEN INTERVAL). One shuffle on the customer key."""
    prep_session(spark)
    o = _t(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(_qcol(F.col("o_totalprice"), 100)).over(w) / 100.0, 4).alias(
            "rev_7d"
        ),
    )


SQL_ROLLING_7D = """
SELECT o_orderkey, o_custkey,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) / 100.0, 4)
         AS rev_7d
FROM orders
"""


def q_customer_deciles(spark, sf_dir):
    """ntile bucketing: customers ranked into revenue deciles (per-decile
    totals + id digests). No global window even though the input is only
    the per-customer rollup: the rank comes from the two-phase machinery
    (range-partition + per-partition offsets, rowid.global_rank) and the
    decile from exact integer ntile arithmetic over that rank + the total
    count — bit-identical to ntile(10) OVER (ORDER BY …) at any
    cardinality, with no single-partition WindowExec."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.rowid import global_rank, ntile_from_rank

    o = _t(spark, sf_dir, "orders")
    # pin the rollup once: the count job and the rank both read the same
    # checkpointed blocks instead of scanning+shuffling orders twice (and
    # ntile_from_rank's n is decoupled from any recompute-determinism
    # assumption — advice finding)
    per_cust = (
        o.groupBy("o_custkey")
        .agg(qsum(F.col("o_totalprice"), 100, 4).alias("revenue"))
        .localCheckpoint(eager=False)
    )
    n = per_cust.count()
    ranked = global_rank(
        per_cust, [F.col("revenue").desc(), F.col("o_custkey").asc()], "__rnk__"
    )
    return (
        ranked.withColumn("decile", ntile_from_rank("__rnk__", n, 10))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            qsum(F.col("revenue"), 10000, 4).alias("decile_revenue"),
        )
    )


SQL_DECILES = """
WITH per_cust AS (SELECT o_custkey,
                         round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS revenue
                  FROM orders GROUP BY o_custkey),
ranked AS (SELECT o_custkey, revenue,
                  ntile(10) OVER (ORDER BY revenue DESC, o_custkey ASC) AS decile
           FROM per_cust)
SELECT decile, count(*) AS n_customers,
       round(sum(CAST(round(revenue * 10000) AS BIGINT)) / 10000.0, 4)
         AS decile_revenue
FROM ranked GROUP BY decile
"""


def q_stratified_sample(spark, sf_dir):
    """Exact-k deterministic stratified sample (splits.
    stratified_sample_exact_k): 5 docs per source by salted-hash rank."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return splits.stratified_sample_exact_k(d, "doc_id", "source", k=5).select(
        "doc_id", "source"
    )


def _sql_stratified_sample() -> str:
    h = md5_long_sql("cast(doc_id as varchar)", seed="strat")
    return (
        "SELECT doc_id, source FROM (\n"
        "  SELECT doc_id, source,\n"
        f"         row_number() OVER (PARTITION BY source ORDER BY {h} ASC,"
        " doc_id ASC) AS rk\n"
        "  FROM documents) t WHERE rk <= 5"
    )


def q_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostic (operators/profile.py::skew_report):
    top-10 heaviest l_partkey values with row shares — the pre-join
    check that decides salting/AQE-skew handling."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.profile import skew_report

    return skew_report(_t(spark, sf_dir, "lineitem"), "l_partkey")


def _sql_skew_report() -> str:
    return (
        "WITH c AS (SELECT cast(l_partkey AS varchar) AS key, count(*) AS n\n"
        "           FROM lineitem GROUP BY 1),\n"
        "t AS (SELECT count(*) AS total FROM lineitem)\n"
        "SELECT key, n, (CAST((CASE WHEN ((n * 1000000)) < 0 THEN -CAST(round(((abs((n * 1000000)) * 2 + ((t.total) * 1)) - ((abs((n * 1000000)) * 2 + ((t.total) * 1)) % (((t.total) * 1) * 2))) / CAST((((t.total) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((n * 1000000)) * 2 + ((t.total) * 1)) - ((abs((n * 1000000)) * 2 + ((t.total) * 1)) % (((t.total) * 1) * 2))) / CAST((((t.total) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS share\n"
        "FROM c CROSS JOIN t ORDER BY n DESC, key ASC LIMIT 10"
    )


def q_contamination_report(spark, sf_dir):
    """Per-source contamination audit: how much of each source overlaps
    the eval corpus (same 4-gram join as `decontaminate` — the report
    and the filter cannot disagree). Left join + conditional count."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    eval_docs = d.where(F.col("doc_id") % 50 == 0)
    train = d.where(F.col("doc_id") % 50 != 0)
    bad = dedup.contaminated_ids(train, eval_docs, n=4).withColumn(
        "is_bad", F.lit(1)
    )
    return (
        train.join(bad, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("is_bad"), F.lit(0))).alias("n_contaminated"),
            qmath.qdiv_count(
                F.sum(F.coalesce(F.col("is_bad"), F.lit(0))).cast("long")
                * F.lit(1_000_000),
                F.count("*"),
                1,
                6,
            ).alias("rate"),
        )
    )


def _sql_contamination_report() -> str:
    h = md5_long_sql("s", hex_chars=15)
    return (
        "WITH tokd AS (SELECT doc_id, "
        + tokens_sql("text", distinct=False)
        + " AS toks FROM documents),\n"
        "sh AS (SELECT doc_id, " + h + " AS h FROM (SELECT doc_id, unnest("
        + shingles_sql("toks", 4)
        + ") AS s FROM tokd)),\n"
        "eval_h AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),\n"
        "bad AS (SELECT DISTINCT doc_id FROM sh JOIN eval_h USING (h)\n"
        "        WHERE doc_id % 50 <> 0)\n"
        "SELECT source, count(*) AS n_docs,\n"
        "  cast(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bad) THEN 1 ELSE 0 END) AS bigint) AS n_contaminated,\n"
        "  " + qmath.sql_qdiv_count(
            "(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bad) THEN 1 ELSE 0 END)"
            " * 1000000)", "count(*)", 1, 6) + " AS rate\n"
        "FROM documents WHERE doc_id % 50 <> 0 GROUP BY source"
    )


def q_lm_score(spark, sf_dir):
    """CCNet-style LM quality filter signal (terms.lm_score): per-doc mean
    log-probability under an add-0.5-smoothed bigram model trained on the
    corpus itself. One model aggregate + one bigram-keyed join + one
    per-doc average."""
    prep_session(spark)
    return terms.lm_score(_t(spark, sf_dir, "documents"), "text", "doc_id")


SQL_LM_SCORE = f"""
WITH tokd AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
big AS (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM tokd),
v AS (SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(toks) AS t FROM tokd)),
c12 AS (SELECT bigram, count(*) AS c12 FROM big GROUP BY bigram),
c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c12) AS c1
       FROM c12 GROUP BY 1),
model AS (SELECT bigram, ln((c12 + 0.5) / (c1 + 0.5 * v.v)) AS logp
          FROM c12 JOIN c1 ON split_part(c12.bigram, ' ', 1) = c1.w1
          CROSS JOIN v)
SELECT doc_id, count(*) AS n_bigrams,
       {qmath.sql_qdiv_count("sum(CAST(round(logp * 1e12) AS BIGINT))", "count(*)", 1000000, 6)}
         AS lm_score
FROM big JOIN model USING (bigram) GROUP BY doc_id
"""


def q_incremental_dedup(spark, sf_dir):
    """Incremental ingestion dedup (dedup.incremental_near_dup_filter):
    treat doc_id % 5 == 0 as today's batch and the rest as the existing
    corpus; keep batch docs that near-dup-collide with neither the corpus
    nor a smaller-id batch member. Two (band,key)-keyed joins, both
    batch-sized."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 5 == 0)
    old = d.where(F.col("doc_id") % 5 != 0)
    return dedup.incremental_near_dup_filter(new, old, "text", "doc_id").select(
        "doc_id", "source"
    )


def _sql_incremental_dedup() -> str:
    # band rows over the WHOLE table once (signatures depend only on the
    # doc), then split by the same doc_id % 5 predicate
    return (
        "WITH sig AS (\n"
        + _sql_minhash_sig()
        + "\n), bands AS (\n"
        + _sql_minhash_band_rows()
        + """
),
new_b AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
old_b AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
hit_old AS (SELECT DISTINCT n.doc_id FROM new_b n
            JOIN old_b o ON n.band = o.band AND n.key = o.key),
hit_new AS (SELECT DISTINCT b.doc_id FROM new_b a
            JOIN new_b b ON a.band = b.band AND a.key = b.key
                        AND a.doc_id < b.doc_id),
dropped AS (SELECT doc_id FROM hit_old UNION SELECT doc_id FROM hit_new)
SELECT doc_id, source FROM documents
WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT doc_id FROM dropped)
"""
    )


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation flagship: exact dedup → quality gate (> 0.55)
    → deterministic train-split filter → sequence packing, every stage an
    existing operator. The corpus is filtered by three scan-stage or
    dim-sized predicates before the only real shuffle (packing's
    group-keyed cumsum), which is the shape a 100 TB curation run wants:
    shrink first, shuffle last."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    surv = dedup.exact_dedup(d, "text", "doc_id").select("doc_id")
    scored = d.withColumn("quality", text.quality_score(F.col("text")))
    kept = (
        scored.join(surv, "doc_id")
        .where(F.col("quality") > 0.55)
        .where(splits.split_assignment(F.col("doc_id")) == "train")
        .select("doc_id", "text")
    )
    return pack_sequences(kept, budget=512, n_groups=8)


def _sql_curation_pipeline() -> str:
    from csvs_to_sqlite_spark.operators.packing import pack_sequences_sql
    from csvs_to_sqlite_spark.operators.splits import split_assignment_sql

    quality = SQL_QUALITY.strip().rstrip(";")
    split = split_assignment_sql("d.doc_id")
    pack = pack_sequences_sql(budget=512, n_groups=8, table="kept")
    return (
        f"WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),\n"
        f"q AS ({quality}),\n"
        "kept AS (SELECT d.doc_id, d.text FROM documents d\n"
        "         JOIN surv USING (doc_id) JOIN q USING (doc_id)\n"
        f"         WHERE q.quality > 0.55 AND {split} = 'train')\n"
        f"SELECT * FROM ({pack}) packed"
    )


def q_global_shuffle(spark, sf_dir):
    """Deterministic global training order (splits.global_shuffle):
    corpus ranked by salted md5(id) via the two-phase distributed rank —
    no single-partition window anywhere."""
    prep_session(spark)
    return splits.global_shuffle(_t(spark, sf_dir, "documents"), "doc_id")


def _sql_global_shuffle() -> str:
    h = md5_long_sql("cast(doc_id as varchar)", seed="shuffle")
    return (
        f"SELECT doc_id, cast(row_number() OVER (ORDER BY {h}, doc_id) AS bigint)"
        " AS shuffle_rank FROM documents"
    )


def q_random_projection(spark, sf_dir):
    """±1 Johnson-Lindenstrauss projection 64→16 (similarity.py::
    random_projection, after Achlioptas 2003): the md5-derived literal
    matrix makes the compression deterministic and oracle-checkable;
    zero joins/shuffles — pure scan-stage array folds."""
    prep_session(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.random_projection(emb, d_in=64, d_out=16)


def _sql_random_projection() -> str:
    return similarity.random_projection_sql(d_in=64, d_out=16)


def q_quantize_embeddings(spark, sf_dir):
    """Affine int8 embedding quantization (similarity.quantize_embeddings):
    scan-stage array expressions only; floor-based levels so the full
    quantized arrays hash-match the DuckDB twin."""
    prep_session(spark)
    return similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))


SQL_QUANTIZE = """
WITH base AS (SELECT vec_id,
                     list_transform(embedding, x -> cast(x AS double)) AS v
              FROM embeddings),
mm AS (SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM base)
SELECT vec_id, vmin, vmax,
       list_transform(v, x -> CASE WHEN vmax = vmin THEN 0
         ELSE least(255, cast(floor((x - vmin) / (vmax - vmin) * 256) AS bigint))
         END) AS q
FROM mm
"""


def q_quality_above_median(spark, sf_dir):
    """Quantile-threshold curation: keep documents strictly above their
    source's median quality (the 'drop the worse half of every domain'
    primitive). Per-source medians are a source-cardinality aggregate
    broadcast back onto the corpus — the corpus itself never shuffles;
    the rounded score (6 dp, both engines) keeps the > comparison
    cross-engine stable. Exact interpolated percentile for the oracle;
    approx_percentile is the drop-in at 100 TB."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", text.quality_score(F.col("text")).alias("quality")
    )
    med = scored.groupBy("source").agg(
        F.round(F.expr("percentile(quality, 0.5)"), 6).alias("med")
    )
    return (
        scored.join(F.broadcast(med), "source")
        .where(F.col("quality") > F.col("med"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
    )


def _sql_quality_above_median() -> str:
    quality = SQL_QUALITY.strip().rstrip(";")
    return (
        f"WITH q AS ({quality}),\n"
        "scored AS (SELECT q.doc_id, d.source, q.quality\n"
        "           FROM q JOIN documents d USING (doc_id)),\n"
        "med AS (SELECT source, round(quantile_cont(quality, 0.5), 6) AS med\n"
        "        FROM scored GROUP BY source)\n"
        "SELECT source, count(*) AS n_kept,\n"
        "  md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) AS id_digest\n"
        "FROM scored JOIN med USING (source)\n"
        "WHERE quality > med GROUP BY source"
    )


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity join (terms.tfidf_cosine_pairs):
    exact lexical near-dup pairs via a token-keyed self-join of unit
    vectors — the no-embeddings complement of the ANN path. df cap ON by
    default (auto = max(1000, 1% of docs); a no-op at oracle scale, so
    the SQL twin matches with and without the arm)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.tfidf_cosine_pairs(d, "text", "doc_id", threshold=0.9)


SQL_TFIDF_COSINE = f"""
WITH tokd AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS token FROM tokd),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
cap AS (SELECT greatest(1000, count(*) // 5) AS max_df FROM documents),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token
          HAVING count(*) <= (SELECT max_df FROM cap)),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (SELECT doc_id, token,
        (tf / (sum(tf) OVER (PARTITION BY doc_id)))
          * ln(n.n_docs / dfreq.df) AS w
      FROM tf JOIN dfreq USING (token) CROSS JOIN n),
u AS (SELECT doc_id, token,
        w / sqrt(sum(CAST(round(w * w * 1e12) AS BIGINT))
                 OVER (PARTITION BY doc_id) / 1e12) AS u
      FROM w)
SELECT a.doc_id AS a, b.doc_id AS b,
       (CAST((CASE WHEN (sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) < 0 THEN -CAST(round(((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) - ((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) % 1000000)) / CAST(1000000 AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) - ((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) % 1000000)) / CAST(1000000 AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS cosine
FROM u a JOIN u b ON a.token = b.token AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING (CAST((CASE WHEN (sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) < 0 THEN -CAST(round(((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) - ((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) % 1000000)) / CAST(1000000 AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) - ((abs(sum(CAST(round(a.u * b.u * 1e12) AS BIGINT))) + 500000) % 1000000)) / CAST(1000000 AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.9
"""


def q_chunk_windows(spark, sf_dir):
    """Context-window chunking (packing.chunk_windows): overlapping
    max_len=32/stride=24 token windows per document — scan-stage only,
    zero shuffles."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.packing import chunk_windows

    return chunk_windows(_t(spark, sf_dir, "documents"), max_len=32, stride=24)


def _sql_chunk_windows() -> str:
    from csvs_to_sqlite_spark.operators.packing import chunk_windows_sql

    return chunk_windows_sql(max_len=32, stride=24)


# shared between q_table_profile and its oracle (ADVICE_r02 pattern: one
# source of truth so neither side can silently drift)
_PROFILE_NUM = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
_PROFILE_STR = ["l_returnflag", "l_linestatus", "l_ship_s"]


def q_table_profile(spark, sf_dir):
    """ANALYZE-style per-column stats (operators/profile.py): unpivot to
    long format + one groupBy(col_name) with exact NDV; timestamps are
    profiled through their rendered string. ``approx=True`` is the
    100 TB path (HLL NDV, unit-tested)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.profile import profile

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "l_ship_s", F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")
    )
    return profile(li, _PROFILE_NUM, _PROFILE_STR)


def _sql_table_profile() -> str:
    from csvs_to_sqlite_spark.operators.profile import profile_sql

    table = ("(SELECT *, strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_ship_s"
             " FROM lineitem)")
    return profile_sql(table, _PROFILE_NUM, _PROFILE_STR)


def q_streaming_interval_join(spark, sf_dir):
    """Stream-stream event-time interval join
    (streaming/windows.py::streaming_interval_join): purchases attributed
    to the same user's views within 24h, per-user pair counts + exact
    integer gap sums. Oracle = the batch interval self-join."""
    prep_session(spark)
    from csvs_to_sqlite_spark.streaming.windows import streaming_interval_join

    return streaming_interval_join(spark, f"{sf_dir}/events.parquet")


SQL_STREAM_INTERVAL_JOIN = """
SELECT l.user_id, count(*) AS n_pairs,
       cast(sum(date_diff('second', l.ts, r.ts)) AS bigint) AS sum_gap_s
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'view' AND r.event_type = 'purchase'
 AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 24 HOUR
GROUP BY l.user_id
"""


def q_chunk_dedup(spark, sf_dir):
    """Substring-level exact dedup (dedup.chunk_dedup): fixed-width token
    chunks, keep each repeated chunk's globally-first occurrence, digest
    the reconstructed per-doc text. One chunk-keyed window shuffle + one
    per-doc reassembly groupBy."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.chunk_dedup(d, "text", "doc_id", width=10)


SQL_CHUNK_DEDUP = f"""
WITH tokd AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
chunked AS (
  SELECT doc_id, cast(ceil(len(toks) / 10.0) AS bigint) AS n_chunks,
         unnest(list_transform(range(0, cast(ceil(len(toks) / 10.0) AS int)),
                i -> {{'idx': i, 'txt': array_to_string(toks[i*10+1 : i*10+10], ' ')}})) AS u
  FROM tokd),
chunks AS (SELECT doc_id, n_chunks, u.idx AS chunk_idx, u.txt AS chunk FROM chunked),
kept AS (
  SELECT * FROM (
    SELECT chunks.*, row_number() OVER (PARTITION BY chunk
                                        ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks) t WHERE rn = 1)
SELECT doc_id, n_chunks, count(*) AS n_kept,
       md5(string_agg(chunk, ' ' ORDER BY chunk_idx)) AS clean_digest
FROM kept GROUP BY doc_id, n_chunks
"""


def q_shard_manifest(spark, sf_dir):
    """Deterministic sharded-export manifest (splits.shard_manifest):
    md5-stable shard assignment verified per-row via ordered id digests.
    The actual partitioned-parquet writer (sinks.parquet_sink.write_shards)
    shares this assignment and is unit-tested."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return splits.shard_manifest(d, "doc_id", n_shards=8)


SQL_SHARD_MANIFEST = f"""
WITH s AS (SELECT {splits.shard_assignment_sql('doc_id', 8)} AS shard, doc_id
           FROM documents)
SELECT shard, count(*) AS n_rows,
       md5(string_agg(cast(doc_id AS varchar), ',' ORDER BY doc_id)) AS id_digest
FROM s GROUP BY shard
"""


def q_shard_balance(spark, sf_dir):
    """Per-shard composition audit (splits.shard_balance_audit): total
    variation distance of each shard's source distribution vs the
    corpus's, as one exact integer rational per shard — the
    pre-training-run check that no shard starves the loader of a
    source. Fact table never joins; rollups are (shards × sources)."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return splits.shard_balance_audit(d, "doc_id", "source", n_shards=8)


def _sql_shard_balance() -> str:
    # absent groups deviate by c_g·n_s each: dev folds present groups,
    # (n_total − c_present)·n_rows adds the rest (mirrors the Spark fold)
    tvd = qmath.sql_qdiv_count(
        "((dev + (n_total - c_present) * n_rows) * 1000000)",
        "(n_rows * n_total * 2)",
        1,
        6,
    )
    return f"""
WITH keyed AS (SELECT {splits.shard_assignment_sql('doc_id', 8)} AS shard, source AS g
               FROM documents),
sg AS (SELECT shard, g, count(*) AS o FROM keyed GROUP BY shard, g),
corpus AS (SELECT g, count(*) AS c FROM keyed GROUP BY g),
total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM corpus),
sizes AS (SELECT shard, CAST(sum(o) AS BIGINT) AS n_rows FROM sg GROUP BY shard),
dev AS (
  SELECT sg.shard,
         max(sizes.n_rows) AS n_rows,
         max(total.n_total) AS n_total,
         CAST(sum(abs(sg.o * total.n_total - corpus.c * sizes.n_rows)) AS BIGINT) AS dev,
         CAST(sum(corpus.c) AS BIGINT) AS c_present
  FROM sg
  JOIN sizes ON sg.shard = sizes.shard
  JOIN corpus ON sg.g = corpus.g
  CROSS JOIN total
  GROUP BY sg.shard)
SELECT shard, n_rows, {tvd} AS tvd FROM dev
"""


def q_corpus_stats(spark, sf_dir):
    """Per-source unigram diversity (terms.corpus_stats): token/type
    counts, type-token ratio, unigram entropy. Two map-side-combined
    aggregates, no windows or joins."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.corpus_stats(d, "text", "source")


SQL_CORPUS_STATS = f"""
WITH tokd AS (SELECT source, {_TOKENS} AS toks FROM documents),
tok AS (SELECT source, unnest(toks) AS token FROM tokd),
cnt AS (SELECT source, token, count(*) AS c FROM tok GROUP BY source, token)
SELECT source, cast(sum(c) AS bigint) AS n_tokens, count(*) AS n_types,
       (CAST((CASE WHEN ((count(*) * 1000000)) < 0 THEN -CAST(round(((abs((count(*) * 1000000)) * 2 + ((sum(c)) * 1)) - ((abs((count(*) * 1000000)) * 2 + ((sum(c)) * 1)) % (((sum(c)) * 1) * 2))) / CAST((((sum(c)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((count(*) * 1000000)) * 2 + ((sum(c)) * 1)) - ((abs((count(*) * 1000000)) * 2 + ((sum(c)) * 1)) % (((sum(c)) * 1) * 2))) / CAST((((sum(c)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS type_token_ratio,
       round(ln(cast(sum(c) AS double))
             - (sum(CAST(round(c * ln(c) * 1e6) AS BIGINT)) / 1e6)
               / cast(sum(c) AS double), 6) AS entropy
FROM cnt GROUP BY source
"""


def q_pagerank(spark, sf_dir):
    """PageRank over the MinHash near-duplicate graph
    (operators/graph.py::pagerank): the centrality score of each document
    inside its duplicate family — the canonical-survivor ranking when
    provenance is equal. 3 damped rounds; per round one node-keyed join +
    one destination-keyed aggregate over the (sparse) edge list, lineage
    cut per round. Ordered neighbor folds + per-round 12 dp rounding keep
    the oracle (the same rounds unrolled as chained CTEs) bit-identical."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, "text", "doc_id")
    return pagerank(pairs, "id_a", "id_b", rounds=3)


def _sql_pagerank() -> str:
    from csvs_to_sqlite_spark.operators.graph import pagerank_sql

    return pagerank_sql(_sql_minhash_pairs(), "id_a", "id_b", rounds=3)


def _scd2_runs(e):
    """Shared run-length SCD-2 builder over an (event_id, ts, user_id,
    event_type) frame — see q_scd2_history for semantics/plan shape."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "chg",
        F.when(F.lag("event_type").over(w) == F.col("event_type"), 0).otherwise(1),
    )
    runs = (
        flagged.withColumn(
            "version",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .groupBy("user_id", "version")
        .agg(
            F.min("event_type").alias("state"),
            F.min("ts").alias("valid_from"),
            F.count("*").cast("long").alias("n_merged"),
        )
    )
    w_runs = Window.partitionBy("user_id").orderBy("version")
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(w_runs)
    ).select(
        "user_id",
        "version",
        "state",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "n_merged",
    )


def q_scd2_history(spark, sf_dir):
    """SCD-2 state history (the versioned complement of the SCD-1 merge
    in q_merge_upsert): each user's event_type stream collapses into
    validity intervals — consecutive duplicate states merge into one row
    carrying (valid_from, valid_to, is_current, n_merged). This is the
    slowly-changing-dimension table a warehouse keeps for point-in-time
    joins.

    Plan shape: run-length encoding via one user-keyed lag flag + one
    user-keyed cumulative sum (same window, computed in one pass), a
    (user, run)-keyed aggregate, and a user-keyed lead for the interval
    close — every window is partitioned by the entity, no global
    ordering anywhere."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    return _scd2_runs(e)


def _sql_scd2_from(relation: str) -> str:
    """DuckDB twin of _scd2_runs, parameterized over the source relation
    so the point-in-time join can reuse it on a filtered stream."""
    return f"""
WITH f AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) = event_type THEN 0 ELSE 1 END AS chg
  FROM {relation}),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS version FROM f),
runs AS (SELECT user_id, CAST(version AS BIGINT) AS version,
                min(event_type) AS state, min(ts) AS valid_from,
                CAST(count(*) AS BIGINT) AS n_merged
         FROM g GROUP BY user_id, version),
hist AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id
               ORDER BY version) AS valid_to FROM runs)
SELECT user_id, version, state, valid_from, valid_to,
       valid_to IS NULL AS is_current, n_merged
FROM hist
"""


SQL_SCD2 = _sql_scd2_from("events")


def q_pit_join(spark, sf_dir):
    """Point-in-time enrichment against the SCD-2 history — THE query an
    SCD-2 table exists for: each purchase event joins the state interval
    (built from the user's NON-purchase events) that contains its
    timestamp: valid_from <= ts < valid_to (current interval open-ended).
    Reports per (user, version, state) purchase counts + value sums.

    Plan shape: both sides shuffle once keyed user_id; the interval
    predicate is evaluated inside the user-keyed sort-merge join (state
    intervals per user are few, so per-key fan-out is bounded); one
    (user, version)-keyed aggregate after."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    hist = _scd2_runs(
        e.where(F.col("event_type") != "purchase").select(
            "event_id", "ts", "user_id", "event_type"
        )
    ).select(
        F.col("user_id").alias("h_user"), "version", "state",
        "valid_from", "valid_to",
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("f_user"), F.col("ts").alias("f_ts"), "value"
    )
    joined = facts.join(
        hist,
        (F.col("f_user") == F.col("h_user"))
        & (F.col("f_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("f_ts") < F.col("valid_to"))),
    )
    return joined.groupBy(
        F.col("h_user").alias("user_id"), "version", "state"
    ).agg(
        F.count("*").alias("n_purchases"),
        qsum(F.col("value"), 100, 4).alias("sum_value"),
    )


def _sql_pit_join() -> str:
    hist = _sql_scd2_from("(SELECT * FROM events WHERE event_type <> 'purchase')")
    return f"""
WITH hist AS ({hist})
SELECT h.user_id, h.version, h.state,
       count(*) AS n_purchases,
       round(sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0, 4) AS sum_value
FROM events e JOIN hist h
  ON e.user_id = h.user_id
 AND e.event_type = 'purchase'
 AND e.ts >= h.valid_from
 AND (h.valid_to IS NULL OR e.ts < h.valid_to)
GROUP BY h.user_id, h.version, h.state
"""


def q_bpe_merges(spark, sf_dir):
    """BPE merge learning (operators/bpe.py, after Sennrich et al. 2016):
    8 merge rounds over the word-frequency dictionary. The corpus is
    scanned ONCE (word counts); every round is vocab-sized — one
    adjacent-pair aggregate + TakeOrdered argmax + a scan-stage fold
    applying the merge. Oracle = the rounds unrolled as chained CTEs with
    recursive-walk merge application."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.bpe import learn_bpe

    d = _t(spark, sf_dir, "documents")
    return learn_bpe(spark, d, "text", n_merges=8)


def _sql_bpe_merges() -> str:
    from csvs_to_sqlite_spark.operators.bpe import learn_bpe_sql

    return learn_bpe_sql("text", n_merges=8)


def q_bpe_encode(spark, sf_dir):
    """Tokenizer application (operators/bpe.py::encode_bpe): the learned
    merges encode the corpus — per-doc word/char/BPE-token counts,
    fertility (tokens per word, the standard tokenizer fitness metric)
    and an md5 digest of the full subword sequence in token order, so
    the oracle verifies the actual encoding, not just its lengths.
    Encoding runs once per DISTINCT word (the learning loop's final
    symbol table), then one broadcast vocab join + one doc-keyed
    aggregate over the corpus."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.bpe import encode_bpe

    d = _t(spark, sf_dir, "documents")
    return encode_bpe(spark, d, "text", id_col="doc_id", n_merges=8)


def _sql_bpe_encode() -> str:
    from csvs_to_sqlite_spark.operators.bpe import encode_bpe_sql

    return encode_bpe_sql("text", n_merges=8)


def q_bpe_roundtrip(spark, sf_dir):
    """Tokenizer losslessness audit (bpe.bpe_roundtrip_report): every
    vocabulary word's subword sequence must rejoin to the word exactly —
    the oracle proves n_mismatch = 0 over the shared learning CTE chain,
    occurrence-weighted. Dimension-sized: the corpus pays only the word
    count scan learning already does."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.bpe import bpe_roundtrip_report

    d = _t(spark, sf_dir, "documents")
    return bpe_roundtrip_report(spark, d, "text", n_merges=8)


def _sql_bpe_roundtrip() -> str:
    from csvs_to_sqlite_spark.operators.bpe import bpe_roundtrip_sql

    return bpe_roundtrip_sql("text", n_merges=8)


def q_event_anomaly(spark, sf_dir):
    """Time-series anomaly flags: daily event counts per type whose
    z-score vs that type's daily distribution is ≥ 2 in magnitude — the
    stream-health alarm a pipeline runs over its ingest volumes.

    Determinism: mean/std derive from exact integer (n, Σc, Σc²) via the
    textbook formula — no float accumulation order anywhere — and the
    z-score is rounded to 6 dp. Plan: one (type, day) count aggregate,
    one type-keyed stats aggregate (cardinality = n_types) broadcast
    back; the fact stream shuffles once."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    daily = (
        e.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(F.count("*").alias("c"))
    )
    # sum_c2 accumulates in decimal(38,0) (exact, like DuckDB's HUGEINT)
    # and sum_c squares through DOUBLE on both sides — int64 c*c would
    # silently wrap at ~3e9 events/type under ansi=off while the oracle
    # stayed exact (review finding)
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("c").alias("sum_c"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("sum_c2"),
    )
    sum_c_d = F.col("sum_c").cast("double")
    z = F.round(
        (F.col("c") - F.col("sum_c") / F.col("n_days"))
        / F.sqrt(
            (F.col("sum_c2") - sum_c_d * sum_c_d / F.col("n_days"))
            / (F.col("n_days") - 1)
        ),
        6,
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("n_events"),
            z.alias("z_score"),
        )
        .where(F.abs(F.col("z_score")) >= 2.0)
    )


SQL_EVENT_ANOMALY = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
               FROM events GROUP BY event_type, CAST(ts AS DATE)),
stats AS (SELECT event_type, count(*) AS n_days, sum(c) AS sum_c,
                 CAST(sum((c::HUGEINT) * c) AS DOUBLE) AS sum_c2
          FROM daily GROUP BY event_type),
scored AS (
  SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
         CAST(c AS BIGINT) AS n_events,
         round((c - sum_c / n_days)
               / sqrt((sum_c2 - (sum_c::DOUBLE) * (sum_c::DOUBLE) / n_days)
                      / (n_days - 1)),
               6) AS z_score
  FROM daily JOIN stats USING (event_type))
SELECT * FROM scored WHERE abs(z_score) >= 2.0
"""


def q_user_growth(spark, sf_dir):
    """Cumulative-distinct growth curve: per day, how many users were
    seen for the FIRST time, and the running total of distinct users to
    date — one per-user min(ts) aggregate, one per-day count, then the
    two-phase distributed cumsum over the day-cardinality rollup (no
    single-partition window; the fact stream never sees any window)."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    per_day = firsts.groupBy("first_day").agg(F.count("*").alias("n_new_users"))
    # running distinct-user total via the two-phase distributed cumsum
    # (rowid.global_cumsum) — no single-partition window over the
    # day-cardinality rollup
    from csvs_to_sqlite_spark.operators.rowid import global_cumsum

    return global_cumsum(per_day, ["first_day"], "n_new_users", "cum_users").select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "n_new_users",
        "cum_users",
    )


SQL_USER_GROWTH = """
WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
                FROM events GROUP BY user_id),
per_day AS (SELECT first_day, count(*) AS n_new_users
            FROM firsts GROUP BY first_day)
SELECT strftime(first_day, '%Y-%m-%d') AS day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY first_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM per_day
"""


def q_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day (the
    cohort), then for each day-offset k the count and fraction of the
    cohort active k days later — THE product-analytics rollup. All
    exact integers + one final division; plan = one per-user min
    aggregate, one distinct (user, day) activity set, a user-keyed join
    and a (cohort, offset) rollup with the cohort sizes broadcast back."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    activity = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    cells = (
        activity.join(firsts, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").alias("day_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            "cohort_size",
            qmath.qdiv_count(
                F.col("n_active") * F.lit(1_000_000), F.col("cohort_size"), 1, 6
            ).alias("retention"),
        )
    )


SQL_RETENTION = """
WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
                FROM events GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
sizes AS (SELECT cohort, count(*) AS cohort_size FROM firsts GROUP BY cohort),
cells AS (SELECT cohort, date_diff('day', cohort, day) AS day_offset,
                 CAST(count(*) AS BIGINT) AS n_active
          FROM activity JOIN firsts USING (user_id)
          GROUP BY cohort, date_diff('day', cohort, day))
SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
       CAST(day_offset AS BIGINT) AS day_offset, n_active, cohort_size,
       (CAST((CASE WHEN ((n_active * 1000000)) < 0 THEN -CAST(round(((abs((n_active * 1000000)) * 2 + ((cohort_size) * 1)) - ((abs((n_active * 1000000)) * 2 + ((cohort_size) * 1)) % (((cohort_size) * 1) * 2))) / CAST((((cohort_size) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((n_active * 1000000)) * 2 + ((cohort_size) * 1)) - ((abs((n_active * 1000000)) * 2 + ((cohort_size) * 1)) % (((cohort_size) * 1) * 2))) / CAST((((cohort_size) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS retention
FROM cells JOIN sizes USING (cohort)
"""


def q_charwords(spark, sf_dir):
    """Characteristic terms of src0 vs the rest of the corpus by smoothed
    log-odds-ratio (Monroe, Colaresi & Quinn 2008, "Fightin' Words"):
    δ_w = ln((a+0.5)/(A−a+0.5)) − ln((b+0.5)/(B−b+0.5)) over exact
    integer counts, min_count ≥ 5 guarding the hapax tail. Top-15 by
    δ desc / token asc — 'which words make this source sound like
    itself', the per-domain vocabulary profile a mixture report needs.

    Plan: ONE (token) aggregate with conditional sums for both groups
    (corpus read once), a 1-row totals broadcast, TakeOrdered top-k."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("source") == "src0").alias("g"),
        F.explode(
            F.expr(
                "filter(split(lower(trim(text)), '\\\\s+'), t -> t != '')"
            )
        ).alias("t"),
    )
    counts = toks.groupBy("t").agg(
        F.sum(F.when(F.col("g"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("g"), 0).otherwise(1)).cast("long").alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("double").alias("ta"), F.sum("b").cast("double").alias("tb")
    )
    delta = F.round(
        F.log((F.col("a") + 0.5) / (F.col("ta") - F.col("a") + 0.5))
        - F.log((F.col("b") + 0.5) / (F.col("tb") - F.col("b") + 0.5)),
        6,
    )
    return (
        counts.where(F.col("a") + F.col("b") >= 5)
        .crossJoin(F.broadcast(totals))
        .select(F.col("t").alias("token"), "a", "b", delta.alias("log_odds"))
        .orderBy(F.col("log_odds").desc(), F.col("token").asc())
        .limit(15)
    )


SQL_CHARWORDS = """
WITH tok AS (SELECT (source = 'src0') AS g,
                    unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                           '\\s+'), t -> t <> '')) AS t
             FROM documents),
counts AS (SELECT t, CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS b
           FROM tok GROUP BY t),
totals AS (SELECT CAST(sum(a) AS DOUBLE) AS ta, CAST(sum(b) AS DOUBLE) AS tb
           FROM counts),
scored AS (
  SELECT t AS token, a, b,
         round(ln((a + 0.5) / (ta - a + 0.5))
               - ln((b + 0.5) / (tb - b + 0.5)), 6) AS log_odds
  FROM counts CROSS JOIN totals WHERE a + b >= 5)
SELECT * FROM scored ORDER BY log_odds DESC, token ASC LIMIT 15
"""


def q_shingle_novelty(spark, sf_dir):
    """Per-document novelty: the fraction of a document's distinct
    3-gram shingles that appear in NO other document — the
    memorization-risk / boilerplate-inverse signal (1.0 = fully novel
    text, ~0 = assembled from corpus-common fragments). Top-20 least
    novel documents (the dedup-candidate tail).

    Plan shape: one (doc, shingle) posting aggregate (the same inverted
    index the Jaccard join uses), shingle df derived FROM the posting
    table (no second corpus pass), one token-keyed equi-join (no
    broadcast hint — shingle vocabulary scales with the corpus; AQE
    broadcasts it when small) + per-doc rollup; ratio of exact integers
    rounded to 6 dp."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    post = dedup.token_posting(d, "text", "doc_id", shingle_n=3)
    dfreq = post.groupBy("token").agg(F.count("*").alias("df"))
    return (
        post.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            qmath.qdiv_count(
                F.col("n_unique") * F.lit(1_000_000), F.col("n_shingles"), 1, 6
            ).alias("novelty"),
        )
        .orderBy(F.col("novelty").asc(), F.col("doc_id").asc())
        .limit(20)
    )


def _sql_shingle_novelty() -> str:
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    toks = tokens_sql("text", distinct=False)
    return f"""
WITH tokd AS (SELECT doc_id, {toks} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                AS token
       FROM tokd),
dfreq AS (SELECT token, count(*) AS df FROM sh GROUP BY token),
per_doc AS (SELECT doc_id, count(*) AS n_shingles,
                   CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unique
            FROM sh JOIN dfreq USING (token) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_unique,
       (CAST((CASE WHEN ((n_unique * 1000000)) < 0 THEN -CAST(round(((abs((n_unique * 1000000)) * 2 + ((n_shingles) * 1)) - ((abs((n_unique * 1000000)) * 2 + ((n_shingles) * 1)) % (((n_shingles) * 1) * 2))) / CAST((((n_shingles) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((n_unique * 1000000)) * 2 + ((n_shingles) * 1)) - ((abs((n_unique * 1000000)) * 2 + ((n_shingles) * 1)) % (((n_shingles) * 1) * 2))) / CAST((((n_shingles) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS novelty
FROM per_doc ORDER BY novelty ASC, doc_id ASC LIMIT 20
"""


def q_hll_ndv(spark, sf_dir):
    """HyperLogLog per-source distinct-token estimate
    (sketch.hll_ndv, Flajolet et al. 2007). Fully deterministic: md5
    60-bit hashes, integer max-registers, EXACT integer harmonic
    numerator (each register contributes a power of two), one double
    division. Shuffle state is ≤ 256 rows per group at any corpus size —
    the 100 TB NDV tool; the exact-NDV column rides along so the
    sketch's error is itself oracle-checked."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.sketch import hll_ndv

    d = _t(spark, sf_dir, "documents")
    return hll_ndv(d, "text", "source")


def _sql_hll_ndv() -> str:
    from csvs_to_sqlite_spark.operators.sketch import hll_ndv_sql

    return hll_ndv_sql("text", "source")


def q_kmv_sketch(spark, sf_dir):
    """KMV/Theta distinct sketches per source + pairwise union /
    intersection / Jaccard estimates (sketch.kmv_pair_report, Beyer et
    al. 2007). The set-operation tier the sketch family was missing:
    HLL gives per-group NDV, KMV's mergeable K-min summaries also give
    cross-group intersections. md5-deterministic, so every estimate is
    exactly reproduced by the DuckDB twin. Plan: one distinct aggregate,
    one group-keyed top-K window, pair math on K-bounded arrays."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.sketch import kmv_pair_report

    d = _t(spark, sf_dir, "documents")
    return kmv_pair_report(d, "text", "source")


def _sql_kmv_sketch() -> str:
    from csvs_to_sqlite_spark.operators.sketch import kmv_pair_sql

    return kmv_pair_sql("text", "source")


def q_image_phash_dedup(spark, sf_dir):
    """Perceptual-hash (aHash) image near-dup pairs — the multimodal
    member of the dedup family: REAL numpy PPM decode → Rec.601 luma →
    8×8 nearest-neighbor sample → 64-bit average hash as 8 byte-bands,
    paired via a (band_idx, band_value) self-equi-join (pigeonhole:
    hamming ≤ 7 always shares one of 8 bands — the SimHash scaling
    shape, never O(n²)). Every quantity is an exact integer (mean
    comparison as 64·luma > total — no division), so the DuckDB twin
    re-derives the hashes from the md5-seeded gradient closed forms and
    matches bit-for-bit. Exact-copy images are planted (every 4th image
    re-appears under media_id+1000) and must pair at hamming 0."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        image_ahash_pairs,
        synth_ppm_media,
    )

    m = synth_ppm_media(spark, 64)
    aug = m.unionByName(
        m.where(F.col("media_id") % 4 == 0).withColumn(
            "media_id", F.col("media_id") + 1000
        )
    )
    return image_ahash_pairs(aug, max_hamming=7)


def _sql_image_phash_dedup() -> str:
    """Closed-form twin of q_image_phash_dedup: geometry/gradient
    coefficients from md5 bytes (the _sql_image_features technique),
    sampled 8×8 luma via the same (o·src)//8 index maps, bands as exact
    integer bit sums, all-pairs hamming ≤ 7 (equivalent to the banded
    join by the pigeonhole guarantee)."""
    b0, b1, b2, b3, b4 = (_sql_hexbyte(k) for k in range(5))
    return f"""
WITH ids AS (
  SELECT unnest(range(0, 64)) AS i
  UNION ALL
  SELECT 1000 + unnest(range(0, 64, 4)) AS i),
seed AS (
  SELECT i, md5('ppm' || (CASE WHEN i >= 1000 THEN i - 1000 ELSE i END)) AS hh
  FROM ids),
geom AS (
  SELECT i, 8 + {b0} % 9 AS w, 8 + {b1} % 9 AS h,
         1 + {b2} % 5 AS ca, 1 + {b3} % 5 AS cb, {b4} AS cc
  FROM seed),
samp AS (
  SELECT g.i, oy.oy, ox.ox,
         (ox.ox * g.w) // 8 AS sx, (oy.oy * g.h) // 8 AS sy
  FROM geom g
  JOIN LATERAL (SELECT unnest(range(0, 8)) AS oy) oy ON true
  JOIN LATERAL (SELECT unnest(range(0, 8)) AS ox) ox ON true),
lum AS (
  SELECT s.i, s.oy, s.ox,
         299 * ((s.sx * g.ca + s.sy) % 256)
         + 587 * ((s.sy * g.cb + s.sx) % 256)
         + 114 * ((s.sx + s.sy + g.cc) % 256) AS luma
  FROM samp s JOIN geom g ON s.i = g.i),
tot AS (SELECT i, sum(luma) AS total FROM lum GROUP BY i),
bands AS (
  SELECT l.i, l.oy,
         CAST(sum(CASE WHEN 64 * l.luma > t.total
                       THEN 1 << l.ox ELSE 0 END) AS BIGINT) AS val
  FROM lum l JOIN tot t ON l.i = t.i
  GROUP BY l.i, l.oy),
hashes AS (
  SELECT i, list(val ORDER BY oy) AS bands FROM bands GROUP BY i),
pairs AS (
  SELECT a.i AS id_a, b.i AS id_b,
         CAST(list_sum(list_transform(range(1, 9),
              j -> bit_count(xor(a.bands[j], b.bands[j])))) AS BIGINT)
           AS hamming
  FROM hashes a JOIN hashes b ON a.i < b.i)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, hamming
FROM pairs WHERE hamming <= 7 ORDER BY id_a, id_b
"""


def q_audio_fingerprint_exact_dedup(spark, sf_dir):
    """Audio member of the r11 linear exact-dedup family (full
    fingerprint == hamming 0; see q_image_ahash_exact_dedup for why the
    destructive path must be groups, not pairs)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        audio_fingerprint_exact_groups,
        synth_wav_media,
    )

    m = synth_wav_media(spark, 64)
    aug = m.unionByName(
        m.where(F.col("media_id") % 4 == 0).withColumn(
            "media_id", F.col("media_id") + 1000
        )
    )
    out = audio_fingerprint_exact_groups(aug)
    return out.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("rep_id").cast("long").alias("rep_id"),
        F.col("group_size").cast("long").alias("group_size"),
    )


def _sql_audio_fingerprint_exact_dedup() -> str:
    """Twin of q_audio_fingerprint_exact_dedup."""
    return _sql_exact_groups_tail(_sql_audio_fingerprint_dedup())


def q_video_fingerprint_exact_dedup(spark, sf_dir):
    """Video member of the r11 linear exact-dedup family (full
    majority-vote fingerprint == hamming 0)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        synth_ppm_video_media,
        video_fingerprint_exact_groups,
    )

    m = synth_ppm_video_media(spark, 24)
    aug = m.unionByName(
        m.where(F.col("media_id") % 4 == 0).withColumn(
            "media_id", F.col("media_id") + 1000
        )
    )
    out = video_fingerprint_exact_groups(aug)
    return out.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("rep_id").cast("long").alias("rep_id"),
        F.col("group_size").cast("long").alias("group_size"),
    )


def _sql_video_fingerprint_exact_dedup() -> str:
    """Twin of q_video_fingerprint_exact_dedup."""
    return _sql_exact_groups_tail(_sql_video_fingerprint_dedup())


def q_image_ahash_exact_dedup(spark, sf_dir):
    """LINEAR destructive perceptual dedup (r11): group by the FULL
    aHash (all 8 bands == hamming 0) with min-id representative +
    group size — multimodal.band_hash_exact_groups. One constant-width
    shuffle on the hash key, output exactly corpus-sized. Exists because
    pair output is |matching pairs|-sized and near-dup-DENSE corpora
    make that quadratic (the r11 sf10 probe: 6,400 synthetic gradient
    images → 15.2M of 32M possible pairs): at 100 TB destructive image
    dedup routes HERE, with image_ahash_pairs kept for threshold
    calibration — the same pairs/edges split as the text MinHash family.
    Planted exact copies (every 4th image at media_id+1000) must map to
    their original's rep with group_size ≥ 2."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        image_ahash_exact_groups,
        synth_ppm_media,
    )

    m = synth_ppm_media(spark, 64)
    aug = m.unionByName(
        m.where(F.col("media_id") % 4 == 0).withColumn(
            "media_id", F.col("media_id") + 1000
        )
    )
    out = image_ahash_exact_groups(aug)
    return out.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("rep_id").cast("long").alias("rep_id"),
        F.col("group_size").cast("long").alias("group_size"),
    )


def _sql_exact_groups_tail(pair_sql: str) -> str:
    """Generic twin tail for the r11 linear exact-dedup family: reuse a
    pair twin's closed-form hash CTE chain (split before its pairs CTE)
    and group by the full band list via the same string key Spark's
    concat_ws builds."""
    prefix = pair_sql.split(",\npairs AS (")[0]
    return (
        prefix
        + """,
keyed AS (
  SELECT i, array_to_string(bands, ',') AS hkey FROM hashes),
groups AS (
  SELECT hkey, min(i) AS rep_id, count(*) AS group_size
  FROM keyed GROUP BY hkey)
SELECT CAST(k.i AS BIGINT) AS media_id,
       CAST(g.rep_id AS BIGINT) AS rep_id,
       CAST(g.group_size AS BIGINT) AS group_size
FROM keyed k JOIN groups g ON k.hkey = g.hkey
ORDER BY media_id
"""
    )


def _sql_image_ahash_exact_dedup() -> str:
    """Twin of q_image_ahash_exact_dedup (see _sql_exact_groups_tail)."""
    return _sql_exact_groups_tail(_sql_image_phash_dedup())


def q_audio_fingerprint_dedup(spark, sf_dir):
    """Audio near-dup pairs over a 64-bit windowed-energy fingerprint —
    the second modality of the perceptual-dedup family (multimodal.py
    audio_energy_bands / band_hash_pairs): REAL RIFF/PCM decode, 64
    equal windows via the (k·64)//n index map, exact integer Σv² window
    energies, bit w set when 64·E_w > total — no division, no floats.
    Same pigeonhole-complete (band_idx, value) posting-list join as the
    image aHash path. Exact-copy clips are planted (every 4th clip under
    media_id+1000) and must pair at hamming 0; the DuckDB twin
    re-derives every fingerprint from the md5-seeded sine closed forms."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        synth_wav_media,
    )

    m = synth_wav_media(spark, 64)
    aug = m.unionByName(
        m.where(F.col("media_id") % 4 == 0).withColumn(
            "media_id", F.col("media_id") + 1000
        )
    )
    return audio_fingerprint_pairs(aug, max_hamming=7)


def _sql_audio_fingerprint_dedup() -> str:
    b0, b1, b2 = (_sql_hexbyte(k) for k in range(3))
    return f"""
WITH ids AS (
  SELECT unnest(range(0, 64)) AS i
  UNION ALL
  SELECT 1000 + unnest(range(0, 64, 4)) AS i),
seed AS (
  SELECT i, md5('wav' || (CASE WHEN i >= 1000 THEN i - 1000 ELSE i END)) AS hh
  FROM ids),
geom AS (
  SELECT i, ([8000, 16000, 22050, 44100])[1 + {b0} % 4] AS rate,
         110.0 * (1 + {b1} % 8) AS freq,
         0.05 + ({b2} % 10) / 100.0 AS dur
  FROM seed),
g2 AS (SELECT i, rate, freq,
              CAST(trunc(rate * dur) AS BIGINT) AS n FROM geom),
pcm AS (
  SELECT g.i, k.k, g.n,
         CAST(trunc((0.5 * sin(((2 * pi()) * g.freq)
                               * (k.k / CAST(g.rate AS DOUBLE))))
                    * 32767.0) AS BIGINT) AS v
  FROM g2 g JOIN LATERAL (SELECT unnest(range(0, g.n)) AS k) k ON true),
energies AS (
  SELECT i, (k * 64) // n AS w, CAST(sum(v * v) AS BIGINT) AS e
  FROM pcm GROUP BY i, (k * 64) // n),
tot AS (SELECT i, CAST(sum(e) AS BIGINT) AS total FROM energies GROUP BY i),
grid AS (
  SELECT s.i, j.j, x.x FROM seed s
  JOIN LATERAL (SELECT unnest(range(0, 8)) AS j) j ON true
  JOIN LATERAL (SELECT unnest(range(0, 8)) AS x) x ON true),
bands AS (
  SELECT g.i, g.j,
         CAST(sum(CASE WHEN 64 * coalesce(e.e, 0) > t.total
                       THEN 1 << g.x ELSE 0 END) AS BIGINT) AS val
  FROM grid g
  JOIN tot t ON g.i = t.i
  LEFT JOIN energies e ON e.i = g.i AND e.w = g.j * 8 + g.x
  GROUP BY g.i, g.j),
hashes AS (
  SELECT i, list(val ORDER BY j) AS bands FROM bands GROUP BY i),
pairs AS (
  SELECT a.i AS id_a, b.i AS id_b,
         CAST(list_sum(list_transform(range(1, 9),
              j -> bit_count(xor(a.bands[j], b.bands[j])))) AS BIGINT)
           AS hamming
  FROM hashes a JOIN hashes b ON a.i < b.i)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, hamming
FROM pairs WHERE hamming <= 7 ORDER BY id_a, id_b
"""


def q_video_fingerprint_dedup(spark, sf_dir):
    """Video near-dup pairs — the third perceptual-dedup modality
    (multimodal.video_fingerprint_bands): REAL PV01 frame decode,
    per-frame aHash bit grids folded by MAJORITY VOTE across frames
    (2·votes > n_frames — integer-only, robust to trimming a few
    frames), paired via the shared band_hash_pairs posting-list join.
    Every 4th clip is planted again under media_id+1000 and must pair at
    hamming 0; the DuckDB twin re-derives every fingerprint from the
    md5-seeded per-frame gradient closed forms."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.multimodal import (
        synth_ppm_video_media,
        video_fingerprint_pairs,
    )

    m = synth_ppm_video_media(spark, 24)
    aug = m.unionByName(
        m.where(F.col("media_id") % 4 == 0).withColumn(
            "media_id", F.col("media_id") + 1000
        )
    )
    return video_fingerprint_pairs(aug, max_hamming=7)


def _sql_video_fingerprint_dedup() -> str:
    b0, b1, b2, b3, b4, b5 = (_sql_hexbyte(k) for k in range(6))
    return f"""
WITH ids AS (
  SELECT unnest(range(0, 24)) AS i
  UNION ALL
  SELECT 1000 + unnest(range(0, 24, 4)) AS i),
seed AS (
  SELECT i, md5('vid' || (CASE WHEN i >= 1000 THEN i - 1000 ELSE i END)) AS hh
  FROM ids),
geom AS (
  SELECT i, 8 + {b0} % 5 AS w, 8 + {b1} % 5 AS h,
         1 + {b2} % 3 AS ca, 1 + {b3} % 3 AS cb, {b4} AS cc,
         4 + {b5} % 5 AS nf
  FROM seed),
samp AS (
  SELECT g.i, g.nf, f.f, oy.oy, ox.ox,
         (ox.ox * g.w) // 8 AS sx, (oy.oy * g.h) // 8 AS sy
  FROM geom g
  JOIN LATERAL (SELECT unnest(range(0, g.nf)) AS f) f ON true
  JOIN LATERAL (SELECT unnest(range(0, 8)) AS oy) oy ON true
  JOIN LATERAL (SELECT unnest(range(0, 8)) AS ox) ox ON true),
lum AS (
  SELECT s.i, s.nf, s.f, s.oy, s.ox,
         299 * ((s.sx * g.ca + s.sy + s.f) % 256)
         + 587 * ((s.sy * g.cb + s.sx + s.f) % 256)
         + 114 * ((s.sx + s.sy + g.cc + s.f) % 256) AS luma
  FROM samp s JOIN geom g ON s.i = g.i),
ftot AS (SELECT i, f, sum(luma) AS total FROM lum GROUP BY i, f),
votes AS (
  SELECT l.i, l.nf, l.oy, l.ox,
         sum(CASE WHEN 64 * l.luma > t.total THEN 1 ELSE 0 END) AS v
  FROM lum l JOIN ftot t ON l.i = t.i AND l.f = t.f
  GROUP BY l.i, l.nf, l.oy, l.ox),
bands AS (
  SELECT i, oy,
         CAST(sum(CASE WHEN 2 * v > nf THEN 1 << ox ELSE 0 END) AS BIGINT)
           AS val
  FROM votes GROUP BY i, oy),
hashes AS (
  SELECT i, list(val ORDER BY oy) AS bands FROM bands GROUP BY i),
pairs AS (
  SELECT a.i AS id_a, b.i AS id_b,
         CAST(list_sum(list_transform(range(1, 9),
              j -> bit_count(xor(a.bands[j], b.bands[j])))) AS BIGINT)
           AS hamming
  FROM hashes a JOIN hashes b ON a.i < b.i)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, hamming
FROM pairs WHERE hamming <= 7 ORDER BY id_a, id_b
"""


def q_totalprice_conformance(spark, sf_dir):
    """Derived-VALUE conformance audit across tables: does
    o_totalprice equal the sum of its lineitems'
    extendedprice·(1+tax)·(1−discount)? (The TPC-H invariant — the
    cross-table generalization of derived_column_conformance.) All
    arithmetic is exact: 2-dp money/rates become integer cents /
    percent-cents, each line's charge is the exact integer
    e_c·(100+t_c)·(100−d_c) in 1e-4-cent units, summed per order and
    diffed against o_totalprice scaled to the same units. One
    orderkey-keyed aggregate + one fact-fact join (the Q3 shuffle
    shape); output is a 1-row summary of exact/over/under counts and
    the worst absolute drift."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    e_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    t_c = F.round(F.col("l_tax") * 100).cast("long")
    d_c = F.round(F.col("l_discount") * 100).cast("long")
    per_order = (
        li.select(
            "l_orderkey",
            (e_c * (F.lit(100) + t_c) * (F.lit(100) - d_c)).alias("charge_u"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("charge_u").cast("long").alias("sum_u"))
    )
    tp_u = (F.round(F.col("o_totalprice") * 100).cast("long") * 10000).alias(
        "tp_u"
    )
    j = per_order.join(
        o.select(F.col("o_orderkey").alias("l_orderkey"), tp_u), "l_orderkey"
    )
    diff = F.col("sum_u") - F.col("tp_u")
    return j.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(diff == 0, 1).otherwise(0)).cast("long").alias("n_exact"),
        F.sum(F.when(diff > 0, 1).otherwise(0)).cast("long").alias("n_over"),
        F.sum(F.when(diff < 0, 1).otherwise(0)).cast("long").alias("n_under"),
        F.max(F.abs(diff)).cast("long").alias("max_abs_diff_u"),
    )


SQL_TOTALPRICE_CONFORMANCE = """
WITH per_order AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 + CAST(round(l_tax * 100) AS BIGINT))
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS sum_u
  FROM lineitem GROUP BY l_orderkey),
j AS (SELECT sum_u,
             CAST(round(o_totalprice * 100) AS BIGINT) * 10000 AS tp_u
      FROM per_order JOIN orders ON l_orderkey = o_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN sum_u - tp_u = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(sum(CASE WHEN sum_u - tp_u > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over,
       CAST(sum(CASE WHEN sum_u - tp_u < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_under,
       CAST(max(abs(sum_u - tp_u)) AS BIGINT) AS max_abs_diff_u
FROM j
"""


def _benford_shares_milli() -> list[tuple[int, float]]:
    """Benford expected shares as 6-dp literals computed ONCE in Python
    and inlined into BOTH engines' plans (the classifier_weights shared-
    literal pattern — no engine-side log10, so no libm drift)."""
    import math

    return [(d, round(math.log10(1 + 1 / d), 6)) for d in range(1, 10)]


def q_digit_benford(spark, sf_dir):
    """Benford first-significant-digit audit of extended prices — the
    classic fabricated-data / truncation-artifact screen. The digit is
    the leading character of the exact integer cents (string head — no
    float log anywhere); counts are exact, shares go through qmath, and
    the Benford expectation enters both engines as shared 6-dp literals.
    One map-side-combined 9-group aggregate: free at any scale."""
    prep_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    c = F.round(F.col("l_extendedprice") * 100).cast("long")
    digit = F.substring(c.cast("string"), 1, 1).cast("long")
    counts = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("t"))
    exp_map = F.create_map(
        *[x for d, s in _benford_shares_milli() for x in (F.lit(d), F.lit(s))]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            qmath.qdiv_count(F.col("n") * 1_000_000, F.col("t"), 1, 6).alias(
                "share"
            ),
            exp_map[F.col("digit")].alias("benford_share"),
        )
        .withColumn("delta", F.col("share") - F.col("benford_share"))
        .orderBy("digit")
    )


def _sql_digit_benford() -> str:
    share = qmath.sql_qdiv_count("(n * 1000000)", "t", 1, 6)
    cases = " ".join(
        f"WHEN {d} THEN {s}" for d, s in _benford_shares_milli()
    )
    return f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
SELECT digit, n, {share} AS share,
       CAST(CASE digit {cases} END AS DOUBLE) AS benford_share,
       {share} - CAST(CASE digit {cases} END AS DOUBLE) AS delta
FROM counts CROSS JOIN tot ORDER BY digit
"""


def q_source_lang_mi(spark, sf_dir):
    """Mutual information between source and lang — the metadata-
    dependence audit (MI ≈ 0 means language is balanced across sources;
    high MI flags sources that are single-language silos, which breaks
    language-stratified splits). One (source, lang) count aggregate;
    the ni/nj marginals ride PARTITIONED window sums over the aggregate
    (keyed by source / lang — never a single-partition WindowExec, the
    suite-wide 100 TB guard), and the two grand totals are broadcast
    1-row aggregates crossJoined back on. The totals' subtrees are
    plan-copies of the probe side with NO extra predicates (crossJoin
    inserts none), so AQE stage reuse dedups them at runtime: the
    executed plan carries ONE corpus scan (ReusedExchange on the cells
    exchange — tests/test_plans.py pins this on the final adaptive
    plan), where the r10 join form re-derived the cells subtree 16x.
    Each cell's p_ij·ln(p_ij·N²/(n_i·n_j)) term is quantized to
    1e-9-unit longs and summed order-free (the PSI/entropy precedent).
    All counts exact; the window/aggregate sums are the same order-free
    long sums the rollups computed."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    cells = assert_dimension_sized(
        d.groupBy("source", "lang").agg(
            F.count("*").cast("long").alias("nij")
        ),
        "source_lang_mi.cells (#sources x #langs)",
    )
    tot = cells.agg(F.sum("nij").cast("long").alias("n"))
    j = cells.select(
        "source",
        "lang",
        "nij",
        F.sum("nij").over(Window.partitionBy("source")).cast("long").alias("ni"),
        F.sum("nij").over(Window.partitionBy("lang")).cast("long").alias("nj"),
    ).crossJoin(F.broadcast(tot))
    pij = F.col("nij").cast("double") / F.col("n").cast("double")
    ratio = (
        F.col("nij").cast("double") * F.col("n").cast("double")
    ) / (F.col("ni").cast("double") * F.col("nj").cast("double"))
    term_q = F.round(pij * F.log(ratio) * 1e9).cast("long")
    rows = j.select(
        "source", "lang", "nij", "ni", "nj", term_q.alias("mi_term_nano")
    )
    t = rows.agg(F.sum("mi_term_nano").cast("long").alias("t"))
    return (
        rows.crossJoin(F.broadcast(t))
        .select(
            "source",
            "lang",
            "nij",
            "ni",
            "nj",
            (F.col("mi_term_nano").cast("double") / F.lit(1e9)).alias("mi_term"),
            (F.col("t").cast("double") / F.lit(1e9)).alias("mi_total"),
        )
        .orderBy("source", "lang")
    )


SQL_SOURCE_LANG_MI = """
WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nij
               FROM documents GROUP BY 1, 2),
ms AS (SELECT source, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
ml AS (SELECT lang, CAST(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
j AS (SELECT source, lang, nij, ni, nj,
             CAST(round((CAST(nij AS DOUBLE) / CAST(n AS DOUBLE))
                        * ln((CAST(nij AS DOUBLE) * CAST(n AS DOUBLE))
                             / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
                        * 1e9) AS BIGINT) AS mi_term_nano
      FROM cells JOIN ms USING (source) JOIN ml USING (lang) CROSS JOIN tot),
tm AS (SELECT CAST(sum(mi_term_nano) AS BIGINT) AS t FROM j)
SELECT source, lang, nij, ni, nj,
       CAST(mi_term_nano AS DOUBLE) / 1e9 AS mi_term,
       CAST(t AS DOUBLE) / 1e9 AS mi_total
FROM j CROSS JOIN tm ORDER BY source, lang
"""


def q_value_hour_corr(spark, sf_dir):
    """Pearson correlation between event value and hour-of-day per type —
    the feature-leakage / seasonality audit. Everything up to the final
    expression is EXACT integer arithmetic: x = cents, y = hour, the five
    sums ride one map-side-combined aggregate in decimal(38,0) (n·Σx²
    overflows int64 at real scales — the event_anomaly precedent), and
    r = num / (sqrt(d1)·sqrt(d2)) is the sqrt-based safe float class —
    bit-identical across engines with no round()."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    x = F.round(F.col("value") * 100).cast("long")
    y = F.hour("ts").cast("long")
    dec = lambda c: c.cast("decimal(38,0)")
    agg = e.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "event_type",
        "n",
        (num / (F.sqrt(d1) * F.sqrt(d2))).alias("pearson_r"),
    ).orderBy("event_type")


SQL_VALUE_HOUR_CORR = """
WITH base AS (SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS x,
                     CAST(hour(ts) AS BIGINT) AS y
              FROM events),
agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM base GROUP BY event_type)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE) /
         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
FROM agg ORDER BY event_type
"""


def q_activity_gini(spark, sf_dir):
    """Gini coefficient of per-user event-count concentration per type —
    the hot-key / whale-user inequality audit (0 = uniform, →1 = one
    user dominates). Formula on ASCENDING-sorted counts c_1..c_m:
    G = 2·Σ i·c_i / (m·Σc) − (m+1)/m. Σ i·c_i and all totals are exact
    integers off one rank window over the (type, user) rollup (window
    sees user-cardinality rows, never the fact stream); the final
    expression is two mirrored divisions and one subtraction — no
    round(), bit-identical across engines."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").asc(), F.col("user_id").asc()
    )
    ranked = per_user.withColumn("i", F.row_number().over(w).cast("long"))
    g = ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("iweighted"),
    )
    m = F.col("m").cast("double")
    gini = (
        F.lit(2.0) * F.col("iweighted").cast("double")
        / (m * F.col("total").cast("double"))
        - (m + F.lit(1.0)) / m
    )
    return g.select("event_type", "m", "total", gini.alias("gini")).orderBy(
        "event_type"
    )


SQL_ACTIVITY_GINI = """
WITH per_user AS (SELECT event_type, user_id,
                         CAST(count(*) AS BIGINT) AS c
                  FROM events GROUP BY 1, 2),
ranked AS (SELECT event_type, c,
                  CAST(row_number() OVER (PARTITION BY event_type
                                          ORDER BY c, user_id) AS BIGINT) AS i
           FROM per_user),
g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(i * c) AS BIGINT) AS iweighted
      FROM ranked GROUP BY event_type)
SELECT event_type, m, total,
       2.0 * CAST(iweighted AS DOUBLE) /
         (CAST(m AS DOUBLE) * CAST(total AS DOUBLE))
       - (CAST(m AS DOUBLE) + 1.0) / CAST(m AS DOUBLE) AS gini
FROM g ORDER BY event_type
"""


def q_corpus_drift_psi(spark, sf_dir):
    """Population-stability-index drift report between two corpus
    snapshots' document-length distributions — the retrain/recrawl alarm
    (PSI > 0.2 = significant drift). Snapshot B is a deterministic
    mutation of the corpus (every 4th doc's text doubled, every 3rd doc
    dropped — a simulated recrawl), mirrored in the oracle.

    Buckets are integer log2 lengths (binary-string length — no float
    log anywhere, same trick as length_batches). Counts are exact
    integers; shares go through qmath; each bucket's
    (pa−pb)·ln(pa/pb) term is quantized to 1e-9 units and summed as
    longs (order-free; integer rounding absorbs last-ulp libm ln
    differences — the corpus_stats entropy precedent).

    Plan: the two per-snapshot bucket counts ride ONE aggregate over a
    side-tagged unionAll (count(CASE side) pivots — identical counts to
    the two separate groupBys), because the inner-join form pushes
    isnotnull(bucket) into only the join-side copy of each aggregate,
    which blocks AQE stage reuse and doubles the corpus scans (measured:
    4 scans vs 2). The inner-join semantics (keep buckets present in
    BOTH snapshots; totals still count one-sided buckets) survive as the
    post-aggregate n_a>0 AND n_b>0 filter — on aggregate OUTPUTS, so
    nothing pushes below the shared subtree. Totals (na, nb, t) are
    broadcast 1-row aggregates crossJoined back on; their plan-copies
    carry no extra predicates, so AQE stage reuse keeps the executed
    plan at exactly TWO corpus scans (tests/test_plans.py pins this on
    the final adaptive plan). No single-partition WindowExec anywhere —
    the suite-wide 100 TB guard holds."""
    prep_session(spark)
    base = _t(spark, sf_dir, "documents")
    snap_b = base.where(F.col("doc_id") % 3 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat_ws(" ", "text", "text")
        ).otherwise(F.col("text")),
    )

    b_expr = (F.length(F.bin(F.length("text"))) - 1).cast("long")
    tagged = base.select(b_expr.alias("bucket"), F.lit(0).alias("side")).unionAll(
        snap_b.select(b_expr.alias("bucket"), F.lit(1).alias("side"))
    )
    agg = assert_dimension_sized(
        tagged.groupBy("bucket").agg(
            F.count(F.when(F.col("side") == 0, 1)).cast("long").alias("n_a"),
            F.count(F.when(F.col("side") == 1, 1)).cast("long").alias("n_b"),
        ),
        "corpus_drift_psi.buckets (log2 length buckets)",
    )
    tot = agg.agg(
        F.sum("n_a").cast("long").alias("na"),
        F.sum("n_b").cast("long").alias("nb"),
    )
    j = agg.crossJoin(F.broadcast(tot)).where(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
    )
    pa = F.col("n_a").cast("double") / F.col("na").cast("double")
    pb = F.col("n_b").cast("double") / F.col("nb").cast("double")
    term_q = F.round((pa - pb) * F.log(pa / pb) * 1e9).cast("long")
    rows = j.select(
        "bucket",
        "n_a",
        "n_b",
        qmath.qdiv_count(F.col("n_a") * 1_000_000, F.col("na"), 1, 6).alias(
            "share_a"
        ),
        qmath.qdiv_count(F.col("n_b") * 1_000_000, F.col("nb"), 1, 6).alias(
            "share_b"
        ),
        term_q.alias("psi_term_nano"),
    )
    t = rows.agg(F.sum("psi_term_nano").cast("long").alias("t"))
    return (
        rows.crossJoin(F.broadcast(t))
        .select(
            "bucket",
            "n_a",
            "n_b",
            "share_a",
            "share_b",
            (F.col("psi_term_nano").cast("double") / F.lit(1e9)).alias("psi_term"),
            (F.col("t").cast("double") / F.lit(1e9)).alias("psi_total"),
        )
        .orderBy("bucket")
    )


def _sql_corpus_drift_psi() -> str:
    share_a = qmath.sql_qdiv_count("(n_a * 1000000)", "na", 1, 6)
    share_b = qmath.sql_qdiv_count("(n_b * 1000000)", "nb", 1, 6)
    return f"""
WITH snap_b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text || ' ' || text ELSE text END AS text
  FROM documents WHERE doc_id % 3 <> 0),
a AS (SELECT CAST(length(bin(length(text))) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_a FROM documents GROUP BY 1),
b AS (SELECT CAST(length(bin(length(text))) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_b FROM snap_b GROUP BY 1),
tot AS (SELECT (SELECT CAST(sum(n_a) AS BIGINT) FROM a) AS na,
               (SELECT CAST(sum(n_b) AS BIGINT) FROM b) AS nb),
j AS (SELECT bucket, n_a, n_b, na, nb,
             CAST(round((CAST(n_a AS DOUBLE) / CAST(na AS DOUBLE)
                         - CAST(n_b AS DOUBLE) / CAST(nb AS DOUBLE))
                        * ln((CAST(n_a AS DOUBLE) / CAST(na AS DOUBLE))
                             / (CAST(n_b AS DOUBLE) / CAST(nb AS DOUBLE)))
                        * 1e9) AS BIGINT) AS psi_term_nano
      FROM a JOIN b USING (bucket) CROSS JOIN tot),
total AS (SELECT CAST(sum(psi_term_nano) AS BIGINT) AS t FROM j)
SELECT bucket, n_a, n_b,
       {share_a} AS share_a,
       {share_b} AS share_b,
       CAST(psi_term_nano AS DOUBLE) / 1e9 AS psi_term,
       CAST(t AS DOUBLE) / 1e9 AS psi_total
FROM j CROSS JOIN total ORDER BY bucket
"""


def q_trimmed_mean(spark, sf_dir):
    """10%-trimmed mean of event value per type — the robust-stats
    companion to winsorize (drop the tails instead of clipping them).
    Values are exact integer cents; the trim bounds are integer rank
    arithmetic (lo = n·10/100 dropped from each side) off ONE per-type
    rank window; both means go through qmath.qdiv_count so the division
    is tie-exact across engines."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("event_type", cents.alias("c"), "event_id")
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").asc(), F.col("event_id").asc()
    )
    ranked = base.withColumn("rn", F.row_number().over(w)).join(
        base.groupBy("event_type").agg(F.count("*").cast("long").alias("n")),
        "event_type",
    )
    lo = F.expr("(n * 10) div 100")
    kept = ranked.where((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
    stats = kept.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count("*").cast("long").alias("n_kept"),
        F.sum("c").alias("sum_kept"),
    )
    full = base.groupBy("event_type").agg(F.sum("c").alias("sum_all"))
    return (
        stats.join(F.broadcast(full), "event_type")
        .select(
            "event_type",
            "n",
            "n_kept",
            qmath.qdiv_count(
                F.col("sum_all") * 1_000_000, F.col("n"), 100, 6
            ).alias("mean_value"),
            qmath.qdiv_count(
                F.col("sum_kept") * 1_000_000, F.col("n_kept"), 100, 6
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


def _sql_trimmed_mean() -> str:
    mean_all = qmath.sql_qdiv_count("(sum_all * 1000000)", "n", 100, 6)
    mean_kept = qmath.sql_qdiv_count("(sum_kept * 1000000)", "n_kept", 100, 6)
    return f"""
WITH base AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                     event_id FROM events),
ranked AS (SELECT event_type, c, event_id,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY c, event_id) AS rn,
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM base),
kept AS (SELECT event_type, n, c FROM ranked
         WHERE rn > (n * 10) // 100
           AND rn <= n - (n * 10) // 100),
stats AS (SELECT event_type, max(n) AS n,
                 CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(c) AS BIGINT) AS sum_kept
          FROM kept GROUP BY event_type),
full_s AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS sum_all
           FROM base GROUP BY event_type)
SELECT event_type, n, n_kept,
       {mean_all} AS mean_value,
       {mean_kept} AS trimmed_mean
FROM stats JOIN full_s USING (event_type) ORDER BY event_type
"""


def q_weekly_trend(spark, sf_dir):
    """Week-over-week event-volume trend per type: weekly counts keyed
    by an epoch-Monday week index (integer day arithmetic — no locale /
    ISO-week engine differences), lag window per type for the previous
    week, delta and percent change via qmath (tie-exact). The lag window
    sees the (type × week)-cardinality rollup, never the fact stream."""
    prep_session(spark)
    e = load_events(spark, f"{sf_dir}/events.parquet")
    return weekly_trend_frame(e)


def weekly_trend_frame(e):
    day = F.to_date("ts")
    widx = F.floor(
        F.datediff(day, F.to_date(F.lit("1970-01-05"))) / 7
    ).cast("long")
    weekly = (
        e.groupBy("event_type", widx.alias("widx"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("widx")
    out = weekly.withColumn("prev_n", F.lag("n").over(w))
    return out.select(
        "event_type",
        F.date_format(
            F.date_add(
                F.to_date(F.lit("1970-01-05")), (F.col("widx") * 7).cast("int")
            ),
            "yyyy-MM-dd",
        ).alias("week_start"),
        "n",
        "prev_n",
        (F.col("n") - F.col("prev_n")).alias("delta"),
        F.when(
            F.col("prev_n").isNotNull(),
            qmath.qdiv_count(
                (F.col("n") - F.col("prev_n")) * 1_000_000, F.col("prev_n"), 1, 6
            ),
        ).alias("pct_change"),
    ).orderBy("event_type", "week_start")


def _sql_weekly_trend() -> str:
    pct = qmath.sql_qdiv_count("((n - prev_n) * 1000000)", "prev_n", 1, 6)
    return f"""
WITH weekly AS (
  SELECT event_type,
         CAST(floor((CAST(ts AS DATE) - DATE '1970-01-05') / 7) AS BIGINT)
           AS widx,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, widx, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY widx) AS prev_n
  FROM weekly)
SELECT event_type,
       strftime(DATE '1970-01-05' + CAST(widx * 7 AS INT), '%Y-%m-%d')
         AS week_start,
       n, prev_n, n - prev_n AS delta,
       CASE WHEN prev_n IS NOT NULL THEN {pct} ELSE NULL END AS pct_change
FROM lagged ORDER BY event_type, week_start
"""


def q_dup_matrix(spark, sf_dir):
    """Cross-source duplication matrix: for every source pair, how many
    distinct texts appear in BOTH (and how many doc-level copies that
    represents) — 'which crawls copy from which', the provenance
    companion to dup_rate_by_source. Plan: one (source, md5(text))
    aggregate (text never shuffles, only its 16-byte hash), then a
    hash-keyed self-equi-join whose fan-out per text is bounded by
    sources-per-text — never corpus-quadratic. All exact integers.

    The synthetic corpus has zero exact duplicates, so the query plants
    both classes deterministically (mirrored in the oracle): every 5th
    doc is re-attributed to a 'mirror-crawl' source (cross-source
    copies) and every 11th doc is duplicated in place (within-source
    diagonal copies).

    The planted multiplicity is ONE scan + explode (optimization r11):
    the obvious 3-branch union scanned documents three times and
    md5-hashed text in every branch (the before-plan held NINE scans —
    the union was also inlined once per `per` consumer); now md5 runs
    once per doc and each doc emits its 1-3 (source) copies from an
    array — the same (source, h) multiset by construction."""
    prep_session(spark)
    base = _t(spark, sf_dir, "documents")
    no_src = F.array().cast("array<string>")
    srcs = F.concat(
        F.array(F.col("source")),
        F.when(F.col("doc_id") % 5 == 0, F.array(F.lit("mirror-crawl"))).otherwise(
            no_src
        ),
        F.when(F.col("doc_id") % 11 == 0, F.array(F.col("source"))).otherwise(no_src),
    )
    d = base.select(srcs.alias("__srcs__"), F.md5("text").alias("h")).select(
        F.explode("__srcs__").alias("source"), "h"
    )
    per = (
        d.groupBy("source", "h")
        .agg(F.count("*").cast("long").alias("c"))
    )
    a = per.select(F.col("source").alias("source_a"), "h", F.col("c").alias("ca"))
    b = per.select(F.col("source").alias("source_b"), "h", F.col("c").alias("cb"))
    cross = (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_texts"),
            F.sum(F.col("ca") + F.col("cb")).cast("long").alias("n_copies"),
        )
    )
    # diagonal: within-source duplicate families (c >= 2) — nonzero on
    # any real corpus even when no text crosses source boundaries
    diag = (
        per.where(F.col("c") >= 2)
        .groupBy(F.col("source").alias("source_a"))
        .agg(
            F.count("*").cast("long").alias("n_shared_texts"),
            F.sum("c").cast("long").alias("n_copies"),
        )
        .select(
            "source_a",
            F.col("source_a").alias("source_b"),
            "n_shared_texts",
            "n_copies",
        )
    )
    return cross.unionByName(diag).orderBy("source_a", "source_b")


SQL_DUP_MATRIX = """
WITH aug AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror-crawl' AS source, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id % 11 = 0),
per AS (SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS c
        FROM aug GROUP BY 1, 2),
cross_m AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared_texts,
         CAST(sum(a.c + b.c) AS BIGINT) AS n_copies
  FROM per a JOIN per b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2),
diag AS (
  SELECT source AS source_a, source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared_texts,
         CAST(sum(c) AS BIGINT) AS n_copies
  FROM per WHERE c >= 2 GROUP BY 1, 2)
SELECT * FROM cross_m UNION ALL SELECT * FROM diag ORDER BY source_a, source_b
"""


def q_langid_margin(spark, sf_dir):
    """Language-ID confidence margin: top-1 minus top-2 marker score per
    document, plus the ambiguity flag (margin <= 1) and agreement with
    the labeled lang — the router a multilingual pipeline uses to decide
    which docs need a heavier language model. All scores are exact
    integer marker counts (scan-stage array expressions, zero shuffle);
    the top-2 come from one sorted literal-array expression."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scores = text.lang_scores(t)
    arr = F.sort_array(
        F.array(*[c.cast("long") for c in scores.values()]), asc=False
    )
    top, second = F.element_at(arr, 1), F.element_at(arr, 2)
    pred = text.lang_id(t)
    return d.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        top.alias("top_score"),
        second.alias("second_score"),
        (top - second).alias("margin"),
        ((top - second) <= 1).alias("is_ambiguous"),
        (pred == F.col("lang")).alias("is_correct"),
    ).orderBy("doc_id")


def _sql_langid_margin() -> str:
    score_cols = []
    for lang, markers in text.LANG_MARKERS.items():
        m = "', '".join(markers)
        score_cols.append(
            f"CAST(len(list_filter({_TOKENS}, t -> t IN ('{m}'))) AS BIGINT)"
            f" AS sc_{lang}"
        )
    langs = list(text.LANG_MARKERS)
    expr = "'und'"
    best = "0"
    for lang in langs:
        expr = f"CASE WHEN sc_{lang} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({best}, sc_{lang})"
    arr = "list_sort([" + ", ".join(f"sc_{l}" for l in langs) + "], 'DESC')"
    return f"""
WITH scored AS (SELECT doc_id, lang, {", ".join(score_cols)} FROM documents),
ranked AS (SELECT doc_id, lang, {expr} AS predicted_lang,
                  {arr}[1] AS top_score, {arr}[2] AS second_score
           FROM scored)
SELECT doc_id, lang, predicted_lang, top_score, second_score,
       top_score - second_score AS margin,
       (top_score - second_score) <= 1 AS is_ambiguous,
       predicted_lang = lang AS is_correct
FROM ranked ORDER BY doc_id
"""


def q_source_cosine(spark, sf_dir):
    """Pairwise source-to-source cosine over unigram COUNT vectors
    (terms.source_unigram_cosine) — the weighted companion to
    vocab_overlap's set Jaccard for 'did I scrape the same site twice'.
    Dot products and squared norms are exact integer sums off one
    (source, token) aggregate; the token-keyed self-join's fan-out is
    bounded by sources-per-token; cosine is sqrt-based double math (the
    provably-safe qmath class), bit-identical in the DuckDB twin."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.terms import source_unigram_cosine

    d = _t(spark, sf_dir, "documents")
    return source_unigram_cosine(d, "text", "source")


def _sql_source_cosine() -> str:
    from csvs_to_sqlite_spark.operators.terms import source_unigram_cosine_sql

    return source_unigram_cosine_sql("text", "source")


def q_filter_funnel(spark, sf_dir):
    """Curation filter funnel: the five quality gates (language-ID
    known, Gopher rules, C4 page gate, blocklist, quality >= 0.5)
    applied in pipeline order, reporting per stage how many docs pass it
    in isolation and how many survive cumulatively — the ablation table
    every corpus release publishes (what did each filter cost?).

    Plan: ONE corpus scan computing all five scan-stage flags, ONE 1-row
    conditional aggregate, inlined to five rows. No joins, no shuffle
    beyond the single global aggregate — at 100 TB the funnel costs the
    same as any one of its member filters."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    g = text.gopher_rules(t)
    gopher_pass = (
        g["word_count_ok"]
        & g["mean_len_ok"]
        & g["symbol_ok"]
        & g["ellipsis_ok"]
        & g["bullet_ok"]
        & g["alpha_ok"]
        & g["stopword_ok"]
    )
    stages = [
        ("langid_known", text.lang_id(t) != "und"),
        ("gopher", gopher_pass),
        ("c4_page", text.c4_line_rules(t)["page_ok"]),
        ("blocklist", text.blocklist_hits(t, BLOCKLIST_TERMS)["is_clean"]),
        ("quality", text.quality_score(t) >= 0.5),
    ]
    flagged = d.select(*[f.alias(n) for n, f in stages])
    aggs = [F.count("*").cast("long").alias("n_docs")]
    cum = None
    for name, _ in stages:
        flag = F.col(name)
        cum = flag if cum is None else (cum & flag)
        aggs.append(
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias(f"p_{name}")
        )
        aggs.append(
            F.sum(F.when(cum, 1).otherwise(0)).cast("long").alias(f"s_{name}")
        )
    one = flagged.agg(*aggs)
    rows = []
    prev_survive = F.col("n_docs")
    for i, (name, _) in enumerate(stages):
        rows.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("stage_idx"),
                F.lit(name).alias("stage"),
                prev_survive.alias("n_in"),
                F.col(f"p_{name}").alias("n_pass_alone"),
                F.col(f"s_{name}").alias("n_survive"),
            )
        )
        prev_survive = F.col(f"s_{name}")
    return one.select(F.inline(F.array(*rows))).orderBy("stage_idx")


def _sql_filter_funnel() -> str:
    quality = SQL_QUALITY.strip().rstrip(";")
    langid = _sql_langid().strip().rstrip(";")
    names = ["langid_known", "gopher", "c4_page", "blocklist", "quality"]
    sums = ", ".join(
        f"CAST(sum(CASE WHEN {n} THEN 1 ELSE 0 END) AS BIGINT) AS p_{n}, "
        + "CAST(sum(CASE WHEN "
        + " AND ".join(names[: i + 1])
        + f" THEN 1 ELSE 0 END) AS BIGINT) AS s_{n}"
        for i, n in enumerate(names)
    )
    selects = []
    prev = "n_docs"
    for i, n in enumerate(names):
        selects.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS stage_idx, '{n}' AS stage, "
            f"{prev} AS n_in, p_{n} AS n_pass_alone, s_{n} AS n_survive FROM agg"
        )
        prev = f"s_{n}"
    union = " UNION ALL ".join(selects)
    return f"""
WITH q AS ({quality}),
lid AS ({langid}),
gop AS (SELECT doc_id, {text.gopher_rules_sql("text")} FROM documents),
c4 AS (SELECT doc_id, {text.c4_line_rules_sql("text")} FROM documents),
bl AS (SELECT doc_id, {text.blocklist_hits_sql("text", BLOCKLIST_TERMS)} FROM documents),
flags AS (SELECT d.doc_id,
                 lid.predicted_lang <> 'und' AS langid_known,
                 (gop.word_count_ok AND gop.mean_len_ok AND gop.symbol_ok
                  AND gop.ellipsis_ok AND gop.bullet_ok AND gop.alpha_ok
                  AND gop.stopword_ok) AS gopher,
                 c4.page_ok AS c4_page,
                 bl.is_clean AS blocklist,
                 q.quality >= 0.5 AS quality
          FROM documents d
          JOIN lid USING (doc_id) JOIN gop USING (doc_id)
          JOIN c4 USING (doc_id) JOIN bl USING (doc_id)
          JOIN q USING (doc_id)),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, {sums} FROM flags)
SELECT * FROM ({union}) ORDER BY stage_idx
"""


def q_readability(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade per document
    (text.readability, Kincaid et al. 1975) — the classic curation
    signal complementing quality_score/gopher: exact integer word /
    sentence / vowel-group counts from Java∩RE2-portable regexes, and
    the two scores as mirrored double arithmetic (no round() — the qmath
    tie class needs a round on a quotient and there is none).
    Scan-stage only: zero joins, zero shuffles at any corpus size."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.text import readability

    d = _t(spark, sf_dir, "documents")
    cols = readability(F.col("text"))
    return d.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    ).orderBy("doc_id")


def _sql_readability() -> str:
    from csvs_to_sqlite_spark.operators.text import readability_sql

    return (
        f"SELECT doc_id, {readability_sql('text')} "
        "FROM documents ORDER BY doc_id"
    )


def q_salted_distinct(spark, sf_dir):
    """Skew-safe exact count-distinct
    (partitioning.salted_distinct_count): distinct users per event_type,
    where event_type is the classic hot low-cardinality key. The salt is
    derived from the VALUE (md5(user) % 16) so each distinct user lands
    in exactly one (type, salt) bucket: phase 1 holds 1/16 of a hot
    type's distinct-set per reducer, phase 2 sums 16 bounded partials —
    the 100 TB answer to one executor owning a 10B-value hash set. The
    oracle is the plain GROUP BY count(*)/count(DISTINCT user_id) the
    two-phase plan provably equals."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.partitioning import salted_distinct_count

    e = load_events(spark, f"{sf_dir}/events.parquet")
    return salted_distinct_count(e, "event_type", "user_id", n_salt=16)


SQL_SALTED_DISTINCT = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_quantile_sketch(spark, sf_dir):
    """Hash-threshold quantile sketch (sketch.quantile_sketch_report):
    per-returnflag p25/p50/p75/p90 of lineitem extended price (cents)
    estimated from a deterministic 1/8 md5 sample, with the exact order
    statistic and the error riding along. The sample predicate is a
    SCAN-STAGE filter — at 100 TB the estimator sorts 1/8 of the data
    (or any mod the error budget affords) while the exact side here
    certifies what that skips. Type-1 (lower) order statistics: every
    output value is an exact integer from the input domain — zero float
    arithmetic, hence bit-identical in the DuckDB twin."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.sketch import quantile_sketch_report

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("rid"),
    )
    return quantile_sketch_report(li, "cents", "l_returnflag", "rid")


def _sql_quantile_sketch() -> str:
    from csvs_to_sqlite_spark.operators.sketch import quantile_sketch_sql

    return quantile_sketch_sql(
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "l_returnflag",
        "concat(l_orderkey, '-', l_linenumber)",
        "lineitem",
    )


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min heavy hitters (operators/sketch.py, Cormode &
    Muthukrishnan 2005): top-20 tokens with exact counts, the CMS
    estimate from a 4×256 md5-deterministic sketch, and the measured
    overestimate. The sketch aggregate is CONSTANT d·w state at any
    corpus size — the sketch is the scale story, and determinism makes
    its error an oracle-checked quantity."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.sketch import cms_heavy_hitters

    d = _t(spark, sf_dir, "documents")
    return cms_heavy_hitters(d, "text", d=4, w=256, k=20)


def q_bloom_prefilter(spark, sf_dir):
    """Bloom-filter dedup pre-filter report (operators/sketch.py):
    even-id documents build a 1024-bit / 3-hash filter; odd-id documents
    probe it. Reports pass/true-member/false-positive/missed counts —
    the oracle proves n_missed == 0 (no false negatives, ever) and
    measures the false-positive cost of the m-bit compression exactly."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.sketch import bloom_prefilter_report

    d = _t(spark, sf_dir, "documents")
    return bloom_prefilter_report(
        d.where(F.col("doc_id") % 2 == 1),
        d.where(F.col("doc_id") % 2 == 0),
        "text",
        m=1024,
        n_hashes=3,
    )


def _sql_cms_heavy_hitters() -> str:
    from csvs_to_sqlite_spark.operators.sketch import cms_heavy_hitters_sql

    return cms_heavy_hitters_sql("text", d=4, w=256, k=20)


def _sql_bloom_prefilter() -> str:
    from csvs_to_sqlite_spark.operators.sketch import bloom_prefilter_sql

    return bloom_prefilter_sql(
        "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
        "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
        "text",
        m=1024,
        n_hashes=3,
    )


def q_fuzzy_link(spark, sf_dir):
    """Cross-table record linkage (dedup.fuzzy_link): every src1
    document linked to its best-matching src0 "master" by token-set
    Jaccard. Blocking = the token-keyed equi-join (a pair is scored only
    if it shares a token — never a cross join), with the df cap guarding
    hyper-frequent blocking tokens; argmax per left row via a
    left-partitioned row_number."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return dedup.fuzzy_link(
        d.where(F.col("source") == "src1"),
        d.where(F.col("source") == "src0"),
        "text",
        "doc_id",
        "doc_id",
        threshold=0.3,
    )


def _sql_fuzzy_link() -> str:
    # models dedup.fuzzy_link's DEFAULT max_df='auto' cap — the oracle
    # must stay a true twin even on corpora where the cap actually bites
    # (review finding: at shipped SFs no token crosses it, which would
    # have masked a divergence on bigger data)
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    toks = tokens_sql("text", distinct=True)
    return f"""
WITH lt0 AS (SELECT doc_id AS l, unnest({toks}) AS token
             FROM documents WHERE source = 'src1'),
rt0 AS (SELECT doc_id AS r, unnest({toks}) AS token
        FROM documents WHERE source = 'src0'),
cap AS (SELECT greatest(1000, CAST(floor(0.2 *
              (SELECT count(*) FROM documents WHERE source = 'src1'))
              AS BIGINT)) AS cap_l,
              greatest(1000, CAST(floor(0.2 *
              (SELECT count(*) FROM documents WHERE source = 'src0'))
              AS BIGINT)) AS cap_r),
dropped AS (SELECT token FROM (
              SELECT coalesce(dl.token, dr.token) AS token,
                     coalesce(dl.c_l, 0) AS c_l, coalesce(dr.c_r, 0) AS c_r
              FROM (SELECT token, count(*) AS c_l FROM lt0 GROUP BY token) dl
              FULL OUTER JOIN
                   (SELECT token, count(*) AS c_r FROM rt0 GROUP BY token) dr
              ON dl.token = dr.token) d, cap
            WHERE d.c_l > cap.cap_l OR d.c_r > cap.cap_r),
lt AS (SELECT * FROM lt0 WHERE token NOT IN (SELECT token FROM dropped)),
rt AS (SELECT * FROM rt0 WHERE token NOT IN (SELECT token FROM dropped)),
inter AS (SELECT l, r, count(*) AS inter FROM lt JOIN rt USING (token)
          GROUP BY l, r),
ls AS (SELECT l, count(*) AS sz_l FROM lt GROUP BY l),
rs AS (SELECT r, count(*) AS sz_r FROM rt GROUP BY r),
scored AS (
  SELECT l, r, (CAST((CASE WHEN ((inter * 1000000)) < 0 THEN -CAST(round(((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) - ((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) % ((((sz_l + sz_r - inter)) * 1) * 2))) / CAST(((((sz_l + sz_r - inter)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) - ((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) % ((((sz_l + sz_r - inter)) * 1) * 2))) / CAST(((((sz_l + sz_r - inter)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS jaccard
  FROM inter JOIN ls USING (l) JOIN rs USING (r)
  WHERE (CAST((CASE WHEN ((inter * 1000000)) < 0 THEN -CAST(round(((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) - ((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) % ((((sz_l + sz_r - inter)) * 1) * 2))) / CAST(((((sz_l + sz_r - inter)) * 1) * 2) AS DOUBLE)) AS BIGINT) ELSE CAST(round(((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) - ((abs((inter * 1000000)) * 2 + (((sz_l + sz_r - inter)) * 1)) % ((((sz_l + sz_r - inter)) * 1) * 2))) / CAST(((((sz_l + sz_r - inter)) * 1) * 2) AS DOUBLE)) AS BIGINT) END) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.3),
best AS (SELECT *, row_number() OVER (PARTITION BY l
               ORDER BY jaccard DESC, r ASC) AS rk FROM scored)
SELECT l AS doc_id, r AS match_id, jaccard FROM best WHERE rk = 1
"""


_BM25_QUERY = ["spark", "shuffle", "window"]
_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def q_hybrid_retrieval(spark, sf_dir):
    """Hybrid lexical+semantic retrieval with reciprocal-rank fusion
    (Cormack et al. 2009): BM25 top-50 over `documents` and brute-force
    cosine top-50 around query vector 0 over `embeddings` (ids share the
    0..N key space in this star schema), fused by
    rrf = Σ 1/(60 + rank) over the rankers that returned the id —
    integer ranks make every fused score an identical double in both
    engines; fixed coalesce(lex)+coalesce(sem) addition order.

    Plan shape: each ranker keeps its own scale story (BM25: scan-stage
    tf + TakeOrdered; cosine: broadcast query sweep); the fusion joins
    two ≤50-row results — driver-sized; the lexical rank uses the
    two-phase global_rank (no single-partition window), the semantic
    rank is query-partitioned. Returns top-10 (id, rrf_score, lex_rank,
    sem_rank)."""
    prep_session(spark)
    from csvs_to_sqlite_spark.operators.rowid import global_rank

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = global_rank(
        terms.bm25_search(d, "text", "doc_id", _BM25_QUERY, k=50),
        [F.col("bm25").desc(), F.col("doc_id").asc()],
        "lex_rank",
    ).select(F.col("doc_id").alias("id"), "lex_rank")
    sem = (
        similarity.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=50)
        .select(F.col("neighbor_id").alias("id"), F.col("rank").cast("long").alias("sem_rank"))
    )
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    return (
        lex.join(sem, "id", "full_outer")
        .select("id", rrf.alias("rrf_score"), "lex_rank", "sem_rank")
        .orderBy(F.col("rrf_score").desc(), F.col("id").asc())
        .limit(10)
    )


def _sql_hybrid_retrieval() -> str:
    lex_sql = terms.bm25_search_sql("text", "doc_id", _BM25_QUERY, k=50)
    return f"""
WITH lex0 AS (SELECT * FROM ({lex_sql})),
lex AS (SELECT doc_id AS id,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
                 AS lex_rank
        FROM lex0),
q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id AS neighbor_id, list_transform(embedding, x -> x::DOUBLE) AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_sum(list_transform(list_zip(qv, cv), p -> p[1]*p[2])) /
               (sqrt(list_sum(list_transform(qv, x -> x*x))) *
                sqrt(list_sum(list_transform(cv, x -> x*x)))), 6) AS cos_sim
  FROM q, c WHERE query_id <> neighbor_id),
sem AS (SELECT neighbor_id AS id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS sem_rank
        FROM scored QUALIFY sem_rank <= 50)
SELECT COALESCE(lex.id, sem.id) AS id,
       round(COALESCE((1.0::DOUBLE) / ({_RRF_K} + lex_rank), 0.0::DOUBLE)
             + COALESCE((1.0::DOUBLE) / ({_RRF_K} + sem_rank), 0.0::DOUBLE), 6)
         AS rrf_score,
       lex_rank, sem_rank
FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
ORDER BY rrf_score DESC, id ASC LIMIT 10
"""


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 ranked retrieval (terms.bm25_search): top-20 documents
    for a 3-token query. Per-term tf/dl are scan-stage array expressions
    (the corpus never explodes); df + (N, Σdl) collapse into one 1-row
    broadcast aggregate; scoring sums query terms in a FIXED expression
    order (no float-sum nondeterminism); top-k is TakeOrderedAndProject."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.bm25_search(d, "text", "doc_id", _BM25_QUERY, k=20)


def q_dsir_importance(spark, sf_dir):
    """DSIR-style hashed-unigram importance weights (terms.dsir_importance,
    after Xie et al. 2023): top-20 most src0-like documents by
    Σ ln(p_target/p_raw) over 256 md5 feature buckets. One bucket-keyed
    aggregate builds both distributions in a single corpus pass; the
    256-row log-ratio table broadcasts; the per-doc score folds exact
    (doc, bucket) integer counts in bucket order on both engines."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.dsir_importance(
        d, "text", "doc_id", F.col("source") == "src0", n_buckets=256, top_k=20
    )


def q_vocab_overlap(spark, sf_dir):
    """Pairwise source-vocabulary Jaccard (terms.vocab_overlap): one
    distinct (source, token) aggregate + a token-keyed self-join whose
    fan-out is bounded by sources-per-token; exact integer counts."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return terms.vocab_overlap(d, "text", "source")


def q_temperature_mixture(spark, sf_dir):
    """α=0.5 temperature mixture sampling (splits.temperature_mixture):
    per-source quotas ∝ floor(sqrt(count)), documents chosen by
    salted-hash rank; per-source manifest with ordered-id digests so the
    oracle verifies membership row by row. Integer-only quota math keeps
    both engines exactly aligned."""
    prep_session(spark)
    d = _t(spark, sf_dir, "documents")
    return splits.temperature_mixture(d, "doc_id", "source", budget=1000)


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: star denormalization at sf0.001."""
    return q_denormalize_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_filter_project": q_scan_filter_project,
        "dim_extract_first_appearance": q_dim_extract_first_appearance,
        "fk_rewrite_broadcast": q_fk_rewrite_broadcast,
        "incremental_dim_growth": q_incremental_dim_growth,
        "denormalize_star": q_denormalize_star,
        "semi_join_urgent": q_semi_join_urgent,
        "anti_join_customers": q_anti_join_customers,
        "int_downcast_detect": q_int_downcast_detect,
        "canonical_g_format": q_canonical_g_format,
        "date_iso_format": q_date_iso_format,
        "agg_pricing_summary": q_agg_pricing_summary,
        "rollup_returnflag": q_rollup_returnflag,
        "tpch_q2": q_tpch_q2,
        "tpch_q3": q_tpch_q3,
        "tpch_q4": q_tpch_q4,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q10": q_tpch_q10,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q13": q_tpch_q13,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_q22": q_tpch_q22,
        "topk_per_group": q_topk_per_group,
        "running_revenue": q_running_revenue,
        "window_functions": q_window_functions,
        "string_functions": q_string_functions,
        "array_agg": q_array_agg,
        "full_outer_join": q_full_outer_join,
        "union_segments": q_union_segments,
        "distinct_counts": q_distinct_counts,
        "sessionize_events": q_sessionize_events,
        "json_props": q_json_props,
        "windowed_event_counts": q_windowed_event_counts,
        "csv_roundtrip_inference": q_csv_roundtrip_inference,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_ensemble": q_dedup_ensemble,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_pairs_bounded": q_dedup_pairs_bounded,
        "dedup_clusters_bounded": q_dedup_clusters_bounded,
        "split_leakage": q_split_leakage,
        "edit_distance_verify": q_edit_distance_verify,
        "dedup_index_precision": q_dedup_index_precision,
        "dedup_index_recall": q_dedup_index_recall,
        "minhash_calibration": q_minhash_calibration,
        "minhash_threshold_curve": q_minhash_threshold_curve,
        "simhash_fingerprints": q_simhash_fingerprints,
        "simhash_pairs": q_simhash_pairs,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "ivf_index_incremental": q_ivf_index_incremental,
        "ivf_rebalance": q_ivf_rebalance,
        "ivf_rebalance_apply": q_ivf_rebalance_apply,
        "ivf_rebalance_query": q_ivf_rebalance_query,
        "knn_ivfpq": q_knn_ivfpq,
        "knn_ivfpq_residual": q_knn_ivfpq_residual,
        "semdedup_prune": q_semdedup_prune,
        "mmr_rerank": q_mmr_rerank,
        "pq_encode": q_pq_encode,
        "ann_recall_eval": q_ann_recall_eval,
        "ann_recall_matrix": q_ann_recall_matrix,
        "zorder_layout": q_zorder_layout,
        "zorder_pruning": q_zorder_pruning,
        "matryoshka_eval": q_matryoshka_eval,
        "curriculum_schedule": q_curriculum_schedule,
        "dataset_card": q_dataset_card,
        "hard_negatives": q_hard_negatives,
        "centroid_classifier_eval": q_centroid_classifier_eval,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "mixed_language": q_mixed_language,
        "text_fingerprints": q_text_fingerprints,
        "asof_join": q_asof_join,
        "pivot_status": q_pivot_status,
        "cube_agg": q_cube_agg,
        "percentiles": q_percentiles,
        "fts_token_match": q_fts_token_match,
        "inverted_index": q_inverted_index,
        "embedding_centroids": q_embedding_centroids,
        "embedding_near_dup": q_embedding_near_dup,
        "bpe_ish_token_count": q_bpe_ish_token_count,
        "dedup_clusters": q_dedup_clusters,
        "time_rollup": q_time_rollup,
        "range_join": q_range_join,
        "stateful_user_totals": q_stateful_user_totals,
        "decontaminate": q_decontaminate,
        "train_val_split": q_train_val_split,
        "pii_redact": q_pii_redact,
        "repetition_filter": q_repetition_filter,
        "weighted_mixture": q_weighted_mixture,
        "sequence_pack": q_sequence_pack,
        "streaming_dedup": q_streaming_dedup,
        "streaming_enrich": q_streaming_enrich,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "tfidf_top_terms": q_tfidf_top_terms,
        "bigram_topk": q_bigram_topk,
        "dedup_survivors": q_dedup_survivors,
        "quality_topk_per_source": q_quality_topk_per_source,
        "chunk_dedup": q_chunk_dedup,
        "shard_manifest": q_shard_manifest,
        "shard_balance": q_shard_balance,
        "corpus_stats": q_corpus_stats,
        "streaming_interval_join": q_streaming_interval_join,
        "table_profile": q_table_profile,
        "chunk_windows": q_chunk_windows,
        "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
        "quality_above_median": q_quality_above_median,
        "quantize_embeddings": q_quantize_embeddings,
        "global_shuffle": q_global_shuffle,
        "curation_pipeline": q_curation_pipeline,
        "incremental_dedup": q_incremental_dedup,
        "lm_score": q_lm_score,
        "ccnet_buckets": q_ccnet_buckets,
        "length_batches": q_length_batches,
        "gopher_rules": q_gopher_rules,
        "blocklist_filter": q_blocklist_filter,
        "quality_classifier": q_quality_classifier,
        "classifier_eval": q_classifier_eval,
        "c4_line_rules": q_c4_line_rules,
        "weighted_topk_sample": q_weighted_topk_sample,
        "boilerplate_lines": q_boilerplate_lines,
        "contamination_report": q_contamination_report,
        "stratified_sample": q_stratified_sample,
        "skew_report": q_skew_report,
        "rolling_revenue_7d": q_rolling_revenue_7d,
        "customer_deciles": q_customer_deciles,
        "event_funnel": q_event_funnel,
        "corpus_diff": q_corpus_diff,
        "daily_dense_rollup": q_daily_dense_rollup,
        "fk_integrity_audit": q_fk_integrity_audit,
        "merge_upsert": q_merge_upsert,
        "char_health": q_char_health,
        "collocations": q_collocations,
        "price_outliers": q_price_outliers,
        "interarrival_stats": q_interarrival_stats,
        "event_cooccurrence": q_event_cooccurrence,
        "assoc_rules": q_assoc_rules,
        "length_histogram": q_length_histogram,
        "argmax_per_group": q_argmax_per_group,
        "embedding_health": q_embedding_health,
        "key_uniqueness_audit": q_key_uniqueness_audit,
        "dup_rate_by_source": q_dup_rate_by_source,
        "minmax_normalize": q_minmax_normalize,
        "winsorize": q_winsorize,
        "text_normalize": q_text_normalize,
        "dedup_priority": q_dedup_priority,
        "vocab_encode": q_vocab_encode,
        "oov_rate": q_oov_rate,
        "vocab_update": q_vocab_update,
        "token_budget_cap": q_token_budget_cap,
        "derived_column_conformance": q_derived_column_conformance,
        "multimodal_image_features": q_multimodal_image_features,
        "multimodal_audio_features": q_multimodal_audio_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_video_frames": q_multimodal_video_frames,
        "multimodal_corrupt_isolation": q_multimodal_corrupt_isolation,
        "streaming_sessions": q_streaming_sessions,
        "bm25_search": q_bm25_search,
        "hybrid_retrieval": q_hybrid_retrieval,
        "scd2_history": q_scd2_history,
        "pagerank": q_pagerank,
        "pit_join": q_pit_join,
        "fuzzy_link": q_fuzzy_link,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "tokenizer_fertility": q_tokenizer_fertility,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "hll_ndv": q_hll_ndv,
        "kmv_sketch": q_kmv_sketch,
        "quantile_sketch": q_quantile_sketch,
        "readability": q_readability,
        "filter_funnel": q_filter_funnel,
        "source_cosine": q_source_cosine,
        "langid_margin": q_langid_margin,
        "dup_matrix": q_dup_matrix,
        "trimmed_mean": q_trimmed_mean,
        "corpus_drift_psi": q_corpus_drift_psi,
        "value_hour_corr": q_value_hour_corr,
        "source_lang_mi": q_source_lang_mi,
        "totalprice_conformance": q_totalprice_conformance,
        "image_phash_dedup": q_image_phash_dedup,
        "image_ahash_exact_dedup": q_image_ahash_exact_dedup,
        "audio_fingerprint_exact_dedup": q_audio_fingerprint_exact_dedup,
        "video_fingerprint_exact_dedup": q_video_fingerprint_exact_dedup,
        "audio_fingerprint_dedup": q_audio_fingerprint_dedup,
        "bpe_roundtrip": q_bpe_roundtrip,
        "video_fingerprint_dedup": q_video_fingerprint_dedup,
        "cluster_size_histogram": q_cluster_size_histogram,
        "digit_benford": q_digit_benford,
        "activity_gini": q_activity_gini,
        "weekly_trend": q_weekly_trend,
        "salted_distinct": q_salted_distinct,
        "event_anomaly": q_event_anomaly,
        "decayed_engagement": q_decayed_engagement,
        "compaction_plan": q_compaction_plan,
        "random_projection": q_random_projection,
        "shingle_novelty": q_shingle_novelty,
        "charwords": q_charwords,
        "retention_cohorts": q_retention_cohorts,
        "user_growth": q_user_growth,
        "bloom_prefilter": q_bloom_prefilter,
        "dsir_importance": q_dsir_importance,
        "vocab_overlap": q_vocab_overlap,
        "temperature_mixture": q_temperature_mixture,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_filter_project": SQL_SCAN,
        "dim_extract_first_appearance": SQL_DIM,
        "fk_rewrite_broadcast": SQL_FK,
        "incremental_dim_growth": SQL_DIM_INCR,
        "denormalize_star": SQL_STAR,
        "semi_join_urgent": SQL_SEMI,
        "anti_join_customers": SQL_ANTI,
        "int_downcast_detect": SQL_DOWNCAST,
        "canonical_g_format": _sql_gfmt(),
        "date_iso_format": SQL_DATE,
        "agg_pricing_summary": SQL_Q1,
        "rollup_returnflag": SQL_ROLLUP,
        "tpch_q2": SQL_TPCH_Q2,
        "tpch_q3": SQL_TPCH_Q3,
        "tpch_q4": SQL_TPCH_Q4,
        "tpch_q5": SQL_TPCH_Q5,
        "tpch_q6": SQL_TPCH_Q6,
        "tpch_q7": SQL_TPCH_Q7,
        "tpch_q8": SQL_TPCH_Q8,
        "tpch_q9": SQL_TPCH_Q9,
        "tpch_q10": SQL_TPCH_Q10,
        "tpch_q11": SQL_TPCH_Q11,
        "tpch_q12": SQL_TPCH_Q12,
        "tpch_q13": SQL_TPCH_Q13,
        "tpch_q14": SQL_TPCH_Q14,
        "tpch_q15": SQL_TPCH_Q15,
        "tpch_q16": SQL_TPCH_Q16,
        "tpch_q17": SQL_TPCH_Q17,
        "tpch_q18": SQL_TPCH_Q18,
        "tpch_q19": SQL_TPCH_Q19,
        "tpch_q20": SQL_TPCH_Q20,
        "tpch_q21": SQL_TPCH_Q21,
        "tpch_q22": SQL_TPCH_Q22,
        "topk_per_group": SQL_TOPK,
        "running_revenue": SQL_RUNNING,
        "window_functions": SQL_WINDOW_FNS,
        "string_functions": SQL_STRING_FNS,
        "array_agg": SQL_ARRAY_AGG,
        "full_outer_join": SQL_FULL_OUTER,
        "union_segments": SQL_UNION,
        "distinct_counts": SQL_DISTINCT,
        "sessionize_events": SQL_SESSIONS,
        "json_props": SQL_JSON,
        "windowed_event_counts": SQL_WINDOWED,
        "csv_roundtrip_inference": SQL_ROUNDTRIP,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_jaccard_pairs": SQL_JACCARD,
        "dedup_ensemble": _sql_dedup_ensemble(),
        "minhash_signatures": _sql_minhash_sig(),
        "minhash_lsh_pairs": _sql_minhash_pairs(),
        "dedup_pairs_bounded": _sql_dedup_pairs_bounded(),
        "dedup_clusters_bounded": _sql_dedup_clusters_bounded(),
        "split_leakage": _sql_split_leakage(),
        "edit_distance_verify": _sql_edit_distance_verify(),
        "dedup_index_precision": _sql_dedup_index_precision(),
        "dedup_index_recall": _sql_dedup_index_recall(),
        "minhash_calibration": _sql_minhash_calibration(),
        "minhash_threshold_curve": _sql_minhash_threshold_curve(),
        "simhash_fingerprints": _sql_simhash(),
        "simhash_pairs": _sql_simhash_pairs(),
        "knn_bruteforce": SQL_KNN,
        "knn_lsh": _sql_knn_lsh(),
        "knn_ivf": _sql_knn_ivf(),
        "ivf_index_incremental": _sql_ivf_index_incremental(),
        "ivf_rebalance": _sql_ivf_rebalance(),
        "ivf_rebalance_apply": _sql_ivf_rebalance_apply(),
        "ivf_rebalance_query": _sql_ivf_rebalance_query(),
        "knn_ivfpq": _sql_knn_ivfpq(),
        "knn_ivfpq_residual": _sql_knn_ivfpq_residual(),
        "semdedup_prune": _sql_semdedup(),
        "mmr_rerank": similarity.mmr_rerank_sql(query_id=0, n_candidates=25, k=10),
        "pq_encode": similarity.pq_encode_sql(),
        "ann_recall_eval": _sql_ann_recall(),
        "ann_recall_matrix": _sql_ann_recall_matrix(),
        "zorder_layout": _sql_zorder_layout(),
        "zorder_pruning": _sql_zorder_pruning(),
        "matryoshka_eval": _sql_matryoshka_eval(),
        "curriculum_schedule": _sql_curriculum_schedule(),
        "dataset_card": _sql_dataset_card(),
        "hard_negatives": SQL_HARD_NEG,
        "centroid_classifier_eval": SQL_CENTROID_EVAL,
        "text_token_stats": SQL_TOKEN_STATS,
        "text_quality": SQL_QUALITY,
        "text_langid": _sql_langid(),
        "mixed_language": _sql_mixed_language(),
        "text_fingerprints": SQL_FINGERPRINT,
        "asof_join": SQL_ASOF,
        "pivot_status": SQL_PIVOT,
        "cube_agg": SQL_CUBE,
        "percentiles": SQL_PERCENTILES,
        "fts_token_match": SQL_FTS_MATCH,
        "inverted_index": SQL_INVERTED,
        "embedding_centroids": SQL_CENTROIDS,
        "embedding_near_dup": _sql_embedding_near_dup(),
        "bpe_ish_token_count": SQL_BPE,
        "dedup_clusters": _sql_dedup_clusters(),
        "time_rollup": SQL_TIME_ROLLUP,
        "range_join": SQL_RANGE_JOIN,
        "stateful_user_totals": SQL_STATEFUL,
        "decontaminate": _sql_decontaminate(),
        "train_val_split": _sql_train_val_split(),
        "pii_redact": _sql_pii_redact(),
        "repetition_filter": _sql_repetition_filter(),
        "weighted_mixture": _sql_weighted_mixture(),
        "sequence_pack": _sql_sequence_pack(),
        "streaming_dedup": SQL_STREAM_DEDUP,
        "streaming_enrich": SQL_STREAM_ENRICH,
        "jsonl_roundtrip": SQL_JSONL_ROUNDTRIP,
        "tfidf_top_terms": SQL_TFIDF,
        "bigram_topk": SQL_BIGRAMS,
        "dedup_survivors": _sql_dedup_survivors(),
        "quality_topk_per_source": _sql_quality_topk(),
        "chunk_dedup": SQL_CHUNK_DEDUP,
        "shard_manifest": SQL_SHARD_MANIFEST,
        "shard_balance": _sql_shard_balance(),
        "corpus_stats": SQL_CORPUS_STATS,
        "streaming_interval_join": SQL_STREAM_INTERVAL_JOIN,
        "table_profile": _sql_table_profile(),
        "chunk_windows": _sql_chunk_windows(),
        "tfidf_cosine_pairs": SQL_TFIDF_COSINE,
        "quality_above_median": _sql_quality_above_median(),
        "quantize_embeddings": SQL_QUANTIZE,
        "global_shuffle": _sql_global_shuffle(),
        "curation_pipeline": _sql_curation_pipeline(),
        "incremental_dedup": _sql_incremental_dedup(),
        "lm_score": SQL_LM_SCORE,
        "ccnet_buckets": _sql_ccnet_buckets(),
        "length_batches": packing.length_bucketed_batches_sql(batch_size=8),
        "gopher_rules": (
            "SELECT doc_id, " + text.gopher_rules_sql("text") + " FROM documents"
        ),
        "blocklist_filter": (
            "SELECT doc_id, source, "
            + text.blocklist_hits_sql("text", BLOCKLIST_TERMS)
            + " FROM documents"
        ),
        "c4_line_rules": _sql_c4_line_rules(),
        "quality_classifier": _sql_quality_classifier(),
        "classifier_eval": _sql_classifier_eval(),
        "weighted_topk_sample": (
            "SELECT doc_id, source, n_chars FROM documents "
            + splits.es_weighted_topk_sql("doc_id", "n_chars", k=50)
        ),
        "boilerplate_lines": dedup.boilerplate_line_filter_sql(
            max_freq=2,
            table="(SELECT doc_id, text || chr(10) || '-- shared footer --' AS text"
            " FROM documents)",
        ),
        "contamination_report": _sql_contamination_report(),
        "stratified_sample": _sql_stratified_sample(),
        "skew_report": _sql_skew_report(),
        "rolling_revenue_7d": SQL_ROLLING_7D,
        "customer_deciles": SQL_DECILES,
        "event_funnel": SQL_FUNNEL,
        "corpus_diff": SQL_CORPUS_DIFF,
        "daily_dense_rollup": SQL_DAILY_DENSE,
        "fk_integrity_audit": SQL_FK_AUDIT,
        "merge_upsert": SQL_MERGE_UPSERT,
        "char_health": _sql_char_health(),
        "collocations": SQL_COLLOCATIONS,
        "price_outliers": SQL_PRICE_OUTLIERS,
        "interarrival_stats": SQL_INTERARRIVAL,
        "event_cooccurrence": SQL_COOCCURRENCE,
        "assoc_rules": SQL_ASSOC,
        "length_histogram": SQL_LENGTH_HIST,
        "argmax_per_group": SQL_ARGMAX,
        "embedding_health": SQL_EMBEDDING_HEALTH,
        "key_uniqueness_audit": SQL_KEY_AUDIT,
        "dup_rate_by_source": SQL_DUP_RATE,
        "minmax_normalize": SQL_MINMAX_NORM,
        "winsorize": SQL_WINSORIZE,
        "text_normalize": _sql_text_normalize(),
        "dedup_priority": _sql_dedup_priority(),
        "vocab_encode": _sql_vocab_encode(),
        "oov_rate": _sql_oov_rate(),
        "vocab_update": _sql_vocab_update(),
        "token_budget_cap": splits.token_budget_cap_sql(
            "text", "doc_id", "source", TOKEN_BUDGET
        ),
        "derived_column_conformance": SQL_CONFORMANCE,
        "bm25_search": terms.bm25_search_sql("text", "doc_id", _BM25_QUERY, k=20),
        "hybrid_retrieval": _sql_hybrid_retrieval(),
        "scd2_history": SQL_SCD2,
        "pagerank": _sql_pagerank(),
        "pit_join": _sql_pit_join(),
        "fuzzy_link": _sql_fuzzy_link(),
        "bpe_merges": _sql_bpe_merges(),
        "bpe_encode": _sql_bpe_encode(),
        "tokenizer_fertility": _sql_tokenizer_fertility(),
        "cms_heavy_hitters": _sql_cms_heavy_hitters(),
        "hll_ndv": _sql_hll_ndv(),
        "kmv_sketch": _sql_kmv_sketch(),
        "quantile_sketch": _sql_quantile_sketch(),
        "readability": _sql_readability(),
        "filter_funnel": _sql_filter_funnel(),
        "source_cosine": _sql_source_cosine(),
        "langid_margin": _sql_langid_margin(),
        "dup_matrix": SQL_DUP_MATRIX,
        "trimmed_mean": _sql_trimmed_mean(),
        "corpus_drift_psi": _sql_corpus_drift_psi(),
        "value_hour_corr": SQL_VALUE_HOUR_CORR,
        "source_lang_mi": SQL_SOURCE_LANG_MI,
        "totalprice_conformance": SQL_TOTALPRICE_CONFORMANCE,
        "image_phash_dedup": _sql_image_phash_dedup(),
        "image_ahash_exact_dedup": _sql_image_ahash_exact_dedup(),
        "audio_fingerprint_exact_dedup": _sql_audio_fingerprint_exact_dedup(),
        "video_fingerprint_exact_dedup": _sql_video_fingerprint_exact_dedup(),
        "audio_fingerprint_dedup": _sql_audio_fingerprint_dedup(),
        "bpe_roundtrip": _sql_bpe_roundtrip(),
        "video_fingerprint_dedup": _sql_video_fingerprint_dedup(),
        "cluster_size_histogram": _sql_cluster_size_histogram(),
        "digit_benford": _sql_digit_benford(),
        "activity_gini": SQL_ACTIVITY_GINI,
        "weekly_trend": _sql_weekly_trend(),
        "salted_distinct": SQL_SALTED_DISTINCT,
        "event_anomaly": SQL_EVENT_ANOMALY,
        "decayed_engagement": SQL_DECAYED_ENGAGEMENT,
        "compaction_plan": SQL_COMPACTION_PLAN.format(
            shard_expr=splits.shard_assignment_sql("doc_id", COMPACT_SHARDS, "compact")
        ),
        "random_projection": _sql_random_projection(),
        "shingle_novelty": _sql_shingle_novelty(),
        "charwords": SQL_CHARWORDS,
        "retention_cohorts": SQL_RETENTION,
        "user_growth": SQL_USER_GROWTH,
        "bloom_prefilter": _sql_bloom_prefilter(),
        "dsir_importance": terms.dsir_importance_sql(
            "text", "doc_id", "source = 'src0'", n_buckets=256, top_k=20
        ),
        "vocab_overlap": terms.vocab_overlap_sql("text", "source"),
        "temperature_mixture": splits.temperature_mixture_sql(
            "doc_id", "source", budget=1000
        ),
        # formerly rows-only, upgraded to hash-compared in round 4:
        "multimodal_image_features": _sql_image_features(),
        "multimodal_audio_features": _sql_audio_features(),
        "multimodal_resize": _sql_resize(),
        "multimodal_video_frames": _sql_video_frames(),
        "multimodal_corrupt_isolation": SQL_MM_CORRUPT,
        "streaming_sessions": SQL_STREAM_SESSIONS,
    }
