"""Prototype: PSI totals via broadcast 1-row agg crossJoin instead of
unpartitioned window sums. Variant A keeps the two per-snapshot bucket
aggregates + inner join; variant B pivots a tagged union so the join's
isnotnull pushdown can't split the reused subtree."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions import qmath
from csvs_to_sqlite_spark.session import get_spark, prep_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

import __spark_entry__ as E


def _snap_b(base):
    return base.where(F.col("doc_id") % 3 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat_ws(" ", "text", "text")
        ).otherwise(F.col("text")),
    )


def _buckets(df, cname):
    b = (F.length(F.bin(F.length("text"))) - 1).cast("long")
    return df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias(cname)
    )


def _finish(j):
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


def variant_a(spark, sf_dir):
    prep_session(spark)
    base = E._t(spark, sf_dir, "documents")
    a_raw = _buckets(base, "n_a")
    ta = a_raw.agg(F.sum("n_a").cast("long").alias("na"))
    a = a_raw.crossJoin(F.broadcast(ta))
    b_raw = _buckets(_snap_b(base), "n_b")
    tb = b_raw.agg(F.sum("n_b").cast("long").alias("nb"))
    bb = b_raw.crossJoin(F.broadcast(tb))
    return _finish(a.join(bb, "bucket"))


def variant_b(spark, sf_dir):
    prep_session(spark)
    base = E._t(spark, sf_dir, "documents")
    b_expr = (F.length(F.bin(F.length("text"))) - 1).cast("long")
    tagged = base.select(b_expr.alias("bucket"), F.lit(0).alias("side")).unionAll(
        _snap_b(base).select(b_expr.alias("bucket"), F.lit(1).alias("side"))
    )
    agg = tagged.groupBy("bucket").agg(
        F.count(F.when(F.col("side") == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("side") == 1, 1)).cast("long").alias("n_b"),
    )
    tot = agg.agg(
        F.sum("n_a").cast("long").alias("na"),
        F.sum("n_b").cast("long").alias("nb"),
    )
    j = (
        agg.crossJoin(F.broadcast(tot))
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    return _finish(j)


def final_plan(df):
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    fin = s.split("== Initial Plan ==")[0]
    return s, fin


if __name__ == "__main__":
    spark = get_spark("proto_psi", cpus=8)
    old = [tuple(r) for r in E.q_corpus_drift_psi(spark, SF).collect()]
    for name, fn in (("A", variant_a), ("B", variant_b)):
        df = fn(spark, SF)
        rows = [tuple(r) for r in df.collect()]
        s, fin = final_plan(df)
        from tests.test_plans import single_partition_windows
        print(f"=== variant {name}: final-plan scans:", fin.count("Scan parquet"),
              "reused:", fin.count("ReusedExchange"),
              "spw:", single_partition_windows(s),
              "rows==old:", rows == old, len(rows))
