"""Prototype: MI totals via broadcast 1-row agg crossJoin instead of
unpartitioned window sums. Checks whether ReuseExchange keeps the executed
plan at ONE parquet scan (the 100 TB property the r11 window form bought)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csvs_to_sqlite_spark.session import get_spark, prep_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

import __spark_entry__ as E


def candidate(spark, sf_dir):
    prep_session(spark)
    d = E._t(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("nij")
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


if __name__ == "__main__":
    spark = get_spark("proto_mi", cpus=8)
    df = candidate(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(plan)
    print("=== scan parquet count:", plan.count("Scan parquet"))
    print("=== ReusedExchange count:", plan.count("ReusedExchange"))
    from tests.test_plans import single_partition_windows
    print("=== single-partition windows:", single_partition_windows(plan))
    old = E.q_source_lang_mi(spark, SF)
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in old.collect()]
    print("=== rows equal old impl:", a == b, len(a))

    # post-execution final adaptive plan: does AQE stage-reuse collapse
    # the identical exchange subtrees so parquet is scanned once?
    df2 = candidate(spark, SF)
    df2.write.format("noop").mode("overwrite").save()
    fin = df2._jdf.queryExecution().executedPlan().toString()
    print(fin[:4000])
    print("=== final scan parquet count:", fin.count("Scan parquet"))
    print("=== final reused:", fin.count("ReusedExchange") + fin.count("TableCacheQueryStage") + fin.count("ShuffleQueryStage"))
