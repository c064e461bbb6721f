"""Interleaved A/B of the r12 single-persist ngram_jaccard_pairs
(pre-cap postings cached once, capped frame re-derived per consumer via
broadcast anti-join) vs the r11 double-persist form, reconstructed
inline. VERDICT r11 item 5's 'Done' requires the bench entry flat.

Usage: python tools/ab_jaccard_persist.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.functions import qmath
from csvs_to_sqlite_spark.operators.dedup import token_posting
from csvs_to_sqlite_spark.session import get_spark, prep_session

import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_jaccard(df, text_col, id_col, threshold):
    """r11 double-persist form (auto cap path only), verbatim."""
    tok = token_posting(df, text_col, id_col, 3).persist()
    dfreq = tok.groupBy("token").count()
    ndocs = df.agg(F.count(F.lit(1)).alias("__ndocs__"))
    cap = F.greatest(
        F.lit(1000).cast("long"), (F.col("__ndocs__") * F.lit(0.01)).cast("long")
    )
    drop = (
        dfreq.crossJoin(F.broadcast(ndocs)).where(F.col("count") > cap).select("token")
    )
    tok = tok.join(F.broadcast(drop), "token", "left_anti").persist()
    sizes = tok.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            qmath.qdiv_count(
                F.col("inter") * F.lit(1_000_000),
                (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("long"),
                1,
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_jaccard_persist")
    spark.sparkContext.setLogLevel("ERROR")

    def run(variant):
        prep_session(spark)
        d = E._t(spark, SF, "documents")
        spark.sparkContext.setJobDescription(f"abjp:{variant}")
        t0 = time.time()
        if variant == "old":
            df = old_jaccard(d, "text", "doc_id", 0.8)
        else:
            df = E.q_dedup_jaccard_pairs(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    run("new"); run("old")
    news, olds = [], []
    for _ in range(runs):
        news.append(run("new")); olds.append(run("old"))
    news.sort(); olds.sort()
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    print(json.dumps({
        "new_median_s": round(news[len(news) // 2], 3),
        "old_median_s": round(olds[len(olds) // 2], 3),
        "new_all": [round(x, 3) for x in news],
        "old_all": [round(x, 3) for x in olds],
        "steal_pct": steal, "probe_s": round(max(probe0, probe1), 3),
    }))


if __name__ == "__main__":
    main()
