"""A/B (VERDICT r11 item 7): q_ann_recall_matrix with the shared coarse
centroids PERSISTED vs the shipped lazy sharing (exchange reuse).
Interleaved, same process, noop sink.

Usage: python tools/ab_ann_recall_share.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.operators import similarity
from csvs_to_sqlite_spark.session import get_spark, prep_session

import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, persist_coarse):
    prep_session(spark)
    emb = E._t(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    brute = similarity.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    base = emb.select(F.col("vec_id"), similarity._as_double(F.col("embedding")).alias("v"))
    coarse = similarity.kmeans_centroids(base, "vec_id", E.IVF_CENTROIDS, E.IVF_KMEANS_ITERS)
    if persist_coarse:
        coarse = coarse.persist()
    tiers = {
        "lsh": similarity.lsh_topk(emb, queries, k=5, n_planes=4, dim=64),
        "ivf": similarity.ivf_topk(emb, queries, k=5, n_centroids=E.IVF_CENTROIDS,
            n_probe=E.IVF_PROBE, kmeans_iters=E.IVF_KMEANS_ITERS, coarse=coarse),
        "ivfpq": similarity.ivfpq_topk(emb, queries, k=5, n_centroids=E.IVF_CENTROIDS,
            n_probe=E.IVF_PROBE, kmeans_iters=E.IVF_KMEANS_ITERS, coarse=coarse),
    }
    outs = []
    for name, approx in tiers.items():
        a = approx.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        hits = F.coalesce(F.sum("hit"), F.lit(0))
        outs.append(
            brute.join(a, ["query_id", "neighbor_id"], "left").groupBy("query_id")
            .agg(hits.cast("long").alias("hits"), F.round(hits / 5.0, 6).alias("recall"))
            .select(F.lit(name).alias("index_name"), "query_id", "hits", "recall")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_ann_recall_share")
    spark.sparkContext.setLogLevel("ERROR")

    def run(variant):
        spark.sparkContext.setJobDescription(f"abars:{variant}")
        t0 = time.time()
        build(spark, variant == "persist").write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    run("persist"); run("lazy")
    ps, ls = [], []
    for _ in range(runs):
        ps.append(run("persist")); ls.append(run("lazy"))
    ps.sort(); ls.sort()
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    print(json.dumps({
        "persist_median_s": round(ps[runs // 2], 3),
        "lazy_median_s": round(ls[runs // 2], 3),
        "persist_all": [round(x, 3) for x in ps],
        "lazy_all": [round(x, 3) for x in ls],
        "steal_pct": steal, "probe_s": round(max(probe0, probe1), 3),
    }))


if __name__ == "__main__":
    main()
