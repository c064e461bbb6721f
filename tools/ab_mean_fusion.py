"""Interleaved same-process A/B of the r12 _mean_arrays fusion (one
cell-keyed exchange per Lloyd round) vs the r10/r11 posexplode +
re-collect form, reconstructed inline from git history and swapped in by
monkeypatching similarity.kmeans_centroids/_pq_codebooks.

Usage: python tools/ab_mean_fusion.py [runs] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.operators import similarity as S
from csvs_to_sqlite_spark.operators.similarity import (
    EMB_Q,
    PQ_DSUB,
    _pq_assign,
    assign_cells,
)
from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = ["knn_ivfpq_residual", "knn_ivf", "pq_encode", "ann_recall_matrix", "semdedup_prune"]


def old_kmeans_centroids(base, id_col, n_centroids=8, n_iters=2, round_dp=6, dim=64):
    cents = base.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("v").alias("cv")
    )
    for _ in range(n_iters):
        assigned = assign_cells(
            base.select(F.col(id_col), F.col("v").alias("av")), cents, id_col, "av"
        )
        exploded = assigned.select("cell", F.posexplode("av").alias("pos", "x"))
        qsum = F.sum(F.round(F.col("x") * F.lit(EMB_Q)).cast("long"))
        means = exploded.groupBy("cell", "pos").agg(
            F.round((qsum / F.lit(float(EMB_Q))) / F.count("x"), round_dp).alias("m")
        )
        cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cell").alias("centroid_id"),
                F.transform("pm", lambda s: s["m"]).alias("cv"),
            )
        )
    return cents


def old_pq_codebooks(subs, k, iters, d_sub=PQ_DSUB):
    cents = subs.where(F.col("vid") < k).select(
        "s", F.col("vid").alias("cid"), F.col("sv").alias("cv")
    )
    for _ in range(iters):
        assigned = _pq_assign(subs, cents)
        expl = assigned.select("s", "cell", F.posexplode("sv").alias("pos", "x"))
        qsum = F.sum(F.round(F.col("x") * F.lit(EMB_Q)).cast("long"))
        means = expl.groupBy("s", "cell", "pos").agg(
            F.round((qsum / F.lit(float(EMB_Q))) / F.count("x"), 6).alias("mu")
        )
        cents = (
            means.groupBy("s", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm"))
            .select(
                "s",
                F.col("cell").alias("cid"),
                F.transform("pm", lambda t: t["mu"]).alias("cv"),
            )
        )
    return cents


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT
    import __spark_entry__ as E

    spark = get_spark("ab_mean_fusion")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    new_km, new_pq = S.kmeans_centroids, S._pq_codebooks

    def run(name, variant):
        # kmeans_centroids keeps the posexplode form in BOTH variants
        # (the dim=64 fusion was measured-and-rejected); only the PQ
        # codebook means differ.
        S._pq_codebooks = old_pq_codebooks if variant == "old" else new_pq
        try:
            spark.sparkContext.setJobDescription(f"abmf:{name}:{variant}")
            t0 = time.time()
            df = qs[name](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            S._pq_codebooks = new_pq
            spark.catalog.clearCache()

    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    out = {}
    for name in names:
        run(name, "new"); run(name, "old")  # warm both off the record
        news, olds = [], []
        for _ in range(runs):
            news.append(run(name, "new"))
            olds.append(run(name, "old"))
        news.sort(); olds.sort()
        out[name] = {
            "new_median_s": round(news[len(news) // 2], 3),
            "old_median_s": round(olds[len(olds) // 2], 3),
            "new_all": [round(x, 3) for x in news],
            "old_all": [round(x, 3) for x in olds],
        }
        print(name, json.dumps(out[name]), flush=True)
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    out["_host"] = {"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3), "runs": runs, "sf": SF}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
