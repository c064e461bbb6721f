"""Snapshot .explain('formatted') plans of selected queries() entries into
per-query files (plans/<round>/<query>_<tag>.txt, round from $SPARK_GRAFT_PLANS_ROUND, default r12) — the optimization round's
before/after evidence.

Usage: python tools/plan_snapshot.py <tag> [query ...]
(default queries: the bench list + the round's optimization targets)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # bench list
    "scan_filter_project", "dim_extract_first_appearance",
    "fk_rewrite_broadcast", "denormalize_star", "semi_join_urgent",
    "agg_pricing_summary", "rollup_returnflag", "topk_per_group",
    "running_revenue", "sessionize_events", "dedup_exact",
    "dedup_jaccard_pairs", "minhash_lsh_pairs", "simhash_fingerprints",
    "knn_bruteforce", "knn_lsh", "text_token_stats", "text_fingerprints",
    # optimization targets beyond the bench
    "knn_ivf", "knn_ivfpq", "knn_ivfpq_residual", "pq_encode",
    "semdedup_prune", "ann_recall_matrix", "ivf_rebalance_query",
    "cluster_size_histogram", "dedup_survivors", "dedup_clusters",
    "bpe_encode", "bpe_merges", "image_phash_dedup",
    "video_fingerprint_dedup", "minhash_calibration",
    "minhash_threshold_curve", "dedup_index_recall", "mixed_language",
    "text_langid", "filter_funnel", "embedding_near_dup",
    "canonical_g_format", "dedup_ensemble", "tpch_q2", "tpch_q21",
]

# streaming queries materialize their plan at runtime — no static explain
STREAMING = {
    "windowed_event_counts", "streaming_sessions", "stateful_user_totals",
    "streaming_dedup", "streaming_enrich", "streaming_interval_join",
}


def explain(df, mode="formatted"):
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from csvs_to_sqlite_spark.session import get_spark

    spark = get_spark("plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        if name in STREAMING:
            with open(path, "w") as f:
                f.write(f"{name}: streaming query — plan materializes at runtime;\n"
                        "see the operator source and the round's OPTIMIZATION_r*.md for the "
                        "runtime-shape evidence.\n")
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = explain(df)
        except Exception as e:  # snapshot must not die on one query
            txt = f"ERROR building {name}: {e}"
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n{txt}\n")
        spark.catalog.clearCache()
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
