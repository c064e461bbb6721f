"""Interleaved same-process A/B for the four r11 perf-weak bench entries
(VERDICT r11 item 2): windowed_event_counts, simhash_fingerprints,
knn_lsh, minhash_lsh_pairs.

For each entry, variant NEW is the shipped r11 code and variant OLD is
the r10 form reconstructed inline (from this repo's own git history —
commits 8c54355 / 42abf27). minhash_lsh_pairs had NO code change on its
postings=None path in r11 (bbd1abe only added the postings= parameter),
so its "A/B" is a settled isolated re-measure against the r10 floor.

Methodology (guide §1): one Spark session, noop sink, per-run wall
times, A/B/A/B interleaving so host drift hits both variants equally;
steal%% + single-core probe recorded before/after (bench.py's gates).

Usage: python tools/ab_perf_weak.py [runs_per_variant] [target ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.functions.hashing import md5_long
from csvs_to_sqlite_spark.operators import dedup, similarity
from csvs_to_sqlite_spark.operators.dedup import token_posting
from csvs_to_sqlite_spark.session import get_spark, prep_session

import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---- OLD variants (r10 forms, reconstructed from our own git history) ----

def old_simhash(df, text_col, id_col, bits=dedup.SIMHASH_BITS, shingle_n=3):
    """r10 simhash: CASE WHEN +-1 votes (pre-8c54355)."""
    tok = token_posting(df, text_col, id_col, shingle_n).withColumn(
        "h", md5_long(F.col("token"), seed="simhash")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fingerprint = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("long")
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return agg.select(F.col(id_col), fingerprint.alias("simhash"))


def old_lsh_topk(emb, query, id_col="vec_id", vec_col="embedding",
                 k=5, n_planes=4, dim=64):
    """r10 lsh_topk: per-pair norm recompute (pre-42abf27)."""
    _as_double, _norm, _dot = similarity._as_double, similarity._norm, similarity._dot
    planes = similarity.hyperplanes(dim, n_planes)
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", similarity.bucket_expr(F.col("cv"), planes))
    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", similarity.bucket_expr(F.col("qv"), planes))
    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
    )
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def make_variants(spark):
    """{target: {"new": thunk, "old": thunk}} — each thunk builds the DF
    (or, for streaming, runs the bounded drive) exactly as the bench
    times it."""
    from csvs_to_sqlite_spark.streaming import windows as W

    def new_windowed():
        return E.q_windowed_event_counts(spark, SF)

    def old_windowed():
        # r10 behavior: idle no-data micro-batch runs after the data batch
        prev = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        import contextlib

        @contextlib.contextmanager
        def idle_on(_s):
            _s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
            try:
                yield
            finally:
                _s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev)

        saved = W._no_idle_batches
        W._no_idle_batches = idle_on
        try:
            return E.q_windowed_event_counts(spark, SF)
        finally:
            W._no_idle_batches = saved

    def new_simhash():
        prep_session(spark)
        d = E._t(spark, SF, "documents")
        return dedup.simhash(d, "text", "doc_id")

    def old_simhash_q():
        prep_session(spark)
        d = E._t(spark, SF, "documents")
        return old_simhash(d, "text", "doc_id")

    def new_knn_lsh():
        return E.q_knn_lsh(spark, SF)

    def old_knn_lsh():
        prep_session(spark)
        emb = E._t(spark, SF, "embeddings")
        out = old_lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5, n_planes=4, dim=64)
        return out.select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rnk")
        )

    def minhash_pairs():
        return E.q_minhash_lsh_pairs(spark, SF)

    return {
        "windowed_event_counts": {"new": new_windowed, "old": old_windowed},
        "simhash_fingerprints": {"new": new_simhash, "old": old_simhash_q},
        "knn_lsh": {"new": new_knn_lsh, "old": old_knn_lsh},
        # no r11 code change on this path: settled re-measure only
        "minhash_lsh_pairs": {"new": minhash_pairs, "old": minhash_pairs},
    }


def time_thunk(spark, thunk) -> float:
    t0 = time.time()
    df = thunk()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    targets = sys.argv[2:] or None
    spark = get_spark("ab_perf_weak")
    spark.sparkContext.setLogLevel("ERROR")
    variants = make_variants(spark)
    if targets:
        variants = {k: v for k, v in variants.items() if k in targets}

    stat0 = _cpu_stat()
    probe0 = min(_single_core_probe() for _ in range(3))
    out = {}
    for name, vv in variants.items():
        # warm both paths once (JIT/codegen/file-listing warmup off the record)
        spark.sparkContext.setJobDescription(f"ab:{name}:warm")
        time_thunk(spark, vv["new"]); time_thunk(spark, vv["old"])
        news, olds = [], []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab:{name}:new:{i}")
            news.append(time_thunk(spark, vv["new"]))
            spark.sparkContext.setJobDescription(f"ab:{name}:old:{i}")
            olds.append(time_thunk(spark, vv["old"]))
        news.sort(); olds.sort()
        out[name] = {
            "new_median_s": round(news[len(news) // 2], 3),
            "old_median_s": round(olds[len(olds) // 2], 3),
            "new_all": [round(x, 3) for x in news],
            "old_all": [round(x, 3) for x in olds],
        }
        print(name, json.dumps(out[name]), flush=True)
    stat1 = _cpu_stat()
    probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    out["_host"] = {"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3), "runs": runs, "sf": SF}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
