"""Approximate aggregates: bounded-error checks against exact values
(cross-engine hashing can't verify these — sketches are engine-specific)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_percentile_approx_near_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_ivf_multiprobe_recall_vs_bruteforce(spark):
    """IVF recall@5 against exact brute force, on the sf0.01 corpus.

    This corpus is synthetic and cluster-FREE (near-random directions;
    max pairwise cosine 0.51), which is the worst case for a coarse
    quantizer: true neighbors scatter across cells, so these bounds are
    the floor, not the ceiling, of IVF recall on real clustered
    embeddings. Measured: P=1 0.74, P=2 0.86, P=3 0.92 — probing more
    cells must recover monotonically more of the exact answer."""
    from csvs_to_sqlite_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    recalls = {}
    for probe in (1, 2, 3):
        ivf = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(emb, q, k=5, n_probe=probe).collect()
        }
        recalls[probe] = len(bf & ivf) / len(bf)
    assert recalls[1] <= recalls[2] <= recalls[3]
    assert recalls[2] >= 0.8
    assert recalls[3] >= 0.9
