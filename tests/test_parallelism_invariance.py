"""Results must not depend on physical parallelism: re-running an
operator over the same data repartitioned 1-way and 7-way must produce
identical rows. This is the local-mode stand-in for 'same answer on a
laptop and on 1000 executors' — it catches partition-dependent logic
(driver-side boundary scans, first-appearance ordering, iterative
label propagation) that small-SF correctness checks can miss."""

import pytest
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators import dedup, similarity, splits, terms

SF = "/root/testdata/sf0.01"


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.mark.parametrize("parts", [1, 7])
def test_token_budget_cap_partitioning_invariant(spark, docs, parts):
    base = rows_of(splits.token_budget_cap(docs, "text", "doc_id", "source", budget=700))
    got = rows_of(
        splits.token_budget_cap(
            docs.repartition(parts), "text", "doc_id", "source", budget=700
        )
    )
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_semdedup_partitioning_invariant(spark, emb, parts):
    base = rows_of(similarity.semdedup_prune(emb, n_centroids=8))
    got = rows_of(similarity.semdedup_prune(emb.repartition(parts), n_centroids=8))
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_dedup_clusters_partitioning_invariant(spark, docs, parts):
    d = docs.repartition(parts)
    pairs = dedup.minhash_lsh_pairs(d, "text", "doc_id")
    got = rows_of(dedup.dedup_clusters(d, pairs, "doc_id"))
    base_pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id")
    base = rows_of(dedup.dedup_clusters(docs, base_pairs, "doc_id"))
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_global_shuffle_partitioning_invariant(spark, docs, parts):
    base = rows_of(splits.global_shuffle(docs, "doc_id").select("doc_id", "shuffle_rank"))
    got = rows_of(
        splits.global_shuffle(docs.repartition(parts), "doc_id").select("doc_id", "shuffle_rank")
    )
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_vocab_encode_partitioning_invariant(spark, docs, parts):
    d = docs.repartition(parts)
    vocab = terms.build_vocab(d, "text", top_k=50)
    got = rows_of(terms.encode_docs(d, "text", "doc_id", vocab).select("doc_id", "ids"))
    base_vocab = terms.build_vocab(docs, "text", top_k=50)
    base = rows_of(
        terms.encode_docs(docs, "text", "doc_id", base_vocab).select("doc_id", "ids")
    )
    assert got == base


# --- round-4 quantized-aggregate determinism: not just the same SET of
# rows, the same FLOAT BITS under different physical parallelism (the
# contract that lets round(sum...) outputs be hash-compared at all) ----


@pytest.mark.parametrize("parts", [1, 7])
def test_kmeans_centroids_bitwise_invariant(spark, emb, parts):
    base = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    ref = rows_of(similarity.kmeans_centroids(base, "vec_id", n_centroids=4))
    got = rows_of(
        similarity.kmeans_centroids(base.repartition(parts), "vec_id", n_centroids=4)
    )
    assert got == ref  # tuple == is exact (bit-level for non-nan floats)


@pytest.mark.parametrize("parts", [1, 7])
def test_lm_score_bitwise_invariant(spark, docs, parts):
    ref = rows_of(terms.lm_score(docs, "text", "doc_id"))
    got = rows_of(terms.lm_score(docs.repartition(parts), "text", "doc_id"))
    assert got == ref


@pytest.mark.parametrize("parts", [1, 7])
def test_tfidf_cosine_values_bitwise_invariant(spark, docs, parts):
    ref = rows_of(terms.tfidf_cosine_pairs(docs, "text", "doc_id"))
    got = rows_of(terms.tfidf_cosine_pairs(docs.repartition(parts), "text", "doc_id"))
    assert got == ref


@pytest.mark.parametrize("parts", [1, 7])
def test_corpus_entropy_bitwise_invariant(spark, docs, parts):
    ref = rows_of(terms.corpus_stats(docs, "text", "source"))
    got = rows_of(terms.corpus_stats(docs.repartition(parts), "text", "source"))
    assert got == ref


@pytest.mark.parametrize("parts", [1, 7])
def test_quantized_mean_quality_bitwise_invariant(spark, docs, parts):
    """The dataset_card shape: mean of 6-dp per-doc quality, quantized to
    exact micro-unit sums — identical bits at any partitioning."""
    from csvs_to_sqlite_spark.operators import text

    def card(frame):
        q = text.quality_score(F.col("text")).alias("q")
        qsum = F.sum(F.round(F.col("q") * 1000000).cast("long"))
        return frame.select(q).agg(
            F.round((qsum / F.lit(1000000.0)) / F.count("q"), 6).alias("mean_q")
        )

    ref = rows_of(card(docs))
    got = rows_of(card(docs.repartition(parts)))
    assert got == ref


@pytest.mark.parametrize("parts", [1, 7])
def test_bpe_encode_partitioning_invariant(spark, docs, parts):
    """Merge learning (TakeOrdered argmax with total tie-break) and the
    per-word fold must give bit-identical encodings at any parallelism."""
    from csvs_to_sqlite_spark.operators.bpe import encode_bpe

    base = rows_of(encode_bpe(spark, docs, "text", n_merges=4))
    got = rows_of(encode_bpe(spark, docs.repartition(parts), "text", n_merges=4))
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_weighted_topk_partitioning_invariant(spark, docs, parts):
    base = rows_of(
        splits.es_weighted_topk(docs, "doc_id", "n_chars", k=50).select(
            "doc_id", "n_chars"
        )
    )
    got = rows_of(
        splits.es_weighted_topk(
            docs.repartition(parts), "doc_id", "n_chars", k=50
        ).select("doc_id", "n_chars")
    )
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_minhash_calibration_partitioning_invariant(spark, docs, parts):
    base = rows_of(dedup.minhash_calibration(docs, "text", "doc_id"))
    got = rows_of(dedup.minhash_calibration(docs.repartition(parts), "text", "doc_id"))
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_hll_ndv_bitwise_invariant(spark, docs, parts):
    from csvs_to_sqlite_spark.operators.sketch import hll_ndv

    base = rows_of(hll_ndv(docs, "text", "source"))
    got = rows_of(hll_ndv(docs.repartition(parts), "text", "source"))
    assert got == base  # register max-agg + integer numerator: order-free


@pytest.mark.parametrize("parts", [1, 7])
def test_pq_encode_bitwise_invariant(spark, emb, parts):
    base = rows_of(similarity.pq_encode(emb))
    got = rows_of(similarity.pq_encode(emb.repartition(parts)))
    assert got == base  # quantized Lloyd means + per-row double folds


@pytest.mark.parametrize("parts", [1, 7])
def test_mmr_rerank_invariant(spark, emb, parts):
    base = rows_of(similarity.mmr_rerank(emb, query_id=0, n_candidates=25, k=10))
    got = rows_of(
        similarity.mmr_rerank(emb.repartition(parts), query_id=0, n_candidates=25, k=10)
    )
    assert got == base

@pytest.mark.parametrize("parts", [1, 7])
def test_ivfpq_topk_bitwise_invariant(spark, emb, parts):
    q = emb.where(F.col("vec_id") < 10)
    base = rows_of(similarity.ivfpq_topk(emb, q, k=5))
    e2 = emb.repartition(parts)
    got = rows_of(similarity.ivfpq_topk(e2, e2.where(F.col("vec_id") < 10), k=5))
    assert got == base  # integer micro-unit ADC sums: order-free ranking

@pytest.mark.parametrize("parts", [1, 7])
def test_kmv_sketch_bitwise_invariant(spark, docs, parts):
    from csvs_to_sqlite_spark.operators.sketch import kmv_pair_report

    base = rows_of(kmv_pair_report(docs, "text", "source"))
    got = rows_of(kmv_pair_report(docs.repartition(parts), "text", "source"))
    assert got == base  # K-min sets depend only on hash values

@pytest.mark.parametrize("parts", [1, 7])
def test_ivfpq_residual_bitwise_invariant(spark, emb, parts):
    q = emb.where(F.col("vec_id") < 10)
    base = rows_of(similarity.ivfpq_residual_topk(emb, q, k=5))
    e2 = emb.repartition(parts)
    got = rows_of(
        similarity.ivfpq_residual_topk(e2, e2.where(F.col("vec_id") < 10), k=5)
    )
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_source_cosine_bitwise_invariant(spark, docs, parts):
    from csvs_to_sqlite_spark.operators.terms import source_unigram_cosine

    out = rows_of(source_unigram_cosine(docs.repartition(parts), "text", "source"))
    base = rows_of(source_unigram_cosine(docs, "text", "source"))
    assert out == base


@pytest.mark.parametrize("parts", [1, 7])
def test_salted_distinct_bitwise_invariant(spark, parts):
    from csvs_to_sqlite_spark.operators.partitioning import salted_distinct_count
    from csvs_to_sqlite_spark.streaming.windows import load_events

    e = load_events(spark, f"{SF}/events.parquet")
    base = rows_of(salted_distinct_count(e, "event_type", "user_id"))
    out = rows_of(salted_distinct_count(e.repartition(parts), "event_type", "user_id"))
    assert out == base


@pytest.mark.parametrize("parts", [1, 7])
def test_global_rank_partitioning_invariant(spark, docs, parts):
    from csvs_to_sqlite_spark.operators.rowid import global_rank

    base = rows_of(
        global_rank(docs.select("doc_id"), [F.col("doc_id").desc()], "r")
    )
    got = rows_of(
        global_rank(
            docs.select("doc_id").repartition(parts), [F.col("doc_id").desc()], "r"
        )
    )
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_global_cumsum_partitioning_invariant(spark, docs, parts):
    from csvs_to_sqlite_spark.operators.rowid import global_cumsum

    sel = docs.select("doc_id", F.length("text").cast("long").alias("w"))
    base = rows_of(global_cumsum(sel, ["doc_id"], "w", "c"))
    got = rows_of(global_cumsum(sel.repartition(parts), ["doc_id"], "w", "c"))
    assert got == base


@pytest.mark.parametrize("parts", [1, 7])
def test_ivf_index_append_partitioning_invariant(spark, emb, parts, tmp_path):
    """write-then-append under different upstream partitionings must
    produce identical query answers (the on-disk cell layout may differ
    in file counts, never in content)."""
    from csvs_to_sqlite_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_topk,
        ivf_index_write,
    )

    path = str(tmp_path / f"ivf_{parts}")
    ivf_index_write(
        emb.where("vec_id % 5 != 0").repartition(parts), path, n_centroids=8,
        kmeans_iters=2,
    )
    ivf_index_append(spark, path, emb.where("vec_id % 5 = 0").repartition(parts))
    got = rows_of(ivf_index_topk(spark, path, emb.where("vec_id < 5"), k=5, n_probe=2))
    base_path = str(tmp_path / "ivf_base")
    ivf_index_write(emb.where("vec_id % 5 != 0"), base_path, n_centroids=8, kmeans_iters=2)
    ivf_index_append(spark, base_path, emb.where("vec_id % 5 = 0"))
    assert got == rows_of(
        ivf_index_topk(spark, base_path, emb.where("vec_id < 5"), k=5, n_probe=2)
    )


@pytest.mark.parametrize("parts", [1, 7])
def test_ivf_rebalance_plan_partitioning_invariant(spark, parts):
    """The rebalance plan (variance argmax + integer median split) is an
    exact integer computation — bit-identical under any input layout,
    and every split must cover its cell (n_left + n_right = n_vectors,
    both sides nonempty)."""
    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.operators.similarity import ivf_rebalance_plan

    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.sin(F.col("id") * (i + 1) * 0.7) * 0.5
                    + F.when(F.col("id") % 3 == 0, 0.8).otherwise(-0.2)
                ).cast("float")
                for i in range(8)
            ]
        ).alias("embedding"),
    )
    rows_of = lambda df: sorted(tuple(r) for r in df.collect())
    base = rows_of(ivf_rebalance_plan(emb, n_centroids=4, kmeans_iters=1))
    got = rows_of(
        ivf_rebalance_plan(emb.repartition(parts), n_centroids=4, kmeans_iters=1)
    )
    assert base == got
    assert len(base) > 0
    for cell, n, dim, split_q, n_left, n_right in base:
        assert n_left + n_right == n
        assert n_left >= 1 and n_right >= 0 and 0 <= dim < 8


@pytest.mark.parametrize("parts", [1, 7])
def test_minhash_lsh_edges_partitioning_invariant(spark, parts):
    """Bounded star edges are a pure function of the md5 signatures —
    the edge SET must be bit-identical under any input layout."""
    from csvs_to_sqlite_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows_of = lambda df: sorted(tuple(r) for r in df.collect())
    base = rows_of(dedup.minhash_lsh_edges(docs, "text", "doc_id"))
    got = rows_of(
        dedup.minhash_lsh_edges(docs.repartition(parts), "text", "doc_id")
    )
    assert base == got


@pytest.mark.parametrize("parts", [1, 7])
def test_split_leakage_partitioning_invariant(spark, parts):
    """The leakage matrix folds exact integers over md5-derived splits
    and buckets — bit-identical under any input layout."""
    from csvs_to_sqlite_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows_of = lambda df: sorted(tuple(r) for r in df.collect())
    base = rows_of(dedup.split_leakage(docs, "text", "doc_id"))
    got = rows_of(dedup.split_leakage(docs.repartition(parts), "text", "doc_id"))
    assert base == got
