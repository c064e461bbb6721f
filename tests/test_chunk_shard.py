"""Units for substring-level chunk dedup (dedup.chunk_dedup), the
deterministic sharded export (splits.shard_assignment +
parquet_sink.write_shards), and per-source corpus stats
(terms.corpus_stats)."""

import hashlib
import math

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.hashing import py_md5_long
from csvs_to_sqlite_spark.operators import splits
from csvs_to_sqlite_spark.operators.dedup import chunk_dedup
from csvs_to_sqlite_spark.operators.splits import shard_assignment
from csvs_to_sqlite_spark.operators.terms import corpus_stats
from csvs_to_sqlite_spark.sinks.parquet_sink import write_shards


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_chunk_dedup_first_occurrence_wins(spark):
    # width=2 chunks: doc1 -> ["a b","c d"], doc2 -> ["a b","x y"],
    # doc3 -> ["c d"]; repeated chunks survive only at their first site
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "c d")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in chunk_dedup(docs, "text", "doc_id", width=2).collect()
    }
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert out[1].clean_digest == _md5("a b c d")
    assert (out[2].n_chunks, out[2].n_kept) == (2, 1)
    assert out[2].clean_digest == _md5("x y")  # "a b" deduped away
    assert 3 not in out  # doc3's only chunk first appeared in doc1


def test_chunk_dedup_partial_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "q")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, "text", "doc_id", width=2).collect()}
    # trailing partial chunk kept as-is; whitespace-only doc vanishes
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert out[1].clean_digest == _md5("a b c")
    assert 2 not in out
    assert (out[3].n_chunks, out[3].n_kept) == (1, 1)


def test_shard_assignment_matches_python_md5(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.shard
        for r in df.select(
            "doc_id", shard_assignment(F.col("doc_id"), 8).alias("shard")
        ).collect()
    }
    for i in range(50):
        assert got[i] == py_md5_long(str(i), seed="shard") % 8


def test_write_shards_layout_and_stability(spark, tmp_path):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_shards(df, path, "doc_id", n_shards=4, sort_within=["doc_id"])
    back = spark.read.parquet(path)
    assert back.count() == 100
    shards = {r.shard for r in back.select("shard").distinct().collect()}
    assert shards <= set(range(4))
    # stability: the same row has the same shard in a grown corpus
    placement = {r.doc_id: r.shard for r in back.collect()}
    grown = spark.range(200).select(F.col("id").alias("doc_id"))
    path2 = str(tmp_path / "shards2")
    write_shards(grown, path2, "doc_id", n_shards=4)
    placement2 = {r.doc_id: r.shard for r in spark.read.parquet(path2).collect()}
    assert all(placement2[k] == v for k, v in placement.items())


def test_corpus_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "c", "s1"), (3, "x y", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in corpus_stats(docs, "text", "source").collect()}
    s1 = out["s1"]  # counts: a=2, b=1, c=1; N=4
    assert (s1.n_tokens, s1.n_types) == (4, 3)
    assert s1.type_token_ratio == 0.75
    expected_h = math.log(4) - (2 * math.log(2)) / 4
    assert s1.entropy == round(expected_h, 6)
    s2 = out["s2"]  # uniform over 2 -> ln 2
    assert s2.entropy == round(math.log(2), 6)


# ---------------------------------------------------------------------------
# property: chunk_dedup vs a pure-Python model
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["a", "b", "c", "dd", "ee"]
TEXTS = st.lists(st.sampled_from(WORDS), min_size=0, max_size=9).map(" ".join)


def py_chunk_dedup(docs, width):
    """Pure-Python model: (doc_id, text) -> {doc_id: (n_chunks, n_kept,
    clean_text)}; first occurrence = lexicographic min (doc_id, idx)."""
    first = {}
    chunked = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().strip().split() if t]
        chunks = [
            " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
        ]
        chunked[doc_id] = chunks
        for idx, ch in enumerate(chunks):
            if ch not in first or (doc_id, idx) < first[ch]:
                first[ch] = (doc_id, idx)
    out = {}
    for doc_id, chunks in chunked.items():
        kept = [
            ch for idx, ch in enumerate(chunks) if first[ch] == (doc_id, idx)
        ]
        if kept:
            out[doc_id] = (len(chunks), len(kept), " ".join(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(TEXTS, min_size=1, max_size=8),
    width=st.integers(min_value=1, max_value=4),
)
def test_chunk_dedup_matches_python_model(spark, texts, width):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.clean_digest)
        for r in chunk_dedup(df, "text", "doc_id", width=width).collect()
    }
    want = {
        k: (n, m, _md5(txt)) for k, (n, m, txt) in py_chunk_dedup(docs, width).items()
    }
    assert got == want


def test_global_shuffle_total_order_and_reseed(spark):
    from csvs_to_sqlite_spark.operators.splits import global_shuffle

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    out = global_shuffle(df, "doc_id")
    ranks = [r.shuffle_rank for r in out.collect()]
    assert sorted(ranks) == list(range(1, 201))  # dense 1..N, no gaps/dupes
    # deterministic across invocations
    again = {r.doc_id: r.shuffle_rank for r in global_shuffle(df, "doc_id").collect()}
    first = {r.doc_id: r.shuffle_rank for r in out.collect()}
    assert again == first
    # a different seed draws a genuinely different order
    other = {r.doc_id: r.shuffle_rank for r in global_shuffle(df, "doc_id", seed="epoch2").collect()}
    assert other != first and sorted(other.values()) == list(range(1, 201))


def py_chunk_windows(docs, max_len, stride):
    out = []
    for doc_id, text in docs:
        toks = [t for t in text.lower().strip().split() if t]
        starts = list(range(0, len(toks), stride))
        for idx, s in enumerate(starts):
            win = toks[s : s + max_len]
            out.append((doc_id, idx, len(win), " ".join(win)))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(TEXTS, min_size=1, max_size=6),
    max_len=st.integers(min_value=1, max_value=5),
    stride=st.integers(min_value=1, max_value=5),
)
def test_chunk_windows_matches_python_model(spark, texts, max_len, stride):
    from csvs_to_sqlite_spark.operators.packing import chunk_windows

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, chunk_windows(df, max_len=max_len, stride=stride).collect()))
    assert got == py_chunk_windows(docs, max_len, stride)


def test_stratified_sample_exact_k(spark):
    from csvs_to_sqlite_spark.operators.splits import stratified_sample_exact_k

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    out = stratified_sample_exact_k(df, "doc_id", "source", k=7)
    sizes = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 7, "small": 7}
    # deterministic; small group (10 rows) keeps exactly 7, k>size keeps all
    again = stratified_sample_exact_k(df, "doc_id", "source", k=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    all_small = stratified_sample_exact_k(df, "doc_id", "source", k=50)
    assert all_small.where("source = 'small'").count() == 10


def test_new_operators_handle_empty_input(spark):
    """Every corpus-level operator must return an empty result — not
    throw — on an empty corpus (the natural state of a new partition)."""
    from csvs_to_sqlite_spark.operators.dedup import chunk_dedup
    from csvs_to_sqlite_spark.operators.packing import chunk_windows
    from csvs_to_sqlite_spark.operators.splits import (
        global_shuffle,
        shard_manifest,
        stratified_sample_exact_k,
    )
    from csvs_to_sqlite_spark.operators.terms import (
        bigram_counts,
        corpus_stats,
        lm_score,
        tfidf_cosine_pairs,
        tfidf_top_terms,
    )

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert chunk_dedup(empty, "text", "doc_id").count() == 0
    assert chunk_windows(empty).count() == 0
    assert global_shuffle(empty, "doc_id").count() == 0
    assert shard_manifest(empty, "doc_id", 4).count() == 0
    assert stratified_sample_exact_k(empty, "doc_id", "source", 3).count() == 0
    assert bigram_counts(empty, "text", top_k=5).count() == 0
    assert corpus_stats(empty, "text", "source").count() == 0
    assert lm_score(empty, "text", "doc_id").count() == 0
    assert tfidf_cosine_pairs(empty, "text", "doc_id").count() == 0
    assert tfidf_top_terms(empty, "text", "doc_id").count() == 0


def test_write_jsonl_roundtrip(spark, tmp_path):
    """documents -> write_jsonl -> load_jsonl is lossless, and the
    sharded variant keeps the write_shards layout contract."""
    from csvs_to_sqlite_spark.sinks.parquet_sink import write_jsonl
    from csvs_to_sqlite_spark.sources.jsonl_source import load_jsonl

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = str(tmp_path / "plain")
    write_jsonl(d, plain)
    back = load_jsonl(
        spark, plain, schema="doc_id long, text string, lang string, "
        "source string, n_chars long"
    )
    assert sorted(map(tuple, back.select(*d.columns).collect())) == sorted(
        map(tuple, d.collect())
    )
    sharded = str(tmp_path / "sharded")
    write_jsonl(d, sharded, id_col="doc_id", n_shards=4)
    back2 = spark.read.json(sharded)
    assert back2.count() == d.count()
    assert {r.shard for r in back2.select("shard").distinct().collect()} <= set(range(4))


def test_token_budget_cap_matches_naive_window(spark):
    """The two-phase bucket plan must agree exactly with the naive
    per-source cumsum it documents — exercised with n_buckets=4 so
    boundary buckets actually split sources."""
    from pyspark.sql.window import Window

    from csvs_to_sqlite_spark.functions.hashing import md5_long, tokens_expr

    rows = [
        (i, "s" + str(i % 3), "tok " * (i % 7 + 1))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budget = 20
    got = {
        (r["id"], r["source"], r["n_tok"])
        for r in splits.token_budget_cap(
            df, "text", "doc_id", "source", budget=budget, n_buckets=4
        ).collect()
    }
    h = md5_long(F.col("doc_id").cast("string"), seed="budget")
    n_tok = F.size(tokens_expr(F.col("text"), distinct=False)).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = (
        df.select(
            F.col("doc_id").alias("id"), "source", n_tok.alias("n_tok"), h.alias("h")
        )
        .withColumn("cum", F.sum("n_tok").over(w))
        .where(F.col("cum") <= budget)
    )
    want = {(r["id"], r["source"], r["n_tok"]) for r in naive.collect()}
    assert got == want
    assert 0 < len(got) < 60  # the budget actually cut something


def test_token_budget_cap_keeps_all_under_budget(spark):
    df = spark.createDataFrame(
        [(1, "a", "one two"), (2, "a", "three")],
        "doc_id long, source string, text string",
    )
    out = splits.token_budget_cap(df, "text", "doc_id", "source", budget=100)
    assert out.count() == 2


def test_vocab_encode_order_oov_and_empty(spark):
    from csvs_to_sqlite_spark.operators import terms

    df = spark.createDataFrame(
        [
            (1, "b b b a a c"),
            (2, "a zzz b"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    vocab = {r["token"]: r["tok_id"] for r in terms.build_vocab(df, "text", top_k=3).collect()}
    # freq: b=4, a=3, c=1/zzz=1 (tie broken alphabetically: c)
    assert vocab == {"b": 1, "a": 2, "c": 3}
    enc = {
        r["doc_id"]: (list(r["ids"]), r["n_tokens"])
        for r in terms.encode_docs(
            df, "text", "doc_id", terms.build_vocab(df, "text", top_k=3)
        ).collect()
    }
    assert enc[1] == ([1, 1, 1, 2, 2, 3], 6)
    assert enc[2] == ([2, 0, 1], 3)  # zzz is OOV -> 0
    assert enc[3] == ([], 0)


def test_temperature_mixture_quotas_and_membership(spark):
    # counts 9 / 4 / 1 → w = 3 / 2 / 1 (floor sqrt), Σw = 6; budget 6 →
    # quotas 3 / 2 / 1
    rows = (
        [(i, "s9") for i in range(9)]
        + [(100 + i, "s4") for i in range(4)]
        + [(200, "s1")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        r.group_name: r
        for r in splits.temperature_mixture(docs, "doc_id", "source", budget=6).collect()
    }
    assert {(g, r.n_groupdocs, r.quota, r.n_selected) for g, r in out.items()} == {
        ("s9", 9, 3, 3),
        ("s4", 4, 2, 2),
        ("s1", 1, 1, 1),
    }
    # membership: replicate the salted-hash selection order in Python
    ids = {"s9": range(9), "s4": range(100, 104), "s1": [200]}
    for g, quota in (("s9", 3), ("s4", 2), ("s1", 1)):
        order = sorted(ids[g], key=lambda i: (py_md5_long(str(i), seed="temp"), i))
        expect = hashlib.md5(
            ",".join(str(i) for i in sorted(order[:quota])).encode()
        ).hexdigest()
        assert out[g].id_digest == expect


def test_temperature_mixture_quota_capped_by_group_size(spark):
    # budget far beyond the corpus: every group contributes all its rows
    rows = [(i, "a") for i in range(9)] + [(50 + i, "b") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        r.group_name: (r.quota, r.n_selected)
        for r in splits.temperature_mixture(docs, "doc_id", "source", budget=500).collect()
    }
    # w = 3 / 2, Σw = 5 → quotas 300 / 200, selections capped at 9 / 4
    assert out == {"a": (300, 9), "b": (200, 4)}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=4),
    budget=st.integers(min_value=0, max_value=30),
)
def test_temperature_mixture_matches_python_model(spark, sizes, budget):
    rows = []
    ids = {}
    for g, size in enumerate(sizes):
        gname = f"g{g}"
        ids[gname] = [g * 1000 + i for i in range(size)]
        rows += [(i, gname) for i in ids[gname]]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r.group_name: (r.n_groupdocs, r.quota, r.n_selected, r.id_digest)
        for r in splits.temperature_mixture(df, "doc_id", "source", budget=budget).collect()
    }
    w = {g: math.floor(math.sqrt(float(len(v)))) for g, v in ids.items()}
    w_tot = sum(w.values())
    want = {}
    for g, gids in ids.items():
        quota = math.floor(budget * w[g] / w_tot)
        order = sorted(gids, key=lambda i: (py_md5_long(str(i), seed="temp"), i))
        sel = sorted(order[:quota])
        want[g] = (
            len(gids),
            quota,
            min(quota, len(gids)),
            hashlib.md5(",".join(str(i) for i in sel).encode()).hexdigest(),
        )
    # groups whose quota floors to 0 contribute no manifest row (inner
    # join keeps them, but count(*) needs >=1 selected row)
    want = {g: v for g, v in want.items() if v[2] > 0}
    assert got == want


def test_round4_operators_handle_empty_input(spark):
    """The round-4 additions must also return empty (never throw) on an
    empty corpus."""
    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.operators.bpe import encode_bpe, learn_bpe
    from csvs_to_sqlite_spark.operators.dedup import minhash_calibration
    from csvs_to_sqlite_spark.operators.splits import es_weighted_topk
    from csvs_to_sqlite_spark.operators.text import blocklist_hits

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long"
    )
    assert learn_bpe(spark, empty, "text").count() == 0
    assert encode_bpe(spark, empty, "text").count() == 0
    assert minhash_calibration(empty, "text", "doc_id").count() == 0
    assert es_weighted_topk(empty, "doc_id", "n_chars", k=5).count() == 0
    cols = blocklist_hits(F.col("text"), ("bad",))
    assert (
        empty.select("doc_id", *[v.alias(k) for k, v in cols.items()]).count() == 0
    )
