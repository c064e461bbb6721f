"""Unit tests for corpus-level term statistics (operators/terms.py):
hand-computed TF-IDF on a tiny corpus, bigram edge cases, and plan
assertions (broadcast DF join; top-k via TakeOrderedAndProject)."""

import math

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.terms import bigram_counts, tfidf_top_terms


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry date"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_hand_computed(spark):
    out = tfidf_top_terms(_docs(spark), "text", "doc_id", k=2)
    rows = {(r.doc_id, r.token): (r.tfidf, r.rank) for r in out.collect()}
    # doc 1: apple tf=2/3 df=1 → (2/3)ln(3); banana tf=1/3 df=2 → (1/3)ln(1.5)
    assert rows[(1, "apple")] == (round(2 / 3 * math.log(3), 6), 1)
    assert rows[(1, "banana")] == (round(1 / 3 * math.log(3 / 2), 6), 2)
    # doc 3: date 1/3 ln(3) beats cherry 2/3 ln(1.5)
    assert rows[(3, "date")][1] == 1
    assert rows[(3, "cherry")][1] == 2
    # k=2 respected
    assert all(rank <= 2 for _, rank in rows.values())


def test_tfidf_ties_break_on_token(spark):
    docs = spark.createDataFrame([(1, "b a"), (2, "x y")], "doc_id long, text string")
    out = tfidf_top_terms(docs, "text", "doc_id", k=2).collect()
    doc1 = sorted((r.rank, r.token) for r in out if r.doc_id == 1)
    assert doc1 == [(1, "a"), (2, "b")]  # equal scores → token asc


def test_tfidf_df_table_broadcast_is_opt_in(spark):
    """Broadcast-audit r8: the document-frequency table grows with the
    corpus vocabulary (Heaps' law), so the broadcast hint is OPT-IN —
    the default plan carries no ResolvedHint and AQE decides from
    runtime sizes; broadcast_df=True still forces the exchange for
    callers with a provably bounded vocabulary."""
    default_logical = str(
        tfidf_top_terms(_docs(spark), "text", "doc_id")
        ._jdf.queryExecution()
        .optimizedPlan()
    )
    assert "ResolvedHint" not in default_logical
    hinted = (
        tfidf_top_terms(_docs(spark), "text", "doc_id", broadcast_df=True)
        ._jdf.queryExecution()
        .toString()
    )
    assert "BroadcastHashJoin" in hinted or "BroadcastExchange" in hinted


def test_bigram_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b"),
            (3, "solo"),  # <2 tokens → no bigrams, must not error
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = [(r.bigram, r.n) for r in bigram_counts(docs, "text", top_k=10).collect()]
    assert rows == [("a b", 3), ("b a", 1)]


def test_bigram_topk_plan_is_take_ordered(spark):
    plan = (
        bigram_counts(_docs(spark), "text", top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_tfidf_cosine_pairs_identical_and_disjoint(spark):
    from csvs_to_sqlite_spark.operators.terms import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana cherry"),  # identical -> cosine 1.0
            (3, "dog emu fox"),  # disjoint -> no pair
            (4, "apple banana zebra"),  # partial overlap with 1/2
        ],
        "doc_id long, text string",
    )
    rows = {(r.a, r.b): r.cosine for r in
            tfidf_cosine_pairs(docs, "text", "doc_id", threshold=0.0, max_df=None).collect()}
    assert rows[(1, 2)] == 1.0
    assert not any(3 in p for p in rows)
    assert 0 < rows[(1, 4)] < 1
    # high threshold keeps only the exact pair
    strict = tfidf_cosine_pairs(docs, "text", "doc_id", threshold=0.99, max_df=None)
    assert [(r.a, r.b) for r in strict.collect()] == [(1, 2)]


def test_tfidf_cosine_max_df_prunes_stop_tokens(spark):
    from csvs_to_sqlite_spark.operators.terms import tfidf_unit_vectors

    docs = spark.createDataFrame(
        [(i, f"the w{i}") for i in range(10)], "doc_id long, text string"
    )
    # 'the' appears in all 10 docs; cap at 5 removes it from every vector
    toks = {r.token for r in tfidf_unit_vectors(docs, "text", "doc_id", max_df=5).collect()}
    assert "the" not in toks and "w3" in toks


def test_lm_score_hand_computed(spark):
    """Corpus 'a b', 'a b', 'a c', 'solo' — V=4 (a,b,c,solo), c(a b)=2,
    c(a c)=1, c1(a)=3. P(b|a) = 2.5/(3+2) = 0.5, P(c|a) = 1.5/5
    (add-0.5 smoothing)."""
    import math

    from csvs_to_sqlite_spark.operators.terms import lm_score

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score(docs, "text", "doc_id").collect()}
    assert out[1].n_bigrams == 1
    assert out[1].lm_score == round(math.log(2.5 / 5.0), 6)
    assert out[3].lm_score == round(math.log(1.5 / 5.0), 6)
    assert out[1].lm_score > out[3].lm_score  # common bigram scores higher
    assert 4 not in out  # single-token doc has no bigrams


def test_update_vocab_immutable_ids_and_growth(spark):
    from csvs_to_sqlite_spark.operators import terms
    from pyspark.sql import functions as F

    d1 = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    v1 = terms.build_vocab(d1, "text", top_k=2)  # a->1, b->2 (c cut)
    d2 = spark.createDataFrame(
        [(2, "c c z z z a")], "doc_id long, text string"
    )
    out = {r["token"]: r["tok_id"] for r in terms.update_vocab(v1, d2, "text", top_k_new=2).collect()}
    # old ids untouched; new tokens z(3 occurrences) then c(2) numbered after max
    assert out == {"a": 1, "b": 2, "z": 3, "c": 4}


def test_update_vocab_empty_base(spark):
    from csvs_to_sqlite_spark.operators import terms

    empty = spark.createDataFrame([], "token string, tok_id long")
    d = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    out = {r["token"]: r["tok_id"] for r in terms.update_vocab(empty, d, "text").collect()}
    assert out == {"x": 1, "y": 2}


def test_bm25_hand_computed(spark):
    from csvs_to_sqlite_spark.operators.terms import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry date"),
            (4, "zebra"),  # no query term → must be excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bm25_search(docs, "text", "doc_id", ["apple", "cherry"]).collect()}
    assert set(out) == {1, 2, 3}  # doc 4 matched nothing

    # replicate the exact formula (N=4, sum_dl=9, df(apple)=1, df(cherry)=2)
    k1, b = 1.2, 0.75
    n, sum_dl = 4.0, 9.0

    def term(tf, dl, dfq):
        idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
        return (idf * (tf * (k1 + 1.0))) / (
            tf + k1 * ((1.0 - b) + (b * dl) / (sum_dl / n))
        )

    assert out[1].bm25 == round(term(2.0, 3.0, 1.0) + term(0.0, 3.0, 2.0), 6)
    assert out[1].n_terms_matched == 1
    assert out[3].bm25 == round(term(0.0, 3.0, 1.0) + term(2.0, 3.0, 2.0), 6)
    assert out[2].n_terms_matched == 1
    # rarer term (apple, df=1) outranks the common one at equal tf/dl
    assert out[1].bm25 > out[3].bm25


def test_bm25_plan_no_explode_no_window(spark):
    from csvs_to_sqlite_spark.operators.terms import bm25_search

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    plan = (
        bm25_search(docs, "text", "doc_id", ["a", "b"])
        ._jdf.queryExecution()
        .toString()
    )
    assert "Generate explode" not in plan  # corpus token stream never explodes
    assert "Window" not in plan  # top-k is TakeOrdered, not a ranking window
    assert "TakeOrderedAndProject" in plan


def test_dsir_importance_prefers_target_like_docs(spark):
    from csvs_to_sqlite_spark.operators.terms import dsir_importance

    rows = [(i, "alpha beta gamma", "tgt") for i in range(10)]
    rows += [(100 + i, "delta epsilon zeta", "raw") for i in range(10)]
    # held-out docs drawn from each side's vocabulary
    rows += [(500, "alpha beta", "raw"), (501, "delta epsilon", "raw")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in dsir_importance(
            docs, "text", "doc_id", F.col("source") == "tgt", top_k=50
        ).collect()
    }
    assert len(out) == 22 and out[500].n_tokens == 2
    # target-vocabulary doc scores above the raw-vocabulary doc
    assert out[500].dsir_weight > 0 > out[501].dsir_weight


def test_vocab_overlap_hand_computed(spark):
    from csvs_to_sqlite_spark.operators.terms import vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b", "g1"),
            (2, "b c a", "g1"),  # g1 vocab {a,b,c}
            (3, "b c d", "g2"),  # g2 vocab {b,c,d}
            (4, "x", "g3"),  # g3 vocab {x} — disjoint, no output pair
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.group_a, r.group_b): r for r in vocab_overlap(docs, "text", "source").collect()}
    assert set(out) == {("g1", "g2")}
    assert out[("g1", "g2")].n_common == 2  # {b, c}
    assert out[("g1", "g2")].jaccard == round(2 / 4, 6)


# ---------------------------------------------------------------------------
# property: bm25_search vs a pure-Python model
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["a", "b", "c", "dd"]
_TEXTS = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join)


def _py_bm25(docs, query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = float(len(docs))
    sum_dl = float(sum(len(v) for v in toks.values()))
    dfs = {q: float(sum(1 for v in toks.values() if q in v)) for q in query}
    out = {}
    for i, v in toks.items():
        score, hits = 0.0, 0
        for q in query:
            tf = float(v.count(q))
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            score += (idf * (tf * (k1 + 1.0))) / (
                tf + k1 * ((1.0 - b) + (b * len(v)) / (sum_dl / n))
            )
            hits += 1 if tf > 0 else 0
        if hits:
            out[i] = (round(score, 6), hits)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_TEXTS, min_size=1, max_size=8),
    query=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=2, unique=True),
)
def test_bm25_matches_python_model(spark, texts, query):
    from csvs_to_sqlite_spark.operators.terms import bm25_search

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.bm25, r.n_terms_matched)
        for r in bm25_search(df, "text", "doc_id", query, k=100).collect()
    }
    assert got == _py_bm25(docs, query)


def test_learn_bpe_matches_sennrich_reference(spark):
    """The classic corpus from the BPE paper: merges must equal a pure-
    Python implementation of the count-merge loop (same tie-break)."""
    from collections import Counter

    from csvs_to_sqlite_spark.operators.bpe import learn_bpe

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in learn_bpe(spark, docs, "text", n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]

    # python reference
    vocab = {w: (list(w), c) for w, c in Counter(words).items()}
    want = []
    for rank in range(1, 7):
        counts = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        (s, t), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, s, t, s + t, n))
        for w, (syms, c) in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == s and x == t:
                    out[-1] = s + t
                else:
                    out.append(x)
            vocab[w] = (out, c)
    assert got == want
    # the famous first merges: 'es' (tie with 'st' broken on lhs), then 'est'
    assert got[0][3] == "es" and got[1][3] == "est"


def test_encode_bpe_matches_python_model(spark):
    """Encoding the corpus with the learned merges must equal a pure-
    Python greedy left-to-right merge application, including the
    token-order sequence digest."""
    import hashlib
    from collections import Counter

    from csvs_to_sqlite_spark.operators.bpe import encode_bpe

    texts = [
        "low low low low low lower lower",
        "newest newest newest widest widest",
        "newest newest newest widest low",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_tokens, r.fertility, r.enc_digest)
        for r in encode_bpe(spark, docs, "text", n_merges=6).collect()
    }

    # python reference: learn on the word dictionary, then encode
    words = [w for t in texts for w in t.split()]
    vocab = {w: list(w) for w in set(words)}
    counts_by_word = Counter(words)
    for _ in range(6):
        counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += counts_by_word[w]
        if not counts:
            break
        (s, t), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == s and x == t:
                    out[-1] = s + t
                else:
                    out.append(x)
            vocab[w] = out
    want = {}
    for i, t in enumerate(texts):
        toks = t.split()
        encs = [" ".join(vocab[w]) for w in toks]
        n_tokens = sum(len(vocab[w]) for w in toks)
        want[i] = (
            len(toks),
            sum(len(w) for w in toks),
            n_tokens,
            round(n_tokens / len(toks), 6),
            hashlib.md5("\x01".join(encs).encode()).hexdigest(),
        )
    assert got == want


def test_source_unigram_cosine_hand_computed(spark):
    from csvs_to_sqlite_spark.operators.terms import source_unigram_cosine

    df = spark.createDataFrame(
        [
            ("s1", "a a b"),     # counts {a:2, b:1}, |v|² = 5
            ("s2", "a b b"),     # counts {a:1, b:2}, |v|² = 5
            ("s3", "c"),         # orthogonal
        ],
        ["source", "text"],
    )
    out = {
        (r["group_a"], r["group_b"]): r
        for r in source_unigram_cosine(df, "text", "source").collect()
    }
    r12 = out[("s1", "s2")]
    assert r12["dot"] == 2 * 1 + 1 * 2 == 4
    assert r12["cosine"] == 4 / ((5**0.5) * (5**0.5))
    # orthogonal sources share no token → no pair row at all
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_bpe_regex_whitespace_class_matches_duckdb_on_vertical_tab(spark):
    """Advice regression: the BPE pre-tokenizer regex used to write \\s,
    which includes \\x0B under Java regex but not under DuckDB's RE2 —
    a doc containing a vertical tab counted differently in the query vs
    its oracle. The class is now spelled explicitly and identically in
    both; this locks the parity on the one character the engines
    disagreed about."""
    import duckdb
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    text = "a\x0bb! c\td\ne 42"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0b\\f\\r]"
    got = df.select(
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pattern), 0))
        .cast("long")
        .alias("n")
    ).collect()[0]["n"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    want = con.execute(entry.SQL_BPE).fetchone()[1]
    assert got == want == 7  # a, b, !, c, d, e, 42 — \x0b is whitespace in both engines


def test_oov_rate_by_group_hand_computed(spark):
    """Vocabulary = {aa, bb}: group g1 is fully covered (rate 0.0),
    g2 is half OOV (half_up(2/4) at 6dp = 0.5), empty-text docs count
    docs but no tokens."""
    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.operators.terms import build_vocab, oov_rate_by_group

    docs = spark.createDataFrame(
        [
            (1, "aa bb aa", "g1"),
            (2, "aa bb", "g1"),
            (3, "aa zz bb yy", "g2"),
            (4, "", "g2"),
        ],
        "doc_id long, text string, source string",
    )
    vocab = build_vocab(docs.where("doc_id <= 2"), "text", top_k=10)
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rate_by_group(docs, "text", "source", vocab).collect()
    }
    assert got["g1"] == (2, 5, 0, 0.0)
    assert got["g2"] == (2, 4, 2, 0.5)
