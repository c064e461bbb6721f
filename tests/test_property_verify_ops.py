"""Property tests for the round-7 verification-tier operators: random
corpora checked against pure-Python models (third-engine evidence next
to the DuckDB oracles)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _py_levenshtein(a, b) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


# Non-ASCII on purpose: edit_distance_verify is BYTE-level (UTF-8
# octets, the semantics both Spark-via-byte_view and DuckDB share);
# 'é' is 2 bytes, '中' is 3, so these exercise the multi-byte paths.
words = st.text(alphabet="abcx é中", min_size=0, max_size=24)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(words, min_size=2, max_size=6))
def test_edit_distance_verify_matches_python_dp(spark, texts):
    from csvs_to_sqlite_spark.functions.qmath import py_half_up
    from csvs_to_sqlite_spark.operators.dedup import edit_distance_verify

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(a, b) for a in range(len(texts)) for b in range(a + 1, len(texts))],
        "id_a long, id_b long",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["edit_distance"], r["char_sim"])
        for r in edit_distance_verify(docs, "text", "doc_id", pairs=pairs).collect()
    }
    for (a, b), (lev, sim) in got.items():
        ba, bb = texts[a].encode("utf-8"), texts[b].encode("utf-8")
        want_lev = _py_levenshtein(ba, bb)
        mx = max(len(ba), len(bb), 1)
        want_sim = py_half_up((mx - want_lev) * 1_000_000, mx) / 1e6
        assert (lev, sim) == (want_lev, want_sim), (texts[a], texts[b])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_rows=st.integers(min_value=1, max_value=120),
    n_groups=st.integers(min_value=1, max_value=4),
    n_shards=st.sampled_from([2, 4, 8]),
)
def test_shard_balance_audit_matches_python_model(spark, n_rows, n_groups, n_shards):
    from csvs_to_sqlite_spark.functions.qmath import py_half_up
    from csvs_to_sqlite_spark.operators.splits import (
        shard_assignment,
        shard_balance_audit,
    )

    rows = [(i, f"g{(i * 7) % n_groups}") for i in range(n_rows)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    shard_of = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", shard_assignment(F.col("doc_id"), n_shards).alias("s")
        ).collect()
    }
    corpus = Counter(g for _, g in rows)
    N = n_rows
    per: dict[int, Counter] = {}
    for i, g in rows:
        per.setdefault(shard_of[i], Counter())[g] += 1
    want = {}
    for s, cnt in per.items():
        n_s = sum(cnt.values())
        dev = sum(abs(cnt.get(g, 0) * N - corpus[g] * n_s) for g in corpus)
        want[s] = (n_s, py_half_up(dev * 1_000_000, 2 * n_s * N) / 1e6)
    got = {
        r["shard"]: (r["n_rows"], r["tvd"])
        for r in shard_balance_audit(df, "doc_id", "source", n_shards=n_shards).collect()
    }
    assert got == want
