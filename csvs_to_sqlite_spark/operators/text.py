"""Text-analysis operators for training-data pipelines.

All pure JVM-side column expressions (no UDFs): token counting, quality
scoring, n-gram-marker language ID, and md5/polynomial document
fingerprints. Each is deterministic and mirrors 1:1 into ANSI/DuckDB SQL
for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.hashing import md5_long, tokens_expr

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# marker tokens per language for the n-gram-heuristic classifier; the
# deterministic argmax (tie → earlier entry wins) is what the oracle mirrors
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "los", "es"),
    "fr": ("le", "la", "les", "est"),
    "zh": ("de", "shi", "zai", "he"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (non-empty tokens)."""
    return F.size(tokens_expr(text, distinct=False))


def stopword_ratio(text: Column) -> Column:
    toks = tokens_expr(text, distinct=False)
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.round(F.size(stops) / F.greatest(F.size(toks), F.lit(1)), 6)


def avg_token_len(text: Column) -> Column:
    toks = tokens_expr(text, distinct=False)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Length/stopword/diversity composite in [0,1]: the kind of cheap
    heuristic used to pre-filter web corpora. Deterministic arithmetic only.
    """
    toks = tokens_expr(text, distinct=False)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return F.round((length_term + stop_term + distinct_ratio) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens_expr(text, distinct=False)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker counts; ties resolve in LANG_MARKERS order
    (strictly-greater chain, earlier language wins); all zero → 'und'."""
    scores = lang_scores(text)
    expr = F.lit("und")
    running_best = F.lit(0)
    for lang in LANG_MARKERS:
        s = scores[lang]
        expr = F.when(s > running_best, F.lit(lang)).otherwise(expr)
        running_best = F.when(s > running_best, s).otherwise(running_best)
    return expr


def doc_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized token stream."""
    return F.md5(F.concat_ws(" ", tokens_expr(text, distinct=False)))


def rolling_fingerprint(text: Column, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes:
    acc = (acc * 31 + h(token)) mod p. One ``aggregate`` fold, JVM-side."""
    toks = tokens_expr(text, distinct=False)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + md5_long(t, seed="fp")) % mod,
    )
