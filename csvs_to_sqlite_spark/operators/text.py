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


# --- PII redaction (training-data scrubbing) -------------------------------
# Patterns are deliberately restricted to syntax with identical semantics
# in Java regex (Spark) and RE2 (DuckDB oracle): character classes,
# bounded repetition, \b ASCII word boundaries — no lookaround, no
# backreferences. Replacement order matters and is part of the contract:
# emails first (their local part may contain digits/dots), then IPv4
# (four dotted octets — must precede phones so "10.1.2.3" is never
# half-eaten), then phones.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Mask emails, IPv4 addresses, and phone numbers. Pure JVM
    regexp_replace chain — scan-stage cost, zero shuffle at any scale."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(expr: str) -> str:
    """DuckDB rendering of redact_pii ('g' flag: RE2 replaces only the
    first match by default, Java replaces all). Patterns embed verbatim:
    DuckDB string literals are standard SQL (no backslash escape
    processing), so ``\\d``/``\\b`` must stay single-backslashed."""
    out = expr
    for pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    return out


# text cleaning: control chars out, typographic punctuation folded to
# ASCII, whitespace runs collapsed. Each (pattern, replacement) is
# RE2/Java-portable so the Spark chain and the DuckDB twin agree
# byte-for-byte. Order matters: fold first (an ellipsis becomes "..."),
# collapse whitespace last, trim at the end.
NORMALIZE_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " "),  # control chars (keep \t \n \r)
    (r"[‘’]", "'"),                     # curly single quotes
    (r"[“”]", "\""),                    # curly double quotes
    (r"[–—]", "-"),                     # en/em dash
    (r"…", "..."),                           # ellipsis
    (r" ", " "),                             # no-break space
    (r"\s+", " "),                                # collapse whitespace runs
)


def normalize_text(text: Column) -> Column:
    """Canonical cleaning applied before hashing/dedup/tokenizing at
    corpus scale: strip control characters, fold typographic punctuation
    to ASCII, collapse whitespace, trim. Pure JVM regexp_replace chain —
    scan-stage cost, zero shuffle."""
    out = text
    for pat, repl in NORMALIZE_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def normalize_text_sql(expr: str) -> str:
    """DuckDB rendering of normalize_text. The patterns embed their
    unicode characters verbatim (UTF-8 literals work identically in Java
    regex and RE2) and the ``\\xNN`` hex escapes are RE2-portable as
    written; 'g' flag because RE2 replaces only the first match by
    default."""
    out = expr
    for pat, repl in NORMALIZE_PATTERNS:
        sql_pat = pat.replace("'", "''")
        sql_repl = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{sql_repl}', 'g')"
    return f"trim({out})"


# --- repetition / boilerplate metrics (Gopher-style filters) ---------------
def dup_ngram_fraction(toks: Column, n: int) -> Column:
    """Fraction of word n-gram windows that are repeats of an earlier
    window in the same document — the Gopher duplicate-n-gram filter
    family. (windows - distinct windows) / windows, 0 for short docs.

    ``toks`` must be an ALREADY-MATERIALIZED token-array column (behind a
    projection boundary), same contract as ``shingles_from_tokens``:
    ``element_at`` inside the transform lambda re-evaluates its array
    argument per element, so an inlined tokenizer would be O(tokens²).
    Linear per document, pure column expressions, zero shuffle."""

    def window_at(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])

    windows = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), window_at),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(windows)
    distinct = F.size(F.array_distinct(windows))
    return F.round(
        F.when(total > 0, (total - distinct) / total).otherwise(F.lit(0.0)), 6
    )


def top_token_fraction(toks: Column) -> Column:
    """Share of the document taken by its single most frequent token
    (Gopher's most-common-word filter). Computed as the longest run in
    the SORTED token array via one linear F.aggregate state machine —
    no explode, no shuffle, O(tokens log tokens) per document, entirely
    inside whole-stage codegen. ``toks``: materialized token-array
    column (same contract as dup_ngram_fraction)."""
    sorted_toks = F.array_sort(toks)
    state = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(sorted_toks, state, step, lambda acc: acc["best"])
    return F.round(
        F.when(F.size(toks) > 0, best / F.size(toks)).otherwise(F.lit(0.0)), 6
    )


# --- character-class health ratios (C4-style filters) ----------------------

def _class_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters matching a regex class — computed by
    length-difference after regexp_replace (pure JVM, no explode)."""
    n = F.length(text)
    kept = F.length(F.regexp_replace(text, pattern, ""))
    return F.when(n > 0, (n - kept) / n).otherwise(F.lit(0.0))


def char_health(text: Column) -> dict[str, Column]:
    """C4-style per-doc character-class ratios: uppercase, digit, and
    non-alphanumeric-non-space ("symbol") fractions — the cheap scan
    signals that flag shouting/boilerplate/code-ish text before any
    heavier scoring runs. Patterns stay within RE2 ∩ Java-regex so the
    DuckDB twin is byte-equivalent."""
    return {
        "upper_ratio": F.round(_class_ratio(text, "[A-Z]"), 6),
        "digit_ratio": F.round(_class_ratio(text, "[0-9]"), 6),
        "symbol_ratio": F.round(_class_ratio(text, "[^A-Za-z0-9 ]"), 6),
    }


def char_health_sql(expr: str) -> str:
    """DuckDB SELECT-list fragment of char_health (same length-diff
    trick, 'g' flag for replace-all)."""
    def ratio(pattern: str) -> str:
        n = f"length({expr})"
        kept = f"length(regexp_replace({expr}, '{pattern}', '', 'g'))"
        return f"CASE WHEN {n} > 0 THEN round(({n} - {kept}) / cast({n} AS double), 6) ELSE 0.0 END"

    return (
        f"{ratio('[A-Z]')} AS upper_ratio, "
        f"{ratio('[0-9]')} AS digit_ratio, "
        f"{ratio('[^A-Za-z0-9 ]')} AS symbol_ratio"
    )


def gopher_rules(text: Column) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, appendix A:
    the repetition/format heuristics that gate MassiveText) as per-doc
    boolean columns plus the measurements behind them — all scan-stage
    expressions, patterns within RE2 ∩ Java-regex so the DuckDB twin is
    byte-equivalent. Thresholds follow the paper (adapted to the ASCII
    test corpus): 50..100k words, mean word length 3..10, ≤10% symbol
    chars, ≤30% ellipsis lines, ≤90% bullet lines, ≥80% words with an
    alphabetic char, ≥2 distinct required stopwords."""
    toks = tokens_expr(text, distinct=False)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    mean_wl = F.when(n_words > 0, F.round(sum_len / n_words, 6)).otherwise(F.lit(0.0))
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    ellipsis = F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.$")))
    bullets = F.size(F.filter(lines, lambda l: l.rlike("^\\s*[-*]")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    )
    symbol = _class_ratio(text, "[^A-Za-z0-9 \\n]")
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "word_count_ok": (n_words >= 50) & (n_words <= 100000),
        "mean_len_ok": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "symbol_ok": F.round(symbol, 6) <= 0.1,
        "ellipsis_ok": (ellipsis / n_lines) <= 0.3,
        "bullet_ok": (bullets / n_lines) <= 0.9,
        "alpha_ok": F.when(
            n_words > 0, (alpha_words / n_words) >= 0.8
        ).otherwise(F.lit(False)),
        "stopword_ok": n_stop >= 2,
    }


def gopher_rules_sql(expr: str) -> str:
    """DuckDB SELECT-list fragment mirroring gopher_rules."""
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    toks = tokens_sql(expr, distinct=False)
    n_words = f"len({toks})"
    sum_len = f"list_sum(list_transform({toks}, t -> length(t)))"
    mean_wl = (
        f"CASE WHEN {n_words} > 0 THEN round({sum_len} / CAST({n_words} AS DOUBLE), 6)"
        " ELSE 0.0 END"
    )
    lines = f"string_split({expr}, chr(10))"
    n_lines = f"greatest(len({lines}), 1)"
    ellipsis = f"len(list_filter({lines}, l -> regexp_matches(l, '\\.\\.\\.$')))"
    bullets = f"len(list_filter({lines}, l -> regexp_matches(l, '^\\s*[-*]')))"
    alpha = f"len(list_filter({toks}, t -> regexp_matches(t, '[a-zA-Z]')))"
    stops = "', '".join(STOPWORDS)
    n_stop = f"len(list_distinct(list_filter({toks}, t -> t IN ('{stops}'))))"
    n_chars = f"length({expr})"
    kept = f"length(regexp_replace({expr}, '[^A-Za-z0-9 \\n]', '', 'g'))"
    symbol = (
        f"CASE WHEN {n_chars} > 0 THEN ({n_chars} - {kept}) / CAST({n_chars} AS DOUBLE)"
        " ELSE 0.0 END"
    )
    return (
        f"CAST({n_words} AS BIGINT) AS n_words, {mean_wl} AS mean_word_len, "
        f"({n_words} >= 50 AND {n_words} <= 100000) AS word_count_ok, "
        f"({mean_wl} >= 3.0 AND {mean_wl} <= 10.0) AS mean_len_ok, "
        f"round({symbol}, 6) <= 0.1 AS symbol_ok, "
        f"({ellipsis} / CAST({n_lines} AS DOUBLE)) <= 0.3 AS ellipsis_ok, "
        f"({bullets} / CAST({n_lines} AS DOUBLE)) <= 0.9 AS bullet_ok, "
        f"CASE WHEN {n_words} > 0 THEN ({alpha} / CAST({n_words} AS DOUBLE)) >= 0.8"
        " ELSE false END AS alpha_ok, "
        f"{n_stop} >= 2 AS stopword_ok"
    )


def blocklist_hits(text: Column, terms: tuple[str, ...]) -> dict[str, Column]:
    """C4-style blocklist filter (Raffel et al. 2020 drop any page
    containing a "List of Dirty, Naughty …" word): token-level word-
    boundary matching against a literal term list, as per-doc counts
    plus the keep/drop boolean. ``n_bad`` counts occurrences,
    ``n_bad_types`` distinct blocklisted words present. All scan-stage
    array expressions over the shared whitespace tokenizer — zero
    shuffle, and the broadcastless literal list lives in the plan, so at
    100 TB the filter is free and pushes the kept-row reduction below
    every downstream shuffle."""
    toks = tokens_expr(text, distinct=False)
    bad = F.array(*[F.lit(t) for t in terms])
    hits = F.filter(toks, lambda t: F.array_contains(bad, t))
    n_bad = F.size(hits).cast("long")
    n_types = F.size(F.array_intersect(F.array_distinct(toks), bad)).cast("long")
    return {"n_bad": n_bad, "n_bad_types": n_types, "is_clean": n_bad == 0}


def blocklist_hits_sql(expr: str, terms: tuple[str, ...]) -> str:
    """DuckDB SELECT-list fragment mirroring blocklist_hits."""
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    toks = tokens_sql(expr, distinct=False)
    lst = "['" + "', '".join(terms) + "']"
    n_bad = f"CAST(len(list_filter({toks}, t -> list_contains({lst}, t))) AS BIGINT)"
    n_types = f"CAST(len(list_intersect(list_distinct({toks}), {lst})) AS BIGINT)"
    return (
        f"{n_bad} AS n_bad, {n_types} AS n_bad_types, "
        f"{n_bad} = 0 AS is_clean"
    )


# --- hashed linear quality classifier (fastText-style inference) -----------

def classifier_weights(dim: int = 128, seed: str = "qw") -> list[int]:
    """Deterministic integer-milli weight table for the hashed linear
    classifier: weight of bucket b is ``md5(seed:b) % 2001 - 1000``
    (uniform in [-1000, 1000] milli-units). Derived once in Python and
    embedded as a literal array in BOTH engines, so the oracle shares the
    exact model."""
    from csvs_to_sqlite_spark.functions.hashing import py_md5_long

    return [py_md5_long(str(b), seed=seed) % 2001 - 1000 for b in range(dim)]


def hashed_classifier(toks: Column, dim: int = 128) -> dict[str, Column]:
    """fastText-style linear classifier INFERENCE over hashed unigram +
    bigram features (Joulin et al. 2016): each term hashes to one of
    ``dim`` buckets (md5), the doc logit is the tf-weighted sum of the
    bucket weights. This is the shape of classifier-based quality
    filtering in LLM corpus curation (GPT-3/LLaMA-style "quality
    classifier" gates) — and because the weights are integer milli-units
    the logit is an exact integer: associative, order-free under any
    partitioning, and bit-checkable against the DuckDB twin.

    Pure scan-stage column expressions (one aggregate fold per doc, no
    explode, no shuffle): at 100 TB this scores every document in the
    scan with zero data movement.

    ``toks``: ALREADY-MATERIALIZED token-array column (behind a
    projection boundary), same contract as dup_ngram_fraction — the
    bigram transform indexes it per element."""
    from csvs_to_sqlite_spark.functions.hashing import md5_long

    weights = classifier_weights(dim)
    w_arr = F.array(*[F.lit(w).cast("long") for w in weights])

    def bigram_at(i: Column) -> Column:
        return F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))

    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1), bigram_at),
    ).otherwise(F.array().cast("array<string>"))
    terms_col = F.concat(toks, bigrams)
    logit = F.aggregate(
        terms_col,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(w_arr, (md5_long(t, seed="qfeat") % dim).cast("int") + 1),
    )
    return {
        "n_terms": F.size(terms_col).cast("long"),
        "logit_milli": logit,
        "label_positive": logit > 0,
    }


def hashed_classifier_sql(expr: str, dim: int = 128) -> str:
    """DuckDB SELECT-list fragment mirroring hashed_classifier. Callers
    must bind ``expr`` to an already-materialized token-list column named
    by ``expr`` (a CTE), same contract as shingles_sql — the bigram
    transform indexes it per element."""
    from csvs_to_sqlite_spark.functions.hashing import md5_long_sql

    weights = classifier_weights(dim)
    w_arr = "[" + ", ".join(f"{w}::BIGINT" for w in weights) + "]"
    bigrams = (
        f"CASE WHEN len({expr}) >= 2 THEN "
        f"list_transform(generate_series(1, len({expr}) - 1), "
        f"i -> concat_ws(' ', {expr}[i], {expr}[i+1])) "
        f"ELSE []::VARCHAR[] END"
    )
    terms = f"list_concat({expr}, {bigrams})"
    bucket = f"({md5_long_sql('t', seed='qfeat')} % {dim})"
    logit = (
        f"CAST(coalesce(list_sum(list_transform({terms}, "
        f"t -> ({w_arr})[{bucket} + 1])), 0) AS BIGINT)"
    )
    return (
        f"CAST(len({terms}) AS BIGINT) AS n_terms, "
        f"{logit} AS logit_milli, "
        f"{logit} > 0 AS label_positive"
    )


def c4_line_rules(
    text: Column, min_words: int = 5, min_kept: int = 3
) -> dict[str, Column]:
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2): keep
    only lines that end in a terminal punctuation mark and have at least
    ``min_words`` words, drop lines mentioning javascript; gate the whole
    page on curly braces (code), "lorem ipsum", and a minimum count of
    surviving lines. Emits the counts, the kept-text reconstruction
    digest, and the page verdict — all scan-stage array/string
    expressions (patterns within RE2 ∩ Java-regex), zero shuffle."""
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")

    def keep(l):
        words = F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda t: t != ""))
        return (
            F.rtrim(l).rlike('[.!?"]$')
            & (words >= min_words)
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, keep)
    kept_text = F.array_join(kept, "\n")
    n_kept = F.size(kept).cast("long")
    page_ok = (
        ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
        & (n_kept >= min_kept)
    )
    return {
        "n_lines": n_lines,
        "n_kept_lines": n_kept,
        "kept_chars": F.length(kept_text).cast("long"),
        "kept_digest": F.md5(kept_text),
        "page_ok": page_ok,
    }


def c4_line_rules_sql(expr: str, min_words: int = 5, min_kept: int = 3) -> str:
    """DuckDB SELECT-list fragment mirroring c4_line_rules."""
    lines = f"string_split({expr}, chr(10))"
    words = "len(list_filter(regexp_split_to_array(trim(l), '\\s+'), t -> t <> ''))"
    keep = (
        f"l -> regexp_matches(rtrim(l), '[.!?\"]$')"
        f" AND {words} >= {min_words}"
        f" AND NOT contains(lower(l), 'javascript')"
    )
    kept = f"list_filter({lines}, {keep})"
    kept_text = f"array_to_string({kept}, chr(10))"
    n_kept = f"len({kept})"
    return (
        f"CAST(len({lines}) AS BIGINT) AS n_lines, "
        f"CAST({n_kept} AS BIGINT) AS n_kept_lines, "
        f"CAST(length({kept_text}) AS BIGINT) AS kept_chars, "
        f"md5({kept_text}) AS kept_digest, "
        f"(NOT contains({expr}, '{{')"
        f" AND NOT contains(lower({expr}), 'lorem ipsum')"
        f" AND {n_kept} >= {min_kept}) AS page_ok"
    )


# --- readability (Flesch reading ease / Flesch-Kincaid grade) ---------------


def readability(text: Column) -> dict[str, Column]:
    """Flesch reading ease + Flesch-Kincaid grade (Kincaid et al. 1975)
    from the classic cheap proxies: whitespace words, ``[.!?]+`` runs as
    sentences (min 1), per-word vowel-group count (min 1) as syllables.
    All counts are exact integers from Java∩RE2-portable regexes; the
    two scores are plain double arithmetic on those integers — division,
    multiplication, subtraction mirror 1:1 in the DuckDB twin and IEEE
    semantics make them bit-identical, with no round() anywhere (the
    qmath tie class needs a round on a quotient; there is none).
    Scan-stage only: zero joins, zero shuffles, whole-stage codegen."""
    toks = tokens_expr(text, distinct=False)
    n_words = F.size(toks).cast("long")
    n_sent = F.greatest(F.regexp_count(text, F.lit("[.!?]+")), F.lit(1)).cast("long")
    n_syll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.greatest(F.regexp_count(t, F.lit("[aeiouy]+")), F.lit(1)).cast("long"),
    )
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = F.when(
        n_words > 0, n_syll.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    flesch = F.when(
        n_words > 0,
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
    )
    fk_grade = F.when(
        n_words > 0,
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sent,
        "n_syllables": n_syll,
        "flesch": flesch,
        "fk_grade": fk_grade,
    }


def readability_sql(expr: str) -> str:
    """DuckDB SELECT-list fragment mirroring readability (lowercasing is
    inside tokens_sql; syllable regex runs on the lowercased tokens in
    BOTH engines)."""
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    toks = tokens_sql(expr, distinct=False)
    n_words = f"CAST(len({toks}) AS BIGINT)"
    n_sent = f"CAST(greatest(len(regexp_extract_all({expr}, '[.!?]+')), 1) AS BIGINT)"
    n_syll = (
        f"CAST(coalesce(list_sum(list_transform({toks}, "
        f"t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1))), 0) AS BIGINT)"
    )
    wps = f"(CAST({n_words} AS DOUBLE) / CAST({n_sent} AS DOUBLE))"
    spw = (
        f"(CASE WHEN {n_words} > 0 THEN CAST({n_syll} AS DOUBLE) /"
        f" CAST({n_words} AS DOUBLE) ELSE 0.0 END)"
    )
    flesch = (
        f"(CASE WHEN {n_words} > 0 THEN"
        f" 206.835 - 1.015 * {wps} - 84.6 * {spw} ELSE NULL END)"
    )
    fk = (
        f"(CASE WHEN {n_words} > 0 THEN"
        f" 0.39 * {wps} + 11.8 * {spw} - 15.59 ELSE NULL END)"
    )
    return (
        f"{n_words} AS n_words, {n_sent} AS n_sentences, "
        f"{n_syll} AS n_syllables, {flesch} AS flesch, {fk} AS fk_grade"
    )
