"""Deterministic, cross-engine-checkable hash primitives.

Everything in the dedup/similarity/text stack builds on MD5, because it is
bit-identical in Spark (``F.md5``), DuckDB (``md5()``), and Python
(``hashlib.md5``) — which makes even MinHash signatures and LSH bucket
assignments verifiable against an external SQL oracle. At 100 TB these are
all JVM-side codegen'd expressions (no Python in the hot path); MD5 is
marginally slower than xxhash64 but the portability is what buys us
testability. Swapping to ``F.xxhash64`` is a one-line change per call site
if profiling ever demands it.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column, seed: str = "", hex_chars: int = 8) -> Column:
    """First ``hex_chars`` of md5(seed:value) as an unsigned long.

    8 hex chars → 32-bit value (fits long, matches DuckDB's
    ``('0x' || substr(md5(...),1,8))::BIGINT``).
    """
    payload = F.concat(F.lit(f"{seed}:"), col) if seed else col
    return F.conv(F.substring(F.md5(payload), 1, hex_chars), 16, 10).cast("long")


def md5_long_sql(expr: str, seed: str = "", hex_chars: int = 8) -> str:
    """The DuckDB rendering of md5_long, for oracle SQL generation."""
    payload = f"concat('{seed}:', {expr})" if seed else expr
    return f"(('0x' || substr(md5({payload}), 1, {hex_chars}))::BIGINT)"


def py_md5_long(value: str, seed: str = "", hex_chars: int = 8) -> int:
    payload = f"{seed}:{value}" if seed else value
    return int(hashlib.md5(payload.encode("utf-8")).hexdigest()[:hex_chars], 16)


def tokens_expr(col: Column, distinct: bool = True) -> Column:
    """Whitespace tokens of lower(trim(col)), empties removed."""
    toks = F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != "")
    return F.array_distinct(toks) if distinct else toks


def tokens_sql(expr: str, distinct: bool = True) -> str:
    base = (
        f"list_filter(regexp_split_to_array(lower(trim({expr})), '\\s+'), t -> t <> '')"
    )
    return f"list_distinct({base})" if distinct else base


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles over an ALREADY-MATERIALIZED token
    array column. Shingles (not unigrams) are the right dedup unit at
    scale: their document frequency is low, so inverted-index and LSH-band
    joins stay near-linear instead of exploding on stop-words.

    ``toks`` must be a plain column reference (behind a projection
    boundary), not a tokenizer expression: ``element_at`` inside the lambda
    re-evaluates its array argument per element, which turns an inlined
    tokenizer into O(tokens²) per document.
    """
    def mk(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])

    windows = F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), mk)
    return F.when(F.size(toks) >= n, F.array_distinct(windows)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(toks_col: str, n: int = 3) -> str:
    """DuckDB shingle list over an already-computed token-list column
    (callers bind ``toks_col`` in a CTE to avoid inlining the tokenizer n
    times)."""
    parts = ", ".join(f"{toks_col}[i+{j}]" if j else f"{toks_col}[i]" for j in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({toks_col})-{n - 1}, 0)),"
        f" i -> concat_ws(' ', {parts})))"
    )
