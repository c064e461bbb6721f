"""Exact integer half-up rounding for quotients of integer aggregates.

Why this exists: ``F.round(x, dp)`` on a double goes through Java's
``BigDecimal.valueOf(double)`` — which rounds the double's SHORTEST
decimal repr — while DuckDB (and CPython) round the double's EXACT
value. When the true quotient is a short decimal whose digit dp+1 is
exactly 5 (e.g. 3078435950/10000 = 307843.595), the two disagree:
Spark says 307843.6, DuckDB says 307843.59 (the nearest double is
307843.59499999997…). Reachable for any quotient of integers whose
reduced denominator divides 10^(dp+1) — i.e. every money/cent/micro
aggregate divided by a power of ten or a row count.

Fix by construction: do the half-up in INTEGER space (abs + half, drop
the remainder, divide exactly), where both engines agree bit-for-bit,
then perform one mirrored double division by 10^dp for display. Ties
round away from zero, matching both engines' round() on doubles.

The helpers come in mirrored pairs (Spark Column / DuckDB SQL string);
``py_half_up`` is the Python-side triplet for mapInPandas operators
whose oracle twins are SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _units_long(num: Column, div: int) -> Column:
    """half_up(num / div) as an exact long Column (div: python int >= 1).

    t = |num| + div//2 overshoots by the remainder; stripping ``t % div``
    leaves the largest multiple of div <= t, whose exact quotient is the
    half-up result. The final division is computed in double and
    re-rounded: exact whenever t < 2^53, and both engines perform the
    identical op sequence beyond that."""
    if div == 1:
        return num
    t = F.abs(num) + F.lit(div // 2)
    adj = t - t % F.lit(div)
    u = F.round(adj / F.lit(float(div))).cast("long")
    return F.when(num < 0, -u).otherwise(u)


def _sql_units(num: str, div: int) -> str:
    if div == 1:
        return f"({num})"
    t = f"(abs({num}) + {div // 2})"
    adj = f"({t} - ({t} % {div}))"
    u = f"CAST(round({adj} / CAST({div} AS DOUBLE)) AS BIGINT)"
    return f"(CASE WHEN ({num}) < 0 THEN -{u} ELSE {u} END)"


def qround_long(num: Column, div: int, dp: int) -> Column:
    """round(num/div / 10^dp ... ) — precisely: half_up(num/div), scaled
    down by 10^dp. Equals round(num/(div*10^dp), dp) with EXACT tie
    handling. num must be an integer-typed Column."""
    return _units_long(num, div).cast("double") / F.lit(float(10 ** dp))


def sql_qround(num: str, div: int, dp: int) -> str:
    return f"(CAST({_sql_units(num, div)} AS DOUBLE) / CAST({10 ** dp} AS DOUBLE))"


def qdiv_count(num: Column, cnt: Column, div: int, dp: int) -> Column:
    """Exact half-up of num/(div·cnt) to dp decimals, where cnt is a
    (positive integer) Column — the mean case. Doubled numerator and
    denominator make the +half trick exact for odd denominators:
    half_up(a/b) = (2a + b) with the remainder mod 2b stripped, over 2b.
    """
    den = cnt * F.lit(div)
    t = F.abs(num) * 2 + den
    d2 = den * 2
    adj = t - t % d2
    u = F.round(adj / d2.cast("double")).cast("long")
    units = F.when(num < 0, -u).otherwise(u)
    return units.cast("double") / F.lit(float(10 ** dp))


def sql_qdiv_count(num: str, cnt: str, div: int, dp: int) -> str:
    den = f"(({cnt}) * {div})"
    t = f"(abs({num}) * 2 + {den})"
    d2 = f"({den} * 2)"
    adj = f"({t} - ({t} % {d2}))"
    u = f"CAST(round({adj} / CAST({d2} AS DOUBLE)) AS BIGINT)"
    units = f"(CASE WHEN ({num}) < 0 THEN -{u} ELSE {u} END)"
    return f"(CAST({units} AS DOUBLE) / CAST({10 ** dp} AS DOUBLE))"


def py_half_up(num: int, den: int) -> int:
    """Python triplet of the same rounding (for mapInPandas operators):
    exact half-up of num/den, ties away from zero."""
    if num < 0:
        return -py_half_up(-num, den)
    return (2 * num + den) // (2 * den)
