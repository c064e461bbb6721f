"""pandas read_csv float-value parity: a faithful Python port of pandas'
``precise_xstrtod`` C converter.

The reference tool parses CSVs with pandas (reference utils.py:38-47), whose
C tokenizer converts float cells with ``precise_xstrtod`` (pandas
``_libs/src/parser/tokenizer.c``, BSD-3 public source; the default for
``float_precision=None``/'high'). That converter caps significant digits at
17 and scales by cached powers of ten, so its results drift from the
correctly-rounded value in the last digit for long mantissas, collapse
>16-significant-digit sub-1 decimals toward zero, and round subnormals
through a two-division path. Spark's string→double cast is correctly
rounded, so by default this engine produces the *better* value — the
documented "xstrtod family" divergence.

Since round 9 value parity is the DEFAULT, in AUTO form: the inference
pass carries a cheap per-column risk probe (any non-null cell with >15
trimmed characters or exponent notation — the only classes where this
converter can differ from a correctly rounded parse), and only risky
columns pay the Arrow-batched parity parse; clean columns keep Spark's
JVM-side cast, which is bit-identical there (<=15-digit mantissas are an
exact integer divided once by an exact power of ten in BOTH parsers).
``SPARK_GRAFT_PANDAS_FLOAT_PARITY=1``/``load_csv(float_parity=True)``
forces the parity parse on every float column;
``SPARK_GRAFT_PANDAS_FLOAT_PARITY=0`` restores the pre-round-9 posture
(correctly rounded everywhere — the documented xstrtod divergence).

Every branch here was differential-tested against the installed pandas
(2.2) over 24k+ randomized numeric strings plus adversarial shapes — see
tests/test_pandasfloat.py. Empirically pinned details that differ from a
naive reading of the algorithm:

- the QUOTE_NONNUMERIC tokenizer path produces the same values as this
  converter (probed: '9223372036854775807' → 9.223372036854778e18 under
  quoting=2, the precise_xstrtod drift, not the legacy-xstrtod one);
- int64 columns that go float64 because of NULL siblings are upcast from
  the exact int64 values (→ use an exact long→double cast, NOT this
  converter);
- the subnormal branch divides by e[-308-exponent] THEN by e[308]
  (matches pandas bit-for-bit on every probed subnormal; the
  multiply-by-1e-308 variant drifts);
- a trailing exponent marker with no digits un-consumes ('1e' is a parse
  failure → object column, '1e5' parses);
- inf keywords are accepted only as the exact raw words
  inf/infinity with optional sign, case-insensitive, NO surrounding
  whitespace (' inf' makes the column object).
"""

# NOTE: no `from __future__ import annotations` — the pandas_udf type-hint
# inference below needs REAL annotations, not strings.
import os

# exact doubles of 10^0..10^308 — mirrors the C static cache `e[]`
_E = [float("1e%d" % i) for i in range(309)]
_WS = " \t\n\r\v\f"
_DIGITS = set("0123456789")
_MAX_DIGITS = 17
_INF_WORDS = {"inf", "+inf", "-inf", "infinity", "+infinity", "-infinity"}
_INF = float("inf")

PARITY_ENV = "SPARK_GRAFT_PANDAS_FLOAT_PARITY"


def parity_enabled() -> bool | None:
    """Tri-state toggle: True = parity-parse every float column, False =
    never (Spark's correctly rounded cast everywhere — the pre-round-9
    default), None (env unset) = AUTO, the default: parity-parse only
    columns holding a risk token (>15 trimmed chars or exponent
    notation), where the two parses can differ; everywhere else the
    casts are provably bit-identical (see csv_source risk probe)."""
    v = os.environ.get(PARITY_ENV)
    if v is None or v == "":
        return None
    return v.lower() in ("1", "true", "yes")


def precise_xstrtod(word: str) -> tuple[float | None, bool]:
    """Port of pandas' precise_xstrtod(word, decimal='.', sci='e',
    tsep='\\0', skip_trailing=1). Returns (value, consumed_all);
    value None means ERANGE (pandas would not parse the cell)."""
    p, L = 0, len(word)
    while p < L and word[p] in _WS:
        p += 1
    negative = False
    if p < L and word[p] in "+-":
        negative = word[p] == "-"
        p += 1
    number = 0.0
    exponent = 0
    num_digits = 0
    num_decimals = 0
    while p < L and word[p] in _DIGITS:
        if num_digits < _MAX_DIGITS:
            number = number * 10.0 + (ord(word[p]) - 48)
            num_digits += 1
        else:
            exponent += 1
        p += 1
    if p < L and word[p] == ".":
        p += 1
        while num_digits < _MAX_DIGITS and p < L and word[p] in _DIGITS:
            number = number * 10.0 + (ord(word[p]) - 48)
            p += 1
            num_digits += 1
            num_decimals += 1
        if num_digits >= _MAX_DIGITS:
            while p < L and word[p] in _DIGITS:
                p += 1
        exponent -= num_decimals
    if num_digits == 0:
        return None, False  # ERANGE
    if negative:
        number = -number
    if p < L and word[p] in "eE":
        start_e = p
        p += 1
        neg_exp = False
        if p < L and word[p] in "+-":
            neg_exp = word[p] == "-"
            p += 1
        n = 0
        exp_digits = 0
        while exp_digits < _MAX_DIGITS and p < L and word[p] in _DIGITS:
            n = n * 10 + (ord(word[p]) - 48)
            exp_digits += 1
            p += 1
        exponent += -n if neg_exp else n
        if exp_digits == 0:
            p = start_e  # no digits after the marker: un-consume it
    if exponent > 308:
        return None, False  # ERANGE → HUGE_VAL → pandas rejects the cell
    elif exponent > 0:
        number *= _E[exponent]
    elif exponent < -308:  # subnormal
        if exponent < -616:
            number = 0.0
        else:
            number /= _E[-308 - exponent]
            number /= _E[308]
    else:
        number /= _E[-exponent]
    if number == _INF or number == -_INF:
        return None, False
    while p < L and word[p] in _WS:  # skip_trailing
        p += 1
    return number, p == L


def pandas_parse_float(word: str) -> float | None:
    """The value pandas read_csv stores for this cell in a float64 column,
    or None if pandas would reject it (→ the column falls back to object).
    Mirrors the _try_double wrapper: converter first, then the exact
    inf-keyword fallback on the raw (un-stripped) word."""
    value, consumed = precise_xstrtod(word)
    if value is None or not consumed:
        w = word.lower()
        if w in _INF_WORDS:
            return -_INF if w[0] == "-" else _INF
        return None
    return value


def parity_double(col):
    """Arrow-batched parity parse of a string Column → nullable double.

    Scale: only active in the opt-in parity mode (the default ingest path
    keeps Spark's JVM-side correctly-rounded cast); per-batch memo over
    distinct strings keeps the Python cost proportional to cardinality.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _parity(s: pd.Series) -> pd.Series:
        memo: dict[str, float | None] = {}

        def conv(w):
            if w is None:
                return None
            v = memo.get(w, memo)
            if v is not memo:
                return v
            v = pandas_parse_float(w)
            if v is None:
                # acceptance is decided by the (pandas-validated) inference
                # rules before values are parsed; if a cell reaches a float
                # column that this port rejects, fall back to the correctly
                # rounded value rather than fabricating a NULL
                try:
                    v = float(w)
                except ValueError:
                    v = None
            memo[w] = v
            return v

        # Float64 (masked) keeps None as NULL — a plain float64 series
        # would smuggle NULLs in as NaN
        return pd.Series([conv(w) for w in s], dtype="Float64")

    return _parity(col)
