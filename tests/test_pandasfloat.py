"""Differential validation of the precise_xstrtod port against the REAL
pandas parser (the reference's actual float converter) — no Spark needed.

Ground truth is pd.read_csv itself: for every probe string we parse a
two-row column (benign float first, so pandas' order-dependent int-overflow
rule keeps the column in float mode) and compare bit patterns.
"""

import io
import random
import struct

import pandas as pd
import pytest

from csvs_to_sqlite_spark.functions.pandasfloat import (
    pandas_parse_float,
    precise_xstrtod,
)


def _pandas_value(s: str, quoting: int = 0):
    """dtype-float64 value pandas stores for s, or None if the column
    falls back to object."""
    df = pd.read_csv(
        io.StringIO("c\n1.5\n" + s + "\n"), na_filter=False, quoting=quoting
    )
    if df["c"].dtype == object:
        return None
    return float(df["c"].iloc[1])


def _bits(x):
    return struct.pack("<d", x)


def _same(a, b):
    if a is None or b is None:
        return a is b
    return _bits(a) == _bits(b)


PINNED = [
    # (string, expected float via the port) — every documented drift class
    ("9223372036854775807", 9.223372036854778e18),  # 19-digit mantissa
    ("123456789.123456789", 123456789.12345678),  # 18-sig-digit drift
    ("0.000000000000000000001", 0.0),  # >16-digit sub-1 collapse
    ("9999999999999999999999999", 1e25),
    ("18446744073709551614", 1.8446744073709552e19),
    ("9.80025680261439e-301", 9.80025680261439e-301),  # subnormal branch
    ("1e-320", 1e-320),
    ("5e-324", 5e-324),
    ("7.7e-400", 0.0),  # exponent < -616 → flushes to +0.0
    (" 7.5 ", 7.5),  # leading/trailing whitespace skipped
    ("-.5", -0.5),
    ("1E+3", 1000.0),
    ("Infinity", float("inf")),
    ("-INFINITY", float("-inf")),
    ("+inf", float("inf")),
]

REJECTED = [
    "1e",  # exponent marker with no digits un-consumes → trailing junk
    "1e+",
    ".",
    "1..2",
    "1e309",  # ERANGE overflow
    "0e309",  # zero value but out-of-range exponent: still ERANGE
    " inf",  # inf keywords match the RAW word only — no whitespace
    "inf ",
    ".inf",
    "infx",
    "",
]


@pytest.mark.parametrize("s,expected", PINNED)
def test_pinned_values(s, expected):
    got = pandas_parse_float(s)
    assert got is not None and _bits(got) == _bits(expected), (s, got)
    assert _same(got, _pandas_value(s)), (s, got, _pandas_value(s))


@pytest.mark.parametrize("s", REJECTED)
def test_pinned_rejections(s):
    assert pandas_parse_float(s) is None
    if s.strip():
        assert _pandas_value(s) is None


def test_randomized_against_real_pandas():
    """Seeded sweep over adversarial shapes: plain ints (short/huge),
    long-mantissa decimals, scientific notation into the subnormal and
    overflow ranges, and repr() of random bit-pattern doubles. Asserts
    BIT-identical agreement with pandas, including rejects, for the
    default converter AND the QUOTE_NONNUMERIC path (probed to share it).
    """
    rng = random.Random(20260816)
    corpus = []
    for _ in range(400):
        kind = rng.randrange(5)
        sign = rng.choice(["", "-", "+"])
        if kind == 0:
            s = sign + "".join(
                rng.choice("0123456789") for _ in range(rng.randint(1, 25))
            )
        elif kind == 1:
            a = "".join(rng.choice("0123456789") for _ in range(rng.randint(0, 20)))
            b = "".join(rng.choice("0123456789") for _ in range(rng.randint(0, 22)))
            if not (a + b):
                continue
            s = sign + a + "." + b
        elif kind == 2:
            a = "".join(rng.choice("0123456789") for _ in range(rng.randint(1, 18)))
            s = (
                sign
                + a
                + rng.choice("eE")
                + rng.choice(["", "-", "+"])
                + str(rng.randint(0, 650))
            )
        elif kind == 3:
            a = "".join(rng.choice("0123456789") for _ in range(rng.randint(0, 9)))
            b = "".join(rng.choice("0123456789") for _ in range(rng.randint(0, 25)))
            if not (a + b):
                continue
            s = sign + a + "." + b + "e-" + str(rng.randint(280, 660))
        else:
            x = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
            if x != x or abs(x) == float("inf"):
                continue
            s = repr(x)
        corpus.append(s)
    for quoting in (0, 2):
        for s in corpus:
            try:
                theirs = _pandas_value(s, quoting=quoting)
            except Exception:
                continue  # quoting=2 hard-errors on some rejects
            ours = pandas_parse_float(s)
            assert _same(ours, theirs), (quoting, s, ours, theirs)


def test_consumed_flag():
    v, ok = precise_xstrtod("1.5x")
    assert v == 1.5 and not ok
    v, ok = precise_xstrtod(" 2.5 ")
    assert v == 2.5 and ok
