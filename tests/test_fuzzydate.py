"""Unit + property tests for the vendored fuzzy date parser."""

from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from csvs_to_sqlite_spark.functions.fuzzydate import UnparseableDate, parse_datetime

GOLDEN = [
    # reference golden cases (tests:584-604)
    ("3rd May 2017", "2017-05-03T00:00:00"),
    ("04/30/2005", "2005-04-30T00:00:00"),
    ("10pm on April 4 1938", "1938-04-04T22:00:00"),
    ("5:45 10 December 2009", "2009-12-10T05:45:00"),
    # broader fuzzy coverage
    ("Jan 5, 2017", "2017-01-05T00:00:00"),
    ("Tuesday, May 3, 2017", "2017-05-03T00:00:00"),
    ("noon 1 Jan 2000", "2000-01-01T12:00:00"),
    ("midnight 1 Jan 2000", "2000-01-01T00:00:00"),
    ("December 25th, 1990", "1990-12-25T00:00:00"),
    ("1990-12-25 13:45:10", "1990-12-25T13:45:10"),
    ("12am January 1 2020", "2020-01-01T00:00:00"),
    ("12pm January 1 2020", "2020-01-01T12:00:00"),
    ("2017/05/03", "2017-05-03T00:00:00"),
    ("15/03/2001", "2001-03-15T00:00:00"),  # day>12 → day-first disambiguation
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden_cases(raw, expected):
    assert parse_datetime(raw).isoformat() == expected


def test_strptime_formats_first():
    assert parse_datetime("03/02/01", ["%y/%d/%m"]).isoformat() == "2003-01-02T00:00:00"
    # format list tried in order; fuzzy fallback when none matches
    assert parse_datetime("3rd May 2017", ["%Y-%m-%d"]).isoformat() == "2017-05-03T00:00:00"


def test_unparseable_raises():
    with pytest.raises(UnparseableDate):
        parse_datetime("not a date at all xyz")


@settings(max_examples=200, deadline=None)
@given(
    st.datetimes(
        min_value=datetime(1900, 1, 1), max_value=datetime(2099, 12, 31)
    ).filter(lambda d: d.microsecond == 0)
)
def test_roundtrip_common_renderings(dt):
    """Any datetime rendered in common formats parses back exactly."""
    renderings = [
        dt.isoformat(),
        dt.strftime("%Y-%m-%d %H:%M:%S"),
        dt.strftime("%B %d %Y ") + dt.strftime("%H:%M:%S"),
        dt.strftime("%d %b %Y %H:%M:%S"),
    ]
    for r in renderings:
        assert parse_datetime(r) == dt, r
    # date-only renderings drop the time
    assert parse_datetime(dt.strftime("%m/%d/%Y")).date() == dt.date()
    assert parse_datetime(dt.strftime("%d %B %Y")).date() == dt.date()
