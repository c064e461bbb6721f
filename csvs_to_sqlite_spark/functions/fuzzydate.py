"""Minimal pure-Python fuzzy date parser.

The reference delegates fuzzy parsing to the ``dateparser`` package
(reference utils.py:505-518; golden cases "3rd May 2017", "10pm on April 4
1938", "5:45 10 December 2009", "04/30/2005" in tests:584-587). That
package is not available here, so we vendor a small parser that covers the
reference's documented/golden behavior: explicit strptime formats first,
then fuzzy English parsing (month names, ordinal suffixes, am/pm times,
numeric m/d/y with US month-first disambiguation — dateparser's default
for English locales).
"""

from __future__ import annotations

import re
from datetime import datetime

_MONTHS = {
    m: i + 1
    for i, names in enumerate(
        [
            ("january", "jan"),
            ("february", "feb"),
            ("march", "mar"),
            ("april", "apr"),
            ("may",),
            ("june", "jun"),
            ("july", "jul"),
            ("august", "aug"),
            ("september", "sep", "sept"),
            ("october", "oct"),
            ("november", "nov"),
            ("december", "dec"),
        ]
    )
    for m in names
}

_ORDINAL_RE = re.compile(r"\b(\d+)(st|nd|rd|th)\b", re.I)
_TIME_RE = re.compile(
    r"\b(\d{1,2})(?::(\d{2}))?(?::(\d{2}))?\s*(am|pm)?\b(?=\s|$)", re.I
)
_WEEKDAYS = {
    "monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday",
    "mon", "tue", "tues", "wed", "thu", "thur", "thurs", "fri", "sat", "sun",
}
_FILLER = {"on", "at", "of", "in", "the", "year", ""} | _WEEKDAYS


class UnparseableDate(ValueError):
    pass


def parse_datetime(value: str, date_formats: list[str] | None = None) -> datetime:
    """strptime formats first (reference utils.py:509: formats are tried
    before fuzzy parsing), then fuzzy."""
    for fmt in date_formats or []:
        try:
            return datetime.strptime(value.strip(), fmt)
        except ValueError:
            continue
    return _parse_fuzzy(value)


def _parse_fuzzy(value: str) -> datetime:
    s = value.strip()
    # ISO fast path
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        pass

    s = _ORDINAL_RE.sub(r"\1", s)
    s = s.replace(",", " ")

    hour = minute = second = 0
    has_time = False
    lowered = s.lower()
    if "noon" in lowered or "midday" in lowered:
        hour, has_time = 12, True
        s = re.sub(r"\b(noon|midday)\b", " ", s, flags=re.I)
    elif "midnight" in lowered:
        has_time = True
        s = re.sub(r"\bmidnight\b", " ", s, flags=re.I)

    def grab_time(m: re.Match) -> str:
        nonlocal hour, minute, second, has_time
        h, mi, se, ampm = m.group(1), m.group(2), m.group(3), m.group(4)
        # A bare 1-2 digit number with no ':' and no am/pm is a date part.
        if mi is None and ampm is None:
            return m.group(0)
        if has_time:
            return m.group(0)
        hour, minute, second = int(h), int(mi or 0), int(se or 0)
        if ampm:
            ampm = ampm.lower()
            if ampm == "pm" and hour != 12:
                hour += 12
            if ampm == "am" and hour == 12:
                hour = 0
        has_time = True
        return " "

    s = _TIME_RE.sub(grab_time, s)

    tokens = [t for t in re.split(r"\s+", s.lower()) if t not in _FILLER]
    month = day = yr = None
    numbers: list[int] = []
    numeric_date: tuple[int, int, int] | None = None
    for tok in tokens:
        if tok in _MONTHS:
            month = _MONTHS[tok]
        elif re.fullmatch(r"\d+", tok):
            numbers.append(int(tok))
        elif re.fullmatch(r"\d{1,4}[/\-.]\d{1,2}[/\-.]\d{1,4}", tok):
            a, b, c = (int(x) for x in re.split(r"[/\-.]", tok))
            numeric_date = (a, b, c)
        else:
            raise UnparseableDate(value)

    if numeric_date is not None:
        a, b, c = numeric_date
        if a > 31:  # y-m-d
            yr, month, day = a, b, c
        else:  # US default: m/d/y (dateparser en locale)
            month, day, yr = a, b, c
            if month > 12 and day <= 12:
                month, day = day, month
        if yr < 100:
            yr += 2000 if yr < 70 else 1900
        return datetime(yr, month, day, hour, minute, second)

    for n in numbers:
        if n > 31 or (yr is None and len(str(n)) == 4):
            yr = n
        elif day is None:
            day = n
        elif yr is None:
            yr = n
    if yr is not None and yr < 100:
        yr += 2000 if yr < 70 else 1900
    if month is None or yr is None:
        raise UnparseableDate(value)
    if day is None:
        day = 1
    return datetime(yr, month, day, hour, minute, second)
