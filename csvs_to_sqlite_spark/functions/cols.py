"""Literal column references for user-controlled names.

``F.col("p.x")`` parses the dot as a struct accessor and backticks as
quoting, so any CSV header containing them breaks a naive reference
(the reference tool, going through pandas, has no such parsing layer —
differential scenario dotted.csv). Every place the engine references a
column whose NAME CAME FROM USER DATA must go through ``qcol``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """A Column reference that treats ``name`` literally (backtick-quoted,
    embedded backticks doubled)."""
    return F.col("`" + name.replace("`", "``") + "`")


def byte_view(col: Column | str) -> Column:
    """A byte-stable string projection: the UTF-8 octets of ``col``
    re-read as ISO-8859-1, i.e. a string with exactly one character per
    UTF-8 byte. String functions that Spark evaluates per CODE POINT
    (``levenshtein``, ``length``) become per-BYTE over this view —
    matching DuckDB, whose string functions are byte-based
    (``levenshtein('é','a')`` = 1 in Spark vs 2 in DuckDB; over the
    byte view both engines say 2). Bijective (latin-1 decodes every
    byte), scan-stage JVM, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.decode(F.encode(c, "UTF-8"), "ISO-8859-1")
