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
