"""B1-B9: --shape parsing and application (reference utils.py:441-487).

The parser grammar is the reference's: ``csvname:dbname(TYPE)`` items,
comma-separated; each part optional except csvname. Application is a pure
``select`` with aliases + casts — Catalyst prunes unselected columns all
the way into the CSV parser.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.cols import qcol

from csvs_to_sqlite_spark.plans.specs import ShapeCol

# reference utils.py:441
_TYPE_RE = re.compile(r"\((real|integer|text|blob|numeric)\)$", re.I)


def parse_shape(shape: str) -> list[ShapeCol]:
    """reference utils.py:444-466."""
    cols: list[ShapeCol] = []
    for item in shape.split(","):
        item = item.strip()
        if not item:
            continue
        type_override = None
        m = _TYPE_RE.search(item)
        if m:
            type_override = m.group(1).upper()
            item = item[: m.start()]
        if ":" in item:
            csv_name, db_name = item.split(":", 1)
        else:
            csv_name = db_name = item
        cols.append(ShapeCol(csv_name.strip(), db_name.strip(), type_override))
    return cols


def apply_shape(df: DataFrame, shape: str | list[ShapeCol] | None) -> tuple[DataFrame, dict[str, str]]:
    """B2-B4: keep/rename + DDL overrides; returns (df, sink_type_overrides).

    EVERY type override (REAL/INTEGER/TEXT/BLOB/NUMERIC) is DDL-ONLY,
    exactly like the reference: apply_shape (utils.py:469-487) never
    casts a value — the override reaches to_sql's dtype= and SQLite's
    column AFFINITY coerces per value at insert. That is why '41' under
    (REAL) lands as 41.0 (golden tests:295-312) while 'e5' in the same
    column stays TEXT: a Spark-side cast would instead null (or, under
    ANSI, reject) the uncastable values — caught by differential fuzz
    seed 17001 with a partially-numeric column."""
    if not shape:
        return df, {}
    cols = parse_shape(shape) if isinstance(shape, str) else shape
    overrides: dict[str, str] = {}
    projections = []
    for c in cols:
        if c.type_override:
            overrides[c.db_name] = c.type_override
        projections.append(qcol(c.csv_name).alias(c.db_name))
    return df.select(*projections), overrides
