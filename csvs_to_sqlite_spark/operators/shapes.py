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


_SPARK_CAST = {"INTEGER": "long", "REAL": "double"}


def apply_shape(df: DataFrame, shape: str | list[ShapeCol] | None) -> tuple[DataFrame, dict[str, str]]:
    """B2-B4: keep/rename/cast; returns (df, sink_type_overrides).

    TEXT/BLOB/NUMERIC only affect sink DDL (reference utils.py:285,305);
    INTEGER/REAL additionally cast the data (golden tests:295-312: values
    become 41.0… under REAL; tests:714-732: just-strings + REAL casts
    strings to float).
    """
    if not shape:
        return df, {}
    cols = parse_shape(shape) if isinstance(shape, str) else shape
    overrides: dict[str, str] = {}
    projections = []
    for c in cols:
        expr = F.col(c.csv_name)
        if c.type_override:
            overrides[c.db_name] = c.type_override
            spark_type = _SPARK_CAST.get(c.type_override)
            if spark_type:
                expr = expr.cast(spark_type)
        projections.append(expr.alias(c.db_name))
    return df.select(*projections), overrides
