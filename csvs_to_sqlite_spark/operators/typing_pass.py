"""C1: int-downcast of integral float columns (reference utils.py:290-303).

pandas represents int-with-NULL columns as float64; the reference checks
whether every non-NaN value is integral and, if so, declares the SQLite
column INTEGER (golden: blank-padded ``district`` column is INTEGER,
reference tests:53). We run ONE aggregate over all float columns at once
(map-side partial agg; no per-column jobs) and downcast winners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def integral_float_columns(df: DataFrame) -> list[str]:
    float_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, (DoubleType, FloatType))]
    if not float_cols:
        return []
    aggs = [
        F.max(
            F.when(F.col(c).isNotNull() & (F.col(c) != F.floor(F.col(c))), 1).otherwise(0)
        ).alias(c)
        for c in float_cols
    ]
    row = df.agg(*aggs).collect()[0]
    return [c for c in float_cols if row[c] == 0]


def downcast_integral_floats(df: DataFrame) -> DataFrame:
    winners = set(integral_float_columns(df))
    if not winners:
        return df
    return df.select(
        *[F.col(c).cast("long").alias(c) if c in winners else F.col(c) for c in df.columns]
    )
