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
    # integrality via `% 1.0` (stays in double — floor() returns BIGINT
    # and overflows for huge doubles); NaN is skipped like the
    # reference's `not np.isnan(v) and not v.is_integer()`
    aggs = [
        F.max(
            F.when(
                F.col(c).isNotNull()
                & ~F.isnan(F.col(c))
                & ((F.col(c) % F.lit(1.0)) != 0.0),
                1,
            ).otherwise(0)
        ).alias(c)
        for c in float_cols
    ]
    row = df.agg(*aggs).collect()[0]
    return [c for c in float_cols if row[c] == 0]


def downcast_integral_floats(df: DataFrame) -> DataFrame:
    """VALUE downcast (long columns) for Spark-side pipelines. Unlike the
    affinity-only C1 decision, an actual long cast must also fit int64 —
    an all-integral column containing 1e25 keeps its doubles (the SQLite
    sink's INTEGER affinity handles per-value coercion instead)."""
    winners = set(integral_float_columns(df))
    if not winners:
        return df
    fits = df.agg(
        *[
            F.max(
                F.when(F.abs(F.col(c)) >= F.lit(float(2**63)), 1).otherwise(0)
            ).alias(c)
            for c in winners
        ]
    ).collect()[0]
    winners = {c for c in winners if fits[c] == 0}
    if not winners:
        return df
    return df.select(
        *[F.col(c).cast("long").alias(c) if c in winners else F.col(c) for c in df.columns]
    )
