"""B10-B13: fuzzy date/datetime columns → ISO-8601 TEXT
(reference utils.py:505-518; golden tests:584-604).

Spark design: an Arrow-batched pandas UDF wrapping the fuzzy parser, with a
per-batch memo cache — date columns repeat heavily, so the cache turns the
per-value Python cost into per-distinct-value. Explicit ``--datetime-format``
strptime formats are tried before fuzzy parsing, exactly like the reference
(utils.py:509). NULLs pass through untouched (utils.py:507-508).

Scale note: this is deliberately the only Pandas-UDF hot path in the parity
surface (SURVEY §7.4). When formats are explicit and Spark-expressible the
faster path is a native ``coalesce(to_date(c, f1), …)`` chain; the fuzzy
English cases have no JVM equivalent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.cols import qcol

from csvs_to_sqlite_spark.functions.fuzzydate import parse_datetime


def _make_udf(date_formats: tuple[str, ...], date_only: bool):
    fmts = list(date_formats)

    @F.pandas_udf("string")
    def parse(series: pd.Series) -> pd.Series:
        cache: dict[str, str | None] = {}

        def one(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return v
            s = str(v)
            if s in cache:
                return cache[s]
            dt = parse_datetime(s, fmts)
            out = dt.date().isoformat() if date_only else dt.isoformat()
            cache[s] = out
            return out

        return series.map(one)

    return parse


def apply_dates_and_datetimes(
    df: DataFrame,
    date_cols: tuple[str, ...] = (),
    datetime_cols: tuple[str, ...] = (),
    datetime_formats: tuple[str, ...] = (),
    nonnull_counts: dict[str, int] | None = None,
) -> DataFrame:
    """``nonnull_counts`` (from the inference pass) lets an ALL-NULL target
    column skip the transform entirely: the reference's parse loop skips
    NaN cells, so an all-NaN column stays float64 and C1 declares it
    INTEGER — stringifying it here would flip the DDL to TEXT (caught by
    differential fuzz seed 82002)."""
    cols = set(df.columns)
    nn = nonnull_counts or {}
    date_udf = _make_udf(datetime_formats, date_only=True)
    dt_udf = _make_udf(datetime_formats, date_only=False)
    for c in date_cols:
        if c in cols and nn.get(c, 1) > 0:
            df = df.withColumn(c, date_udf(qcol(c).cast("string")))
    for c in datetime_cols:
        if c in cols and nn.get(c, 1) > 0:
            df = df.withColumn(c, dt_udf(qcol(c).cast("string")))
    return df
