"""Stable row identity (SURVEY.md §4.3).

SQLite ``rowid`` (1..N in insert order) is load-bearing in the reference:
FTS external-content tables address rows by rowid (utils.py:386,428) and
the canonical query idiom is ``rowid IN (…)`` (reference tests:179-187).
Spark DataFrames have no stable row order, so we materialize ``row_id``
explicitly.

Implementation: ``zipWithIndex`` over the scan RDD. The Spark CSV reader
emits records in file order within a partition and partitions are ordered
by file offset, so zipWithIndex reproduces CSV row order deterministically.
This is the ONE place the engine drops to the RDD API (SURVEY §7.1).

Scale note: zipWithIndex runs one extra job to count per-partition sizes —
acceptable (metadata-only second pass). For parquet-derived pipelines we
avoid it entirely by ranking over an explicit order key
(``row_id_from_order``), which stays in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

ROW_ID = "__row_id__"


def with_row_id(df: DataFrame, start: int = 1) -> DataFrame:
    """Append ROW_ID = start..start+N-1 in current (scan) order."""
    schema = T.StructType(list(df.schema.fields) + [T.StructField(ROW_ID, T.LongType(), False)])
    rdd = df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1] + start))
    return df.sparkSession.createDataFrame(rdd, schema)


def row_id_from_order(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """ROW_ID via row_number() over an explicit total-order key.

    Preferred at scale when the data carries its own order (e.g. TPC-H
    (l_orderkey, l_linenumber)): no RDD round-trip, stays in codegen.
    A single unpartitioned window is a bottleneck at 100 TB — callers
    needing global ids at that scale should use with_row_id (zipWithIndex)
    or a two-phase rank (per-partition rank + offset). For dim numbering
    (small distinct sets) this is the right tool.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(ROW_ID, F.row_number().over(w).cast("long"))
