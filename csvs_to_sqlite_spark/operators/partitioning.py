"""Partitioning strategies for 100 TB joins (SURVEY §4 / brief).

- bucketed_write / bucketed tables: co-locate both sides of a recurring
  equi-join at write time so the join runs with NO exchange — the only
  way a fact-fact join (lineitem ⋈ orders) avoids reshuffling terabytes
  on every query.
- salted_join: hot-key mitigation when one side has pathological key
  skew AQE can't fix alone — explode the hot side's key space by a salt
  factor, replicate the small side per salt, join, drop the salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketed_write(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed (and sorted) table; subsequent equi-joins on
    ``key`` between tables bucketed the same way need no shuffle."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_l] == right[key_r])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``salt``
    sub-keys. The right side is replicated ``salt``× (explode of a small
    literal array), so each (key, salt_i) bucket holds 1/salt of the hot
    key's rows. Use when a handful of keys dominate; for uniform keys the
    plain join is cheaper.
    """
    salt_col = (F.rand(seed=42) * salt).cast("int")
    l = left.withColumn("__salt__", salt_col)
    r = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "__salt__"], how)
    return out.drop("__salt__")
