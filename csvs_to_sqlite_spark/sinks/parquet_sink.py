"""Native large-scale sink: partitioned Parquet.

The SQLite sink is the parity/compat path; at 100 TB the engine's real
output is Parquet (SURVEY §4.4). Facts are written partitioned; dims are
small single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from csvs_to_sqlite_spark.operators.rowid import ROW_ID


def write_fact(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    cols = [c for c in df.columns if c != ROW_ID]
    writer = df.select(*cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_dim(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.coalesce(1).write.mode(mode).parquet(path)
