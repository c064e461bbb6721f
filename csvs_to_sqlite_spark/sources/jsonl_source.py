"""Line-delimited JSON (JSONL) source — extension beyond the reference.

The reference ingests CSV only (csvs_to_sqlite/cli.py:8-17 takes CSV
paths); training-data pipelines overwhelmingly ship documents as JSONL,
so this source gives the same load surface (projection, malformed-row
policy, schema control) over ``spark.read.json``.

Scale posture:
- JSONL is line-splittable, so a 100 TB corpus parallelizes at file-split
  granularity with no driver involvement (gzip members are the usual
  caveat: one .jsonl.gz = one task; prefer zstd/uncompressed or many
  files).
- Schema inference samples the data (``samplingRatio``) instead of a full
  pre-scan; for production runs pass an explicit ``schema`` so the scan
  is single-pass and the reader can prune columns it never parses
  (Spark's JSON reader skips tokenizing unprojected fields).
- ``columns`` projection happens in the same select, so Catalyst prunes
  parsing work; a missing requested column is a loud per-file error like
  the CSV source's A6 semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MALFORMED_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def load_jsonl(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    schema: str | None = None,
    mode: str = "PERMISSIVE",
    sampling_ratio: float = 1.0,
    corrupt_column: str | None = None,
) -> DataFrame:
    """Load one JSONL file/directory into a DataFrame.

    ``mode`` follows Spark's JSON reader: PERMISSIVE keeps malformed
    lines as nulls (optionally captured whole in ``corrupt_column``),
    DROPMALFORMED skips them (the CSV source's A4 skip-errors shape),
    FAILFAST raises on the first bad line.
    """
    if mode not in MALFORMED_MODES:
        raise ValueError(f"mode must be one of {MALFORMED_MODES}, got {mode!r}")
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    if corrupt_column is not None:
        if schema is None:
            raise ValueError("corrupt_column capture needs an explicit schema")
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    df = reader.json(path)
    if columns is not None:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            raise ValueError(f"{path} has no column{'s' if len(missing) > 1 else ''} {', '.join(missing)}")
        df = df.select(*columns)
    return df
