"""Sequence packing: assign documents to fixed token-budget context
windows ("packs") for LM training.

Semantics (offset packing, the distributed-friendly scheme): within a
worker group, documents are laid end-to-end in a deterministic order and
a document belongs to the pack where it STARTS —
``pack_id = floor(start_offset / budget)``. A document may straddle a
pack boundary; the training loader truncates/continues at read time.
This is the packing used when the corpus is materialized as contiguous
token streams, and unlike first-fit it needs no sequential state, so it
is expressible as one cumulative-sum window.

Scale shape: packing is embarrassingly parallel across ``n_groups``
hash-derived worker groups (a real pipeline packs per shard — packs
never span shards). One shuffle keyed by group, one in-partition sort by
doc id, zero Python. Group count scales with the cluster, so no window
ever sees more than corpus/n_groups rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csvs_to_sqlite_spark.functions.hashing import md5_long, md5_long_sql, tokens_expr


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_groups: int = 32,
    seed: str = "pack",
) -> DataFrame:
    """(id, group_id, pack_id, n_tokens, start_offset) per document.

    ``n_groups`` bounds window-partition width — size it to executor
    count × a few, the same way you size shuffle partitions.
    """
    toked = df.select(
        F.col(id_col),
        (md5_long(F.col(id_col).cast("string"), seed=seed) % n_groups).alias(
            "group_id"
        ),
        F.size(tokens_expr(F.col(text_col), distinct=False)).cast("long").alias(
            "n_tokens"
        ),
    )
    w = Window.partitionBy("group_id").orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    return toked.select(
        id_col,
        "group_id",
        "n_tokens",
        start,
    ).withColumn("pack_id", F.floor(F.col("start_offset") / budget))


def pack_sequences_sql(
    budget: int = 512,
    n_groups: int = 32,
    seed: str = "pack",
    table: str = "documents",
) -> str:
    """DuckDB twin of pack_sequences (same hash, same window)."""
    h = md5_long_sql("cast(doc_id as varchar)", seed=seed)
    return (
        "WITH toked AS (SELECT doc_id, "
        f"({h} % {n_groups}) AS group_id, "
        "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        "t -> t <> '')) AS n_tokens "
        f"FROM {table}),\n"
        "laid AS (SELECT doc_id, group_id, n_tokens, "
        "sum(n_tokens) OVER (PARTITION BY group_id ORDER BY doc_id) - n_tokens "
        "AS start_offset FROM toked)\n"
        f"SELECT doc_id, group_id, n_tokens, start_offset, "
        f"cast(floor(start_offset / {budget}) AS BIGINT) AS pack_id FROM laid"
    )
