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
        "CAST(sum(n_tokens) OVER (PARTITION BY group_id ORDER BY doc_id) "
        "- n_tokens AS BIGINT) AS start_offset FROM toked)\n"
        f"SELECT doc_id, group_id, n_tokens, start_offset, "
        f"cast(floor(start_offset / {budget}) AS BIGINT) AS pack_id FROM laid"
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Context-window chunking: split each document into token windows of
    ``max_len`` starting every ``stride`` tokens (stride < max_len ⇒
    overlapping windows, the standard way long documents become training
    sequences without losing cross-boundary context).

    Window starts run 0, stride, 2·stride, … while start < n_tokens, so
    every token appears in ≥1 window and the final window may be short.
    Returns (id, chunk_idx, n_tokens, chunk). Entirely scan-stage: one
    explode, zero shuffles, zero Python — at 100 TB this adds no stage
    boundary to the pipeline it feeds.
    """
    toks = tokens_expr(F.col(text_col), distinct=False)
    base = df.select(F.col(id_col), toks.alias("__toks__"))
    windows = F.when(
        F.size("__toks__") >= 1,
        F.expr(
            f"transform(sequence(0, size(__toks__) - 1, {stride}),"
            f" s -> concat_ws(' ', slice(__toks__, s + 1, {max_len})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = base.select(
        F.col(id_col),
        F.size("__toks__").alias("__n__"),
        F.posexplode(windows).alias("chunk_idx", "chunk"),
    )
    n_tokens = F.least(
        F.lit(max_len), F.col("__n__") - F.col("chunk_idx") * stride
    ).cast("long")
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        n_tokens.alias("n_tokens"),
        "chunk",
    )


def chunk_windows_sql(
    max_len: int = 32, stride: int = 24, table: str = "documents"
) -> str:
    """DuckDB twin of chunk_windows (same starts, same slices)."""
    return (
        "WITH tokd AS (SELECT doc_id, "
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        "t -> t <> '') AS toks "
        f"FROM {table}),\n"
        "win AS (SELECT doc_id, len(toks) AS n, "
        f"unnest(list_transform(range(0, greatest(len(toks), 0), {stride}), "
        f"s -> {{'idx': s // {stride}, 'txt': array_to_string("
        f"toks[s + 1 : s + {max_len}], ' '), 'nt': least({max_len}, len(toks) - s)}})) AS u "
        "FROM tokd)\n"
        "SELECT doc_id, cast(u.idx AS bigint) AS chunk_idx, "
        "cast(u.nt AS bigint) AS n_tokens, u.txt AS chunk FROM win"
    )


def length_bucketed_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 8,
) -> DataFrame:
    """Length-grouped batch assignment (the HF ``group_by_length``
    trainer pattern): docs land in log2 length buckets, batches form
    WITHIN a bucket, and the per-batch padding waste — the wasted
    compute the grouping exists to minimize — is reported exactly.

    Returns one row per batch: (bucket, batch_id, n_docs, max_len,
    sum_len, padding_waste) where padding_waste = n_docs·max_len −
    sum_len (all exact integers — no float anywhere).

    Plan shape: one scan-stage tokenize + bucket expr, one window keyed
    (bucket) ordered (n_tokens, id) for deterministic batch membership,
    one (bucket, batch) aggregate. The window partitions by bucket
    (~log2(max_len) groups): batches must be globally numbered within a
    bucket, so this is the price of the contract; at extreme scale
    sub-salt the bucket by a hash prefix and renumber hierarchically,
    same two-phase discipline as global_shuffle's rank."""
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr

    toked = df.select(
        F.col(id_col),
        F.size(tokens_expr(F.col(text_col), distinct=False)).cast("long").alias(
            "n_tokens"
        ),
    ).where(F.col("n_tokens") > 0)
    # floor(log2(n)) via binary-string length: EXACT integer arithmetic —
    # a float log2 is libm-dependent and can land on 2.999…96 at exact
    # powers of two, flipping the bucket between engines
    bucket = (
        F.length(F.conv(F.col("n_tokens").cast("string"), 10, 2)) - 1
    ).cast("long").alias("bucket")
    w = Window.partitionBy("bucket").orderBy(
        F.col("n_tokens").asc(), F.col(id_col).asc()
    )
    laid = toked.select(id_col, "n_tokens", bucket).withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / batch_size).cast("long")
    )
    return (
        laid.groupBy("bucket", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_len"),
            (F.count("*") * F.max("n_tokens") - F.sum("n_tokens")).alias(
                "padding_waste"
            ),
        )
    )


def length_bucketed_batches_sql(batch_size: int = 8, table: str = "documents") -> str:
    """DuckDB twin of length_bucketed_batches."""
    return (
        "WITH toked AS (SELECT doc_id, "
        "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        "t -> t <> '')) AS n_tokens "
        f"FROM {table}),\n"
        "nz AS (SELECT * FROM toked WHERE n_tokens > 0),\n"
        "laid AS (SELECT doc_id, n_tokens, "
        "CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket, "
        "CAST((row_number() OVER (PARTITION BY length(bin(n_tokens)) "
        "ORDER BY n_tokens ASC, doc_id ASC) - 1) "
        f"// {batch_size} AS BIGINT) AS batch_id FROM nz)\n"
        "SELECT bucket, batch_id, count(*) AS n_docs, "
        "max(n_tokens) AS max_len, CAST(sum(n_tokens) AS BIGINT) AS sum_len, "
        "CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) "
        "AS padding_waste "
        "FROM laid GROUP BY bucket, batch_id"
    )
