"""Distributed BPE merge learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The classic trainer operates on the WORD-FREQUENCY dictionary, not the
raw corpus — and that is exactly the scalable shape: the corpus is
touched ONCE (a word-count aggregate, map-side combined); every learning
round then runs over the vocabulary table, which is dimension-sized. Per
round: one adjacent-pair aggregate over the vocab (weighted by word
count), a TakeOrdered argmax for the winning pair, and a scan-stage fold
that applies the merge to each word's symbol array (leftmost-first,
non-overlapping — the fold's accumulator semantics). ``localCheckpoint``
cuts lineage per round like every other iterative operator here — LAZY
(eager=False, optimization r11): the round's own top-pair collect is the
first action over the new symbol table, so it materializes the blocks as
part of that job instead of paying a separate eager-checkpoint job per
round (halves the learning loop's job count; blocks are still written
once and reused by every later round).

Cross-engine determinism: pair counts are exact integers; ties break on
(count desc, lhs asc, rhs asc). The DuckDB twin unrolls the rounds as
chained CTEs (the k-means/PageRank pattern) with the merge-application
fold expressed as a recursive-CTE walk (DuckDB 1.0's list_reduce cannot
carry a list accumulator).

No end-of-word marker is used (a documented simplification — adding one
is a one-line change to the symbol split on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.hashing import tokens_expr, tokens_sql

MERGES_SCHEMA = "merge_rank long, lhs string, rhs string, merged string, pair_count long"


def _adjacent_pairs(syms_col: str):
    """Adjacent symbol pairs of an array column, [] for 1-symbol words
    (sequence(1, 0) would count DOWN and fabricate indices)."""
    return F.when(
        F.size(F.col(syms_col)) >= 2,
        F.expr(
            f"transform(sequence(1, size({syms_col}) - 1),"
            f" i -> struct(element_at({syms_col}, i) AS s,"
            f"             element_at({syms_col}, i + 1) AS t))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<s:string,t:string>>"))


def _learn_core(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int
):
    """Shared learning loop: returns (merges list, final symbol table).
    The symbol table after round N IS the BPE-encoded vocabulary —
    ``encode_bpe`` reuses it instead of re-applying merges."""
    toks = tokens_expr(F.col(text_col), distinct=False)
    words = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    syms = words.select(
        "w",
        "cnt",
        F.filter(F.split(F.col("w"), ""), lambda c: c != "").alias("syms"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        top = (
            syms.select("cnt", F.explode(_adjacent_pairs("syms")).alias("p"))
            .groupBy(F.col("p.s").alias("s"), F.col("p.t").alias("t"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("s").asc(), F.col("t").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        s_, t_, n_ = top[0]["s"], top[0]["t"], int(top[0]["n"])
        merged = s_ + t_
        merges.append((r, s_, t_, merged, n_))
        # leftmost-first non-overlapping merge: fold left, replacing the
        # accumulator's tail when it is `s_` and the next symbol is `t_`
        # (a just-merged tail spells s_+t_, never s_, so no re-merge).
        # Closure factory on purpose: extra default args would change the
        # lambda's arity, which F.aggregate introspects.
        def merge_step(s: str, t: str, m: str):
            def step(acc, x):
                return F.when(
                    (F.size(acc) > 0) & (F.element_at(acc, -1) == s) & (x == t),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return step

        apply_merge = F.aggregate(
            F.col("syms"),
            F.expr("array()").cast("array<string>"),
            merge_step(s_, t_, merged),
        )
        syms = syms.select("w", "cnt", apply_merge.alias("syms")).localCheckpoint(
            eager=False
        )
    return merges, syms


def learn_bpe(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int = 8
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text column. Returns
    (merge_rank, lhs, rhs, merged, pair_count) in learning order."""
    merges, _ = _learn_core(spark, df, text_col, n_merges)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def encode_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    n_merges: int = 8,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Apply the learned merges back to the corpus — the tokenizer-
    application half of the BPE story (learn → encode → count). Returns
    per-document (id, n_words, n_chars, n_tokens, fertility, enc_digest)
    where ``fertility`` = BPE tokens per word (the standard tokenizer
    fitness metric) and ``enc_digest`` = md5 over the document's full
    subword sequence in token order (so the check verifies the actual
    encoding, not just its lengths).

    Scale shape: encoding happens ONCE per distinct word (the learning
    loop's final symbol table is the encoded vocabulary — dimension-
    sized), never per occurrence. The corpus is then touched twice: the
    word-count scan inside learning and one posexplode → vocab equi-join
    → per-doc aggregate. With ``broadcast_vocab`` the join is a broadcast
    hash join (right for bench-scale vocabularies); at web-scale
    vocabularies (~100M types) pass False and let AQE pick the shuffle
    join — the fan-out is 1:1 either way.
    """
    _, syms = _learn_core(spark, df, text_col, n_merges)
    vocab = syms.select(
        "w",
        F.size("syms").alias("n_sub"),
        F.array_join("syms", " ").alias("enc"),
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    toks = tokens_expr(F.col(text_col), distinct=False)
    doc_words = df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "w")
    )
    ordered_enc = F.transform(
        F.sort_array(F.collect_list(F.struct("pos", "enc"))),
        lambda s: s["enc"],
    )
    return (
        doc_words.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("n_sub").alias("n_tokens"),
            F.md5(F.array_join(ordered_enc, "\x01")).alias("enc_digest"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            "n_tokens",
            F.round(
                F.col("n_tokens") / F.col("n_words").cast("double"), 6
            ).alias("fertility"),
            "enc_digest",
        )
    )


def _sql_round_parts(text_expr: str, n_merges: int, table: str) -> list:
    """The shared CTE chain: word counts → symbol table → per-round
    (pair count, argmax, recursive merge walk). ``syms{n_merges}`` is the
    encoded vocabulary."""
    toks = tokens_sql(text_expr, distinct=False)
    parts = [
        f"tok AS (SELECT unnest({toks}) AS w FROM {table})",
        "words AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w)",
        "syms0 AS MATERIALIZED (SELECT w, cnt, regexp_split_to_array(w, '') AS syms FROM words)",
    ]
    for r in range(1, n_merges + 1):
        prev = f"syms{r - 1}"
        parts.append(
            f"pairs{r} AS MATERIALIZED (SELECT p.s AS s, p.t AS t, sum(cnt) AS n FROM ("
            f"SELECT cnt, unnest(list_transform(range(1, len(syms)),"
            f" i -> {{'s': syms[i], 't': syms[i + 1]}})) AS p FROM {prev})"
            f" GROUP BY p.s, p.t)"
        )
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT {r} AS merge_rank, s, t, s || t AS merged, n"
            f" FROM pairs{r} ORDER BY n DESC, s ASC, t ASC LIMIT 1)"
        )
        parts.append(
            f"walk{r} AS ("
            f"SELECT w, cnt, 1 AS pos, [syms[1]] AS acc, syms FROM {prev}"
            f" UNION ALL "
            f"SELECT k.w, k.cnt, k.pos + 1,"
            f" CASE WHEN k.acc[-1] = m.s AND k.syms[k.pos + 1] = m.t"
            f" THEN k.acc[1:len(k.acc) - 1] || [m.merged]"
            f" ELSE k.acc || [k.syms[k.pos + 1]] END, k.syms"
            f" FROM walk{r} k CROSS JOIN m{r} m WHERE k.pos < len(k.syms))"
        )
        parts.append(
            f"syms{r} AS MATERIALIZED (SELECT w, cnt, acc AS syms FROM walk{r}"
            f" WHERE pos = len(syms))"
        )
    return parts


def learn_bpe_sql(
    text_expr: str, n_merges: int = 8, table: str = "documents"
) -> str:
    """DuckDB twin: rounds unrolled as chained CTEs; each round's merge
    application is a recursive walk carrying the fold accumulator."""
    parts = _sql_round_parts(text_expr, n_merges, table)
    union = " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, n_merges + 1))
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"\nSELECT merge_rank, s AS lhs,"
        f" t AS rhs, merged, CAST(n AS BIGINT) AS pair_count FROM ({union})"
    )


def encode_bpe_sql(
    text_expr: str,
    n_merges: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`encode_bpe`: reuses the learning chain's
    final symbol table as the encoded vocabulary, re-tokenizes the
    corpus with positions, and mirrors the per-document fold — exact
    integer sums, ONE double division for fertility, and an ordered
    ``string_agg`` for the sequence digest."""
    toks = tokens_sql(text_expr, distinct=False)
    parts = _sql_round_parts(text_expr, n_merges, table)
    parts.append(
        f"vocab AS MATERIALIZED (SELECT w, len(syms) AS n_sub,"
        f" array_to_string(syms, ' ') AS enc FROM syms{n_merges})"
    )
    parts.append(
        f"doc_words AS (SELECT {id_col}, p.pos AS pos, p.w AS w FROM ("
        f"SELECT {id_col}, unnest(list_transform(range(1, len(toks) + 1),"
        f" i -> {{'pos': i, 'w': toks[i]}})) AS p"
        f" FROM (SELECT {id_col}, {toks} AS toks FROM {table})))"
    )
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"\n"
        f"SELECT {id_col}, count(*) AS n_words,\n"
        f"  CAST(sum(length(w)) AS BIGINT) AS n_chars,\n"
        f"  CAST(sum(n_sub) AS BIGINT) AS n_tokens,\n"
        f"  round(CAST(sum(n_sub) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)"
        f" AS fertility,\n"
        f"  md5(string_agg(enc, chr(1) ORDER BY pos)) AS enc_digest\n"
        f"FROM doc_words JOIN vocab USING (w) GROUP BY {id_col}"
    )


def bpe_roundtrip_report(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int = 8
) -> DataFrame:
    """Tokenizer losslessness audit: BPE merges only ever concatenate
    adjacent symbols, so rejoining every vocabulary word's subwords must
    reproduce the word exactly — a broken merge fold (the classic
    off-by-one in the leftmost-first walk) shows up here as a mismatch.
    One row: vocabulary words checked, ok/mismatch counts, occurrence-
    weighted ok count, and the deepest subword split. Runs on the
    DIMENSION-sized symbol table — corpus cost is the one word-count
    scan learning already pays."""
    _, syms = _learn_core(spark, df, text_col, n_merges)
    ok = F.array_join("syms", "") == F.col("w")
    return syms.agg(
        F.count("*").cast("long").alias("n_vocab_words"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_ok"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias("n_mismatch"),
        F.sum(F.when(ok, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("occurrences_ok"),
        F.sum("cnt").cast("long").alias("total_occurrences"),
        F.max(F.size("syms")).cast("long").alias("max_subwords"),
    )


def bpe_roundtrip_sql(
    text_expr: str, n_merges: int = 8, table: str = "documents"
) -> str:
    """DuckDB twin of bpe_roundtrip_report over the shared CTE chain."""
    parts = _sql_round_parts(text_expr, n_merges, table)
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"\n"
        f"SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,\n"
        f"  CAST(sum(CASE WHEN array_to_string(syms, '') = w THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_ok,\n"
        f"  CAST(sum(CASE WHEN array_to_string(syms, '') = w THEN 0 ELSE 1 END)"
        f" AS BIGINT) AS n_mismatch,\n"
        f"  CAST(sum(CASE WHEN array_to_string(syms, '') = w THEN cnt ELSE 0 END)"
        f" AS BIGINT) AS occurrences_ok,\n"
        f"  CAST(sum(cnt) AS BIGINT) AS total_occurrences,\n"
        f"  CAST(max(len(syms)) AS BIGINT) AS max_subwords\n"
        f"FROM syms{n_merges}"
    )
