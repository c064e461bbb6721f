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
cuts lineage per round like every other iterative operator here.

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


def learn_bpe(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int = 8
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text column. Returns
    (merge_rank, lhs, rhs, merged, pair_count) in learning order."""
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
    ).localCheckpoint()
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
        syms = syms.select("w", "cnt", apply_merge.alias("syms")).localCheckpoint()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def learn_bpe_sql(
    text_expr: str, n_merges: int = 8, table: str = "documents"
) -> str:
    """DuckDB twin: rounds unrolled as chained CTEs; each round's merge
    application is a recursive walk carrying the fold accumulator."""
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
    union = " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, n_merges + 1))
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"\nSELECT merge_rank, s AS lhs,"
        f" t AS rhs, merged, CAST(n AS BIGINT) AS pair_count FROM ({union})"
    )
