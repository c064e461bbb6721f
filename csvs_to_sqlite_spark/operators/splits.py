"""Deterministic dataset splitting for training pipelines.

``hash_split`` assigns every row to a named split (train/val/test/…) by
hashing a stable id — the standard way to partition a training corpus so
that the assignment is (a) reproducible across runs and engines, (b)
stable under corpus growth (adding documents never moves an existing one
between splits), and (c) computable in the scan stage with zero shuffle
and zero coordination. Salting the hash with ``seed`` yields independent
re-splits.

All hashing is MD5 (see functions/hashing.py) so the assignment is
bit-identical in Spark, DuckDB, and Python — the oracle checks the
actual per-row placement, not just split sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.hashing import md5_long, md5_long_sql

# (name, weight) pairs; weights are percents summing to ≤ 100 — any
# remainder falls into the last bucket, so exhaustiveness is structural.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5))


def split_assignment(
    id_col: Column, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS, seed: str = "split"
) -> Column:
    """Pure column expression: the split name for ``id_col``.

    Bucket = md5(seed:id) mod 100, carved into cumulative weight ranges.
    """
    bucket = md5_long(id_col.cast("string"), seed=seed) % 100
    expr = F.lit(splits[-1][0])
    cum = 0
    branches: list[tuple[int, str]] = []
    for name, weight in splits[:-1]:
        cum += weight
        branches.append((cum, name))
    for cum, name in reversed(branches):
        expr = F.when(bucket < cum, F.lit(name)).otherwise(expr)
    return expr


def split_assignment_sql(
    id_expr: str, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS, seed: str = "split"
) -> str:
    """The DuckDB rendering of ``split_assignment`` (same bucket math)."""
    bucket = f"({md5_long_sql(f'cast({id_expr} as varchar)', seed=seed)} % 100)"
    cases = []
    cum = 0
    for name, weight in splits[:-1]:
        cum += weight
        cases.append(f"WHEN {bucket} < {cum} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    seed: str = "split",
) -> DataFrame:
    """Adds a ``split`` column. Zero shuffle — evaluates in the scan stage
    and survives whole-stage codegen, so at 100 TB the split is free."""
    return df.withColumn("split", split_assignment(F.col(id_col), splits, seed))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    group_col: str = "source",
    default_weight: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic data mixing: keep each row with its group's sampling
    rate (0..1), decided by a salted hash of the row id — the standard way
    to up/down-weight sources when composing a training mixture.

    Zero shuffle and zero randomness: the same (id, seed) always lands on
    the same side, so mixtures are reproducible across runs, engines, and
    partitionings, and re-salting ``seed`` draws an independent sample.
    Scan-stage filter → at 100 TB this costs nothing and pushes the
    surviving-row reduction below every downstream shuffle.
    """
    bucket = md5_long(F.col(id_col).cast("string"), seed=seed) % 10000
    rate = F.lit(default_weight)
    for name, w in weights.items():
        rate = F.when(F.col(group_col) == name, F.lit(w)).otherwise(rate)
    return df.where(bucket < (rate * 10000).cast("long"))


def weighted_sample_sql(
    id_expr: str,
    weights: dict[str, float],
    group_expr: str = "source",
    default_weight: float = 1.0,
    seed: str = "mix",
) -> str:
    """DuckDB rendering of the weighted_sample keep-predicate."""
    bucket = f"({md5_long_sql(f'cast({id_expr} as varchar)', seed=seed)} % 10000)"
    rate = str(default_weight)
    for name, w in reversed(weights.items()):
        rate = f"CASE WHEN {group_expr} = '{name}' THEN {w} ELSE {rate} END"
    return f"{bucket} < cast(({rate}) * 10000 AS BIGINT)"


def es_weighted_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "es",
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row gets key = u^(1/w) with a
    deterministic md5-derived uniform u ∈ (0, 1], and the k largest keys
    are the sample. Complements ``weighted_sample`` (per-GROUP Bernoulli
    rates): here the weight is PER ROW and the sample size is exact —
    the standard way to draw a fixed-budget subset biased toward
    long/high-quality documents.

    Determinism: u = (md5_60bit(id)+1)/2^60 is bit-identical across
    engines; pow is the only float op and key gaps (~1/k) dwarf its
    ≤1-ulp engine variance, so the selected SET is stable. Scale: the
    key is scan-stage and selection is TakeOrdered (per-partition top-k
    + driver merge of k·partitions rows) — no global sort, no shuffle
    of the fact."""
    h = md5_long(F.col(id_col).cast("string"), seed=seed, hex_chars=15)
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__es_key")
    )


def es_weighted_topk_sql(
    id_expr: str, weight_expr: str, k: int, seed: str = "es"
) -> str:
    """DuckDB rendering of the A-ES ORDER BY ... LIMIT k tail (caller
    supplies the SELECT/FROM head)."""
    h = md5_long_sql(f"cast({id_expr} as varchar)", seed=seed, hex_chars=15)
    u = f"(CAST(({h} + 1) AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE))"
    key = f"power({u}, 1.0 / CAST({weight_expr} AS DOUBLE))"
    return f"ORDER BY {key} DESC, {id_expr} ASC LIMIT {k}"


def shard_assignment(id_col: Column, n_shards: int, seed: str = "shard") -> Column:
    """Pure column expression: deterministic shard id (0..n_shards-1) for a
    row — md5-based so the same document always lands in the same shard
    across runs, engines, and cluster sizes (unlike hash-partitioning,
    which follows Spark's partitioner). Zero shuffle to compute."""
    return (md5_long(id_col.cast("string"), seed=seed) % n_shards).cast("long")


def shard_assignment_sql(id_expr: str, n_shards: int, seed: str = "shard") -> str:
    """DuckDB rendering of shard_assignment (same hash, same modulus)."""
    return f"({md5_long_sql(f'cast({id_expr} as varchar)', seed=seed)} % {n_shards})"


def shard_manifest(
    df: DataFrame, id_col: str, n_shards: int, seed: str = "shard"
) -> DataFrame:
    """Per-shard manifest of a deterministic sharded export:
    (shard, n_rows, id_digest). The digest is md5 over the ordered id
    list, so the oracle verifies every row's PLACEMENT, not just shard
    sizes. One groupBy(shard) — n_shards is the output cardinality, so
    the aggregate state is tiny; collect_list is bounded by shard size,
    which the caller chooses (rows/n_shards)."""
    return (
        df.select(
            shard_assignment(F.col(id_col), n_shards, seed).alias("shard"),
            F.col(id_col),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(id_col)),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
    )


def shard_balance_audit(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_shards: int,
    seed: str = "shard",
) -> DataFrame:
    """Per-shard composition audit for a deterministic sharded export:
    does each shard's ``group_col`` (source/lang/…) distribution match
    the corpus distribution? A skewed shard starves the data loader of
    a source for whole training windows, which shows up as loss spikes —
    this is the check a pipeline runs before shipping shards.

    Returns (shard, n_rows, tvd): the total variation distance between
    the shard's group distribution and the corpus's, as ONE exact
    integer rational per shard — TVD = Σ_g |o_sg·N − c_g·n_s| over
    (2·n_s·N) — pushed through qmath half-up at 6 dp, so the value is
    bit-identical across engines and partitionings.

    Scale: one (shard, group) count aggregate over the corpus (map-side
    combined, ≤ n_shards·|groups| rows), one |groups|-sized corpus
    rollup broadcast back, per-shard fold. The fact table never joins."""
    from csvs_to_sqlite_spark.functions.qmath import qdiv_count

    keyed = df.select(
        shard_assignment(F.col(id_col), n_shards, seed).alias("shard"),
        F.col(group_col).alias("g"),
    )
    sg = keyed.groupBy("shard", "g").agg(F.count("*").alias("o"))
    corpus = keyed.groupBy("g").agg(F.count("*").alias("c"))
    total = corpus.agg(F.sum("c").alias("n_total"))
    # the fold needs n_s inside the |…| term, so two stages over the tiny
    # (shard, group) rollup: shard sizes, then the deviation sum — every
    # term an exact long, abs-diff sums order-free
    sizes = sg.groupBy("shard").agg(F.sum("o").alias("n_rows"))
    dev = (
        sg.join(F.broadcast(sizes), "shard")
        .join(F.broadcast(corpus), "g")
        .crossJoin(F.broadcast(total))
        .groupBy("shard")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("n_total").alias("n_total"),
            F.sum(
                F.abs(F.col("o") * F.col("n_total") - F.col("c") * F.col("n_rows"))
            ).alias("dev"),
            # groups ABSENT from the shard still deviate by c_g·n_s each;
            # the inner join only folds present groups, so add
            # (N − Σ_present c)·n_s — without it a shard missing a group
            # under-reports (property test vs the Python model caught it)
            F.sum("c").alias("c_present"),
        )
    )
    return dev.select(
        "shard",
        "n_rows",
        qdiv_count(
            (
                F.col("dev")
                + (F.col("n_total") - F.col("c_present")) * F.col("n_rows")
            )
            * F.lit(1_000_000),
            F.col("n_rows") * F.col("n_total") * 2,
            1,
            6,
        ).alias("tvd"),
    )


def global_shuffle(df: DataFrame, id_col: str, seed: str = "shuffle") -> DataFrame:
    """Deterministic global training order: (id, shuffle_rank) where rank
    is the row's 1-based position when the corpus is ordered by a salted
    md5 of its id (ties broken by id — total order, reproducible across
    runs, engines, and partitionings; re-salt ``seed`` for an independent
    epoch order).

    The rank is a GLOBAL dense numbering but there is no single-partition
    window: range-partition by the hash, sort within partitions, then
    per-partition offset row ids (the same two-phase machinery as dim
    numbering — two tiny metadata jobs, scales to any corpus size).
    """
    from csvs_to_sqlite_spark.operators.rowid import global_rank

    h = md5_long(F.col(id_col).cast("string"), seed=seed)
    base = df.select(F.col(id_col), h.alias("__h__"))
    # global_rank pins the range partitioning with a localCheckpoint —
    # without it the counting job and the final pass can sample different
    # boundaries on corpus-scale inputs (see rowid.global_rank)
    ranked = global_rank(base, ["__h__", id_col], "shuffle_rank")
    return ranked.select(id_col, "shuffle_rank")


def stratified_sample_exact_k(
    df: DataFrame, id_col: str, group_col: str, k: int, seed: str = "strat"
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by salted-hash rank
    — the deterministic version of per-group reservoir sampling ("100
    eval docs per domain"). Unlike rate-based sampling the count is
    exact; unlike a random sample it is reproducible across runs,
    engines, and partitionings, and re-salting draws an independent
    sample. One group-partitioned window; partition width = group size
    (groups are domains/sources — bounded, unlike a global window).
    """
    from pyspark.sql.window import Window

    h = md5_long(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .where(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def token_budget_cap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str = "source",
    budget: int = 10_000,
    n_buckets: int = 1024,
    seed: str = "budget",
) -> DataFrame:
    """Token-budget corpus capping: per source, keep documents in salted-
    hash order while the running token total stays ≤ ``budget`` — how a
    mixture recipe caps an over-represented source at N tokens instead
    of at a sampling rate (cf. ``weighted_sample``).

    SEMANTICS are one per-source cumulative sum in (hash, id) order; the
    PLAN is two-phase so no executor ever runs a source-sized window:

    1. per-(source, bucket) token subtotals, where ``bucket`` is a
       monotone prefix of the hash (so (bucket, hash, id) order equals
       (hash, id) order); collected driver-side — ≤ sources × n_buckets
       rows, the same dim-sized-collect class as the dim maps — to find
       each source's boundary bucket and the token total before it;
    2. buckets strictly before the boundary are kept by a scan-stage
       filter with NO window; the exact cumsum window runs only over
       boundary-bucket rows (~1/n_buckets of each source).

    Every row after the boundary bucket is provably over budget (token
    counts are non-negative), so the two-phase result is identical to
    the naive single-window cumsum — which is exactly what the SQL
    oracle runs. Returns kept rows as (id, source, n_tok).
    """
    from collections import defaultdict

    from csvs_to_sqlite_spark.functions.hashing import tokens_expr
    from pyspark.sql.window import Window

    h = md5_long(F.col(id_col).cast("string"), seed=seed)
    n_tok = F.size(tokens_expr(F.col(text_col), distinct=False)).cast("long")
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("source"),
            n_tok.alias("n_tok"),
            h.alias("h"),
        )
        .withColumn(
            "bucket", F.floor(F.col("h") * n_buckets / F.lit(2**32)).cast("long")
        )
        .persist()  # reused by the subtotal pass and both keep branches
    )
    per_source: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for r in base.groupBy("source", "bucket").agg(F.sum("n_tok").alias("t")).collect():
        per_source[r["source"]].append((r["bucket"], r["t"]))
    cut: dict[str, int] = {}
    pre: dict[str, int] = {}
    for s, lst in per_source.items():
        run = 0
        for b, t in sorted(lst):
            if run + t > budget:
                cut[s] = b
                pre[s] = run
                break
            run += t
    if not cut:
        return base.select("id", "source", "n_tok")
    cut_col = F.lit(None).cast("long")
    pre_col = F.lit(0).cast("long")
    for s in cut:
        cut_col = F.when(F.col("source") == s, F.lit(cut[s])).otherwise(cut_col)
        pre_col = F.when(F.col("source") == s, F.lit(pre[s])).otherwise(pre_col)
    whole = base.where(cut_col.isNull() | (F.col("bucket") < cut_col))
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        base.where(F.col("bucket") == cut_col)
        .withColumn("cum", F.sum("n_tok").over(w) + pre_col)
        .where(F.col("cum") <= budget)
    )
    return whole.select("id", "source", "n_tok").unionByName(
        boundary.select("id", "source", "n_tok")
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    budget: int,
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-LM α-sampling
    recipe, α = 0.5): per-group quotas proportional to count^α flatten
    the source distribution — over-represented sources are downweighted,
    rare ones kept nearly whole — then each group contributes exactly its
    quota of documents, chosen by salted-hash rank (reproducible across
    runs, engines, and partitionings; re-salt for an independent draw).

    Quota arithmetic is INTEGER-ONLY so both engines agree exactly:
    w_g = floor(sqrt(c_g)) (IEEE sqrt of an exact int is identical
    everywhere), k_g = floor(budget·w_g / Σw) — a double division of
    exact int64s, bit-identical in both engines. Plan shape: one
    group-cardinality count aggregate; the quota table (+ the 1-row Σw)
    broadcasts back; selection is one group-partitioned row_number
    window in (hash, id) order — partition width = group size, same
    contract as stratified_sample_exact_k. Returns a per-group manifest
    (group, n_groupdocs, quota, n_selected, id_digest) — the digest is
    md5 over the ordered selected-id list, so the oracle verifies every
    row's membership, not just counts.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(group_col).alias("g")).agg(F.count("*").alias("c"))
    w_int = F.floor(F.sqrt(F.col("c").cast("double"))).cast("long")
    quotas = counts.select("g", "c", w_int.alias("w"))
    tot = quotas.agg(F.sum("w").alias("w_tot"))
    quotas = quotas.crossJoin(F.broadcast(tot)).select(
        "g",
        "c",
        F.floor(F.lit(budget) * F.col("w") / F.col("w_tot")).cast("long").alias("quota"),
    )
    h = md5_long(F.col(id_col).cast("string"), seed=seed)
    win = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col),
        F.col(group_col).alias("g"),
        F.row_number().over(win).alias("rk"),
    )
    kept = ranked.join(F.broadcast(quotas), "g").where(F.col("rk") <= F.col("quota"))
    return (
        kept.groupBy("g", "c", "quota")
        .agg(
            F.count("*").cast("long").alias("n_selected"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(F.col(id_col))),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("id_digest"),
        )
        .select(
            F.col("g").alias("group_name"),
            F.col("c").alias("n_groupdocs"),
            "quota",
            "n_selected",
            "id_digest",
        )
    )


def temperature_mixture_sql(
    id_expr: str,
    group_expr: str,
    budget: int,
    seed: str = "temp",
    table: str = "documents",
) -> str:
    """DuckDB twin of temperature_mixture (same integer quota math, same
    salted-hash selection order)."""
    h = md5_long_sql(f"cast({id_expr} as varchar)", seed=seed)
    return f"""
WITH counts AS (SELECT {group_expr} AS g, count(*) AS c FROM {table} GROUP BY 1),
quotas AS (SELECT g, c,
                  CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS w
           FROM counts),
tot AS (SELECT sum(w) AS w_tot FROM quotas),
q AS (SELECT g, c,
             CAST(floor({budget} * w / w_tot) AS BIGINT) AS quota
      FROM quotas CROSS JOIN tot),
ranked AS (SELECT {id_expr} AS id, {group_expr} AS g,
                  row_number() OVER (PARTITION BY {group_expr}
                                     ORDER BY {h} ASC, {id_expr} ASC) AS rk
           FROM {table}),
kept AS (SELECT ranked.*, q.c, q.quota FROM ranked JOIN q USING (g)
         WHERE rk <= quota)
SELECT g AS group_name, c AS n_groupdocs, quota,
       CAST(count(*) AS BIGINT) AS n_selected,
       md5(string_agg(cast(id AS varchar), ',' ORDER BY id)) AS id_digest
FROM kept GROUP BY g, c, quota
"""


def token_budget_cap_sql(
    text_expr: str,
    id_expr: str,
    source_expr: str,
    budget: int,
    seed: str = "budget",
    table: str = "documents",
) -> str:
    """DuckDB twin of token_budget_cap — the naive single-window cumsum
    the two-phase plan must agree with."""
    from csvs_to_sqlite_spark.functions.hashing import tokens_sql

    toks = tokens_sql(text_expr, distinct=False)
    h = md5_long_sql(f"cast({id_expr} as varchar)", seed=seed)
    return f"""
WITH base AS (SELECT {id_expr} AS id, {source_expr} AS source,
                     CAST(len({toks}) AS BIGINT) AS n_tok, {h} AS h
              FROM {table}),
cum AS (SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY h, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM base)
SELECT id, source, n_tok FROM cum WHERE cum <= {budget}
"""
