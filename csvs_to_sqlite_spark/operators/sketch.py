"""Deterministic streaming sketches: Count-Min and Bloom.

Both sketches are usually treated as "approximate and therefore
untestable"; built on the md5 hash family they are fully DETERMINISTIC —
the same sketch, cell for cell, in Spark, DuckDB and Python — so their
estimates (and their error) are exact oracle-checkable quantities.

- Count-Min (Cormode & Muthukrishnan 2005): d rows × w columns of
  integer counters; ``est(x) = min_i sketch[i][h_i(x)]`` ≥ true count,
  with overestimate bounded by collisions. The sketch is ONE aggregate
  keyed (row, cell) — CONSTANT d·w state regardless of corpus size,
  which is the whole point at 100 TB: a heavy-hitter pass whose shuffle
  is d·w rows instead of |vocab|.
- Bloom (Bloom 1970): an m-bit array as the distinct set of set
  positions; a member sets k md5-derived bits. As a dedup/linkage
  PRE-FILTER the m-row bit set is broadcast-class even when the master
  id set is not: probes that miss ANY bit are guaranteed non-members
  and skip the expensive exact join; false positives are the (measured
  here, exactly) price.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csvs_to_sqlite_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
    tokens_expr,
    tokens_sql,
)


def _cms_cell(token, i: int, w: int):
    return (md5_long(token, seed=f"cms{i}") % w).cast("long")


def cms_heavy_hitters(
    df: DataFrame, text_col: str, d: int = 4, w: int = 256, k: int = 20
) -> DataFrame:
    """Top-k tokens by exact count, with their Count-Min estimate and
    the sketch's overestimate (always ≥ 0 — asserted by a unit test).

    Plan shape (optimization r11): ONE map-side-combined vocab count
    feeds BOTH the sketch and the exact top-k — the sketch cell (i, c)
    holds sum over tokens hashing there of the token's count, which is
    BY DEFINITION the same integer as counting the exploded occurrence
    stream per cell, so the corpus is tokenized once and md5 runs d
    times per DISTINCT token instead of d times per occurrence (the
    former second explode pass). Exact top-k is TakeOrdered over the
    same vocab aggregate (exchange-reused); the estimate joins the k
    tokens' d cells against the broadcastable d·w-row sketch. Returns
    (token, exact_n, cms_estimate, overestimate)."""
    tok = df.select(F.explode(tokens_expr(F.col(text_col), distinct=False)).alias("t"))
    vocab = tok.groupBy("t").agg(F.count("*").alias("exact_n"))
    cells = vocab.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _cms_cell(F.col("t"), i, w).alias("cell")
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
        F.col("exact_n"),
    )
    sketch = cells.groupBy(F.col("c.i").alias("i"), F.col("c.cell").alias("cell")).agg(
        F.sum("exact_n").alias("n")
    )
    top = vocab.orderBy(F.col("exact_n").desc(), F.col("t").asc()).limit(k)
    probes = top.select(
        "t",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _cms_cell(F.col("t"), i, w).alias("cell")
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select("t", "exact_n", F.col("c.i").alias("i"), F.col("c.cell").alias("cell"))
    est = (
        probes.join(F.broadcast(sketch), ["i", "cell"])
        .groupBy("t", "exact_n")
        .agg(F.min("n").alias("cms_estimate"))
    )
    return est.select(
        F.col("t").alias("token"),
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_n")).alias("overestimate"),
    )


def cms_heavy_hitters_sql(
    text_expr: str, d: int = 4, w: int = 256, k: int = 20, table: str = "documents"
) -> str:
    toks = tokens_sql(text_expr, distinct=False)
    cell_rows = " UNION ALL ".join(
        f"SELECT t, {i} AS i, ({md5_long_sql('t', seed=f'cms{i}')} % {w}) AS cell"
        f" FROM tok"
        for i in range(d)
    )
    return f"""
WITH tok AS (SELECT unnest({toks}) AS t FROM {table}),
cells AS ({cell_rows}),
sketch AS (SELECT i, cell, count(*) AS n FROM cells GROUP BY i, cell),
top AS (SELECT t, count(*) AS exact_n FROM tok GROUP BY t
        ORDER BY exact_n DESC, t ASC LIMIT {k}),
probes AS ({" UNION ALL ".join(
    f"SELECT t, exact_n, {i} AS i,"
    f" ({md5_long_sql('t', seed=f'cms{i}')} % {w}) AS cell FROM top"
    for i in range(d))}),
est AS (SELECT t, exact_n, min(n) AS cms_estimate
        FROM probes JOIN sketch USING (i, cell) GROUP BY t, exact_n)
SELECT t AS token, exact_n, cms_estimate,
       cms_estimate - exact_n AS overestimate FROM est
"""


# --- HyperLogLog ------------------------------------------------------------

HLL_B = 8  # 2^8 = 256 registers
HLL_FIELD = 52  # bits of the md5 hash left after the bucket index


def _hll_alpha_c(m: int) -> float:
    """alpha_m * m^2 * 2^53 — the whole estimator numerator as ONE Python
    double literal embedded in both engines, so the only runtime float op
    is a single division by the integer harmonic numerator."""
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m * float(2**53)


def hll_ndv(df: DataFrame, text_col: str, group_col: str, b: int = HLL_B) -> DataFrame:
    """HyperLogLog distinct-token estimate per group (Flajolet et al.
    2007), fully deterministic and oracle-checkable: md5 supplies the
    60-bit hash (low ``b`` bits → register index, high 52 bits → rank),
    registers are an integer max-aggregate, and the harmonic mean is an
    EXACT integer — each register contributes ``2^(53 - M_j)`` (a power
    of two ≤ 2^53), so the numerator is an order-free long sum and the
    estimate is one double division from integers. No libm, no float
    accumulation: both engines produce identical bits.

    Returns per group: ``(group, exact_ndv, m, n_zero_registers,
    harmonic_num, hll_estimate, err_pct)`` — the exact NDV rides along so
    the sketch's error is itself an oracle-checked quantity.

    Scale: the shuffle state is ≤ m rows per group regardless of corpus
    size (the 100 TB NDV tool); the exact-NDV branch exists for the
    oracle and would be dropped at scale."""
    m = 2**b
    tok = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens_expr(F.col(text_col), distinct=True)).alias("t"),
        )
        .distinct()
    )
    h = md5_long(F.col("t"), seed="hll", hex_chars=15)  # 60-bit
    hashed = tok.select(
        "grp",
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.shiftright(h, b).alias("w"),
    )
    rho = F.when(
        F.col("w") > 0, F.lit(HLL_FIELD + 1) - F.length(F.bin(F.col("w")))
    ).otherwise(F.lit(HLL_FIELD + 1))
    regs = (
        hashed.select("grp", "bucket", rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("M"))
    )
    per_grp = regs.groupBy("grp").agg(
        F.count("*").alias("n_set"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - M)")).alias("num_present"),
    )
    exact = tok.groupBy("grp").agg(F.count("*").alias("exact_ndv"))
    c = _hll_alpha_c(m)
    est = F.round(F.lit(c) / F.col("harmonic_num"), 6)
    joined = (
        exact.join(F.broadcast(per_grp), "grp")
        .withColumn("m", F.lit(m).cast("long"))
        .withColumn("n_zero_registers", (F.lit(m) - F.col("n_set")).cast("long"))
        .withColumn(
            "harmonic_num",
            F.col("num_present")
            + F.col("n_zero_registers") * F.lit(2**53).cast("long"),
        )
        .withColumn("hll_estimate", est)
        .withColumn(
            "err_pct",
            F.round((est - F.col("exact_ndv")) / F.col("exact_ndv") * 100, 6),
        )
    )
    return joined.select(
        F.col("grp").alias(group_col),
        "exact_ndv",
        "m",
        "n_zero_registers",
        "harmonic_num",
        "hll_estimate",
        "err_pct",
    ).orderBy(group_col)


def hll_ndv_sql(
    text_expr: str, group_col: str, b: int = HLL_B, table: str = "documents"
) -> str:
    m = 2**b
    c = _hll_alpha_c(m)
    h = md5_long_sql("t", seed="hll", hex_chars=15)
    toks = tokens_sql(text_expr, distinct=True)
    est = f"round(CAST('{c!r}' AS DOUBLE) / harmonic_num, 6)"
    return f"""
WITH tok AS (SELECT DISTINCT {group_col} AS grp, unnest({toks}) AS t FROM {table}),
hashed AS (SELECT grp, ({h} & {m - 1}) AS bucket, ({h} >> {b}) AS w FROM tok),
regs AS (SELECT grp, bucket,
                max(CASE WHEN w > 0 THEN {HLL_FIELD + 1} - length(bin(w))
                         ELSE {HLL_FIELD + 1} END) AS M
         FROM hashed GROUP BY grp, bucket),
per_grp AS (SELECT grp, count(*) AS n_set,
                   sum((1::BIGINT << (53 - M))) AS num_present
            FROM regs GROUP BY grp),
exact AS (SELECT grp, count(*) AS exact_ndv FROM tok GROUP BY grp),
j AS (SELECT grp, exact_ndv, CAST({m} AS BIGINT) AS m,
             CAST({m} - n_set AS BIGINT) AS n_zero_registers,
             CAST(num_present + ({m} - n_set) * (1::BIGINT << 53) AS BIGINT)
               AS harmonic_num
      FROM exact JOIN per_grp USING (grp))
SELECT grp AS {group_col}, exact_ndv, m, n_zero_registers, harmonic_num,
       {est} AS hll_estimate,
       round(({est} - exact_ndv) / exact_ndv * 100, 6) AS err_pct
FROM j ORDER BY {group_col}
"""


def _bloom_positions(key, m: int, n_hashes: int):
    return [
        (md5_long(key, seed=f"bloom{i}") % m).cast("long") for i in range(n_hashes)
    ]


def bloom_prefilter_report(
    probe: DataFrame,
    master: DataFrame,
    text_col: str,
    m: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-prefilter effectiveness report: build an m-bit filter from
    the master set's text hashes, probe every probe-side row, and
    compare against the exact answer. One row:
    (n_probes, n_pass, n_true_members, n_false_positives, n_missed).
    n_missed is asserted 0 by the oracle — a Bloom filter NEVER misses a
    true member; false positives are the measured cost of the m-bit
    compression.

    Plan shape: the bit set is a distinct aggregate of ≤ m rows
    (broadcast-class at any master size); probes join it k times via one
    (position)-keyed join and pass iff all k bits hit. The exact check is
    the md5-keyed semi-join the filter would gate at scale."""
    # persisted: mh feeds bits + truth, ph feeds probes + missed +
    # n_probes — one tokenize/hash pass each, not one per consumer
    mh = master.select(F.md5(F.col(text_col)).alias("h")).persist()
    bits = (
        mh.select(
            F.explode(
                F.array(*_bloom_positions(F.col("h"), m, n_hashes))
            ).alias("pos")
        )
        .distinct()
    )
    # distinct probe hashes: the prefilter gates unique keys (duplicate
    # probe texts would double-count bit hits in the all-k check)
    ph = probe.select(F.md5(F.col(text_col)).alias("h")).distinct().persist()
    probe_pos = ph.select(
        "h",
        F.explode(F.array(*_bloom_positions(F.col("h"), m, n_hashes))).alias("pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("h")
        .agg(F.count("*").alias("nbits"))
        .where(F.col("nbits") == n_hashes)
        .select("h")
    )
    # truth is the MEMBER SET (corpus-sized) — no broadcast hint
    # (broadcast-audit r8: forcing it would rebuild the exact structure
    # the bloom filter exists to avoid shipping); the joins against it
    # are hash-keyed equi-joins AQE can broadcast at small scale
    truth = mh.distinct().select(F.col("h").alias("h_true"))
    flagged = hits.join(truth, hits["h"] == truth["h_true"], "left")
    passed = flagged.agg(
        F.count("*").alias("n_pass"),
        F.sum(F.when(F.col("h_true").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_true_members"),
    )
    # every scalar stays a 1-row aggregate cross-joined into ONE lazy
    # plan (review finding: driver-side .count() at build time executed
    # two extra jobs and rescanned both inputs)
    missed = (
        ph.join(truth, ph["h"] == truth["h_true"], "inner")
        .join(
            hits.select(F.col("h").alias("h_hit")),
            F.col("h") == F.col("h_hit"),
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_missed"))
    )
    n_probes = ph.agg(F.count("*").cast("long").alias("n_probes"))
    return (
        passed.crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(missed))
        .select(
            "n_probes",
            F.col("n_pass").cast("long"),
            "n_true_members",
            (F.col("n_pass") - F.col("n_true_members")).alias("n_false_positives"),
            "n_missed",
        )
    )


def bloom_prefilter_sql(
    probe_rel: str,
    master_rel: str,
    text_expr: str,
    m: int = 4096,
    n_hashes: int = 3,
) -> str:
    pos = lambda i: f"({md5_long_sql('h', seed=f'bloom{i}')} % {m})"
    bit_rows = " UNION ALL ".join(
        f"SELECT {pos(i)} AS pos FROM mh" for i in range(n_hashes)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT h, {pos(i)} AS pos FROM ph" for i in range(n_hashes)
    )
    return f"""
WITH mh AS (SELECT md5({text_expr}) AS h FROM {master_rel}),
bits AS (SELECT DISTINCT pos FROM ({bit_rows})),
ph AS (SELECT DISTINCT md5({text_expr}) AS h FROM {probe_rel}),
ppos AS ({probe_rows}),
hits AS (SELECT h FROM ppos JOIN bits USING (pos)
         GROUP BY h HAVING count(*) = {n_hashes}),
truth AS (SELECT DISTINCT h FROM mh),
agg AS (SELECT count(*) AS n_pass,
               CAST(sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true_members
        FROM hits LEFT JOIN truth t USING (h)),
missed AS (SELECT count(*) AS n_missed FROM ph
           WHERE h IN (SELECT h FROM truth)
             AND h NOT IN (SELECT h FROM hits))
SELECT CAST((SELECT count(*) FROM ph) AS BIGINT) AS n_probes,
       CAST(n_pass AS BIGINT) AS n_pass, n_true_members,
       CAST(n_pass - n_true_members AS BIGINT) AS n_false_positives,
       CAST((SELECT n_missed FROM missed) AS BIGINT) AS n_missed
FROM agg
"""


# --- KMV (K-minimum-values) distinct sketch with set operations ------------

KMV_K = 64
KMV_HEX = 15          # 60-bit hash: collision-free at these scales, and
KMV_SCALE = 1 << 60   # exactly representable as double (power of two)


def kmv_pair_report(
    df: DataFrame, text_col: str, group_col: str, k: int = KMV_K
) -> DataFrame:
    """KMV/Theta-style distinct sketch per group + pairwise set-operation
    estimates (Beyer et al. 2007; the mergeable-summaries family): each
    group keeps its K smallest distinct 60-bit md5 hashes; NDV_est =
    (K-1)/u_K, the union sketch is the K smallest of the merged sets, and
    Jaccard_est = |both-present ∩ union-sketch| / |union sketch| — giving
    intersection estimates no single-pass exact method can provide at
    100 TB. All hash values are md5-deterministic, so every estimate is
    EXACTLY reproducible in the DuckDB twin (like cms/bloom/hll).

    Plan: one distinct (group, hash) aggregate, one group-keyed top-K
    window, then all pair math runs on K-bounded arrays (n_groups² rows).
    """
    from csvs_to_sqlite_spark.functions.hashing import md5_long

    h = md5_long(F.col(text_col), seed="kmv", hex_chars=KMV_HEX)
    d = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    sk = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("g")
        .agg(
            F.sort_array(F.collect_list("h")).alias("arr"),
            F.count("*").cast("long").alias("cnt"),
        )
    )

    def est(cnt: F.Column, kth: F.Column) -> F.Column:
        return F.round(
            F.when(cnt < k, cnt.cast("double")).otherwise(
                F.lit(float(k - 1)) / (kth.cast("double") / F.lit(float(KMV_SCALE)))
            ),
            6,
        )

    a = sk.select(
        F.col("g").alias("group_a"), F.col("arr").alias("arr_a"), F.col("cnt").alias("cnt_a")
    )
    b = sk.select(
        F.col("g").alias("group_b"), F.col("arr").alias("arr_b"), F.col("cnt").alias("cnt_b")
    )
    pairs = a.crossJoin(F.broadcast(b)).where(F.col("group_a") < F.col("group_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("arr_a"), F.col("arr_b"))), 1, k
    )
    usize = F.least(F.lit(k), F.size(merged)).cast("long")
    inter_n = F.size(
        F.array_intersect(F.array_intersect(merged, F.col("arr_a")), F.col("arr_b"))
    ).cast("long")
    union_all_n = F.size(F.array_union(F.col("arr_a"), F.col("arr_b")))
    out = pairs.select(
        "group_a",
        "group_b",
        est(F.col("cnt_a"), F.element_at("arr_a", F.col("cnt_a").cast("int"))).alias(
            "ndv_a_est"
        ),
        est(F.col("cnt_b"), F.element_at("arr_b", F.col("cnt_b").cast("int"))).alias(
            "ndv_b_est"
        ),
        est(union_all_n.cast("long"), F.element_at(merged, usize.cast("int"))).alias(
            "union_est"
        ),
        usize.alias("union_sketch_n"),
        inter_n.alias("inter_sketch_n"),
        F.round(inter_n / usize, 6).alias("jaccard_est"),
    )
    return out.withColumn(
        "inter_est",
        F.round(
            F.col("jaccard_est") * F.col("union_est"), 6
        ),
    )


def kmv_pair_sql(
    text_expr: str, group_expr: str, k: int = KMV_K, table: str = "documents"
) -> str:
    """DuckDB twin of kmv_pair_report — identical hash values, identical
    estimator arithmetic (the only doubles are the final mirrored
    divisions)."""
    from csvs_to_sqlite_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(text_expr, seed="kmv", hex_chars=KMV_HEX)

    def est(cnt: str, kth: str) -> str:
        return (
            f"round(CASE WHEN {cnt} < {k} THEN CAST({cnt} AS DOUBLE) "
            f"ELSE {float(k - 1)} / (CAST({kth} AS DOUBLE) / {float(KMV_SCALE)}) END, 6)"
        )

    merged = f"list_slice(list_sort(list_distinct(list_concat(a.arr, b.arr))), 1, {k})"
    return f"""
WITH d AS (SELECT DISTINCT {group_expr} AS g, {h} AS h FROM {table}),
ranked AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d),
sk AS (SELECT g, list_sort(list(h)) AS arr, CAST(count(*) AS BIGINT) AS cnt
       FROM ranked WHERE rn <= {k} GROUP BY g),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b,
         {est('a.cnt', 'a.arr[CAST(a.cnt AS INT)]')} AS ndv_a_est,
         {est('b.cnt', 'b.arr[CAST(b.cnt AS INT)]')} AS ndv_b_est,
         {merged} AS merged,
         CAST(len(list_distinct(list_concat(a.arr, b.arr))) AS BIGINT) AS union_all_n,
         CAST(len(list_intersect(list_intersect({merged}, a.arr), b.arr)) AS BIGINT)
           AS inter_sketch_n
  FROM sk a, sk b WHERE a.g < b.g),
scored AS (
  SELECT group_a, group_b, ndv_a_est, ndv_b_est,
         {est('union_all_n', 'merged[CAST(least(' + str(k) + ', len(merged)) AS INT)]')}
           AS union_est,
         CAST(least({k}, len(merged)) AS BIGINT) AS union_sketch_n,
         inter_sketch_n,
         round(inter_sketch_n / CAST(least({k}, len(merged)) AS BIGINT), 6) AS jaccard_est
  FROM pairs)
SELECT *, round(jaccard_est * union_est, 6) AS inter_est FROM scored
"""


# --- hash-threshold quantile sketch ----------------------------------------


def quantile_sketch_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    qs: tuple[int, ...] = (25, 50, 75, 90),
    sample_mod: int = 8,
) -> DataFrame:
    """Per-group quantile estimates from a deterministic hash sample,
    with the exact quantile and the error riding along (the same
    estimate-plus-measured-error contract as cms/bloom/hll/kmv).

    The estimator is bottom-sampling by hash predicate: a row enters the
    sample iff ``md5(id) % sample_mod == 0`` — a SCAN-STAGE filter, no
    shuffle, no coordination, and deterministic, so the sample (and
    therefore the estimate) is bit-identical in Spark, DuckDB and
    Python. Quantiles are type-1 (lower) order statistics — index
    ``(q·(n-1)) div 100`` of the (value, hash)-sorted rows — so every
    output is an exact integer from the input domain: no interpolation,
    no float arithmetic anywhere.

    Plan shape: the production path sorts ONLY the sample (a per-group
    window over ~n/sample_mod rows); the exact side — a per-group sort
    of the full fact — exists to certify the estimator and is what the
    sketch lets a 100 TB job skip. ``value_col`` must be integer-typed
    (quantize money to cents first); ``id_col`` must be a unique string
    key (it seeds both the sample predicate and the sort tiebreak).

    Returns one row per (group, q): (group, q, n_rows, n_sample,
    exact_v, est_v, err) with err = est_v - exact_v (NULL when the
    sample is empty)."""
    from csvs_to_sqlite_spark.functions.hashing import md5_long

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        md5_long(F.col(id_col), seed="qsk", hex_chars=15).alias("h"),
    )

    def order_stats(frame: DataFrame, prefix: str) -> DataFrame:
        w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("h").asc())
        n = f"n_{prefix}"
        ranked = frame.withColumn("rn", F.row_number().over(w)).join(
            frame.groupBy("g").agg(F.count("*").cast("long").alias(n)), "g"
        )
        return (
            ranked.select(
                "g",
                "v",
                "rn",
                n,
                F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"),
            )
            .where(F.col("rn") - 1 == F.expr(f"(q * ({n} - 1)) div 100"))
            .select("g", "q", n, F.col("v").alias(f"{prefix}_v"))
        )

    exact = order_stats(base, "rows")
    sample = order_stats(
        base.where(F.col("h") % F.lit(sample_mod) == 0), "sample"
    )
    return (
        exact.join(sample, ["g", "q"], "left")
        .select(
            F.col("g").alias("grp"),
            F.col("q").cast("long").alias("q"),
            F.col("n_rows"),
            F.coalesce("n_sample", F.lit(0)).cast("long").alias("n_sample"),
            F.col("rows_v").alias("exact_v"),
            F.col("sample_v").alias("est_v"),
            (F.col("sample_v") - F.col("rows_v")).alias("err"),
        )
        .orderBy("grp", "q")
    )


def quantile_sketch_sql(
    value_expr: str,
    group_expr: str,
    id_expr: str,
    table: str,
    qs: tuple[int, ...] = (25, 50, 75, 90),
    sample_mod: int = 8,
) -> str:
    """DuckDB twin of quantile_sketch_report — identical hash sample,
    identical order statistics, integer-only arithmetic."""
    from csvs_to_sqlite_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(id_expr, seed="qsk", hex_chars=15)
    qvals = ", ".join(f"({q})" for q in qs)
    return f"""
WITH base AS (SELECT {group_expr} AS g, CAST({value_expr} AS BIGINT) AS v,
                     {h} AS h FROM {table}),
qv(q) AS (VALUES {qvals}),
ex_ranked AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, h) AS rn,
                     CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_rows
              FROM base),
exact AS (SELECT g, q, n_rows, v AS exact_v
          FROM ex_ranked CROSS JOIN qv
          WHERE rn - 1 = (q * (n_rows - 1)) // 100),
samp AS (SELECT g, v, h FROM base WHERE h % {sample_mod} = 0),
sa_ranked AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, h) AS rn,
                     CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_sample
              FROM samp),
est AS (SELECT g, q, n_sample, v AS est_v
        FROM sa_ranked CROSS JOIN qv
        WHERE rn - 1 = (q * (n_sample - 1)) // 100)
SELECT exact.g AS grp, CAST(exact.q AS BIGINT) AS q, exact.n_rows,
       CAST(coalesce(est.n_sample, 0) AS BIGINT) AS n_sample,
       exact.exact_v, est.est_v,
       est.est_v - exact.exact_v AS err
FROM exact LEFT JOIN est ON exact.g = est.g AND exact.q = est.q
ORDER BY grp, q
"""
