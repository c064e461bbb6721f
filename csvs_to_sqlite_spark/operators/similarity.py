"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force baseline. The query set is broadcast; the
  corpus streams through one codegen'd stage computing dot products with
  ``zip_with`` + ``aggregate`` (all JVM-side, no Python). Cost is
  O(|queries| · |corpus|) — correct at any corpus size as long as the
  query set is small, since the corpus side never shuffles.
- lsh_topk: bucketed ANN for a SMALL query set (broadcast). Random-
  hyperplane LSH with DETERMINISTIC hyperplanes derived from md5 (no RNG
  state, so results are reproducible and oracle-checkable).
- lsh_near_dup_pairs: the corpus-vs-corpus scale path. Multi-band
  hyperplane codes + a self-EQUI-join keyed by (band, code) — the same
  shape as dedup.minhash_lsh_pairs. Nothing is broadcast; bucket count
  is derived from corpus size so expected bucket occupancy stays O(1)
  and candidate volume stays ~linear in the corpus; a per-bucket cap
  bounds the worst bucket.

All arithmetic is done in double (the raw column is float32; mixed-width
sums would diverge from any external oracle).
"""

from __future__ import annotations

import logging
import math

from csvs_to_sqlite_spark.functions.hashing import py_md5_long

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

logger = logging.getLogger("csvs_to_sqlite_spark.similarity")

# Quantum for embedding-component aggregation: multiplying a float32-origin
# double by 2^40 yields an exact integer at these magnitudes (float32 ulp
# ≥ 2^-40 for |x| > ~2^-16), so sums become exact long arithmetic —
# associative, hence bit-identical under any partitioning or shuffle order.
# Without this, round(avg(double), 6) can flip its last digit between
# sessions that split the scan differently.
EMB_Q = 1 << 40


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors (excluding self) for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); deterministic tie-break
    on (rounded sim desc, neighbor id asc).
    """
    # per-row norms computed once per query/corpus row, not per pair
    # (bit-identical: same values, same division/round — optimization r11)
    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("__qn__", _norm(F.col("qv")))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("__cn__", _norm(F.col("cv")))
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("__qn__") * F.col("__cn__")), 6
    )
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component i of plane j is
    md5-derived in [-1, 1). Reproducible everywhere (driver Python, Spark
    literals, SQL oracles) with no RNG state."""
    return [
        [(py_md5_long(f"plane{j}_{i}") % 2001 - 1000) / 1000.0 for i in range(dim)]
        for j in range(n_planes)
    ]


def bucket_expr(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """LSH bucket id: bit j = sign(v · plane_j)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec_col, plane_lit) > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def assign_cells(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_alias: str,
    n_probe: int = 1,
) -> DataFrame:
    """IVF cell assignment: nearest centroid(s) by (rounded) cosine, ties
    to the lower centroid id. Centroids are broadcast; assignment is one
    map-side |vecs|×|centroids| sweep + an argmax AGGREGATE (n_probe=1,
    the corpus path) or a per-vector top-``n_probe`` window
    (``n_probe > 1`` — the QUERY side; the corpus keeps exactly one
    home cell)."""
    # norms precomputed per ROW (once per vector / once per centroid)
    # instead of inside the pair expression, where they would be folded
    # again for every (vector, centroid) combination. Same expression
    # values feed the same division and round, so results are
    # bit-identical (optimization r11, guide §1.2 per-task work).
    c = centroids.select(
        F.col("centroid_id"),
        F.col("cv").alias("centroid_v"),
        _norm(F.col("cv")).alias("__cn__"),
    )
    pairs = vecs.withColumn("__vn__", _norm(F.col(vec_alias))).crossJoin(
        F.broadcast(c)
    )
    sim = F.round(
        _dot(F.col(vec_alias), F.col("centroid_v"))
        / (F.col("__vn__") * F.col("__cn__")),
        6,
    )
    scored = pairs.select(
        F.col(id_col), F.col(vec_alias), F.col("centroid_id"), sim.alias("csim")
    )
    if n_probe == 1:
        # ARGMAX aggregate instead of a top-1 window (optimization r11,
        # same rewrite as _pq_assign, guide §2.3): the ×k candidate rows
        # collapse map-side inside the scan stage, so the exchange
        # carries one row per vector and no sort. max(struct(csim,
        # -centroid_id)) is exactly the window's (csim desc, id asc)
        # order INCLUDING NaN placement (NaN sorts largest both in desc
        # ordering and under max); the vector column is functionally
        # determined by the group key, so first() is value-deterministic.
        agg = scored.groupBy(id_col).agg(
            F.max(
                F.struct(F.col("csim"), (-F.col("centroid_id")).alias("__negid__"))
            ).alias("__m__"),
            F.first(vec_alias).alias(vec_alias),
        )
        return agg.select(
            id_col, vec_alias, (-F.col("__m__.__negid__")).alias("cell")
        )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= n_probe)
        .select(id_col, vec_alias, F.col("centroid_id").alias("cell"))
    )


def _mean_arrays(
    assigned: DataFrame,
    keys: list[str],
    vec_col: str,
    dim: int,
    round_dp: int,
) -> DataFrame:
    """Element-wise quantized mean of ``vec_col`` arrays per ``keys`` in
    ONE aggregate: dim fixed-position sums of round(x·EMB_Q) longs plus
    one count, reassembled with F.array in pos order.

    Optimization r12 (guide §2.3/§2.4): the posexplode form generated
    dim× the corpus rows into a (keys, pos)-keyed aggregate and then
    needed a SECOND (keys)-keyed exchange to collect_list the components
    back into an array — per Lloyd round that was 2 exchanges and a dim×
    row blowup. Fixed-position sums aggregate the SAME addends (same
    round(x·Q) longs, order-free exact), divide by the same per-key row
    count (arrays are fixed-length, so count(*) per key equals the old
    per-(key,pos) count("x")), and round with the same expression — the
    centroids are bit-identical, in one exchange carrying one wide row
    per key.

    SMALL dim only (the d_sub=8 PQ codebooks): the same fusion at dim=64
    (kmeans_centroids) measured 3x SLOWER in interleaved A/B — the
    64-buffer wide aggregate loses to posexplode there, so
    kmeans_centroids keeps its (cell, pos) form; see its in-loop
    comment."""
    qsum = lambda i: F.sum(
        F.round(F.col(vec_col)[i] * F.lit(EMB_Q)).cast("long")
    )
    agg = assigned.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n__"),
        *[qsum(i).alias(f"__s{i}__") for i in range(dim)],
    )
    comp = lambda i: F.round(
        (F.col(f"__s{i}__") / F.lit(float(EMB_Q))) / F.col("__n__"), round_dp
    )
    return agg.select(
        *keys, F.array(*[comp(i) for i in range(dim)]).alias("__cv__")
    )


def kmeans_centroids(
    base: DataFrame,
    id_col: str,
    n_centroids: int = 8,
    n_iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic k-means(-ish) centroids: seed with the first
    ``n_centroids`` vectors by id, run a FIXED number of Lloyd rounds
    (assign to nearest by rounded cosine, recompute element-wise means).

    Fixed iteration count + EMB_Q-quantized component means (exact
    integer sums — order-free) + rounding every centroid component to
    ``round_dp`` decimals keeps the result bit-reproducible across Spark
    and a SQL oracle under ANY partitioning. Each round is one
    broadcast sweep + one shuffle keyed (cell, pos) — the corpus is
    never collected, so the loop scales to any corpus size; n_iters is
    a small constant, not data-dependent (no convergence probe needed
    for an ANN coarse quantizer — cell QUALITY, not optimality, is what
    multi-probe recall rests on).

    Optimization-r11 note (measured, REJECTED): materializing each
    round's centroids through the driver (collect → local relation) to
    "truncate lineage" ran 20-60% SLOWER across the family in paired
    A/B — Spark's exchange/subquery reuse already executes the Lloyd
    lineage once per action, so the lazy plan pays nothing, while the
    per-round collects added 3-5 serial driver round-trip jobs. The
    lazy chain stays."""
    cents = base.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("v").alias("cv")
    )
    for _ in range(n_iters):
        assigned = assign_cells(
            base.select(F.col(id_col), F.col("v").alias("av")), cents, id_col, "av"
        )
        exploded = assigned.select("cell", F.posexplode("av").alias("pos", "x"))
        # quantized mean: exact integer sum (order-free) + one mirrored
        # double division — see EMB_Q.
        # r12 measured-and-REJECTED: fusing this into one cell-keyed
        # aggregate of 64 fixed-position sums (_mean_arrays, the form the
        # d_sub=8 PQ codebooks DID keep) ran 3x SLOWER for knn_ivf /
        # knn_ivfpq_residual in interleaved A/B — at dim=64 the wide
        # aggregate loses to the posexplode + re-collect pair.
        qsum = F.sum(F.round(F.col("x") * F.lit(EMB_Q)).cast("long"))
        means = exploded.groupBy("cell", "pos").agg(
            F.round((qsum / F.lit(float(EMB_Q))) / F.count("x"), round_dp).alias("m")
        )
        cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cell").alias("centroid_id"),
                F.transform("pm", lambda s: s["m"]).alias("cv"),
            )
        )
    return cents


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    coarse: DataFrame | None = None,
) -> DataFrame:
    """IVF(-flat) ANN: corpus partitioned into k-means centroid cells
    (deterministic seeded Lloyd rounds, see ``kmeans_centroids``); each
    query probes its ``n_probe`` nearest cells and candidates are exact-
    cosine re-ranked. A corpus vector lives in exactly one cell and a
    query's probed cells are distinct, so no candidate dedupe is needed.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    centroids = (
        coarse
        if coarse is not None
        else kmeans_centroids(base, id_col, n_centroids, kmeans_iters)
    )
    corpus = assign_cells(
        base.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv2")),
        centroids,
        "neighbor_id",
        "cv2",
    )
    q = assign_cells(
        query.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")),
        centroids,
        "query_id",
        "qv",
        n_probe=n_probe,
    )
    cand = corpus.withColumn("__cn__", _norm(F.col("cv2"))).join(
        F.broadcast(q.withColumn("__qn__", _norm(F.col("qv")))), "cell"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv2")) / (F.col("__qn__") * F.col("__cn__")), 6
    )
    scored = cand.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_topk(
    emb: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, exact cosine within.

    The bucket join replaces the cross join — candidates shrink by
    ~2^n_planes. The corpus side is hash-partitioned by bucket (one
    shuffle), queries broadcast.

    CONTRACT: ``query`` must be small (it is broadcast and every corpus
    bucket is scanned against its bucket-mates). For corpus-vs-corpus
    near-duplicate detection use ``lsh_near_dup_pairs`` — feeding the
    full corpus in as ``query`` here would broadcast it.
    """
    planes = hyperplanes(dim, n_planes)
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", bucket_expr(F.col("cv"), planes))
    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", bucket_expr(F.col("qv"), planes))
    pairs = c.withColumn("__cn__", _norm(F.col("cv"))).join(
        F.broadcast(q.withColumn("__qn__", _norm(F.col("qv")))), "bucket"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("__qn__") * F.col("__cn__")), 6
    )
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def derive_planes_per_band(n_vectors: int) -> int:
    """Planes per band sized so each band has ~n buckets (2^planes ≈ n):
    expected bucket occupancy stays O(1) as the corpus grows, which keeps
    within-bucket pair generation ~linear in corpus size instead of
    quadratic at a fixed bucket count."""
    return max(4, math.ceil(math.log2(max(n_vectors, 2))))


def band_code_cols(vec: F.Column, n_bands: int, planes_per_band: int, dim: int) -> list[F.Column]:
    """One struct(band, code) per band; code bit j = sign(v · plane_{b*r+j}).
    Reuses the deterministic md5 hyperplane family so Spark, SQL oracles,
    and driver Python agree bit-for-bit."""
    planes = hyperplanes(dim, n_bands * planes_per_band)
    out = []
    for b in range(n_bands):
        code = F.lit(0).cast("long")
        for j in range(planes_per_band):
            plane = planes[b * planes_per_band + j]
            plane_lit = F.array(*[F.lit(x) for x in plane])
            bit = F.when(_dot(vec, plane_lit) > 0, F.lit(2 ** j)).otherwise(F.lit(0))
            code = code + bit.cast("long")
        out.append(F.struct(F.lit(b).alias("band"), code.alias("code")))
    return out


def lsh_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 2,
    planes_per_band: int | None = None,
    dim: int = 64,
    bucket_cap: int = 10_000,
    log_drops: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, with both vectors attached)
    via a banded hyperplane-LSH self-equi-join — NO broadcast, no cross
    join; the only wide operation is one shuffle keyed by (band, code),
    exactly like ``dedup.minhash_lsh_pairs``.

    - ``planes_per_band=None`` derives the band width from a corpus
      count so bucket count tracks corpus size (see
      ``derive_planes_per_band``); pass an explicit value when the
      result must match a statically-generated oracle.
    - ``bucket_cap`` keeps only the ``bucket_cap`` lowest ids per
      (band, code) bucket before pairing — a deterministic skew guard
      bounding any one bucket at O(cap²) pairs. ``log_drops=True`` runs
      one extra small aggregate over bucket sizes and logs how many
      postings the cap discarded.
    - Vectors ride through the band join (width ≈ ``dim`` doubles per
      banded row) so exact re-scoring needs no second join against the
      corpus; for very wide vectors prefer re-joining on id instead.
    """
    if planes_per_band is None:
        planes_per_band = derive_planes_per_band(emb.count())
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))  # once per vector, rides the join
    coded = base.select(
        "vid",
        "v",
        "nrm",
        F.explode(F.array(*band_code_cols(F.col("v"), n_bands, planes_per_band, dim))).alias("bc"),
    ).select(
        "vid", "v", "nrm", F.col("bc.band").alias("band"), F.col("bc.code").alias("code")
    )
    if bucket_cap is not None:
        if log_drops:
            sizes = coded.groupBy("band", "code").count()
            dropped = (
                sizes.select(
                    F.sum(F.greatest(F.col("count") - bucket_cap, F.lit(0))).alias("d")
                ).collect()[0]["d"]
                or 0
            )
            if dropped:
                logger.warning(
                    "lsh_candidate_pairs: bucket_cap=%d dropped %d postings",
                    bucket_cap,
                    dropped,
                )
        w = Window.partitionBy("band", "code").orderBy("vid")
        coded = (
            coded.withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") <= bucket_cap)
            .drop("__rn__")
        )
    coded = coded.persist()  # both self-join sides reuse the coding stage
    a, b = coded.alias("a"), coded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .groupBy(
            F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b")
        )  # dedupe multi-band hits; map-side partial agg keeps it cheap
        .agg(
            F.first("a.v").alias("va"),
            F.first("b.v").alias("vb"),
            F.first("a.nrm").alias("na"),
            F.first("b.nrm").alias("nb"),
        )
    )


def lsh_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bands: int = 2,
    planes_per_band: int | None = None,
    dim: int = 64,
    bucket_cap: int = 10_000,
    log_drops: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale:
    banded LSH candidates (see ``lsh_candidate_pairs``) + exact cosine
    filter. Returns (id_a, id_b, cos_sim) with id_a < id_b."""
    cand = lsh_candidate_pairs(
        emb, id_col, vec_col, n_bands, planes_per_band, dim, bucket_cap, log_drops
    )
    sim = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    return cand.select("id_a", "id_b", sim.alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )


def semdedup_prune(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    threshold: float = 0.95,
    kmeans_iters: int = 2,
    cell_cap: int | None = 10_000,
    log_drops: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with the deterministic
    seeded k-means from ``kmeans_centroids``, then within each cluster
    drop every vector that has a LOWER-id cluster-mate within cosine
    ``threshold`` — keep-first, the same survivor rule the text dedup
    ops use, so the result is order-free and oracle-checkable.

    Returns every input row as (id, cell, kept): the caller filters
    ``kept`` to materialize the pruned corpus, or aggregates per cell
    for a pruning report.

    Scale shape: the Lloyd rounds are broadcast sweeps + (cell, pos)
    shuffles (see ``kmeans_centroids``); after assignment the only wide
    op is ONE self-equi-join keyed by cell. Within-cell pairing is
    quadratic in cell size, so ``n_centroids`` must grow with the
    corpus (the paper uses ~sqrt(n); expected cell size n/k stays
    bounded) — same contract as every bucketed op here. ``cell_cap``
    (ON by default, like ``lsh_candidate_pairs``'s bucket_cap) is the
    deterministic backstop for a runaway cell: only each cell's
    ``cell_cap`` lowest ids participate in pairing, so a monster cell
    costs O(cap²) and the overflow is conservatively KEPT (never
    silently dropped); ``log_drops`` reports how many vectors the cap
    excluded from pairing.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    cents = kmeans_centroids(base, id_col, n_centroids, kmeans_iters)
    assigned = assign_cells(
        base.select(F.col(id_col).alias("vid"), F.col("v").alias("av")),
        cents,
        "vid",
        "av",
    ).persist()  # reused by both self-join sides and the final output
    pair_side = assigned
    if cell_cap is not None:
        if log_drops:
            sizes = assigned.groupBy("cell").count()
            excluded = (
                sizes.select(
                    F.sum(F.greatest(F.col("count") - cell_cap, F.lit(0))).alias("d")
                ).collect()[0]["d"]
                or 0
            )
            if excluded:
                logger.warning(
                    "semdedup_prune: cell_cap=%d excluded %d vectors from pairing",
                    cell_cap,
                    excluded,
                )
        w_cap = Window.partitionBy("cell").orderBy("vid")
        pair_side = (
            assigned.withColumn("__rn__", F.row_number().over(w_cap))
            .where(F.col("__rn__") <= cell_cap)
            .drop("__rn__")
        )
    # per-row norm computed once before the within-cell pair join instead
    # of twice per candidate pair (bit-identical values — optimization r11)
    pair_side = pair_side.withColumn("__n__", _norm(F.col("av")))
    a, b = pair_side.alias("a"), pair_side.alias("b")
    sim = F.round(
        _dot(F.col("a.av"), F.col("b.av"))
        / (F.col("a.__n__") * F.col("b.__n__")),
        6,
    )
    drops = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vid") < F.col("b.vid")),
        )
        .where(sim >= threshold)
        .select(F.col("b.vid").alias("vid"))
        .distinct()
        .withColumn("__dropped__", F.lit(True))
    )
    return assigned.join(drops, "vid", "left").select(
        F.col("vid").alias(id_col),
        F.col("cell").cast("long").alias("cell"),
        F.coalesce(~F.col("__dropped__"), F.lit(True)).alias("kept"),
    )


def rp_signs(d_out: int, d_in: int, seed: str = "rp") -> list[list[float]]:
    """The ±1 projection matrix (Achlioptas 2003's database-friendly
    Johnson-Lindenstrauss variant), derived row-by-row from md5 so
    Spark, DuckDB and Python all see the IDENTICAL matrix — the
    projection is deterministic, hence oracle-checkable."""
    from csvs_to_sqlite_spark.functions.hashing import py_md5_long

    return [
        [
            1.0 if py_md5_long(f"{k}:{j}", seed=seed) % 2 == 0 else -1.0
            for j in range(d_in)
        ]
        for k in range(d_out)
    ]


def random_projection(
    df: DataFrame,
    d_in: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss compression of an embedding column:
    y_k = (1/√d_out) · Σ_j ±1_{k,j} · x_j, the 4× (64→16) dimensionality
    cut applied before ANN indexing or shipping at corpus scale (pairwise
    cosines survive within the JL bound — unit-tested statistically).

    Entirely scan-stage: the matrix ships as ±1 LITERAL arrays (zero
    joins, zero shuffles, zero Python at runtime); each output dim is an
    ordered fold over the input so float addition order matches the SQL
    twin. Components rounded to 6 dp. Returns (id, proj array<double>).
    """
    signs = rp_signs(d_out, d_in, seed)
    inv = 1.0 / float(d_out) ** 0.5
    v = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    base = df.select(F.col(id_col), v.alias("__v__"))
    comps = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("__v__"),
                    F.array(*[F.lit(s) for s in signs[k]]),
                    lambda x, r: x * r,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(inv),
            6,
        )
        for k in range(d_out)
    ]
    return base.select(id_col, F.array(*comps).alias("proj"))


def random_projection_sql(
    d_in: int,
    d_out: int = 16,
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
    seed: str = "rp",
    table: str = "embeddings",
) -> str:
    """DuckDB twin of random_projection — same literal matrix (shared
    builder), same per-component rounding."""
    signs = rp_signs(d_out, d_in, seed)
    inv = repr(1.0 / float(d_out) ** 0.5)
    comps = ", ".join(
        "round(list_sum(list_transform(list_zip(v, ["
        + ", ".join(repr(s) for s in signs[k])
        + f"]), p -> p[1] * p[2])) * {inv}, 6)"
        for k in range(d_out)
    )
    return f"""
WITH base AS (SELECT {id_expr} AS id,
                     list_transform({vec_expr}, x -> x::DOUBLE) AS v
              FROM {table})
SELECT id AS {id_expr}, [{comps}] AS proj FROM base
"""


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Affine int8 scalar quantization of an embedding column — the
    standard 4× compression applied before embeddings are stored or
    shipped at corpus scale (float32[d] → int64-coded 0..255 levels +
    per-vector (min, max) for dequantization).

    q = floor((x - min) / (max - min) * 256), clamped to 255; floor (not
    round) so no half-way tie can diverge between engines — every
    arithmetic step is plain IEEE double math, identical in Spark and
    DuckDB, which makes the full quantized array oracle-checkable.
    Entirely scan-stage: per-row array expressions, zero shuffles, zero
    Python. Dequantization midpoint x̂ = min + (q + 0.5)·(max − min)/256
    bounds |x̂ − x| ≤ (max − min)/512.
    """
    v = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    base = df.select(F.col(id_col), v.alias("__v__")).select(
        id_col,
        F.array_min("__v__").alias("vmin"),
        F.array_max("__v__").alias("vmax"),
        F.col("__v__"),
    )
    q = F.expr(
        "transform(__v__, x -> CASE WHEN vmax = vmin THEN 0L"
        " ELSE least(255L, cast(floor((x - vmin) / (vmax - vmin) * 256) AS bigint))"
        " END)"
    )
    return base.select(id_col, "vmin", "vmax", q.alias("q"))


# --- MMR diversified reranking ---------------------------------------------

MMR_LAMBDA = 0.7
MMR_ONE_MINUS_LAMBDA = 0.3  # independent literal, NOT 1-0.7 (ulp-different)


def _round_half_up(x: float, nd: int) -> float:
    """Spark/DuckDB round(double, nd): HALF_UP on the SHORTEST decimal
    repr (java BigDecimal.valueOf semantics) — Python's round() is
    half-even and diverges on exact .5 digits."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def mmr_rerank(
    emb: DataFrame,
    query_id: int = 0,
    n_candidates: int = 25,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    retrieve the cosine top-``n_candidates`` for the query vector
    distributedly, then greedily select ``k`` results maximizing
    ``λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`` (tie → lower id).

    Scale split: relevance scoring + top-N is the distributed part (the
    corpus never shuffles — broadcast query, TakeOrdered); the greedy is
    inherently sequential over the BOUNDED candidate set, so the N
    relevances and N·(N−1) pairwise sims are collected (bounded by the
    user's n_candidates, never corpus size) and folded on the driver
    with the engines' HALF_UP double rounding. Returns
    (sel_rank, vec_id, relevance, mmr_score)."""
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )
    q = base.where(F.col("vid") == query_id).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("__qn__")
    )
    rel = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("__qn__") * _norm(F.col("v"))), 6
    )
    cand = (
        base.where(F.col("vid") != query_id)
        .crossJoin(F.broadcast(q))
        .select("vid", "v", rel.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vid").asc())
        .limit(n_candidates)
        .persist()
    )
    a = cand.select(
        F.col("vid").alias("ia"), F.col("v").alias("va"), _norm(F.col("v")).alias("na")
    )
    b = cand.select(
        F.col("vid").alias("ib"), F.col("v").alias("vb"), _norm(F.col("v")).alias("nb")
    )
    s = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    sims = {
        (r.ia, r.ib): r.s
        for r in a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .select("ia", "ib", s.alias("s"))
        .collect()
    }
    rels = {r.vid: r.rel for r in cand.select("vid", "rel").collect()}
    cand.unpersist()

    def sim(x: int, y: int) -> float:
        return sims[(x, y) if x < y else (y, x)]

    selected: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    for rank in range(1, min(k, len(rels)) + 1):
        best = None
        for vid in sorted(rels):
            if vid in chosen:
                continue
            maxsim = max((sim(vid, sv) for sv in chosen), default=0.0)
            score = _round_half_up(
                MMR_LAMBDA * rels[vid] - MMR_ONE_MINUS_LAMBDA * maxsim, 6
            )
            if best is None or score > best[0] or (score == best[0] and vid < best[1]):
                best = (score, vid)
        selected.append((rank, best[1], rels[best[1]], best[0]))
        chosen.append(best[1])
    spark = emb.sparkSession
    return spark.createDataFrame(
        selected, "sel_rank long, vec_id long, relevance double, mmr_score double"
    )


def mmr_rerank_sql(
    query_id: int = 0,
    n_candidates: int = 25,
    k: int = 10,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of mmr_rerank: the greedy is unrolled as one
    MATERIALIZED CTE per selection round (the MATERIALIZED keyword is
    load-bearing — inlined CTEs re-evaluate the whole upstream chain per
    reference, exponential over k rounds)."""
    cos = (
        "round(list_sum(list_transform(list_zip(qv, v), p -> p[1]*p[2])) / "
        "(sqrt(list_sum(list_transform(qv, x -> x*x))) * "
        "sqrt(list_sum(list_transform(v, x -> x*x)))), 6)"
    )
    sim = (
        "round(list_sum(list_transform(list_zip(va, vb), p -> p[1]*p[2])) / "
        "(sqrt(list_sum(list_transform(va, x -> x*x))) * "
        "sqrt(list_sum(list_transform(vb, x -> x*x)))), 6)"
    )
    parts = [
        f"WITH base AS MATERIALIZED (SELECT vec_id AS vid, "
        f"list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}),",
        f"q AS (SELECT v AS qv FROM base WHERE vid = {query_id}),",
        f"cand AS MATERIALIZED (SELECT vid, v, {cos} AS rel "
        f"FROM base, q WHERE vid <> {query_id} "
        f"ORDER BY rel DESC, vid ASC LIMIT {n_candidates}),",
        "sims AS MATERIALIZED (SELECT a.vid AS ia, b.vid AS ib, "
        f"{sim.replace('va', 'a.v').replace('vb', 'b.v')} AS s "
        "FROM cand a JOIN cand b ON a.vid < b.vid),",
        "sel1 AS MATERIALIZED (SELECT 1 AS sel_rank, vid, rel, "
        "round(0.7::DOUBLE * rel - 0.3::DOUBLE * 0.0, 6) AS mmr "
        "FROM cand ORDER BY round(0.7::DOUBLE * rel - 0.3::DOUBLE * 0.0, 6) DESC, "
        "vid ASC LIMIT 1),",
        "selu1 AS MATERIALIZED (SELECT * FROM sel1),",
    ]
    for r in range(2, k + 1):
        prev = f"selu{r - 1}"
        parts.append(
            f"sel{r} AS MATERIALIZED (SELECT {r} AS sel_rank, c.vid, c.rel, "
            f"round(0.7::DOUBLE * c.rel - 0.3::DOUBLE * "
            f"(SELECT max(s.s) FROM sims s JOIN {prev} p "
            f"ON (s.ia = c.vid AND s.ib = p.vid) OR (s.ib = c.vid AND s.ia = p.vid)"
            f"), 6) AS mmr "
            f"FROM cand c WHERE c.vid NOT IN (SELECT vid FROM {prev}) "
            f"ORDER BY mmr DESC, c.vid ASC LIMIT 1),"
        )
        parts.append(
            f"selu{r} AS MATERIALIZED "
            f"(SELECT * FROM {prev} UNION ALL SELECT * FROM sel{r}),"
        )
    parts.append(
        f"final AS (SELECT * FROM selu{k}) "
        "SELECT sel_rank, vid AS vec_id, rel AS relevance, mmr AS mmr_score "
        "FROM final ORDER BY sel_rank"
    )
    return "\n".join(parts)


# --- product quantization ---------------------------------------------------

PQ_M = 8        # subspaces
PQ_DSUB = 8     # dims per subspace (m * d_sub = 64)
PQ_K = 16       # centroids per subspace codebook
PQ_ITERS = 1    # Lloyd rounds per codebook (fixed, deterministic)


def _pq_subspaces(
    base: DataFrame, m: int, d_sub: int, keys: tuple = ("vid",)
) -> DataFrame:
    """Explode (*keys, v) into the (*keys, s, sv) subvector frame PQ
    stages share. Scan-stage only — one explode of ``m`` sliced structs.
    ``keys`` lets the query side carry extra grouping columns (e.g. the
    probed cell for residual ADC) through the same slicing code, so the
    corpus-side codes and query-side LUT can never desynchronize."""
    return base.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice("v", s * d_sub + 1, d_sub).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select(*keys, F.col("e.s").alias("s"), F.col("e.sv").alias("sv"))


def _pq_l2(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 distance, folded per-row in list order (mirrored by the
    DuckDB twin's list_sum fold — bit-identical inputs give bit-identical
    distances, which the rn=1 assignment ordering relies on)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_assign(subs: DataFrame, books: DataFrame) -> DataFrame:
    """Nearest-codebook-centroid assignment per (vid, subspace): one
    broadcast join + a (vid, s)-keyed ARGMIN aggregate.

    Optimization r11 (guide §2.3 — shuffle fewer bytes): the former
    top-1 window shuffled every (vid, s, sv, cid, d2) row ×k codewords
    through the window exchange. min(struct(d2, cid)) is the same
    (d2 asc, cid asc) order, computed with map-side partial aggregation
    — the ×k candidate rows collapse inside the scan stage (the explode
    that built ``subs`` left all of a vid's rows co-located), so the
    exchange carries one row per (vid, s). ``sv`` is functionally
    determined by the group key (every candidate row carries the same
    subvector), so first() is value-deterministic."""
    j = subs.join(F.broadcast(books), "s").select(
        "vid", "s", "sv", "cid", _pq_l2(F.col("sv"), F.col("cv")).alias("d2")
    )
    agg = j.groupBy("vid", "s").agg(
        F.min(F.struct(F.col("d2"), F.col("cid"))).alias("m"),
        F.first("sv").alias("sv"),
    )
    return agg.select(
        "vid", "s", "sv", F.col("m.cid").alias("cell"), F.col("m.d2").alias("d2")
    )


def _pq_codebooks(
    subs: DataFrame, k: int, iters: int, d_sub: int = PQ_DSUB
) -> DataFrame:
    """Learn the per-subspace codebooks: seed with the first ``k`` ids,
    run ``iters`` quantized Lloyd rounds (L2 assignment, EMB_Q-exact
    integer mean sums, 6-dp rounded components). Returns (s, cid, cv).

    Lazy like kmeans_centroids, and for the same measured reason (see
    its optimization-r11 note): exchange reuse already runs the Lloyd
    lineage once per action, so driver materialization only adds serial
    job latency."""
    cents = subs.where(F.col("vid") < k).select(
        "s", F.col("vid").alias("cid"), F.col("sv").alias("cv")
    )
    for _ in range(iters):
        assigned = _pq_assign(subs, cents)
        # one (s, cell)-keyed exchange per round (_mean_arrays, r12)
        # instead of the (s, cell, pos) posexplode + re-collect pair
        cents = _mean_arrays(assigned, ["s", "cell"], "sv", d_sub, 6).select(
            "s", F.col("cell").alias("cid"), F.col("__cv__").alias("cv")
        )
    return cents


def pq_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    d_sub: int = PQ_DSUB,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): split each
    vector into ``m`` subvectors, learn a ``k``-centroid codebook per
    subspace (seeded with the first ``k`` ids, fixed Lloyd rounds,
    EMB_Q-quantized means — the kmeans_centroids determinism recipe with
    L2 assignment), and emit each vector's code word + reconstruction
    error. PQ compresses 64 floats to ``m`` bytes — the memory layout
    ANN indexes use at 100 TB.

    Plan shape: ONE exploded (vid, subspace, subvector) frame feeds every
    stage; codebooks are (m·k)-row broadcasts; means are a (s, cell,
    pos)-keyed aggregate with constant state; the final code word is a
    per-vid collect of exactly ``m`` rows. The corpus never shuffles
    except the bounded (s,cell,pos) mean aggregate and the vid-keyed
    code collect. All distances fold per-row in mirrored order; sums
    across rows are integer-quantized — bit-stable under any
    partitioning."""
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )
    subs = _pq_subspaces(base, m, d_sub).persist()
    cents = _pq_codebooks(subs, k, iters, d_sub)
    final = _pq_assign(subs, cents).select(
        "vid", "s", F.col("cell").alias("code"), F.round(F.col("d2"), 6).alias("err")
    )
    agg = final.groupBy("vid").agg(
        F.array_sort(F.collect_list(F.struct("s", "code", "err"))).alias("a")
    )
    codes = F.concat_ws("-", F.transform("a", lambda t: t["code"].cast("string")))
    errsum = F.round(
        F.aggregate(
            F.transform("a", lambda t: t["err"]), F.lit(0.0), lambda acc, x: acc + x
        ),
        6,
    )
    return agg.select(
        F.col("vid").alias(id_col), codes.alias("codes"), errsum.alias("recon_err")
    ).orderBy(id_col)


def _pq_sql_parts(
    m: int = PQ_M,
    d_sub: int = PQ_DSUB,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    base: str = "base",
) -> tuple[list[str], list[str], list[str]]:
    """CTE fragments (no WITH, no trailing commas) unrolling the PQ
    codebook learning + final assignment over an existing ``base(vid, v)``
    CTE. Returns (parts, code_tables, final_cent_tables): ``code{s}`` is
    (vid, code, err) per subspace; the final codebooks are (cid, cv).
    Shared by pq_encode_sql and the IVF-PQ oracle so the Spark constants
    and the SQL stay in lockstep."""
    dist = "list_sum(list_transform(list_zip(sv, cv), p -> (p[1]-p[2])*(p[1]-p[2])))"
    parts: list[str] = []
    code_tables: list[str] = []
    cent_tables: list[str] = []
    for s in range(m):
        lo, hi = s * d_sub + 1, s * d_sub + d_sub
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vid, list_slice(v, {lo}, {hi}) AS sv"
            f" FROM {base})"
        )
        cent = f"seed{s}"
        parts.append(
            f"seed{s} AS (SELECT vid AS cid, sv AS cv FROM sub{s} WHERE vid < {k})"
        )
        for it in range(iters):
            parts.append(
                f"a{s}_{it} AS MATERIALIZED (SELECT vid, sv, cell, d2 FROM ("
                f"SELECT vid, sv, cid AS cell, d2, row_number() OVER ("
                f"PARTITION BY vid ORDER BY d2 ASC, cid ASC) AS rn "
                f"FROM (SELECT vid, sv, cid, {dist} AS d2 FROM sub{s}, {cent})"
                f") WHERE rn = 1)"
            )
            parts.append(
                f"m{s}_{it} AS (SELECT cell, pos, "
                f"round((sum(CAST(round(x * {EMB_Q}) AS BIGINT)) / "
                f"CAST({EMB_Q} AS DOUBLE)) / count(x), 6) AS mu "
                f"FROM (SELECT cell, i AS pos, sv[i] AS x "
                f"FROM a{s}_{it}, generate_series(1, {d_sub}) t(i)) "
                f"GROUP BY cell, pos)"
            )
            parts.append(
                f"cent{s}_{it} AS MATERIALIZED (SELECT cell AS cid, "
                f"list(mu ORDER BY pos) AS cv FROM m{s}_{it} GROUP BY cell)"
            )
            cent = f"cent{s}_{it}"
        parts.append(
            f"code{s} AS MATERIALIZED (SELECT vid, cell AS code, round(d2, 6) AS err"
            f" FROM (SELECT vid, cid AS cell, d2, row_number() OVER ("
            f"PARTITION BY vid ORDER BY d2 ASC, cid ASC) AS rn "
            f"FROM (SELECT vid, cid, {dist} AS d2 FROM sub{s}, {cent})"
            f") WHERE rn = 1)"
        )
        code_tables.append(f"code{s}")
        cent_tables.append(cent)
    return parts, code_tables, cent_tables


def pq_encode_sql(
    m: int = PQ_M,
    d_sub: int = PQ_DSUB,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of pq_encode: one CTE chain per subspace (seed →
    assign → quantized means → reassign), MATERIALIZED where re-read."""
    parts = [
        "base AS MATERIALIZED (SELECT vec_id AS vid, "
        f"list_transform(embedding, x -> x::DOUBLE) AS v FROM {table})"
    ]
    pq_parts, code_tables, _ = _pq_sql_parts(m, d_sub, k, iters)
    parts += pq_parts
    joins = " ".join(
        f"JOIN {t} c{i} ON c{i}.vid = base.vid" for i, t in enumerate(code_tables)
    )
    code_cols = ", ".join(f"c{i}.code" for i in range(m))
    err_list = "[" + ", ".join(f"c{i}.err" for i in range(m)) + "]"
    parts.append(
        f"final AS (SELECT base.vid AS vec_id, "
        f"concat_ws('-', {code_cols}) AS codes, "
        f"round(list_sum({err_list}), 6) AS recon_err FROM base {joins})"
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT vec_id, codes, recon_err FROM final ORDER BY vec_id"
    )


# ADC distance quantum: per-subspace squared-L2 terms are bit-identical
# across engines (same fold order, same 6-dp codebooks), so scaling to
# micro-units and rounding yields exact longs whose sums are order-free.
ADC_Q = 1_000_000


def ivfpq_topk(
    emb: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    m: int = PQ_M,
    d_sub: int = PQ_DSUB,
    pq_k: int = PQ_K,
    pq_iters: int = PQ_ITERS,
    coarse: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011, the production index layout at
    100 TB): coarse k-means cells route each query to its ``n_probe``
    nearest inverted lists; candidates inside probed cells are scored by
    asymmetric distance computation (ADC) — the query's exact subvectors
    against each candidate's PQ code — via an (|queries|·m·k)-row
    lookup table, never touching candidate raw vectors.

    Plan shape: centroids and codebooks are broadcast; the corpus
    shuffles once for the (vid, s) code assignment and once keyed vid
    for the candidate join; the LUT join is a broadcast; the final
    (query, neighbor) score is an integer sum of micro-unit longs —
    associative, so bit-stable under any partitioning. Ranking compares
    the exact longs (no float order wobble).

    Returns (query_id, neighbor_id, adist, rank): ADC squared-L2
    distance (rounded for display; ranked on the exact integer),
    ascending.
    """
    base = emb.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    if coarse is None:
        coarse = kmeans_centroids(base, "vid", n_centroids, kmeans_iters)
    cells = assign_cells(
        base.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("nv")),
        coarse,
        "neighbor_id",
        "nv",
    ).select("neighbor_id", "cell")

    subs = _pq_subspaces(base, m, d_sub).persist()
    books = _pq_codebooks(subs, pq_k, pq_iters, d_sub)
    codes = _pq_assign(subs, books).select("vid", "s", F.col("cell").alias("code"))

    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    probed = assign_cells(q, coarse, "query_id", "qv", n_probe=n_probe).select(
        "query_id", "cell"
    )
    qsubs = _pq_subspaces(
        q.select(F.col("query_id").alias("vid"), F.col("qv").alias("v")), m, d_sub
    ).select(F.col("vid").alias("query_id"), "s", "sv")
    lut = qsubs.join(F.broadcast(books), "s").select(
        "query_id",
        "s",
        F.col("cid").alias("code"),
        F.round(_pq_l2(F.col("sv"), F.col("cv")) * F.lit(ADC_Q))
        .cast("long")
        .alias("d2u"),
    )

    cand = cells.join(F.broadcast(probed), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = (
        cand.join(codes, cand["neighbor_id"] == codes["vid"])
        .join(F.broadcast(lut), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2u").alias("adu"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adu").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("adu") / F.lit(float(ADC_Q)), 6).alias("adist"),
            "rank",
        )
    )


def ivfpq_residual_topk(
    emb: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    m: int = PQ_M,
    d_sub: int = PQ_DSUB,
    pq_k: int = PQ_K,
    pq_iters: int = PQ_ITERS,
) -> DataFrame:
    """IVFADC, the textbook IVF-PQ of Jégou et al. 2011 §III: PQ encodes
    the RESIDUAL v − coarse_centroid(v), not the raw vector, so the
    codebooks only have to cover the within-cell spread — tighter codes
    at the same budget. The ADC lookup table is therefore built per
    (query, probed cell): d2(query_residual_in_cell, codeword). Same
    plan shape as ivfpq_topk with the LUT |q|·n_probe× larger (still a
    broadcast) and the candidate join keyed (cell) with the score join
    keyed (query, cell, s, code). Ranking compares exact micro-unit
    longs."""
    base = emb.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    coarse = kmeans_centroids(base, "vid", n_centroids, kmeans_iters)
    cvs = coarse.select(F.col("centroid_id").alias("cell"), F.col("cv").alias("ctr"))

    cells = assign_cells(
        base.select(F.col("vid").alias("nid"), F.col("v").alias("nv")),
        coarse,
        "nid",
        "nv",
    )
    res = cells.join(F.broadcast(cvs), "cell").select(
        F.col("nid").alias("vid"),
        F.col("cell"),
        F.zip_with("nv", "ctr", lambda x, y: x - y).alias("v"),
    )
    subs = _pq_subspaces(res.select("vid", "v"), m, d_sub).persist()
    books = _pq_codebooks(subs, pq_k, pq_iters, d_sub)
    codes = _pq_assign(subs, books).select("vid", "s", F.col("cell").alias("code"))
    corpus = res.select(F.col("vid").alias("neighbor_id"), "cell")

    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    probed = assign_cells(q, coarse, "query_id", "qv", n_probe=n_probe)
    qres = probed.join(F.broadcast(cvs), "cell").select(
        "query_id",
        "cell",
        F.zip_with("qv", "ctr", lambda x, y: x - y).alias("rv"),
    )
    qsubs = _pq_subspaces(
        qres.select("query_id", "cell", F.col("rv").alias("v")),
        m,
        d_sub,
        keys=("query_id", "cell"),
    )
    lut = qsubs.join(F.broadcast(books), "s").select(
        "query_id",
        "cell",
        "s",
        F.col("cid").alias("code"),
        F.round(_pq_l2(F.col("sv"), F.col("cv")) * F.lit(ADC_Q))
        .cast("long")
        .alias("d2u"),
    )

    cand = corpus.join(
        F.broadcast(probed.select("query_id", "cell")), "cell"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(codes, cand["neighbor_id"] == codes["vid"])
        .join(F.broadcast(lut), ["query_id", "cell", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2u").alias("adu"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adu").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("adu") / F.lit(float(ADC_Q)), 6).alias("adist"),
            "rank",
        )
    )


# --- persistable IVF index (build once, query many) --------------------------


def ivf_rebalance_plan(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    kmeans_iters: int = 2,
    cap_num: int = 1,
    cap_den: int = 1,
) -> DataFrame:
    """Index-maintenance planner for the IVF layout: for every cell
    holding more than ``cap_num/cap_den ×`` the mean cell size, a
    DETERMINISTIC split prescription — the dimension with the largest
    exact variance and that dimension's type-1 lower median — yielding
    (cell, n_vectors, split_dim, split_q, n_left, n_right). Hot inverted
    lists are THE IVF degradation mode at scale (a skewed cell turns
    probes into scans); this is the plan a maintenance job applies as a
    kd-style list split without retraining the coarse quantizer (the
    FAISS "split big lists" maintenance pattern).

    Exactness: components quantize to EMB_Q integer units; per-dim
    variance numerators n·Σq² − (Σq)² fold in decimal(38,0) (DuckDB
    HUGEINT — q² alone overflows int64); the argmax and median are
    integer order statistics, so the whole plan is bit-identical across
    engines and partitionings.

    Plan shape: assignment is the broadcast centroid sweep; stats are
    ONE (cell, pos)-keyed aggregate restricted to hot cells; the median
    pass windows ONLY (hot cell, split_dim) rows — cell-sized
    partitions, never a global window; output is hot-cell-sized.
    ``split_dim`` is 0-based; ``split_q`` is in EMB_Q units
    (value = split_q / 2^40); n_left counts q ≤ split_q."""
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = kmeans_centroids(base, "vid", n_centroids, kmeans_iters)
    assigned = assign_cells(
        base.select("vid", F.col("v").alias("av")), cents, "vid", "av"
    ).localCheckpoint(eager=False)
    return _rebalance_plan_from_assigned(assigned, n_centroids, cap_num, cap_den)


def _rebalance_plan_from_assigned(
    assigned: DataFrame,
    n_centroids: int,
    cap_num: int,
    cap_den: int,
    with_total: bool = False,
) -> DataFrame:
    """Split-plan core over an existing (cell, vid, av) assignment —
    shared by ``ivf_rebalance_plan`` (inline k-means) and
    ``ivf_index_rebalance_apply`` (a PERSISTED index's frozen layout,
    where re-running k-means would defeat the point of maintenance).

    ``with_total`` (optimization r11) appends the corpus row count the
    plan already aggregates internally as ``__n_total__`` — the apply
    path's before/after fail-loud guard reads it from the plan collect
    instead of paying a separate corpus.count() job. The public plan
    QUERY keeps the frozen schema (with_total=False)."""
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("n_vectors"))
    total = sizes.agg(F.sum("n_vectors").alias("n_total"))
    hot = (
        sizes.crossJoin(F.broadcast(total))
        .where(
            F.col("n_vectors") * n_centroids * cap_den > F.col("n_total") * cap_num
        )
        .select("cell", "n_vectors")
    )
    expl = (
        assigned.join(F.broadcast(hot), "cell")
        .select("cell", "n_vectors", "vid", F.posexplode("av").alias("pos", "x"))
        .withColumn("q", F.round(F.col("x") * F.lit(EMB_Q)).cast("long"))
    )
    dq = F.col("q").cast("decimal(38,0)")
    stats = expl.groupBy("cell", "pos").agg(
        F.max("n_vectors").alias("n_vectors"),
        F.sum(dq).alias("s"),
        F.sum(dq * dq).alias("ss"),
    )
    var_num_raw = (
        F.col("n_vectors").cast("decimal(38,0)") * F.col("ss")
        - F.col("s") * F.col("s")
    )
    # Overflow guard (fail-loud): under the session's ANSI-off pin a
    # decimal(38,0) overflow yields NULL, and desc-nulls-last would then
    # silently argmax a WRONG split_dim — exactly on the huge-hot-cell
    # path this planner targets (n²·q̄² > 1e38 at ~9M vectors with
    # |component|≈1 at EMB_Q=2^40). DuckDB's HUGEINT errors there; so
    # must we. Inputs are non-null by construction (s/ss aggregate
    # non-null q), so a NULL fold IS the overflow.
    var_num = F.when(var_num_raw.isNotNull(), var_num_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "ivf_rebalance_plan: per-dim variance numerator "
                    "n*ss - s*s overflowed decimal(38,0) for cell "
                ),
                F.col("cell").cast("string"),
                F.lit(
                    " — hot cell too large for EMB_Q quantization; "
                    "split the cell in stages or lower the "
                    "quantization scale"
                ),
            )
        ).cast("decimal(38,0)")
    )
    w = Window.partitionBy("cell").orderBy(
        var_num.desc(), F.col("pos").asc()
    )
    split_dims = (
        stats.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select("cell", "n_vectors", F.col("pos").alias("split_dim"))
    )
    member = expl.join(
        F.broadcast(split_dims.select("cell", "split_dim")), "cell"
    ).where(F.col("pos") == F.col("split_dim"))
    wm = Window.partitionBy("cell").orderBy(F.col("q").asc(), F.col("vid").asc())
    med = (
        member.withColumn("__rn__", F.row_number().over(wm))
        .where(F.col("__rn__") == F.expr("(n_vectors + 1) div 2"))
        .select("cell", F.col("q").alias("split_q"))
    )
    counts = (
        member.join(F.broadcast(med), "cell")
        .groupBy("cell")
        .agg(
            F.max("split_q").alias("split_q"),
            F.sum((F.col("q") <= F.col("split_q")).cast("long")).alias("n_left"),
        )
    )
    plan = (
        split_dims.join(counts, "cell")
        .select(
            "cell",
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.col("split_dim").cast("long").alias("split_dim"),
            "split_q",
            "n_left",
            (F.col("n_vectors") - F.col("n_left")).cast("long").alias("n_right"),
        )
    )
    if with_total:
        plan = plan.crossJoin(
            F.broadcast(total.select(F.col("n_total").alias("__n_total__")))
        )
    return plan


def ivf_index_write(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    kmeans_iters: int = 2,
) -> None:
    """Persist the IVF index so queries stop paying the k-means build:
    ``{path}/centroids`` (n_centroids rows) and ``{path}/cells`` — the
    corpus vectors partitioned BY CELL on disk (``partitionBy("cell")``),
    so the physical layout is the inverted file: probing a cell reads
    only that cell's files (Spark partition pruning), which is the
    on-disk contract real IVF services (FAISS on object storage) rely
    on. Build is the same deterministic seeded Lloyd loop as the inline
    path — an index written twice is byte-identical."""
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    cents = kmeans_centroids(base, id_col, n_centroids, kmeans_iters)
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    # read the just-written centroids back for the assignment pass
    # (optimization r11): the centroids write and the cells write are two
    # separate ACTIONS, and exchange reuse only spans one action — using
    # the in-memory lineage here re-ran the whole Lloyd loop a second
    # time during the cells write. The parquet round-trip is exact
    # (doubles are stored bit-identically), so assignments are unchanged.
    cents = emb.sparkSession.read.parquet(f"{path}/centroids")
    assigned = assign_cells(
        base.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv2")),
        cents,
        "neighbor_id",
        "cv2",
    )
    assigned.select("cell", "neighbor_id", "cv2").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/cells")


def ivf_index_append(
    spark,
    path: str,
    new_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to a persisted IVF index WITHOUT
    rebuilding: the frozen centroids are loaded (tiny, broadcast), new
    vectors are assigned to their nearest existing cell, and the rows
    are APPENDED into the cell-partitioned parquet layout — only the
    cells that actually receive vectors grow new files, so ingesting a
    delta touches O(delta) data, exactly the maintenance contract real
    IVF services (FAISS add()) offer. Queries through ``ivf_index_topk``
    then see the union corpus bit-identically to an index whose cells
    were written from the union under the same centroids (unit-asserted).

    Centroids are deliberately NOT retrained (an IVF invariant: moving a
    centroid would orphan previously-assigned vectors); after heavy
    distribution drift, rebuild with ``ivf_index_write``. Appending the
    same batch twice duplicates it — the caller owns delta dedup (e.g.
    ``incremental_near_dup_filter`` / anti-join on ids upstream)."""
    cents = spark.read.parquet(f"{path}/centroids")
    base = new_emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    assigned = assign_cells(
        base.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv2")),
        cents,
        "neighbor_id",
        "cv2",
    )
    assigned.select("cell", "neighbor_id", "cv2").write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")


def ivf_index_rebalance_apply(
    spark,
    path: str,
    cap_num: int = 1,
    cap_den: int = 1,
) -> list:
    """Execute the hot-list split plan against a PERSISTED index — the
    maintenance job ``ivf_rebalance_plan`` prescribes (FAISS
    "split big lists"): each hot cell's members are divided at the
    plan's (split_dim, split_q) boundary; the LEFT side keeps the
    original cell id, the RIGHT side gets a fresh id
    (max_centroid_id + 1 + rank of the split cell, deterministic), and
    both sides get recomputed EMB_Q-quantized mean centroids. Non-hot
    cells are untouched — the rewrite uses dynamic partition overwrite,
    so only the split cells' partition directories are replaced and the
    cell-partitioned layout (hence ``ivf_index_topk`` partition
    pruning) is preserved.

    Scale: the plan is computed from the index's OWN frozen assignment
    (no k-means re-run); only hot-cell partitions are read (partition
    filter) and rewritten (O(hot) I/O, the FAISS maintenance contract);
    centroid tables are dimension-bounded by construction (collected
    driver-side like every dim). Fail-loud: the corpus row count must
    be identical before/after or the apply raises. Local/parquet note:
    dynamic partition overwrite is not an atomic commit — production
    would wrap this in a table-format transaction (Iceberg/Delta
    rewrite), which changes the commit, not the math.

    Returns the applied plan rows (possibly empty)."""
    cents = spark.read.parquet(f"{path}/centroids")
    cent_rows = cents.collect()  # dimension-bounded by construction
    n_centroids = len(cent_rows)
    corpus = spark.read.parquet(f"{path}/cells")
    assigned = corpus.select(
        F.col("cell").cast("long").alias("cell"),
        F.col("neighbor_id").alias("vid"),
        F.col("cv2").alias("av"),
    )
    # with_total: the plan aggregate already sums per-cell counts over
    # the whole corpus, so the fail-loud before-count rides the plan
    # collect instead of a separate corpus.count() job (optimization
    # r11). An empty plan returns before the guard is ever needed.
    plan_rows = _rebalance_plan_from_assigned(
        assigned, n_centroids, cap_num, cap_den, with_total=True
    ).collect()
    if not plan_rows:
        return []
    n_before = int(plan_rows[0]["__n_total__"])
    plan_rows.sort(key=lambda r: r["cell"])
    max_id = max(int(r["centroid_id"]) for r in cent_rows)
    plan_df = spark.createDataFrame(
        [
            (int(r["cell"]), int(r["split_dim"]), int(r["split_q"]), max_id + 1 + i)
            for i, r in enumerate(plan_rows)
        ],
        "cell long, split_dim long, split_q long, right_id long",
    )
    hot_cells = [int(r["cell"]) for r in plan_rows]
    # partition filter prunes to the hot cells; the broadcast plan table
    # carries each cell's boundary. element_at is 1-based, split_dim 0-based.
    q = F.round(
        F.element_at("cv2", (F.col("split_dim") + 1).cast("int")) * F.lit(EMB_Q)
    ).cast("long")
    rebal = (
        corpus.where(F.col("cell").isin(hot_cells))
        .withColumn("cell", F.col("cell").cast("long"))
        .join(F.broadcast(plan_df), "cell")
        .select(
            F.when(q <= F.col("split_q"), F.col("cell"))
            .otherwise(F.col("right_id"))
            .alias("cell"),
            "neighbor_id",
            "cv2",
        )
        # materialize BEFORE the overwrite: breaks lineage to the files
        # being replaced (Spark refuses to overwrite a path it is reading)
        .localCheckpoint(eager=True)
    )
    # recomputed centroids for both split sides (same quantized-mean math
    # as kmeans_centroids, so the result stays oracle-expressible)
    qsum = F.sum(F.round(F.col("x") * F.lit(EMB_Q)).cast("long"))
    new_cents_df = (
        rebal.select("cell", F.posexplode("cv2").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.round((qsum / F.lit(float(EMB_Q))) / F.count("x"), 6).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col("cell").alias("centroid_id"),
            F.transform("pm", lambda s: s["m"]).alias("cv"),
        )
    )
    # sibling map (both directions) for query-side probe expansion: a
    # fixed n_probe scans fewer vectors after a split (smaller lists);
    # ivf_index_topk(expand_siblings=True) adds the probed cell's split
    # sibling so the pre-split recall is recovered at ~pre-split scanned
    # bytes. Single maintenance generation: re-applying rebalance
    # OVERWRITES this map (document: rebuild after repeated splits).
    sibs = [
        (int(r["cell"]), max_id + 1 + i)
        for i, r in enumerate(plan_rows)
    ]
    # the four maintenance commits after the eager checkpoint are
    # independent of each other (new_cents and the cells rewrite both
    # read the CHECKPOINT, not the files being replaced; centroids/
    # siblings land in their own directories), so the cells rewrite
    # overlaps the centroid recompute + small writes on a second driver
    # thread (guide §2.6 — actions are only sequential because the
    # driver calls them sequentially) instead of four serial jobs. The
    # dynamic-overwrite conf is session-wide but only affects
    # PARTITIONED writes, and the only partitioned write in flight is
    # the cells rewrite itself; it is restored after both threads join.
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            cells_fut = pool.submit(
                lambda: rebal.write.mode("overwrite")
                .partitionBy("cell")
                .parquet(f"{path}/cells")
            )
            new_cents = new_cents_df.collect()
            kept = [
                (int(r["centroid_id"]), list(r["cv"]))
                for r in cent_rows
                if int(r["centroid_id"]) not in set(hot_cells)
            ] + [(int(r["centroid_id"]), list(r["cv"])) for r in new_cents]
            spark.createDataFrame(
                sorted(kept), "centroid_id long, cv array<double>"
            ).write.mode("overwrite").parquet(f"{path}/centroids")
            spark.createDataFrame(
                sorted(sibs + [(b, a) for a, b in sibs]),
                "cell long, sibling long",
            ).write.mode("overwrite").parquet(f"{path}/siblings")
            cells_fut.result()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    n_after = spark.read.parquet(f"{path}/cells").count()
    if n_after != n_before:
        raise RuntimeError(
            f"ivf_index_rebalance_apply: corpus changed size during the "
            f"rewrite ({n_before} -> {n_after}) — index at {path} needs "
            f"a rebuild from source"
        )
    return plan_rows


def ivf_index_topk(
    spark,
    path: str,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
    expand_siblings: bool = False,
) -> DataFrame:
    """Query a persisted IVF index: load the (tiny, broadcast) centroid
    table, assign each query its n_probe nearest cells, and join against
    the cell-partitioned corpus. Returns exactly what the inline
    ``ivf_topk`` returns for the same parameters (unit-asserted) — the
    k-means cost is simply amortized away. With literal cell predicates
    the partitioned layout prunes at the file level (plan-asserted in
    tests).

    ``expand_siblings=True`` additionally probes the split SIBLING of
    every probed cell (the map ``ivf_index_rebalance_apply`` writes):
    after a split, a fixed n_probe scans fewer vectors, so recall can
    dip; sibling expansion recovers the pre-split candidate set at
    ~pre-split scanned bytes for exactly the probes that hit split
    cells, and is a no-op (empty map) on an unrebalanced index. The
    sibling table is split-count-sized (broadcast-class by
    construction)."""
    import os as _os

    cents = spark.read.parquet(f"{path}/centroids")
    corpus = spark.read.parquet(f"{path}/cells")
    q = assign_cells(
        query.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        n_probe=n_probe,
    )
    if expand_siblings and _os.path.isdir(f"{path}/siblings"):
        sibs = spark.read.parquet(f"{path}/siblings")
        expanded = q.join(F.broadcast(sibs), "cell").select(
            F.col("sibling").alias("cell"), "query_id", "qv"
        )
        q = q.select("cell", "query_id", "qv").unionByName(expanded).dropDuplicates(
            ["cell", "query_id"]
        )
    cand = corpus.withColumn("__cn__", _norm(F.col("cv2"))).join(
        F.broadcast(q.withColumn("__qn__", _norm(F.col("qv")))), "cell"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv2")) / (F.col("__qn__") * F.col("__cn__")),
        6,
    )
    scored = cand.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
