"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force baseline. The query set is broadcast; the
  corpus streams through one codegen'd stage computing dot products with
  ``zip_with`` + ``aggregate`` (all JVM-side, no Python). Cost is
  O(|queries| · |corpus|) — correct at any corpus size as long as the
  query set is small, since the corpus side never shuffles.
- lsh_topk: the scale path. Random-hyperplane LSH with DETERMINISTIC
  hyperplanes derived from md5 (no RNG state, so results are reproducible
  and oracle-checkable). Vectors hash to a bucket; top-k runs within the
  query's bucket only. Recall/cost tunable via n_planes.

All arithmetic is done in double (the raw column is float32; mixed-width
sums would diverge from any external oracle).
"""

from __future__ import annotations

from csvs_to_sqlite_spark.functions.hashing import py_md5_long

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
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
) -> DataFrame:
    """IVF cell assignment: nearest centroid by (rounded) cosine, ties to
    the lower centroid id. Centroids are broadcast; assignment is one
    map-side |vecs|×|centroids| sweep + a per-vector argmax window."""
    c = centroids.select(
        F.col("centroid_id"), F.col("cv").alias("centroid_v")
    )
    pairs = vecs.crossJoin(F.broadcast(c))
    sim = F.round(
        _dot(F.col(vec_alias), F.col("centroid_v"))
        / (_norm(F.col(vec_alias)) * _norm(F.col("centroid_v"))),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return (
        pairs.select(F.col(id_col), F.col(vec_alias), F.col("centroid_id"), sim.alias("csim"))
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select(id_col, vec_alias, F.col("centroid_id").alias("cell"))
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
) -> DataFrame:
    """IVF(-flat) ANN: corpus partitioned into centroid cells; each query
    probes only its own cell. Centroids here are the first ``n_centroids``
    vectors (deterministic; production would k-means them — the partition/
    probe structure, which is what scales, is identical). Multi-probe is a
    matter of taking the top-P cells in ``assign_cells``.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    centroids = base.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("v").alias("cv")
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
    )
    cand = corpus.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("cv2")) / (_norm(F.col("qv")) * _norm(F.col("cv2"))), 6
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
    """
    planes = hyperplanes(dim, n_planes)
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", bucket_expr(F.col("cv"), planes))
    q = query.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", bucket_expr(F.col("qv"), planes))
    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
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
