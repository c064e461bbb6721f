"""Iterative graph analytics over similarity graphs: PageRank.

Complements the connected-components fixpoint in ``dedup.dedup_clusters``
with a value-propagating iteration — on a near-duplicate graph, PageRank
ranks the most "central" documents of each duplicate family (the natural
canonical-survivor score when provenance is equal; cf. the policy-based
``dedup.dedup_priority``).

Plan shape per round (the 100 TB contract): contributions are one
node-keyed join of the (sparse) rank table onto the edge list, then ONE
destination-keyed aggregate — no global structure anywhere; the rank
table is nodes-sized. Rounds are a driver loop with ``localCheckpoint``
per round to cut lineage (same discipline as ``dedup_clusters``).

Cross-engine determinism: per-node neighbor sums are ORDERED folds
(sort_array + F.aggregate over (src, contrib) structs; the DuckDB twin
uses ``sum(x ORDER BY src)``), each round's rank is rounded to 12 dp, and
the final output to 6 dp — float addition order can never diverge the
oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    damping: float = 0.85,
    rounds: int = 3,
) -> DataFrame:
    """PageRank over an undirected edge list (each pair counts as two
    directed edges). Nodes = endpoints of at least one edge (isolated
    docs have no graph signal and are excluded — the SQL twin matches).
    Returns (node, degree, pagerank) with pagerank rounded to 6 dp."""
    both = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    both = both.localCheckpoint()
    deg = both.groupBy("src").agg(F.count("*").alias("deg"))
    n = deg.count()  # scalar — node count, never a collected dataset
    ranks = deg.select(
        F.col("src").alias("node"),
        "deg",
        (F.lit(1.0) / F.lit(float(n))).alias("r"),
    ).localCheckpoint()
    base = F.lit(1.0 - damping) / F.lit(float(n))
    for _ in range(rounds):
        contribs = both.join(
            ranks.select(F.col("node").alias("src"), "deg", "r"), "src"
        ).select("dst", "src", (F.col("r") / F.col("deg")).alias("c"))
        summed = contribs.groupBy("dst").agg(
            F.round(
                base
                + F.lit(damping)
                * F.aggregate(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("src"), F.col("c").alias("v")))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                ),
                12,
            ).alias("r")
        )
        ranks = (
            summed.select(F.col("dst").alias("node"), "r")
            .join(deg.select(F.col("src").alias("node"), "deg"), "node")
            .select("node", "deg", "r")
            .localCheckpoint()
        )
    return ranks.select(
        "node", "deg", F.round("r", 6).alias("pagerank")
    )


def pagerank_sql(
    pairs_sql: str,
    a_expr: str = "a",
    b_expr: str = "b",
    damping: float = 0.85,
    rounds: int = 3,
) -> str:
    """DuckDB twin: the same rounds unrolled into chained CTEs (the
    k-means/_sql_kmeans_parts pattern), with ordered neighbor sums and
    the same per-round 12 dp rounding."""
    base = f"({1.0 - damping!r} / n.n)"
    parts = [
        f"pairs AS ({pairs_sql})",
        f"edges AS (SELECT {a_expr} AS src, {b_expr} AS dst FROM pairs"
        f" UNION ALL SELECT {b_expr} AS src, {a_expr} AS dst FROM pairs)",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)",
        "r0 AS (SELECT src AS node, deg, (1.0::DOUBLE / n.n) AS r"
        " FROM deg CROSS JOIN n)",
    ]
    prev = "r0"
    for i in range(1, rounds + 1):
        parts.append(
            f"r{i} AS (SELECT e.dst AS node, d2.deg,"
            f" round({base} + {damping!r} * sum(p.r / p.deg ORDER BY e.src), 12) AS r"
            f" FROM edges e JOIN {prev} p ON p.node = e.src"
            f" JOIN deg d2 ON d2.src = e.dst CROSS JOIN n"
            f" GROUP BY e.dst, d2.deg, n.n)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node, CAST(deg AS BIGINT) AS deg,"
        f" round(r, 6) AS pagerank FROM {prev}"
    )
