"""Graph centrality over DataFrame edge lists — the domain-authority
signal web-curation pipelines attach to documents (a PageRank-style
score over the outlink/co-link graph decides which domains' text is
kept at higher rates).

Spark-first shape: the edge table is degree-normalized ONCE and
localCheckpointed; every PageRank iteration is then one equi join
(ranks x edges on src) plus one groupBy(dst) aggregate — a single
shuffle per iteration, with rank state bounded by #nodes rows.
Dangling mass (nodes with no out-edges) is redistributed uniformly,
the standard correction, costing one 1-row aggregate per iteration.
Deterministic given (graph, iters, damping) — SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: str | None = None,
             checkpoint_every: int = 5) -> DataFrame:
    """Weighted PageRank. Returns (node, rank) with Σ rank = 1.

    ``edges`` is a directed edge list; parallel edges sum their
    weights (weight 1 each when ``weight_col`` is None).
    """
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"), w.alias("w"))
         .groupBy("src", "dst").agg(F.sum("w").alias("w")))
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # out-degree-normalized edges, built once and reused every iteration
    norm = (e.join(deg, "src")
            .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
            .localCheckpoint())
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(iters):
        contrib = (norm.join(ranks, norm.src == ranks.node)
                   .groupBy("dst")
                   .agg(F.sum(F.col("p") * F.col("rank")).alias("c")))
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (ranks.join(deg, ranks.node == deg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dm")))
        ranks = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("c"), F.lit(0.0))
                             + F.col("dm") / n)).alias("rank")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks
