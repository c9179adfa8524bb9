"""Graph centrality over event-derived edge lists (north star: corpus
quality weighting — crawl-frontier importance scores like PageRank are a
standard signal for selecting/weighting web training data).

``pagerank`` is the classic damped random-walk fixpoint, expressed
Spark-first for the 100 TB regime where EDGES are huge and the NODE set is
orders of magnitude smaller (items, hosts, domains — not raw pages):

- The edge list is collapsed (parallel edges summed into a weight) and
  hash-partitioned by ``dst`` ONCE before the loop.
- Each iteration joins the small rank relation to the big edge relation via
  ``broadcast`` — the edges never shuffle again, and because contributions
  inherit the dst partitioning, the per-iteration inflow aggregation is a
  partial+final HashAggregate with NO Exchange (gated by
  tests/test_plan_quality.py).
- Dangling mass (rank sitting on nodes with no out-edges) is redistributed
  uniformly each iteration; computing it is one scalar aggregate over the
  node-sized relation per iteration — a driver sync, same bounded pattern as
  connected_components' convergence count (operators/dedup.py), and the cost
  is O(|nodes|), not O(|edges|).
- ``localCheckpoint`` truncates the growing lineage each round (iterative
  plans otherwise re-analyze an ever-deeper tree).

Fixed iteration count (no convergence test) keeps the result deterministic
and SQL-replayable — the q57 oracle unrolls the same iterations as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iters: int = 5,
    rank_decimals: int = 6,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns (node, rank).

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)·w(u,v)/out_w(u) + dangling/N)

    with ``dangling = Σ rank(u)`` over nodes with no out-edges. Ranks are
    rounded to ``rank_decimals`` in the OUTPUT only (iterations run at full
    double precision); grouped double sums commute to ~1e-16, so round-6
    values are engine-portable (same argument as the cosine oracles).
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .repartition("dst")
    )
    e = e.persist()
    outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list — no nodes to rank")
    base = (1.0 - damping) / n

    # Out-weight rides WITH the rank relation (node-sized, broadcast) so the
    # edge side never joins more than once per iteration.
    ranks = nodes.join(outw, nodes.node == outw.src, "left").select(
        "node", F.lit(1.0 / n).alias("rank"), "out_w"
    )
    for _ in range(iters):
        dangling = (
            ranks.filter(F.col("out_w").isNull()).agg(F.sum("rank")).first()[0]
            or 0.0
        )
        contrib = e.join(
            F.broadcast(ranks.filter(F.col("out_w").isNotNull())),
            e.src == F.col("node"),
        ).select(
            "dst", (F.col("rank") * F.col("w") / F.col("out_w")).alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = (
            nodes.join(inflow, nodes.node == inflow.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .join(outw, F.col("node") == outw.src, "left")
            .select("node", "rank", "out_w")
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node", F.round("rank", rank_decimals).alias("rank")
    ).orderBy("node")
