"""Link-graph analytics: fixed-iteration PageRank — the importance
weighting a web-scale corpus pipeline applies to its documents (page
rank over the crawl's link graph is a standard quality prior for
training-data selection, alongside the content-quality scores in
``operators/text.py``; connected components for the DEDUP graph live
in ``operators/dedup.py``).

Scale shape: one degree aggregation up front, then per iteration ONE
shuffle (contributions grouped by destination) plus a left join back
onto the node set — the textbook distributed power iteration. The
edge set never moves: it is checkpointed once with its out-degrees
attached and re-joined each round against the (small, node-sized)
rank frame. Each round ``localCheckpoint``s the ranks to stop
exponential lineage growth, the same discipline as the
label-propagation CC.

Determinism: floating-point SUM is shuffle-order-dependent, so each
edge's contribution is ``pround``-ed and summed as an exact DECIMAL
(order-independent), and each new rank is ``pround``-ed again — the
identical expression tree a SQL oracle can evaluate, making a FIXED
iteration count hash-exact cross-engine (convergence-threshold
variants are inherently float-compare-order fragile; a pipeline wants
the reproducible fixed-K form anyway).

Dangling nodes (no out-edges) contribute nothing — the classic
"ignore dangling mass" PageRank variant; with damping < 1 ranks stay
bounded. Callers wanting the redistribution variant can add a
terminal self-loop per dangling node to the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum, pround


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 6,
    damping: float = 0.85,
    round_digits: int = 9,
    contrib_digits: int = 12,
) -> DataFrame:
    """(node, rank): ``iterations`` rounds of the damped power
    iteration over a directed edge list (duplicate edges are parallel
    edges — each carries its own contribution; self-loops allowed).

        rank⁰(v)   = pround(1/N)
        rankᵏ⁺¹(v) = pround((1−d)/N + d · Σ_{(u,v)∈E} pround(rankᵏ(u)/deg(u)))

    with the inner Σ an exact DECIMAL sum of the pround'ed per-edge
    contributions (order-independent — see module doc)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1]: {damping}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast("double"))
    deg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    base = (1.0 - damping) / float(n)  # python float == IEEE double
    ranks = nodes.select(
        "node", pround(F.lit(1.0) / F.lit(float(n)), round_digits).alias("rank")
    )
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst"),
                pround(
                    F.col("rank") / F.col("__deg").cast("double"), contrib_digits
                ).alias("__c"),
            )
            .groupBy("dst")
            .agg(dsum("__c", scale=contrib_digits).alias("__s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                pround(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0)),
                    round_digits,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
