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


def triangle_stats(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(node, degree, triangles, clustering_coeff): per-node triangle
    count and local clustering coefficient over an undirected simple
    graph — the cohesion diagnostic for a near-dup graph (a clique of
    mutual near-dups is one template family; a hub with no triangles
    is a boilerplate shingle collision worth inspecting before
    cluster-collapse).

    Edges are canonicalized (min, max), self-loops dropped, duplicates
    collapsed. Triangles use the ordered node-iterator join: with
    every edge stored as a < b, triangle {a<b<c} is found exactly once
    as (a,b) ⋈ (b,c) ⋈ (a,c) — two equi-joins on edge endpoints, no
    direction double-counting, no post-hoc /6. Per-node counts credit
    each corner once; ``clustering_coeff`` = 2·T / (deg·(deg−1))
    (0 when deg < 2), pround'ed rational arithmetic of exact integers.

    Scale shape: the canonical edge set is checkpointed and reused by
    all three legs; both triangle joins are equi-joins on node ids
    (AQE splits skewed high-degree vertices); degrees are one
    map-side-combined aggregation. Nothing ever shuffles wider than
    (node, node) pairs. The ordered form also bounds the join fan-out
    by out-degree in the a<b orientation — the standard mitigation
    that keeps hub vertices from exploding the candidate set."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .select("x", "y", "z")
        .localCheckpoint(eager=False)
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        nodes.join(deg, "node")
        .join(corners, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            pround(
                F.when(
                    F.col("degree") >= 2,
                    F.lit(2.0)
                    * F.coalesce(F.col("triangles"), F.lit(0)).cast("double")
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree").cast("double") - F.lit(1.0))
                    ),
                ).otherwise(F.lit(0.0)),
                round_digits,
            ).alias("clustering_coeff"),
        )
    )


def k_core(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int = 2,
    rounds: int | None = None,
) -> DataFrame:
    """(node, core_degree): the k-core of the undirected simple graph
    — the maximal subgraph in which every node keeps degree ≥ k
    (Seidman 1983, "Network structure and minimum degree"; public
    literature) — by iterated peeling: drop nodes with degree < k,
    recompute, repeat. On a near-dup pair graph the k-core separates
    REAL template families (mutually similar cliques) from incidental
    pairwise matches and star-shaped shingle collisions, which is the
    inspection step before bulk cluster-collapse.

    ``rounds=None`` peels to the fixpoint with a cheap convergence
    probe per round (``limit(1).count()`` on the dropped set, the
    dedup_clusters discipline); a fixed ``rounds`` runs exactly that
    many peels — converged peels are no-ops, so any rounds ≥ the
    convergence depth yields the true k-core, and the fixed form is
    what a SQL oracle can state (unrolled CTEs). Peel depth is
    bounded by max-degree in theory but 1-3 rounds in practice on
    near-dup graphs (cliques survive intact; chains dissolve fast).

    Scale shape per round: one map-side-combined degree aggregation
    plus two semi-joins of the edge list against the surviving node
    set — all keyed on node ids, never wider than (node, node);
    lineage is checkpoint-truncated per round."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0: {rounds}")
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("a").alias("node"))
            .unionByName(ed.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("__d"))
        )

    i = 0
    while True:
        deg = degrees(e)
        keep = deg.where(F.col("__d") >= k).select("node")
        if rounds is None:
            dropped = deg.where(F.col("__d") < k).limit(1).count()
            if dropped == 0:
                break
        elif i >= rounds:
            break
        e = (
            e.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        i += 1
    return degrees(e).where(F.col("__d") >= k).select(
        "node", F.col("__d").cast("long").alias("core_degree")
    )
