"""Static graph analytics: triangle counting and label propagation.

Complements the iterative graph family (alternating-star connected
components in operators/clusters.py, pointer-doubling depths and integer
PageRank in operators/hierarchy.py) with the canonical NON-iterative graph
kernel: per-node triangle counts, the building block of clustering
coefficients and community features.

Scale design — DEGREE ORIENTATION (Chiba–Nishizeki / the MapReduce
formulation of Suri & Vassilvitskii, WWW'11): orient every undirected edge
from the lower (degree, id) endpoint to the higher. The oriented
out-degree of ANY node — including a hub with millions of undirected
neighbors — is bounded by O(sqrt(m)) (graph arboricity), so the two-path
fan-out join that dominates triangle enumeration is bounded by
sum(C(outdeg, 2)) = O(m^1.5) TOTAL and, critically, per-key skew is
structurally removed: a celebrity node generates NO two-paths, its
low-degree followers each generate few. The naive unoriented two-path join
explodes as C(deg_hub, 2) on exactly the keys AQE can least help with.

Plan shape: two hash exchanges (two-paths grouped on the mid node key;
closing-edge semi join on the (lo, hi) pair), ids-only payloads, no
broadcast needed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_edges(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Canonicalize an undirected edge list to distinct (lo, hi) pairs
    oriented by (degree, id): lo is the endpoint with the smaller
    (undirected degree, id) tuple. Self-loops are dropped (a triangle is
    three DISTINCT mutually adjacent nodes). Returns columns (lo, hi)."""
    und = (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"),
            F.greatest(src, dst).alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    lo_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )


def triangle_counts(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-node triangle participation counts over an undirected edge list
    (duplicate / reversed / self-loop rows tolerated). Returns
    (node, n_triangles) for every node in >= 1 triangle.

    Enumeration: for oriented edges e1=(x,y), e2=(x,z) with y<z by the
    orientation order, the triple closes iff oriented edge (y,z) or (z,y)
    exists — since orientation is a total order, exactly the pair
    (least, greatest) in *orientation* position; we check both id orders
    via the canonical (lo,hi) form, which already stores the oriented
    pair. Each triangle is counted exactly once (its orientation-minimal
    node is the pivot x), then credited to all three corners."""
    # lazy barrier (r11 bench honesty): o feeds e1/e2/closing; eager would
    # run the orientation joins at plan-build time, outside the timed action
    o = orient_edges(edges, src, dst).localCheckpoint(eager=False)
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    two_paths = e1.join(e2, "x").where(F.col("y") < F.col("z"))
    # the closing oriented edge may be stored (y,z) or (z,y) depending on
    # degree order; match on the unordered pair
    closing = o.select(
        F.least("lo", "hi").alias("p"), F.greatest("lo", "hi").alias("q")
    )
    tri = two_paths.join(
        closing,
        (F.least("y", "z") == F.col("p")) & (F.greatest("y", "z") == F.col("q")),
        "leftsemi",
    )
    # triangle-set-sized barrier: corners fans tri out to three consumers —
    # without it each union branch replays the two-path join + closing
    # semi-join (AQE stage reuse hides most of the wall cost, but the plan
    # is honest and non-reusable branches can't regress it) (r11, guide §5)
    tri = tri.localCheckpoint(eager=False)
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def label_propagation(
    edges: DataFrame, rounds: int = 3, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge list: every node starts as its own label; each round
    every node adopts the most frequent label among its neighbors, ties
    broken by SMALLEST label — the deterministic variant of
    Raghavan et al. (2007), whose async random tie-breaks do not replay.
    Returns (node, label) after ``rounds``. Input edges are symmetrized; a
    node with no neighbors keeps its label. Known synchronous-LPA property
    (Raghavan et al. §3): bipartite structures can OSCILLATE under
    synchronous updates (a lone edge swaps labels every round) — callers
    wanting a fixed point run an even round count or post-process with
    connected components; the fixed deterministic schedule is what makes
    the operator replayable by a SQL oracle.

    Scale shape: fixed synchronous rounds (the q59 power-iteration
    discipline — LPA converges in a handful of sweeps and production runs
    cap them); each round is one join moving (neighbor, label) pairs plus
    one (node, label) count — two hash exchanges of longs, state is one
    label per node, localCheckpointed so plans stay flat. The argmax is an
    aggregate (max of a (count, -label) struct), never a per-node window
    sort."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
            .where(F.col("a") != F.col("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)  # lazy: fixed-round loop, no driver probe (r11)
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(rounds):
        neigh = und.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        best = (
            neigh.groupBy("node", "label")
            .agg(F.count("*").alias("__c"))
            .groupBy("node")
            .agg(F.max(F.struct(F.col("__c"), (-F.col("label")).alias("__nl"))).alias("__m"))
            .select("node", (-F.col("__m.__nl")).alias("label"))
        )
        labels = (
            nodes.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("label", F.col("node")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels
