"""Static graph analytics: triangle counting.

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
    o = orient_edges(edges, src, dst).localCheckpoint()
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
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))
