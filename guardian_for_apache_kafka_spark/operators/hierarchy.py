"""Hierarchy / iterative-closure operators.

Spark has no recursive CTE, and the naive translation — a driver loop doing
one self-join per LEVEL (frontier BFS) — is the classic scale trap: a
depth-1000 supply-chain or org hierarchy means 1000 shuffles. The
scale-correct formulation is POINTER DOUBLING: each round every node learns
its 2^i-th ancestor, so convergence takes ceil(log2(depth)) rounds — the
same O(log) round discipline as the alternating-star connected components
in operators/clusters.py (Kiveris et al., SoCC'14).

Each round is one self-equi-join on the ancestor key + a localCheckpoint to
cut lineage (without it the plan doubles per round and Catalyst analysis
goes quadratic). Convergence is a bounded scalar aggregate per round
(count of unconverged rows) — a driver-side scalar, never record data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def md5_hash32(c: F.Column) -> F.Column:
    """Dialect-portable non-negative 32-bit hash: first 8 hex chars of md5.
    Fits a signed BIGINT in every engine, so modulo arithmetic agrees
    between Spark and DuckDB with no two's-complement gymnastics (the
    64-bit variant needs sign wrapping — functions/columns.portable_hash64)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def synthetic_parent(node: F.Column) -> F.Column:
    """Deterministic synthetic forest over positive integer ids:
    parent(n) = n - 1 - (h32(n) mod n) — a uniform jump strictly below n,
    so the graph is acyclic with root 0 and expected depth O(log n) with
    no closed form (the point: depth must actually be COMPUTED)."""
    return node - 1 - md5_hash32(node.cast("string")) % node


def ancestor_depths(
    edges: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    root: int = 0,
    max_iter: int = 64,
) -> DataFrame:
    """Depth of every node in a forest of (child, parent) edges, by pointer
    doubling. Returns (node, depth) with depth = #edges to that node's tree
    root — a parent equal to ``root`` OR any parent id with no edge row of
    its own terminates the walk (multi-tree forests and dangling parent
    ids are both valid input; tested in test_pointer_doubling_forest_semantics).

    State per node: (anc, depth) = "my 2^i-th ancestor, and how many edges
    I walked to reach it" (anc == root means converged; depth is final).
    One round: every unconverged node joins its ancestor's state and
    composes — anc' = anc.anc, depth' = depth + anc.depth. After r rounds
    each node knows its 2^r-th ancestor, so rounds = ceil(log2(max depth)).

    At 100 TB: rounds are log-bounded; each is ONE hash exchange on the
    ancestor key; state is 3 longs/node; the convergence probe is a scalar
    count. ``max_iter`` guards corrupt (cyclic) input — raising beats
    silently wrong depths."""
    state = edges.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(parent_col).cast("long").alias("anc"),
        F.lit(1).cast("long").alias("depth"),
    ).localCheckpoint()
    root_lit = F.lit(root).cast("long")
    def converged() -> bool:
        return state.where(F.col("anc") != root_lit).isEmpty()

    for _ in range(max_iter):
        if converged():
            return state.select("node", "depth")
        t = state.select(
            F.col("node").alias("__tn"),
            F.col("anc").alias("__ta"),
            F.col("depth").alias("__td"),
        )
        state = (
            state.join(t, state["anc"] == t["__tn"], "left")
            .select(
                "node",
                F.when(F.col("anc") == root_lit, F.col("anc"))
                .otherwise(F.coalesce("__ta", root_lit))
                .alias("anc"),
                F.when(F.col("anc") == root_lit, F.col("depth"))
                .otherwise(F.col("depth") + F.coalesce("__td", F.lit(0)))
                .alias("depth"),
            )
            .localCheckpoint()
        )
    # convergence reached DURING the max_iter-th join must still return
    # (check-then-join would otherwise raise one round early on a depth
    # needing exactly max_iter doublings)
    if converged():
        return state.select("node", "depth")
    raise RuntimeError(
        f"ancestor_depths did not converge in {max_iter} rounds — "
        "cycle in the parent edges, or depth exceeds 2^max_iter"
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer fixed-point PageRank over an edge list — the power-iteration
    family next to pointer doubling (q47) and alternating-star CC: a fixed
    number of synchronous rounds, each ONE hash exchange (edges join ranks
    on src, aggregate contributions on dst) + localCheckpoint to cut
    lineage.

    Determinism discipline: ranks are integer MICROS. Each round,
    share(u) = (p(u) * damping_pct) DIV (100 * outdeg(u)) is an exact
    integer per edge source, and summing int64 contributions is
    order-independent — so the result is bit-identical across engines and
    an oracle can replay the same rounds in unrolled SQL (float PageRank
    sums would drift with Spark's nondeterministic reduce order). Dangling
    mass is dropped (documented; same rule in the oracle). Nodes =
    src ∪ dst; base rank (1 - d) = (100 - damping_pct) * 10_000 micros.

    At 100 TB: iterations are fixed (power iteration converges
    geometrically; 3-10 rounds is the production norm for ranking
    features); state is (node, rank) longs; the edge list shuffles once
    per round on src then once on dst — co-bucketing edges by src
    (operators/bucketing.py) removes the first exchange entirely."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("__deg"))
    base = (100 - damping_pct) * 10_000
    ranks = nodes.withColumn("rank", F.lit(1_000_000).cast("long"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["node"])
            .join(outdeg, src_col)
            .select(
                F.col(dst_col).alias("node"),
                F.expr(f"(rank * {damping_pct}) DIV (100 * __deg)").alias("__share"),
            )
            .groupBy("node")
            .agg(F.sum("__share").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base).cast("long") + F.coalesce(F.col("__in"), F.lit(0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks


def ancestor_closure(
    edges: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    root: int = 0,
    max_iter: int = 64,
) -> DataFrame:
    """Transitive closure (node -> EVERY proper ancestor) by path doubling:
    reach(r+1) = reach(r) UNION reach(r) o reach(r), so after r rounds every
    ancestor within 2^r edges is known — ceil(log2(depth)) rounds instead of
    one join per level. The virtual root (parent == ``root``) is excluded
    from the closure.

    Output size is n x avg_depth rows — for the O(log n)-deep forests this
    engine builds, ~12x the node count, NOT the quadratic worst case; a
    chain-shaped hierarchy would be O(n^2) and should use per-level
    aggregation instead (the docstring is the contract). Each round is one
    self-join on the ancestor key + a distinct; lineage cut per round with
    localCheckpoint like ancestor_depths."""
    reach = (
        edges.select(
            F.col(id_col).cast("long").alias("node"),
            F.col(parent_col).cast("long").alias("anc"),
        )
        .where(F.col("anc") != F.lit(root).cast("long"))
        .distinct()
        .localCheckpoint()
    )
    n_prev = reach.count()
    for _ in range(max_iter):
        t = reach.select(F.col("node").alias("__m"), F.col("anc").alias("__a"))
        composed = reach.join(t, reach["anc"] == F.col("__m")).select(
            "node", F.col("__a").alias("anc")
        )
        reach = reach.unionByName(composed).distinct().localCheckpoint()
        n = reach.count()
        if n == n_prev:
            # a CYCLE also reaches a fixed point (its closure is finite) —
            # but only a cycle can make a node its own proper ancestor, so
            # detect it explicitly instead of returning self-ancestor rows
            # that would double-count in rollups (review r6 finding)
            if not reach.where(F.col("node") == F.col("anc")).isEmpty():
                raise ValueError(
                    "cycle detected: node(s) reachable from themselves"
                )
            return reach
        n_prev = n
    raise ValueError(f"closure did not converge in {max_iter} rounds")
