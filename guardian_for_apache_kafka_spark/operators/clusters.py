"""Connected components over near-duplicate pair graphs.

The pairwise dedup operators (dedup.py) emit edges (id_a, id_b); keep-first
dedup drops id_b per edge, which under-collapses transitive chains
(a~b, b~c but a!~c still keeps c when b is dropped first... actually keep-first
drops both b and c — it can *over*-collapse too: c is dropped because of b
even though b itself was dropped). Cluster-exact dedup needs the connected
components of the pair graph: one keeper (min id) per component.

Implementation: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-parallel CC used by production dedup pipelines:

- large-star: for each node u, connect every strictly-larger neighbor v to
  min(neighbors(u) ∪ {u}).
- small-star: connect every neighbor <= u (and u) to the minimum.

Each round is two DataFrame shuffles; converges in O(log^2 n) rounds (a few,
in practice — near-dup graphs are unions of small cliques). Everything stays
distributed: no driver-side graph, termination checked by a count aggregate,
per-round ``localCheckpoint`` truncates the exponentially-growing lineage
(the standard Spark iteration pattern; at 100 TB use reliable checkpoints on
the cluster FS instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One star round over canonical edges (src, dst), per Kiveris et al. §3:

    - large-star(u): emit (v, m) for every neighbor v > u,
    - small-star(u): emit (v, m) for every v in N(u) ∪ {u} with v <= u
      (u itself included — dropping it strands star centers),

    with m = min(N(u) ∪ {u}). Output edges satisfy src > dst (parent
    pointers); self-edges are filtered."""
    # neighborhood view: for each node u, its neighbors in both directions
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    nbrs = fwd.unionByName(rev)
    m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    joined = nbrs.join(m, "u")
    if large:
        out = joined.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        )
    else:
        small_nbrs = joined.where(F.col("v") <= F.col("u")).select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        )
        self_rows = m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
        out = small_nbrs.unionByName(self_rows)
    out = out.where(F.col("src") != F.col("dst"))
    # min() is duplicate-insensitive, so the intermediate large-star output
    # skips its dedup shuffle; only the small-star round (each loop
    # iteration's terminal set) pays the distinct. Duplicate inflation does
    # not compound across rounds — every round starts from a distinct set.
    return out if large else out.distinct()


def _local_components(edges: DataFrame) -> DataFrame:
    """Driver-side union-find for broadcast-sized edge sets: the same
    size-gated escape hatch as a broadcast join (driver materializes only
    what fits a fixed bound). Near-dup pair graphs are typically orders of
    magnitude smaller than the corpus, so this is the common case; the star
    loop remains the unbounded-scale path."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edges.collect():
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(n, find(n)) for n in parent]
    spark = edges.sparkSession
    schema = edges.schema
    schema = type(schema)(
        [
            type(schema.fields[0])("node", schema.fields[0].dataType, True),
            type(schema.fields[1])("component", schema.fields[1].dataType, True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
    small_graph_edges: int = 1 << 19,
) -> DataFrame:
    """Components of the undirected pair graph: returns (node, component) with
    component = min node id of the component. Nodes appearing in no edge are
    not returned (callers union isolated nodes as their own component).

    Edge sets at or below ``small_graph_edges`` resolve with a driver-side
    union-find in one collect instead of O(log n) shuffle rounds; larger
    graphs run the distributed alternating-star loop. Set
    ``small_graph_edges=0`` to force the distributed path.

    The 512k default is sized like a broadcast threshold: two int64 ids/edge
    -> ~8 MB collected (~the 10 MB autoBroadcastJoinThreshold), and
    path-compressed union-find on 512k edges is sub-second driver work,
    vs >= 3 star rounds x 2 shuffles each plus a signature aggregate per
    round on the distributed path (measured ~2.4 s minimum at bench scale —
    iteration latency, not data volume, dominates below ~1M edges). Near-dup
    pair graphs are typically orders of magnitude smaller than the corpus,
    so the gate, not the loop, is the common case."""
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("src"),
            F.least(F.col(id_a), F.col(id_b)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    def _signature(df: DataFrame) -> tuple:
        # order-invariant multiset signature in ONE aggregate pass:
        # (count, xor of per-edge xxhash64). Equal signatures on distinct
        # edge sets require xor of the symmetric difference's 64-bit hashes
        # to cancel — vanishingly unlikely on non-adversarial ids, and far
        # cheaper than the exceptAll set-difference join it replaces.
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("chk"),
        ).first()
        return (row["n"], row["chk"])

    prev_sig = _signature(edges)
    if prev_sig[0] <= small_graph_edges:
        return _local_components(edges)
    converged = False
    for _ in range(max_rounds):
        after_large = _star_round(edges, large=True)
        after_small = _star_round(after_large, large=False).localCheckpoint()
        # convergence = stable parent-pointer forest (signature unchanged)
        new_sig = _signature(after_small)
        edges = after_small
        if new_sig == prev_sig:
            converged = True
            break
        prev_sig = new_sig
    if not converged:
        # An unconverged forest yields component ids that are not the
        # component minimum — silent under-collapse downstream. The theory
        # bound is O(log^2 n) rounds; hitting max_rounds means the caller's
        # bound is too small for this graph, not a soft degradation.
        raise RuntimeError(
            f"connected_components did not converge within max_rounds={max_rounds}; "
            "raise max_rounds (alternating-star needs O(log^2 n) rounds)"
        )
    comp = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.unionByName(roots).dropDuplicates(["node"])


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster-exact dedup: keep exactly one row (the min id) per connected
    component of the pair graph, plus every row not in any pair."""
    comp = connected_components(pairs, id_a, id_b)
    doomed = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(doomed, id_col, "left_anti")


def cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-cluster representative selection: for each connected component of
    the near-dup pair graph, keep the highest-``quality_col`` member (ties to
    the lowest id) — the keep-the-best-copy policy real dedup pipelines use
    instead of keep-first when a quality signal exists.

    One component pass (see :func:`connected_components`) plus one window
    rank over (component) — the quality join ships only (id, quality), never
    document bodies. Returns (component, cluster_size, rep_id, rep_quality)
    for multi-document clusters."""
    comp = connected_components(pairs, id_a, id_b)
    members = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col).alias("__q")), "node"
    )
    w = Window.partitionBy("component").orderBy(F.col("__q").desc(), F.col("node"))
    return (
        members.withColumn("__rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count("*").over(Window.partitionBy("component")))
        .where(F.col("__rn") == 1)
        .select(
            "component",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("node").alias("rep_id"),
            F.col("__q").alias("rep_quality"),
        )
    )
