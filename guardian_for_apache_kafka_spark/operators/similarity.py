"""Similarity search over embedding columns (north-star ANN surface).

- ``cosine_topk``  — brute-force exact top-k: broadcast the (small) query set,
  one pass over the corpus, per-query heap via ranking window. The baseline
  and the verifier for the approximate paths.
- ``ivf_topk``     — IVF-style scale path: deterministic coarse centroids,
  corpus partitioned by nearest centroid, queries probe only ``nprobe``
  nearest lists. At 100 TB the corpus pass becomes a pruned scan of
  ~nprobe/nlist of the data; centroid assignment is one broadcast join.

All vector math is JVM-side fold arithmetic (functions/columns.py) — no Python
in the scoring loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.functions.columns import cosine_similarity
from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar int8 quantization: per-vector max-abs scale, 4x memory cut.

    Output (id, qvec: array<tinyint>, qscale: float) reconstructs as
    ``qvec[i] * qscale``; at 100 TB the quantized corpus is what stays
    resident for ANN probing while full-precision vectors remain on disk for
    final re-ranking. Pure JVM expressions (no UDF)."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    safe = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    return emb.select(
        F.col(id_col),
        F.transform(v, lambda x: F.round(x / safe).cast("tinyint")).alias("qvec"),
        safe.cast("float").alias("qscale"),
    )


def dequantized_cosine(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Cosine over int8-quantized vectors. The per-vector scales cancel in
    cosine (they factor out of numerator and both norms), so this is integer
    dot-product arithmetic promoted to double — scales are accepted for
    interface symmetry and future asymmetric (dot-product) scoring."""
    from guardian_for_apache_kafka_spark.functions.columns import cosine_similarity

    return cosine_similarity(qa.cast("array<double>"), qb.cast("array<double>"))


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k over the int8-quantized corpus: same plan shape as
    cosine_topk but the scanned corpus payload is 4x smaller. Recall vs the
    full-precision exact top-k is asserted in tests (max-abs int8 keeps
    cosine ordering nearly intact for unit-ish embeddings)."""
    qc = quantize_embeddings(spread_narrow_scan(corpus), id_col, vec_col)
    qq = quantize_embeddings(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)),
        "query_id",
        vec_col,
    )
    scored = (
        qc.crossJoin(
            F.broadcast(
                qq.select(
                    F.col("query_id"),
                    F.col("qvec").alias("__qq"),
                    F.col("qscale").alias("__qs"),
                )
            )
        )
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            dequantized_cosine(
                F.col("qvec"), F.col("qscale"), F.col("__qq"), F.col("__qs")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Excludes self-matches when a
    query id equals a corpus id. Returns (query_id, vec_id, cosine, rnk)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    # the corpus side carries the per-row scoring work (|Q| cosines per
    # vector) — spread a narrow scan so it parallelizes
    c = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def _assign_cluster_udf(cents: list[tuple[int, list[float]]]):
    """Arrow-vectorized argmax-cosine cluster assignment against the (small)
    centroid matrix shipped in the UDF closure: one numpy matmul per batch —
    no joins, no shuffles, no per-centroid interpreted folds (the fold
    formulation cost ~300us x nlist per ROW). ``argmax`` takes the FIRST
    maximum, and centroids are ordered by cid, so exact ties break to the
    smaller cid like the window-rank formulation; numpy's reordered sums
    drift ~1e-15 from the fold — absorbed by the asserted argmax margin
    budget (tests/test_dedup_similarity.py)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("long")
    def assign(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        return pd.Series(cids[(Vn @ Cn.T).argmax(axis=1)])

    # asNondeterministic: joins/filters on the assigned cid make the
    # optimizer infer isnotnull(assign(..)) and push it below the spread
    # exchange, evaluating the corpus kernel TWICE (guide §4.4 — observed in
    # s5/s9/s2's executed plans). The kernel is deterministic in fact; the
    # marker only forbids the optimizer from duplicating or reordering it.
    return assign.asNondeterministic()


# closure-size gate for the literal centroid matrix: above this many doubles
# (nlist * dim), assignment shards the centroid set across several
# shard-sized Arrow UDFs and takes a second argmax over per-shard winners
# (the fine-codebook path the _centroid_rows docstring promises). 2^21
# doubles = 16 MiB per closure — far under Spark's task-size warnings while
# letting e.g. nlist=4096 x dim=4096 codebooks run as 8 shards.
_CENTROID_SHARD_ELEMS = 1 << 21


def _shard_winner_udf(cents: list[tuple[int, list[float]]]):
    """Arrow UDF returning this centroid SHARD's winner per row as
    struct(cid, score): same normalized matmul as ``_assign_cluster_udf``,
    plus the winning cosine so shard winners can be compared JVM-side."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("struct<cid: long, score: double>")
    def win(vs: pd.Series) -> pd.DataFrame:
        V = np.array(vs.tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Cn.T
        j = S.argmax(axis=1)
        return pd.DataFrame({"cid": cids[j], "score": S[np.arange(len(j)), j]})

    # see _assign_cluster_udf: forbid optimizer duplication of the kernel
    return win.asNondeterministic()


def _assign_fn(
    cents: list[tuple[int, list[float]]], shard_elems: int | None = None
):
    """Column-factory for argmax-cosine assignment against ``cents``
    (sorted by cid). Below the closure gate: the single-matrix Arrow UDF.
    Above it: the centroid set is split into gate-sized shards, each scored
    by its own shard-closure UDF in the SAME projection (one ArrowEvalPython
    pass over the corpus — no joins, no exchanges), and the global winner
    is a JVM-side struct fold over the per-shard winners. Tie discipline is
    preserved: within a shard argmax takes the FIRST max (smallest cid);
    across shards strict ``>`` keeps the earlier (smaller-cid) shard."""
    # enforce the cid-ascending invariant here rather than assert it at call
    # sites (r12 advisor): the argmax/array_max tie disciplines ("first max
    # wins" == smallest cid; sharded max(score, -cid)) are only equivalent to
    # the window formulation's (cosine desc, cid asc) rule while centroids
    # ascend in cid — a driver-side sort of nlist tuples is free and makes
    # the discipline impossible to drift if a caller's ordering changes.
    cents = sorted(cents)
    limit = shard_elems or _CENTROID_SHARD_ELEMS
    dim = max(1, len(cents[0][1])) if cents else 1
    per = max(1, limit // dim)
    if len(cents) <= per:
        udf = _assign_cluster_udf(cents)
        return lambda vec: udf(vec)
    shards = [cents[i : i + per] for i in range(0, len(cents), per)]
    udfs = [_shard_winner_udf(s) for s in shards]

    def assign(vec):
        # each shard UDF is referenced EXACTLY ONCE: the kernels are marked
        # nondeterministic (so the optimizer cannot duplicate them under
        # inferred filters — guide §4.4), which also disables common-
        # subexpression merging, so the old when-chain (whose `best` branch
        # re-appeared per fold step) would re-evaluate earlier shards per
        # reference. Collect the winners into one array and take the max by
        # (score, -cid): ties on score resolve to the smaller cid — the same
        # discipline as the old strict-> fold (shards ascend in cid, so the
        # earlier shard's winner IS the smaller cid on an exact tie).
        winners = F.array(*[u(vec) for u in udfs])
        ranked = F.transform(
            winners,
            lambda s: F.struct(
                s["score"].alias("score"), (-s["cid"]).alias("negcid")
            ),
        )
        return -F.array_max(ranked)["negcid"]

    return assign


def _topn_lists_udf(cents: list[tuple[int, list[float]]], n: int):
    """Arrow-vectorized top-``n`` nearest-centroid lists per row as
    ``array<long>`` of cids, ordered (cosine desc, cid asc) — the probe
    rule of ``ivf_topk``'s ranking-window formulation without the window:
    the nlist scores per row never leave the projection, so the corpus
    (or a corpus-sized query side, as in ``knn_graph``) is not exchanged
    nlist-fold just to rank its own row-local scores. Tie discipline
    matches the window exactly: centroids arrive cid-ascending and the
    argsort is STABLE, so equal cosines keep the smaller cid first (the
    same first-max rule `_assign_cluster_udf` relies on, underwritten by
    the asserted argmax margin budget)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    cents = sorted(cents)  # the stable-argsort tie rule REQUIRES cid-asc (r12)
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    keep = min(n, len(cents))

    @pandas_udf("array<long>")
    def probe(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Cn.T
        idx = np.argsort(-S, axis=1, kind="stable")[:, :keep]
        return pd.Series([cids[row].tolist() for row in idx])

    # see _assign_cluster_udf: forbid optimizer duplication of the kernel
    return probe.asNondeterministic()


def auto_nlist(n_rows: int) -> int:
    """Default IVF list count from corpus size: ~sqrt(n) (the classic IVF
    sizing — per-list scan work and probe fan-out balance), clamped to
    [8, 4096]. Deterministic in n, so oracle replays can pin it."""
    return max(8, min(4096, int(n_rows**0.5)))


def _centroid_rows(
    corpus: DataFrame,
    nlist: int,
    id_col: str,
    vec_col: str,
    kmeans_iterations: int = 2,
    shard_elems: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd schedule with driver-collected centroids: seed =
    per-position means of the id-mod-nlist groups, then ``kmeans_iterations``
    steps of (assign to argmax-cosine centroids via the vectorized closure
    UDF, re-mean); empty clusters keep their previous centroid. Returns
    sorted (cid, vector).

    The driver round-trip is nlist x dim doubles per iteration — a bounded
    scalar-sized collect (the d7/anchor discipline), and what makes each
    Lloyd pass ONE corpus scan (numpy matmul per Arrow batch) feeding a
    partial-agg mean: no broadcast exchange, no crossJoin, no per-vector
    window. The closure matrix is nlist x dim doubles; past the
    ``_CENTROID_SHARD_ELEMS`` gate, ``_assign_fn`` shards the centroid set
    and takes a second argmax over per-shard winners — same one-scan
    shape, several shard-sized closures instead of one big one."""

    def mean_rows(assigned: DataFrame) -> dict[int, list[float]]:
        # collect the (cid, pos, mean) rows straight off the ONE per-position
        # aggregate and assemble vectors on the driver: the second
        # cid-keyed exchange (+ array_sort re-assembly) _mean_vectors pays
        # to stay distributed buys nothing for a result that is collected
        # anyway — nlist x dim rows, the same bounded-scalar volume either
        # way (r11: one exchange per Lloyd round instead of two)
        rows = (
            assigned.select(
                "cid",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
            )
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in rows:
            acc.setdefault(r["cid"], {})[r["pos"]] = float(r["m"])
        return {cid: [d[p] for p in range(len(d))] for cid, d in acc.items()}

    # the per-row fold cosines are the CPU cost — parallelize a narrow scan
    # before every Lloyd pass rather than fold on one core (layout.py).
    # The (seed-cid, vector) projection is materialized ONCE (lazy local
    # checkpoint, r12 — VERDICT r11 ask #5): every Lloyd round re-assigns
    # the SAME vectors against new centroids, so without the barrier each
    # of the seed + kmeans_iterations passes re-ran the parquet scan and
    # the spread exchange just to reach identical rows. Values are
    # unchanged: the blocks replay the exact rows/layout the scan produced
    # (float32-derived grouped double sums are exact in any order — the s5
    # discipline — and the argmax margin budget covers assignment ties).
    base = spread_narrow_scan(corpus).select(
        (F.col(id_col) % nlist).alias("__cid0"), F.col(vec_col).alias(vec_col)
    ).localCheckpoint(eager=False)
    seed = base.select(F.col("__cid0").alias("cid"), F.col(vec_col))
    cur = mean_rows(seed)
    for _ in range(kmeans_iterations):
        assign = _assign_fn(sorted(cur.items()), shard_elems)
        assigned = base.select(
            assign(F.col(vec_col)).alias("cid"), F.col(vec_col)
        )
        refined = mean_rows(assigned)
        merged = dict(cur)  # empty clusters keep their previous centroid
        merged.update(refined)
        cur = merged
    return sorted(cur.items())


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int | None = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    kmeans_iterations: int = 2,
    shard_elems: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign corpus vectors to their nearest centroid
    (broadcast join, one corpus pass), then score queries only against the
    ``nprobe`` lists whose centroids are nearest to each query.

    ``nlist=None`` auto-sizes the list count to ~sqrt(|corpus|)
    (:func:`auto_nlist`; one count() job) — the right default when the
    caller does not know the corpus scale. Past the closure gate the
    centroid set shards (``_assign_fn``).

    Assignment/probing ride the scans as Arrow argmax/arg-top-``nprobe``
    kernels against the literal centroid matrix (r11; previously a
    crossJoin-with-centroids + ranking window, whose exchange carried
    ``nlist`` copies of every vector through a shuffle just to rank
    row-local scores — the guide-§8 payload-shuffle anti-pattern). Tie
    discipline is unchanged (first max / stable argsort = smaller cid);
    past the closure-size gate the corpus argmax shards via ``_assign_fn``
    and the nprobe probe falls back to the window formulation (queries
    are the small side everywhere but knn_graph)."""
    if nlist is None:
        nlist = auto_nlist(corpus.count())
    cent_rows = _centroid_rows(
        corpus, nlist, id_col, vec_col, kmeans_iterations, shard_elems
    )
    assign = _assign_fn(cent_rows, shard_elems)
    c_assigned = (
        spread_narrow_scan(corpus)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
        .select("vec_id", "__cv", assign(F.col("__cv")).alias("list_id"))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    limit = shard_elems or _CENTROID_SHARD_ELEMS
    dim = max(1, len(cent_rows[0][1])) if cent_rows else 1
    if len(cent_rows) * dim <= limit:
        probe = _topn_lists_udf(cent_rows, nprobe)
        q_probes = q.select(
            "query_id", "__qv", F.explode(probe(F.col("__qv"))).alias("list_id")
        )
    else:
        # sharded-codebook fallback: rank with the window formulation
        cents = corpus.sparkSession.createDataFrame(
            [(cid, vec) for cid, vec in cent_rows], "cid long, centroid array<double>"
        )
        scored = q.crossJoin(F.broadcast(cents)).select(
            "query_id",
            "__qv",
            F.col("cid"),
            cosine_similarity(F.col("__qv"), F.col("centroid")).alias("__cs"),
        )
        w = Window.partitionBy("query_id").orderBy(F.col("__cs").desc(), F.col("cid"))
        q_probes = (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= nprobe)
            .select("query_id", "__qv", F.col("cid").alias("list_id"))
        )
    scored = (
        c_assigned.join(q_probes, "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def kmeans_assign(
    corpus: DataFrame,
    nlist: int | None = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_elems: int | None = None,
) -> DataFrame:
    """Deterministic k-means cluster assignment over an embedding corpus:
    seed centroids are the per-position means of the ``id % nlist`` groups
    (iteration zero), refined by ``iterations`` Lloyd steps (``_centroids``),
    then every vector takes its argmax-cosine centroid (ties -> smaller cid).

    Returns (vec_id, cluster, cosine, csize) where ``csize`` is the final
    cluster's population — the health signal for downstream cluster-pruned
    work (SemDeDup-style dedup, IVF probe sizing).

    Scale shape: each Lloyd step is ONE corpus scan — assignment against
    LITERAL centroid arrays (no broadcast exchange, no crossJoin, no
    per-vector window) feeding a per-position partial-agg mean; the corpus
    payload never shuffles. The final assignment is a pure projection;
    only ``csize`` adds one exchange of (id, cluster) rows. The per-
    iteration driver round-trip is nlist x dim doubles (bounded-scalar
    collect discipline; see ``_centroid_rows`` for the large-nlist note).
    Determinism contract: every argmax margin is orders of magnitude above
    cross-engine float drift — asserted per scale factor in
    tests/test_dedup_similarity.py (s5 margin budget, d4-style)."""
    if nlist is None:
        nlist = auto_nlist(corpus.count())
    rows = _centroid_rows(corpus, nlist, id_col, vec_col, iterations, shard_elems)
    assign = _assign_fn(rows, shard_elems)
    sel = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
    )
    assigned = sel.select("vec_id", "__v", assign(F.col("__v")).alias("cluster"))
    # the reported cosine is the ORACLE-EXACT fold against the chosen
    # centroid only (one fold per row, not nlist): margins guarantee the
    # choice matches the oracle's, so the scored value does too
    cents = corpus.sparkSession.createDataFrame(
        [(cid, vec) for cid, vec in rows], "cluster long, __cent array<double>"
    )
    assigned = assigned.join(F.broadcast(cents), "cluster").select(
        "vec_id",
        "cluster",
        cosine_similarity(F.col("__v"), F.col("__cent")).alias("cosine"),
    )
    return assigned.withColumn(
        "csize", F.count("*").over(Window.partitionBy("cluster")).cast("long")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Majority-label kNN classification over an embedding corpus: each query
    takes the modal label of its exact cosine top-k (ties -> smaller label).
    Returns (query_id, pred_label, votes).

    Scale shape: the neighbor set is |Q| x k rows — broadcast it against the
    corpus's (id, label) projection (the corpus side never shuffles); the vote
    count groups |Q| x k rows, a driver-trivial aggregate."""
    nn = cosine_topk(corpus, queries, k, id_col, vec_col, query_id_col)
    labels = corpus.select(F.col(id_col).alias("vec_id"), F.col(label_col).alias("__lbl"))
    votes = labels.join(F.broadcast(nn.select("query_id", "vec_id")), "vec_id")
    counts = votes.groupBy("query_id", "__lbl").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("__lbl"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("query_id", F.col("__lbl").alias("pred_label"), "votes")
        .orderBy("query_id")
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "query_id",
) -> DataFrame:
    """Training-data decontamination: flag every corpus vector whose cosine
    to ANY benchmark/eval vector reaches ``threshold`` (these are the
    documents that would leak evaluation data into training).

    The eval set broadcasts (benchmarks are small); the corpus streams
    through one scan scoring |eval| cosines per row and never shuffles
    payloads — only the per-vector (best_eval_id, cosine) winner survives
    the rank. Returns flagged (vec_id, best_eval_id, cosine) with ties on
    cosine broken by eval id for determinism."""
    q = eval_set.select(
        F.col(eval_id_col).alias("best_eval_id"), F.col(vec_col).alias("__qv")
    )
    c = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            "vec_id", "best_eval_id",
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("best_eval_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def mmr_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 8,
    pool: int = 24,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximal Marginal Relevance diverse top-k retrieval: greedily select
    k results balancing relevance to the query against redundancy with the
    already-selected set — score(c) = lam*rel(c) - (1-lam)*max_{s in S}
    sim(c, s), the standard diversity re-ranker for RAG/retrieval dedup
    (a plain cosine top-k returns near-duplicate neighbors; MMR spends the
    k slots on coverage).

    Determinism: relevance and pairwise similarities are rounded to
    INTEGER MICROS (round(cos * 1e6) as BIGINT) and lambda is the rational
    lam_num/lam_den, so every greedy comparison is exact integer
    arithmetic — the oracle replays the identical selection in a recursive
    CTE; ties break on the smaller id.

    Scale shape: stage 1 is the distributed exact top-``pool`` scan
    (cosine_topk: corpus never shuffles, queries broadcast); stages 2-3
    operate on the POOLS ONLY — per-query pool^2 pairwise sims via
    broadcast joins and one Arrow applyInPandas group PER QUERY for the
    greedy walk (executor-side; Python touches pool-sized state, never
    corpus rows; query ids must be integral). Returns
    (query_id, rank, vec_id, rel_micro) — selections are fully independent
    per query."""
    cands = cosine_topk(corpus, query, k=pool, id_col=id_col, vec_col=vec_col,
                        query_id_col=query_id_col)
    # pool-sized barriers (r11, guide §5): rel fans out to ids/ra/rb/combined
    # and cv to both pair sides — without them the corpus-scale cosine_topk
    # subtree (scan + crossJoin + ranking window) re-evaluates once per
    # consumer (24 parquet scans in the measured plan). The checkpointed
    # frames are |queries|*pool rows — model-sized, never corpus-sized.
    rel = cands.select(
        F.col("query_id"),
        F.col("vec_id"),
        F.round(F.col("cosine") * 1_000_000).cast("long").alias("rel"),
    ).localCheckpoint(eager=False)
    ids = rel.select(F.col("vec_id").alias("__id")).distinct()
    cv = (
        corpus.join(F.broadcast(ids), corpus[id_col] == ids["__id"], "inner")
        .select(F.col("__id"), F.col(vec_col).alias("__v"))
        .localCheckpoint(eager=False)
    )
    ra = rel.select("query_id", F.col("vec_id").alias("ia"))
    rb = rel.select("query_id", F.col("vec_id").alias("ib"))
    pairs = (
        ra.join(F.broadcast(rb), "query_id")  # per-query pool^2 candidate pairs
        .where(F.col("ia") != F.col("ib"))
        .join(
            F.broadcast(cv.select(F.col("__id").alias("ia"), F.col("__v").alias("__va"))),
            "ia",
        )
        .join(
            F.broadcast(cv.select(F.col("__id").alias("ib"), F.col("__v").alias("__vb"))),
            "ib",
        )
        .select(
            "query_id", "ia", "ib",
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")) * 1_000_000)
            .cast("long")
            .alias("sim"),
        )
    )
    combined = rel.withColumnRenamed("vec_id", "ia").join(
        F.broadcast(pairs), ["query_id", "ia"], "left"  # pool^2/query — never a shuffle join
    )

    def select_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rels = {int(r.ia): int(r.rel) for r in pdf.drop_duplicates("ia").itertuples()}
        sims = {
            (int(r.ia), int(r.ib)): int(r.sim)
            for r in pdf.dropna(subset=["ib"]).itertuples()
        }
        selected: list[int] = []
        avail = set(rels)
        for _ in range(min(k, len(rels))):
            best = None
            for c in sorted(avail):
                ms = max((sims.get((c, s), 0) for s in selected), default=0)
                score = lam_num * rels[c] - (lam_den - lam_num) * ms
                if best is None or score > best[0]:
                    best = (score, c)
            selected.append(best[1])
            avail.discard(best[1])
        return pd.DataFrame(
            {
                "query_id": [qid] * len(selected),
                "rank": range(1, len(selected) + 1),
                "vec_id": selected,
                "rel": [rels[s] for s in selected],
            }
        )

    return combined.groupBy("query_id").applyInPandas(
        select_fn, "query_id long, rank long, vec_id long, rel long"
    )


def quantized_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    probe_k: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage ANN: the int8-quantized corpus (4x smaller resident
    payload) proposes ``probe_k`` candidates per query; full-precision
    cosine re-ranks ONLY the candidate set down to ``k`` — the standard
    memory/recall trade at 100 TB, where the full-precision vectors stay
    on disk and are fetched for probe_k rows per query, not scanned.
    Returns (query_id, vec_id, cosine, rnk) with exact full-precision
    scores; recall vs the exact top-k is governed by probe_k/k headroom
    (asserted in-query by the s7 registry entry)."""
    probe = quantized_cosine_topk(
        corpus, queries, k=probe_k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select("query_id", "vec_id")
    full = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    rer = (
        # probe is |queries|*probe_k id pairs — broadcast keeps the corpus
        # side of the rerank join map-side (r11, guide §3.1; the s23 idiom)
        F.broadcast(probe).join(full, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 3,
    nlist: int | None = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_elems: int | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the whole corpus — every
    vector probes its own ``nprobe`` nearest IVF lists and reranks exactly
    within them (the graph-construction primitive under SemDeDup, kNN-LM
    retrieval indexes, and UMAP-style neighborhood embeddings). This is
    ivf_topk with the corpus as its own query set: candidate pairs exist
    only within probed lists, so the pair count is sum over lists of
    |list| * |probers| — bucketed, never the all-pairs square. Returns
    (query_id, vec_id, cosine, rnk <= k).

    Corpus-as-query specialization (r11): assignment and probing share ONE
    Arrow top-``nprobe`` pass — the assigned list is by definition the
    first probed list (argmax = top-1 of the same (cosine desc, cid)
    ordering) — and the ranked frame is materialized once (lazy local
    checkpoint) so the probe kernel does not run again per join side.
    Past the centroid closure gate this falls back to the generic
    ``ivf_topk`` (sharded-closure) path."""
    return knn_graph_at_budgets(
        corpus, k=k, nlist=nlist, budgets=(nprobe,),
        id_col=id_col, vec_col=vec_col, shard_elems=shard_elems,
    )[nprobe]


def knn_graph_at_budgets(
    corpus: DataFrame,
    k: int = 3,
    nlist: int | None = 8,
    budgets: tuple[int, ...] = (2,),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_elems: int | None = None,
) -> dict[int, DataFrame]:
    """:func:`knn_graph` at SEVERAL probe budgets from ONE trained index —
    the tuning-curve shape (s12): centroid training and the top-lists
    kernel run once at ``max(budgets)``, and each budget's probes are
    ``slice(lists, 1, p)`` of the shared checkpointed frame. Correct by
    the kernel's ordering discipline: the top-``p`` lists are exactly the
    first ``p`` entries of the top-``max`` list under the same
    (cosine desc, cid) stable order, so each returned frame is
    bit-identical to an independent ``knn_graph(..., nprobe=p)`` call
    (pinned by test_round11_optimization) — a curve over B budgets pays
    ONE training + ONE kernel pass instead of B (guide §1.2: don't
    recompute what you already have)."""
    if nlist is None:
        nlist = auto_nlist(corpus.count())
    limit = shard_elems or _CENTROID_SHARD_ELEMS
    cent_rows = _centroid_rows(corpus, nlist, id_col, vec_col, 2, shard_elems)
    dim = max(1, len(cent_rows[0][1])) if cent_rows else 1
    if len(cent_rows) * dim > limit:
        q = corpus.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        return {
            p: ivf_topk(
                corpus, q, k=k, nlist=nlist, nprobe=p,
                id_col=id_col, vec_col=vec_col, shard_elems=shard_elems,
            )
            for p in budgets
        }
    probe = _topn_lists_udf(cent_rows, max(max(budgets), 1))
    ranked = (
        spread_narrow_scan(corpus)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
        .select("vec_id", "__cv", probe(F.col("__cv")).alias("__lists"))
        .localCheckpoint(eager=False)
    )
    c_assigned = ranked.select(
        "vec_id", "__cv", F.element_at("__lists", 1).alias("list_id")
    )
    out: dict[int, DataFrame] = {}
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    for p in budgets:
        q_probes = ranked.select(
            F.col("vec_id").alias("query_id"),
            F.col("__cv").alias("__qv"),
            F.explode(F.slice("__lists", 1, p)).alias("list_id"),
        )
        scored = (
            c_assigned.join(q_probes, "list_id")
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
            )
        )
        out[p] = (
            scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k)
            .orderBy("query_id", "rnk")
        )
    return out


def pq_train(
    corpus: DataFrame,
    m: int = 16,
    ksub: int = 32,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[dict[int, list[float]]]:
    """Product-quantization codebooks by per-subspace Lloyd refinement:
    the vector space splits into ``m`` contiguous subspaces, each trained
    to ``ksub`` centroids from the deterministic id-mod seed (the s5
    iteration-zero schedule) through ``iters`` reassign-and-remean rounds
    — so a SQL oracle can replay training exactly, iteration by
    iteration. Returns ``codebooks[sub] = {cid: mean subvector}`` (dicts
    because Lloyd may empty a cluster mid-training; absent cids simply
    stop being candidates, identically on both engines).

    Per iteration: ONE distributed aggregate (posexplode + grouped
    ``avg``) and one codebook-sized driver collect (m*ksub*dsub doubles —
    the ``_centroid_rows`` discipline); assignment rides the scan as an
    Arrow-batch numpy kernel, never a join. Exactness contract (the s5
    float discipline): the embeddings are float32, so grouped double sums
    are EXACT in any order; squared distances use an explicit
    left-associated chain (see ``_pq_assign_udf``), so argmin decisions —
    and therefore the codes, the next round's groups, and the final
    codebooks — are bit-identical across engines."""
    if dim is None:
        # callers that already know the dimensionality pass it and skip
        # this one-row probe job (r11: ivfpq_topk knows it from cent_rows)
        dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    # materialize the (id, double-cast vector) projection ONCE (lazy local
    # checkpoint, r12 — VERDICT r11 ask #5): the seed pass plus each of the
    # ``iters`` reassign-and-remean rounds aggregates over the SAME rows,
    # and for raw-parquet callers (s14's pq_topk) every round previously
    # re-ran the scan + cast; for callers that already pass a checkpointed
    # frame (ivfpq's residuals) this adds one narrow block copy and the
    # rounds then skip the per-scan cast. Spread first so the posexplode
    # aggregates run at session parallelism on single-file scans. Values
    # unchanged: float32-derived grouped double sums are exact in any
    # order (the docstring's exactness contract).
    base = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("__pqid"),
        F.col(vec_col).cast("array<double>").alias("__pqv"),
    ).localCheckpoint(eager=False)
    v = F.col("__pqv")

    def means(codes: Column) -> list[dict[int, list[float]]]:
        rows = (
            base.select(codes.alias("__codes"), F.posexplode(v).alias("pos", "x"))
            .select(
                F.expr(f"pos div {dsub}").cast("int").alias("sub"),
                F.col("pos"),
                F.col("x"),
                F.element_at(
                    "__codes", (F.expr(f"pos div {dsub}") + 1).cast("int")
                ).alias("cid"),
            )
            .groupBy("sub", "cid", "pos")
            .agg(F.avg("x").alias("mean"))
            .collect()
        )
        cbs: list[dict[int, list[float]]] = [dict() for _ in range(m)]
        for r in rows:
            cbs[r.sub].setdefault(r.cid, [0.0] * dsub)[r.pos - r.sub * dsub] = float(r.mean)
        return cbs

    seed = F.array_repeat((F.col("__pqid") % ksub).cast("int"), m)
    cbs = means(seed)
    for _ in range(iters):
        cbs = means(_pq_assign_udf(cbs, dsub)(v))
    return cbs


def _pq_assign_udf(cbs: list[dict[int, list[float]]], dsub: int):
    """Arrow-vectorized per-subspace nearest-centroid codes: one numpy
    kernel per batch returning the length-m int code array. Squared
    distances accumulate in an EXPLICIT left-associated chain over the
    dsub positions — term for term the association the oracle's
    ``list_reduce`` fold replays — so with float32-derived doubles every
    distance is bit-identical and ``argmin`` (first minimum, candidate
    cids sorted ascending) breaks ties to the smaller cid exactly like
    the oracle's ``ORDER BY d, j``."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    m = len(cbs)
    cids = [np.array(sorted(cb), dtype=np.int32) for cb in cbs]
    cents = [
        np.array([cb[c] for c in sorted(cb)], dtype=np.float64) for cb in cbs
    ]

    @pandas_udf("array<int>")
    def assign(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        out = np.empty((len(V), m), dtype=np.int32)
        for s in range(m):
            sub = V[:, s * dsub : (s + 1) * dsub]
            sq = (sub[:, None, :] - cents[s][None, :, :]) ** 2
            acc = sq[:, :, 0]
            for p in range(1, dsub):
                acc = acc + sq[:, :, p]
            out[:, s] = cids[s][acc.argmin(axis=1)]
        return pd.Series(list(out))

    return assign


def _pq_qtab_udf(cbs: list[dict[int, list[float]]], dsub: int, ksub: int):
    """Arrow-vectorized ADC distance tables for QUERY vectors: a flat
    m*ksub double array, slot [s*ksub + j] = squared distance from the
    query's subvector s to centroid j (same left-associated chain as
    ``_pq_assign_udf``). Slots for Lloyd-emptied cids hold +inf — no code
    ever points at them, so they are never read."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    m = len(cbs)

    @pandas_udf("array<double>")
    def qtab(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        out = np.full((len(V), m * ksub), np.inf)
        for s in range(m):
            sub = V[:, s * dsub : (s + 1) * dsub]
            js = sorted(cbs[s])
            cent = np.array([cbs[s][j] for j in js], dtype=np.float64)
            sq = (sub[:, None, :] - cent[None, :, :]) ** 2
            acc = sq[:, :, 0]
            for p in range(1, dsub):
                acc = acc + sq[:, :, p]
            out[:, [s * ksub + j for j in js]] = acc
        return pd.Series(list(out))

    return qtab


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 16,
    ksub: int = 32,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation
    (ADC) — the memory-bound ANN workhorse: the corpus is stored as ``m``
    small integer codes per vector (m*log2(ksub) BITS of identity instead
    of dim floats — 10 bytes vs 256 here), queries precompute an m x ksub
    distance table, and each candidate costs ``m`` table lookups instead
    of a dim-length dot product. Returns (query_id, vec_id, adc,
    rnk <= k) by ascending ADC distance, ties to smaller vec_id;
    self-pairs excluded.

    Plan shape: training is ``pq_train`` (one aggregate per Lloyd round);
    encoding rides the corpus scan as one Arrow numpy kernel; the only
    join is the crossJoin against the BROADCAST query side (id + m*ksub
    table doubles — queries never shuffle the corpus), and the ADC sum is
    a pure JVM left-associated chain of ``m`` ``element_at`` lookups
    inside whole-stage codegen: no Python in the scoring loop. At 100 TB
    the wins compound — the resident scan payload is the m-byte code
    column, not the float vectors, and scoring cost per candidate is m
    adds, independent of dim.

    Exactness contract: float32 inputs + fixed association order at every
    step (training folds, table entries, the ADC chain) make distances
    bit-identical to the oracle's replay; ranking ties break on the
    integer ids. Retrieval quality on isotropic embeddings is bounded in
    tests (tests/test_dedup_similarity.py) — for high recall compose with
    exact reranking (``pq_rerank_topk``)."""
    cbs = pq_train(corpus, m, ksub, iters, id_col, vec_col)
    dim = sum(len(next(iter(cb.values()))) for cb in cbs) if cbs else 0
    dsub = dim // m
    v = F.col(vec_col).cast("array<double>")

    coded = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"),
        _pq_assign_udf(cbs, dsub)(v).alias("__codes"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _pq_qtab_udf(cbs, dsub, ksub)(v).alias("__qtab"),
    )
    adc = F.element_at("__qtab", F.element_at("__codes", 1) + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            "__qtab", F.element_at("__codes", s + 1) + F.lit(s * ksub + 1)
        )
    scored = (
        coded.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    probe_mult: int = 4,
    m: int = 16,
    ksub: int = 32,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage PQ retrieval — the standard IVFADC+rerank architecture:
    the compressed-domain ADC scan proposes ``k * probe_mult`` candidates
    per query, then ONLY those rows are re-read at full precision and
    re-ranked by exact squared L2. Returns (query_id, vec_id, d2,
    rnk <= k). At 100 TB the full-precision table is touched for
    |queries| * k * probe_mult rows total (a semi-join on the id column —
    Parquet scans just the id + vector columns), while the streaming scan
    cost is the PQ code column. On the isotropic test embeddings this
    lifts recall@5 from ~0.4 (pure ADC) to ~0.75 (see tests)."""
    cand = pq_topk(
        corpus, queries, k=k * probe_mult, m=m, ksub=ksub, iters=iters,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select("query_id", "vec_id")
    full = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    d2 = F.aggregate(
        F.zip_with("__cv", "__qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    # the candidate list is |queries|*k*probe_mult (query_id, vec_id) rows —
    # broadcast it so the rerank is the promised semi-join: the planner's
    # default was a SortMergeJoin that shuffled the CORPUS by vec_id to meet
    # ~200 candidate rows (r11, guide §3.1/§8)
    scored = (
        F.broadcast(cand).join(full, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


_RESID_SCALE = 1 << 20  # residual quantization grid (see ivfpq_topk)


def _residualize(df: DataFrame, vec_col: str, cent_df: DataFrame) -> DataFrame:
    """Replace ``vec_col`` with the GRID-QUANTIZED residual against the
    joined ``centroid`` column: round((vec - centroid) * 2^20). The scale
    makes every residual component an INTEGER-VALUED double, which is what
    keeps downstream PQ training deterministic — grouped sums of integers
    are exact in any partitioning/order, whereas raw residuals carry full
    53-bit mantissas and a grouped avg over them would be order-dependent
    run to run. Distances scale uniformly by 2^40, so rankings are
    unchanged."""
    resid = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("centroid"),
        lambda x, y: F.round((x - y) * float(_RESID_SCALE), 0),
    )
    keep = [c for c in df.columns if c != vec_col]
    return (
        df.join(F.broadcast(cent_df), F.col("list_id") == F.col("cid"))
        .select(*keep, resid.alias(vec_col))
    )


class IvfPqModel:
    """Trained IVF-PQ state shared between probe stages: coarse centroid
    frame, PQ codebooks, the PQ-encoded corpus, and the geometry. Built by
    :func:`ivfpq_model`; consumed by :func:`ivfpq_topk` (``model=``)."""

    __slots__ = ("cent_df", "cbs", "coded", "dsub", "m", "ksub")

    def __init__(self, cent_df, cbs, coded, dsub, m, ksub):
        self.cent_df = cent_df
        self.cbs = cbs
        self.coded = coded
        self.dsub = dsub
        self.m = m
        self.ksub = ksub


def ivfpq_model(
    corpus: DataFrame,
    nlist: int | None = 8,
    m: int = 16,
    ksub: int = 32,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iterations: int = 2,
    shard_elems: int | None = None,
    share: bool = False,
) -> IvfPqModel:
    """Train the IVF-PQ index ONCE — coarse Lloyd centroids, grid-quantized
    residuals, PQ codebooks, encoded corpus — so several probe stages (the
    s18 nprobe curve) reuse one model instead of re-training per budget
    (guide §1.2: training is the multi-job cost; probing is one bucketed
    join). Determinism makes the reuse exact: training is a pure function
    of the corpus (s5 float discipline + integer-grid residuals), so a
    shared model yields bit-identical results to per-call training.

    ``share=True`` additionally materializes the encoded corpus (lazy
    localCheckpoint) so the encode UDF pass runs once across every
    consumer; single-probe callers leave it False and stream the encode
    into their one candidate join (no second corpus-scale copy)."""
    if nlist is None:
        nlist = auto_nlist(corpus.count())
    cent_rows = _centroid_rows(
        corpus, nlist, id_col, vec_col, kmeans_iterations, shard_elems
    )
    cent_df = corpus.sparkSession.createDataFrame(
        [(cid, vec) for cid, vec in cent_rows], "cid long, centroid array<double>"
    )
    assign = _assign_fn(cent_rows, shard_elems)
    base = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        assign(F.col(vec_col)).alias("list_id"),
    )
    resid = _residualize(base, "__v", cent_df)
    # see ivfpq_topk: PQ training drives iters+1 aggregate jobs over the
    # residual frame; the checkpoint stops each from re-running the
    # assignment kernel + residual join from the scan
    resid = resid.localCheckpoint(eager=False)
    dim = len(cent_rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    cbs = pq_train(
        resid, m=m, ksub=ksub, iters=iters, id_col="vec_id", vec_col="__v", dim=dim
    )
    coded = resid.select(
        "vec_id", "list_id", _pq_assign_udf(cbs, dsub)(F.col("__v")).alias("__codes")
    )
    if share:
        coded = coded.localCheckpoint(eager=False)
    return IvfPqModel(cent_df, cbs, coded, dsub, m, ksub)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int | None = 8,
    nprobe: int = 2,
    m: int = 16,
    ksub: int = 32,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    kmeans_iterations: int = 2,
    shard_elems: int | None = None,
    model: IvfPqModel | None = None,
) -> DataFrame:
    """IVFADC — the FAISS IVF-PQ architecture, the index layout that
    actually serves billion-vector ANN: a coarse IVF quantizer routes
    every vector to one of ``nlist`` cells, PQ codebooks are trained on
    the RESIDUALS (vector minus its cell centroid — residuals are near
    zero-mean, so the same code budget buys far finer quantization than
    raw-vector PQ), and queries score codes with an ADC table built from
    their own residual against each probed cell. Composes s2's bucketing
    (candidates exist only inside probed cells — the join is IVF-
    bucketed, never all-pairs) with s14's compression (the scan payload
    is m small codes per vector).

    Returns (query_id, vec_id, adc, rnk <= k) — ADC distances in the
    2^40-scaled residual metric (ranking-equivalent; see _residualize).

    Plan shape at 100 TB: coarse training collects only nlist x dim
    doubles per Lloyd round (_centroid_rows discipline, sharded closures
    past the gate); corpus-side assignment + residual + PQ encoding all
    ride ONE scan (Arrow numpy kernels + a broadcast nlist-row join); the
    only corpus-sized exchange is the final codes-vs-probes join keyed on
    list_id, carrying (id, list_id, m codes). The query side is
    |queries| x nprobe rows of m*ksub-double tables — broadcast. Per-
    candidate scoring is m JVM element_at lookups in whole-stage codegen.

    Determinism contract: coarse centroids follow the s5 float32
    discipline; residuals are grid-quantized to integer-valued doubles
    (exact grouped sums -> deterministic PQ codebooks regardless of
    partitioning), and every distance/table term is integer arithmetic in
    double with the fixed left association — so codes, tables, and the
    final ranking are run-to-run and cluster-layout stable.

    ``model=`` supplies a pre-trained :class:`IvfPqModel` (the s18 curve
    shares one across probe budgets); geometry args (nlist/m/ksub/iters)
    are then taken from the model. PQ-training notes (the iters+1
    aggregate jobs over the checkpointed residual frame, the 100 TB
    train-on-a-sample posture) live on :func:`ivfpq_model`."""
    if model is None:
        model = ivfpq_model(
            corpus, nlist=nlist, m=m, ksub=ksub, iters=iters,
            id_col=id_col, vec_col=vec_col,
            kmeans_iterations=kmeans_iterations, shard_elems=shard_elems,
        )
    cent_df, cbs, coded = model.cent_df, model.cbs, model.coded
    dsub, m, ksub = model.dsub, model.m, model.ksub

    # queries: top-nprobe cells by cosine (same probe rule as ivf_topk),
    # then a PER-CELL residual -> per-cell ADC table
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )
    probed = q.crossJoin(F.broadcast(cent_df)).select(
        "query_id",
        "__q",
        F.col("cid"),
        F.col("centroid"),
        cosine_similarity(F.col("__q"), F.col("centroid")).alias("__cs"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__cs").desc(), F.col("cid"))
    probed = (
        probed.withColumn("__r", F.row_number().over(w_probe))
        .where(F.col("__r") <= nprobe)
        .select("query_id", F.col("cid").alias("list_id"), "__q", "centroid")
    )
    q_resid = probed.withColumn(
        "__q",
        F.zip_with(
            F.col("__q").cast("array<double>"),
            F.col("centroid"),
            lambda x, y: F.round((x - y) * float(_RESID_SCALE), 0),
        ),
    ).select(
        "query_id",
        "list_id",
        _pq_qtab_udf(cbs, dsub, ksub)(F.col("__q")).alias("__qtab"),
    )

    adc = F.element_at("__qtab", F.element_at("__codes", 1) + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            "__qtab", F.element_at("__codes", s + 1) + F.lit(s * ksub + 1)
        )
    scored = (
        coded.join(F.broadcast(q_resid), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    probe_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    **ivfpq_kwargs,
) -> DataFrame:
    """IVFADC + refine — the production composition (FAISS
    IndexIVFPQ + IndexRefineFlat): the compressed bucketed scan proposes
    k * probe_mult candidates per query, exact squared-L2 re-ranks only
    those rows (a semi-join on the id column). Returns (query_id,
    vec_id, d2, rnk <= k)."""
    cand = ivfpq_topk(
        corpus, queries, k=k * probe_mult,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        **ivfpq_kwargs,
    ).select("query_id", "vec_id")
    full = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    d2 = F.aggregate(
        F.zip_with("__cv", "__qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    # broadcast the candidate id list so the refine stage is the promised
    # semi-join — never a corpus shuffle by vec_id (r11, guide §3.1/§8)
    scored = (
        F.broadcast(cand).join(full, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def reciprocal_rank_fusion(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 5,
    c: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) of two ranked
    retrieval lists: score(d) = sum over lists of 1/(c + rank_d) — the
    standard zero-training hybrid-search combiner (lexical + vector, or
    two ANN variants). Inputs are (query_id, vec_id, rnk) frames; a doc
    absent from one list contributes nothing from it (full outer join,
    0.0 fill). Determinism: ranks are integers, each RRF score is a
    fixed-order two-term double sum (no shuffle-order float folding), and
    the final top-k breaks ties by vec_id. Scale: the join is keyed by
    (query_id, vec_id) — candidate-list-sized, never corpus-sized; the
    per-query top-k window partitions by query."""
    a = ranked_a.select("query_id", "vec_id", F.col("rnk").alias("__ra"))
    b = ranked_b.select("query_id", "vec_id", F.col("rnk").alias("__rb"))
    fused = a.join(b, ["query_id", "vec_id"], "full_outer").select(
        "query_id",
        "vec_id",
        (
            F.coalesce(1.0 / (F.lit(c) + F.col("__ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("__rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("vec_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= k)
        .select("query_id", "vec_id", F.round("rrf", 6).alias("rrf"), "fused_rank")
    )


def prefix_dim_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    prefix_dims: int = 16,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style two-stage retrieval (Kusupati et al. 2022, MRL):
    stage 1 scores the corpus by cosine over only the FIRST ``prefix_dims``
    dimensions (MRL-trained embeddings front-load information, so the
    prefix preserves neighborhood structure at a fraction of the FLOPs and
    scan bytes), keeps a per-query shortlist, and stage 2 re-ranks the
    shortlist by full-dimension cosine. At 100 TB the prefix slice is what
    stays memory-resident (prefix_dims/dim of the vector bytes — here 1/4)
    while full vectors are fetched only for |Q| x shortlist rows; the plan
    is one corpus pass + a shortlist-sized self-join back to full vectors.
    Both scoring folds are the deterministic left-to-right double fold
    (functions/columns.cosine_similarity), so an oracle replaying the same
    two stages matches bit-exactly. Returns (query_id, vec_id,
    cosine, rnk) — full-precision cosine of the re-ranked top k."""
    qp = queries.select(
        F.col("query_id"),
        F.slice(F.col(vec_col), 1, prefix_dims).alias("__qp"),
    )
    qfull = queries.select(F.col("query_id"), F.col(vec_col).alias("__qv"))
    # slice BEFORE the spread exchange: the round-robin repartition then
    # carries prefix_dims/dim of the vector bytes (here 1/4) instead of the
    # full embeddings it only needs the prefix of
    c = spread_narrow_scan(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), 1, prefix_dims).alias("__cp"),
        )
    )
    # stage 1 shuffles ONLY (query_id, vec_id, score) into the rank window
    # — full vectors never enter the corpus-sized exchange
    coarse = (
        c.crossJoin(F.broadcast(qp))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("__cp"), F.col("__qp")).alias("__coarse"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.col("__coarse").desc(), F.col("vec_id"))
    short = (
        coarse.withColumn("__crk", F.row_number().over(wc))
        .where(F.col("__crk") <= shortlist)
        .select("query_id", "vec_id")
    )
    # fetch full vectors for the |Q| x shortlist survivors only: the tiny
    # shortlist broadcasts, so the corpus side of the join stays map-side
    full = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    rer = (
        full.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def hard_negative_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-pair mining for embedding-model training: for each query
    vector, the nearest SAME-label neighbor (the positive) and the nearest
    DIFFERENT-label neighbor (the hard negative), plus the margin between
    them — the standard triplet-mining step of a retrieval fine-tune (hard
    negatives are what make in-batch-negative training converge). One
    broadcast of the query set, one corpus pass; the per-side argmax is a
    plain ``max(struct(cosine, -vec_id))`` hash aggregate, so it combines
    map-side (no per-query corpus-wide sort, unlike a ranking window) and
    the reduce exchange carries |Q| x 2 rows. Tie-break: higher cosine
    first, then LOWER vec_id (the negated id field inside the max struct).
    Contract: a query with NO same-label neighbor or NO different-label
    neighbor (single-label corpus, or a label unique to the query) emits
    no row — the pos/neg join is inner; mining requires both sides.
    Returns (query_id, pos_id, pos_cosine, neg_id, neg_cosine, margin)."""
    q = queries.select(
        F.col("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__ql"),
    )
    c = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("__cl"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id"),
            (F.col("__cl") == F.col("__ql")).alias("__same"),
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    best = scored.groupBy("query_id", "__same").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("vec_id")).alias("__nid"))).alias("__w")
    )
    pos = best.where(F.col("__same")).select(
        "query_id",
        (-F.col("__w.__nid")).cast("long").alias("pos_id"),
        F.col("__w.cosine").alias("__pc"),
    )
    neg = best.where(~F.col("__same")).select(
        "query_id",
        (-F.col("__w.__nid")).cast("long").alias("neg_id"),
        F.col("__w.cosine").alias("__nc"),
    )
    return (
        pos.join(neg, "query_id")
        .select(
            "query_id",
            "pos_id",
            F.round("__pc", 4).alias("pos_cosine"),
            "neg_id",
            F.round("__nc", 4).alias("neg_cosine"),
            F.round(F.col("__pc") - F.col("__nc"), 4).alias("margin"),
        )
        .orderBy("query_id")
    )


def filtered_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Filtered vector search: exact top-k restricted to corpus rows whose
    metadata matches the query's (label equality here — any equi-predicate
    plugs in), the "search within my category" flavor every production
    vector store exposes. The filter applies BEFORE scoring, so at 100 TB
    a selectivity-s predicate cuts the scored candidate set (and the
    cosine FLOPs) by s — with a label-partitioned corpus layout the scan
    itself prunes to the matching partitions (the q49 partition-pruning
    discipline applied to ANN). Same determinism contract as cosine_topk:
    left-fold cosine, (cosine desc, vec_id) tie order."""
    q = queries.select(
        F.col("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__ql"),
    )
    c = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("__cl"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where((F.col("vec_id") != F.col("query_id")) & (F.col("__cl") == F.col("__ql")))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )
