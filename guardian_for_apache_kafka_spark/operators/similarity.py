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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.functions.columns import cosine_similarity


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
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
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


def _centroids(corpus: DataFrame, nlist: int, id_col: str, vec_col: str) -> DataFrame:
    """Deterministic coarse centroids: mean vector of each of ``nlist`` groups
    formed by id mod nlist (a k-means iteration zero; swap in trained centroids
    for recall-critical deployments — the query plan is identical)."""
    # mean per dimension: explode positions, average, re-assemble in order
    exploded = corpus.select(
        (F.col(id_col) % nlist).alias("cid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    return (
        exploded.groupBy("cid", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: assign corpus vectors to their nearest centroid
    (broadcast join, one corpus pass), then score queries only against the
    ``nprobe`` lists whose centroids are nearest to each query."""
    cents = _centroids(corpus, nlist, id_col, vec_col)

    def nearest(df: DataFrame, idc: str, vcol: str, keep: int, out: str) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col(idc),
            F.col(vcol),
            F.col("cid"),
            cosine_similarity(F.col(vcol), F.col("centroid")).alias("__cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("__cs").desc(), F.col("cid"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= keep)
            .select(idc, vcol, F.col("cid").alias(out))
        )

    c_assigned = nearest(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")),
        "vec_id",
        "__cv",
        1,
        "list_id",
    )
    q_probes = nearest(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "query_id",
        "__qv",
        nprobe,
        "list_id",
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
