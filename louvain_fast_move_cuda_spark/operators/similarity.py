"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k (exact) — a broadcast join of the
query set against the corpus with the dot product computed by built-in
higher-order array functions (zip_with/aggregate, JVM-side).

Scale path: IVF-style partitioning — assign every vector to its nearest
of C centroids (chosen deterministically from the data), then search only
vectors sharing the query's `nprobe` nearest centroids. Both paths return
the same schema so callers can switch by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine.

    Queries are broadcast (the small side); the corpus streams through a
    single stage. Ranking uses one window partitioned by query — the
    post-join row count is |Q|·|corpus| before the rank filter, so keep
    |Q| bounded (that is the point of the IVF variant below).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(F.col(vec_col)).alias("qn")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), _norm(F.col(vec_col)).alias("cn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_to_centroids(corpus_iv: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax-cosine assignment of (id, vec) rows to broadcast centroids."""
    scored = (
        corpus_iv.crossJoin(F.broadcast(cents))
        .select(
            "id", "vec", "cid",
            (_dot(F.col("vec"), F.col("cv")) / (_norm(F.col("vec")) * _norm(F.col("cv")))).alias("sim"),
        )
    )
    ww = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") == 1)
        .select("id", "vec", "cid")
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: hash-seeded centroids refined by
    ``kmeans_iters`` Lloyd iterations (spherical k-means: assign by
    cosine, recenter on the per-cluster mean — cosine normalizes, so the
    mean direction is the spherical centroid). Assignment = argmax cosine
    to a centroid (broadcast join, no shuffle of the corpus); each Lloyd
    recenter is ONE map-side-combinable groupBy(cid) producing C rows.

    Seeds: hash-order oversample of 4C candidate vectors (distributed
    top-4C — ``orderBy().limit()`` compiles to TakeOrderedAndProject:
    per-partition top-k then a 4C-row merge on the driver, NOT a global
    single-partition window), thinned to C by farthest-first traversal
    on the driver (greedy max-min cosine distance — the k-means++ idea,
    deterministic). Plain hash seeds can land two seeds in one cluster
    and none in another, merging cells that Lloyd alone can never split;
    farthest-first spreads them, and the Lloyd iterations then pull them
    onto the actual cluster means.

    Returns (centroids(cid, cv), assigned(id, vec, cid)).
    """
    spark = corpus.sparkSession
    top = (
        corpus.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000_007)).alias("_h"),
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("cv"),
        )
        .orderBy("_h", "_id")
        .limit(4 * n_centroids)
        .collect()
    )
    if len(top) > n_centroids:
        import numpy as np

        cand = np.asarray([r["cv"] for r in top], dtype=np.float64)
        nrm = np.linalg.norm(cand, axis=1)
        nrm[nrm == 0] = 1.0
        unit = cand / nrm[:, None]
        picked = [0]  # first hash-order candidate anchors the traversal
        # min cosine-similarity to any picked seed, per candidate
        best_sim = unit @ unit[0]
        for _ in range(n_centroids - 1):
            nxt = int(np.argmin(best_sim))  # farthest from the picked set
            picked.append(nxt)
            best_sim = np.maximum(best_sim, unit @ unit[nxt])
        top = [top[i] for i in picked]
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    cents = spark.createDataFrame(
        [(i, r["cv"]) for i, r in enumerate(top)], schema=f"cid int, cv {vec_type}"
    )
    corpus_iv = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if kmeans_iters > 0:
        dims = len(top[0]["cv"]) if top else 0
        for _ in range(kmeans_iters):
            assigned = _assign_to_centroids(corpus_iv, cents)
            # per-cluster elementwise mean: one groupBy(cid) with `dims`
            # avg columns (partial+final HashAggregate) -> C tiny rows
            means = (
                assigned.groupBy("cid")
                .agg(*[F.avg(F.element_at("vec", d + 1)).alias(f"d{d}") for d in range(dims)])
                .collect()
            )
            by_cid = {r["cid"]: [r[f"d{d}"] for d in range(dims)] for r in means}
            # empty clusters keep their previous centroid (standard Lloyd)
            prev = {r["cid"]: r["cv"] for r in cents.collect()}
            cents = spark.createDataFrame(
                [(i, by_cid.get(i, prev[i])) for i in sorted(prev)],
                schema=f"cid int, cv {vec_type}",
            )
    assigned = _assign_to_centroids(corpus_iv, cents)
    return cents, assigned


def ivf_probes(
    cents: DataFrame,
    queries: DataFrame,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, qv, cid) — each query's `nprobe` nearest centroid cells."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_probe = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qv", "cid",
            (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        q_probe.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cid")
    )


def topk_within_cells(assigned: DataFrame, probes: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k restricted to each query's probed cells."""
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            (_dot(F.col("qv"), F.col("vec")) / (_norm(F.col("qv")) * _norm(F.col("vec")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> DataFrame:
    """Approximate top-k: search only the query's `nprobe` nearest centroid
    partitions. Same output schema as brute_force_topk."""
    cents, assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, kmeans_iters)
    probes = ivf_probes(cents, queries, nprobe, id_col, vec_col)
    return topk_within_cells(assigned, probes, k)
