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


# ---------------------------------------------------------------------------
# Arrow scoring kernels (guide §4.2): the pair-scoring hot loops hand whole
# Arrow batches to NumPy instead of evaluating interpreted higher-order
# array functions per pair. Bit-compatibility is load-bearing — the declared
# ANN queries are oracle-checked — so the kernels reproduce the EXACT float64
# operation sequence of the `_dot`/`_norm` expressions above:
#   _dot  = left fold  acc := acc + a_d * b_d   over dims, acc0 = 0.0
#   _norm = sqrt(left fold acc := acc + x_d * x_d)
# The per-dim python loop below performs the same sequence per row
# (vectorized ACROSS rows, sequential ACROSS dims), so every cosine is the
# identical double the JVM expression produced.
# ---------------------------------------------------------------------------


def _fold_dot(q_row, C):
    """Exact-fold dot of one query vector against row matrix C (n, d)."""
    import numpy as np

    acc = np.zeros(C.shape[0], dtype=np.float64)
    for d in range(C.shape[1]):
        acc += q_row[d] * C[:, d]
    return acc


def _fold_norm(C):
    """Exact-fold L2 norm per row of C (n, d)."""
    import numpy as np

    acc = np.zeros(C.shape[0], dtype=np.float64)
    for d in range(C.shape[1]):
        acc += C[:, d] * C[:, d]
    return np.sqrt(acc)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine.

    The bounded query set rides with the scoring kernel (same bytes the
    old broadcast cross join shipped — a broadcast is a driver collect +
    re-ship); the corpus streams through a single mapInPandas stage that
    scores whole Arrow batches in NumPy with `_fold_dot`/`_fold_norm`
    (bit-identical cosines to the `_dot`/`_norm` expressions — guide
    §4.2). Ranking uses one window partitioned by query — the pair count
    is |Q|·|corpus| before the rank filter, so keep |Q| bounded (that is
    the point of the IVF variant below).
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    idt = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {idt}, neighbor_id {idt}, cosine double"
    q_rows = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")).collect()
    if not q_rows:
        return spark.createDataFrame([], f"{out_schema}, rank int")
    qids = [r["qid"] for r in q_rows]
    Q = np.asarray([list(r["qv"]) for r in q_rows], dtype=np.float64)
    qn = _fold_norm(Q)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col]
            C = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            cn = _fold_norm(C)
            for j, qid in enumerate(qids):
                cos = _fold_dot(Q[j], C) / (qn[j] * cn)
                mask = (ids != qid).to_numpy()
                if not mask.any():
                    continue
                yield pd.DataFrame(
                    {
                        "query_id": [qid] * int(mask.sum()),
                        "neighbor_id": ids[mask].tolist(),
                        "cosine": cos[mask],
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_to_centroids(corpus_iv: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax-cosine assignment of (id, vec) rows to the centroid set.

    One mapInPandas pass over the corpus with the (bounded, C-row)
    centroid table carried into the kernel — no |corpus|·C pair rows
    materialize, no per-id ranking shuffle (the old plan's window
    repartitioned the pair table by id). Scoring is `_fold_dot`/
    `_fold_norm` (bit-identical sims); the argmax reproduces the window
    rule (sim DESC with NaN largest, ties → lowest cid) exactly:
    NumPy's argmax keeps the first (= lowest-cid) occurrence, and rows
    containing NaN pick their first NaN column, matching Spark's
    NaN-sorts-largest ordering."""
    import numpy as np

    idt = corpus_iv.schema["id"].dataType.simpleString()
    vt = corpus_iv.schema["vec"].dataType.simpleString()
    cent_rows = cents.orderBy("cid").collect()
    cids = np.asarray([r["cid"] for r in cent_rows], dtype=np.int64)
    Ce = np.asarray([list(r["cv"]) for r in cent_rows], dtype=np.float64)
    cn = _fold_norm(Ce)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
            vn = _fold_norm(C)
            S = np.empty((len(pdf), len(cids)), dtype=np.float64)
            for c in range(len(cids)):
                S[:, c] = _fold_dot(Ce[c], C) / (vn * cn[c])
            nanmask = np.isnan(S)
            has_nan = nanmask.any(axis=1)
            best = np.where(
                has_nan,
                np.argmax(nanmask, axis=1),
                np.argmax(np.where(nanmask, -np.inf, S), axis=1),
            )
            out = pdf[["id", "vec"]].copy()
            out["cid"] = cids[best].astype("int32")
            yield out

    return corpus_iv.select("id", "vec").mapInPandas(
        assign, schema=f"id {idt}, vec {vt}, cid int"
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
    train_max: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: hash-sampled training set, farthest-first
    seeds, ``kmeans_iters`` Lloyd iterations (spherical k-means: assign
    by cosine, recenter on the per-cluster mean), then ONE full-corpus
    assignment (argmax cosine against the broadcast centroids — no
    shuffle of the corpus).

    Cost shape (the 100 TB property): Lloyd refinement runs on a
    deterministic hash-ordered sample of ``train_max`` vectors held on
    the driver — O(train_max · C · iters) NumPy work independent of
    corpus size — so the corpus itself is scanned exactly TWICE: once by
    the sampling top-k (TakeOrderedAndProject: per-partition top-k, then
    a train_max-row driver merge — scan-only, no shuffle) and once by
    the final assignment. (Previously each Lloyd iteration re-assigned
    the full corpus: kmeans_iters+1 corpus×centroid passes.)

    Seeds: the sample's first 4C hash-order rows thinned to C by
    farthest-first traversal (greedy max-min cosine distance — the
    k-means++ idea, deterministic). Plain hash seeds can land two seeds
    in one cluster and none in another, merging cells that Lloyd alone
    can never split; farthest-first spreads them, and the Lloyd
    iterations then pull them onto the actual cluster means.

    Returns (centroids(cid, cv), assigned(id, vec, cid)).
    """
    import numpy as np

    spark = corpus.sparkSession
    sample = (
        corpus.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000_007)).alias("_h"),
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("cv"),
        )
        .orderBy("_h", "_id")
        .limit(max(train_max, 4 * n_centroids))
        .collect()
    )
    top = sample[: 4 * n_centroids]
    if len(top) > n_centroids:
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
        seeds = [top[i]["cv"] for i in picked]
    else:
        seeds = [r["cv"] for r in top]
    cents_np = np.asarray([list(v) for v in seeds], dtype=np.float64)
    if kmeans_iters > 0 and len(sample) and len(seeds) > 1:
        train = np.asarray([list(r["cv"]) for r in sample], dtype=np.float64)
        tn = np.linalg.norm(train, axis=1)
        tn[tn == 0] = 1.0
        t_unit = train / tn[:, None]
        for _ in range(kmeans_iters):
            cn = np.linalg.norm(cents_np, axis=1)
            cn[cn == 0] = 1.0
            # argmax over cosine; np.argmax keeps the FIRST max — the
            # same deterministic first-max rule as _assign_to_centroids'
            # (sim desc, cid asc). (Not bit-identical tie-breaking: the
            # float association differs — unit @ unit here vs
            # dot/(|v|*|c|) there — so an exact tie can land elsewhere;
            # harmless for training, which only needs determinism.)
            assign = np.argmax(t_unit @ (cents_np / cn[:, None]).T, axis=1)
            for c in range(len(cents_np)):
                members = train[assign == c]
                if len(members):  # empty cluster keeps its previous centroid
                    cents_np[c] = members.mean(axis=0)
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    cents = spark.createDataFrame(
        [(i, [float(x) for x in cv]) for i, cv in enumerate(cents_np)],
        schema=f"cid int, cv {vec_type}",
    )
    corpus_iv = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    assigned = _assign_to_centroids(corpus_iv, cents)
    return cents, assigned


def ivf_probes(
    cents: DataFrame,
    queries: DataFrame,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, qv, cid) — each query's `nprobe` nearest centroid cells.

    ``nprobe=None`` scales SUBLINEARLY with the index: ceil(sqrt(C)),
    min 1 — the probe count must track the cell count (a fixed nprobe=4
    decays as C grows) without erasing IVF's cost advantage (the
    round-3 C/2 default scanned half the corpus per query). Search cost
    is ~nprobe/C of brute force; measured recall@10 at C=16 (BENCH.md):
    sqrt default (4 probes) = 1.00 on clustered embeddings (IVF's
    intended regime) and 0.55 on uniform-random ones (the no-structure
    worst case); half-the-cells (8 probes) = 0.80 uniform. Callers on
    unclustered data should pass nprobe explicitly — recall there is
    bought linearly with probes, and brute_force_topk is usually the
    better tool.
    """
    if nprobe is None:
        import math

        nprobe = max(1, math.isqrt(cents.count() - 1) + 1)  # ceil(sqrt(C))
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
    """Exact cosine top-k restricted to each query's probed cells.

    The probe table (|Q|·nprobe rows — bounded) rides into a mapInPandas
    kernel over the assigned corpus, replacing the broadcast join whose
    pair rows each re-evaluated both interpreted norms; scoring is
    `_fold_dot`/`_fold_norm`, bit-identical to the old expressions
    (the per-pair `_norm` re-evaluations always produced the same
    double, so hoisting them per row/probe is exact)."""
    import numpy as np
    import pandas as pd

    spark = assigned.sparkSession
    idt = assigned.schema["id"].dataType.simpleString()
    out_schema = f"query_id {idt}, neighbor_id {idt}, cosine double"
    probe_rows = probes.collect()
    if not probe_rows:
        return spark.createDataFrame([], f"{out_schema}, rank int")
    by_cid: dict = {}
    for r in probe_rows:
        q = np.asarray(list(r["qv"]), dtype=np.float64)
        by_cid.setdefault(r["cid"], []).append(
            (r["query_id"], q, float(_fold_norm(q[None, :])[0]))
        )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for cid, sub in pdf.groupby("cid", sort=False):
                plist = by_cid.get(cid)
                if not plist:
                    continue
                ids = sub["id"]
                C = np.asarray(sub["vec"].tolist(), dtype=np.float64)
                cn = _fold_norm(C)
                for qid, qv, qn in plist:
                    cos = _fold_dot(qv, C) / (qn * cn)
                    mask = (ids != qid).to_numpy()
                    if not mask.any():
                        continue
                    yield pd.DataFrame(
                        {
                            "query_id": [qid] * int(mask.sum()),
                            "neighbor_id": ids[mask].tolist(),
                            "cosine": cos[mask],
                        }
                    )

    scored = assigned.select("id", "vec", "cid").mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
    train_max: int = 4096,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k: search only the query's `nprobe` nearest centroid
    partitions (default nprobe = ceil(sqrt(n_centroids)) — see
    ivf_probes for the measured recall/cost trade). Same output schema
    as brute_force_topk.

    ``index``: a prebuilt ``(centroids, assigned)`` pair from
    :func:`ivf_assign` — REQUIRED for repeated query batches against one
    corpus, otherwise every call re-trains and re-assigns (two full
    corpus scans per call). Persist/checkpoint ``assigned`` before
    reuse so the scans actually amortize:

        cents, assigned = ivf_assign(corpus, n_centroids=256)
        assigned = assigned.localCheckpoint(eager=True)  # or write out
        for qs in query_batches:
            ivf_topk(corpus, qs, index=(cents, assigned))
    """
    if index is not None:
        # nprobe=None falls through to ivf_probes, which derives the
        # sqrt default from the INDEX's actual cell count (n_centroids
        # describes only a to-be-built index)
        cents, assigned = index
    else:
        if nprobe is None:
            import math

            nprobe = max(1, math.isqrt(n_centroids - 1) + 1)  # ceil(sqrt(C))
        cents, assigned = ivf_assign(
            corpus, n_centroids, id_col, vec_col, kmeans_iters, train_max
        )
    probes = ivf_probes(cents, queries, nprobe, id_col, vec_col)
    return topk_within_cells(assigned, probes, k)


def knn_label_predict(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, true_label, pred_label, n_votes, correct) — k-NN
    majority-vote classification of each query against the labeled
    corpus: the standard embedding-quality probe (kNN accuracy) run
    directly inside the engine. Prediction = most common label among
    the k nearest-by-cosine neighbors (self excluded), ties broken by
    lowest label; every output column is an integer, so the driver
    check is exact.

    Scale: rides brute_force_topk's broadcast-queries/streamed-corpus
    plan — keep |Q| bounded (it is the evaluation sample, not the
    corpus); swap in ivf_topk's candidate set for corpus-sized query
    loads.
    """
    nb = brute_force_topk(corpus, queries, k, id_col, vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nb_label")
    )
    votes = (
        nb.join(labels, "neighbor_id")
        .groupBy("query_id", "nb_label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("nb_label")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nb_label").alias("pred_label"), "n_votes")
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return truth.join(pred, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "n_votes",
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("correct"),
    )


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embeddings, then mark a vector a SEMANTIC DUPLICATE if some
    lower-id member of its own cluster has cosine >= threshold to it —
    dup_of = the smallest such member (the kept representative), so
    keep-one-per-group falls out of the deterministic id order exactly
    like exact_dedup's first-seen rule.

    Returns (centroids(cid, cv), result(vec_id, cid, is_dupe, dup_of)).

    Scale shape: the expensive all-pairs cosine never happens — the
    pairwise join runs WITHIN clusters only (one shuffle of the
    assignment table on cid, cells bounded by n_centroids's growth with
    the corpus — SemDeDup's own design). The centroid training is
    driver-side on a fixed-size hash sample (ivf_assign), the corpus is
    scanned twice, and the within-cell join is quadratic only in cell
    size. The centroids materialize as the bridged artifact; everything
    downstream (assignment argmax, within-cell cosines, the dup rule)
    is exact ANSI-SQL-checkable arithmetic.
    """
    import numpy as np
    import pandas as pd

    cents, assigned = ivf_assign(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    nrm = F.sqrt(
        F.aggregate(F.transform("vec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    a = assigned.select("id", "cid", "vec", nrm.alias("nrm")).localCheckpoint(
        eager=True
    )
    idt = a.schema["id"].dataType.simpleString()
    thr = float(threshold)

    # Per-cell Arrow kernel (guide §4.2): ONE shuffle of the assignment
    # table on cid and the quadratic pair scoring happens in-kernel —
    # the old plan materialized every within-cell pair row (two vectors
    # per row) through a self-join, re-shuffled the pairs for the min
    # aggregate, and joined the verdicts back. Cosines are bit-identical:
    # the dim loop reproduces the zip_with/aggregate fold sequence per
    # pair (see _fold_dot), the denominator is the same nrm_x*nrm_y
    # product of the JVM-computed norms, and the NaN disjunct replicates
    # Spark's NaN-is-largest comparison (NaN >= threshold is TRUE there).
    def cell_dupes(pdf):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        ids = pdf["id"].to_numpy()
        dup_of = np.full(n, -1, dtype=np.int64)
        if n > 1:
            V = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
            nr = pdf["nrm"].to_numpy()
            # column blocks bound peak memory at n*block doubles; the
            # per-pair op sequence is block-invariant
            block = 2048
            for j0 in range(0, n, block):
                j1 = min(j0 + block, n)
                S = np.zeros((n, j1 - j0), dtype=np.float64)
                for d in range(V.shape[1]):
                    col = V[:, d]
                    S += np.outer(col, col[j0:j1])
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = S / np.outer(nr, nr[j0:j1])
                hit = (cos >= thr) | np.isnan(cos)
                # keep i < j (id order) only
                rows = np.arange(n)[:, None]
                hit &= rows < np.arange(j0, j1)[None, :]
                any_hit = hit.any(axis=0)
                first = np.argmax(hit, axis=0)
                tgt = np.arange(j0, j1)[any_hit]
                dup_of[tgt] = ids[first[any_hit]]
        return pd.DataFrame(
            {
                "id": ids,
                "cid": pdf["cid"],
                "dup_of": pd.array(
                    [None if d < 0 else int(d) for d in dup_of], dtype="Int64"
                ),
            }
        )

    verdicts = a.groupBy("cid").applyInPandas(
        cell_dupes, schema=f"id {idt}, cid int, dup_of long"
    )
    out = verdicts.select(
        F.col("id").alias(id_col),
        "cid",
        F.col("dup_of").isNotNull().alias("is_dupe"),
        "dup_of",
    )
    return cents, out


def embedding_norm_quantiles(
    emb: DataFrame, quantiles: tuple = (25, 50, 75, 90, 99)
) -> DataFrame:
    """(q, n, norm) — EXACT type-1 quantiles of the L2 embedding norms:
    the one-glance ANN-hygiene check (norm collapse -> cosine loses
    discrimination; wild norm spread -> dot-product retrieval skews to
    long vectors).

    Norms use the same per-row left-fold sum-of-squares expression the
    cosine scorers use (row-local, deterministic in any engine); the
    selected order statistics are raw doubles passed through untouched
    with (norm, vec_id) rank tie-breaks — never percentile_approx.
    """
    from pyspark.sql import Window

    v = emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("norm"),
    )
    w = Window.orderBy("norm", "vec_id")
    ranked = v.withColumn("rn", F.row_number().over(w))
    n = v.agg(F.count("*").alias("n"))
    qdf = emb.sparkSession.createDataFrame([(int(q),) for q in quantiles], "q int")
    targets = qdf.crossJoin(F.broadcast(n)).select(
        "q",
        "n",
        F.greatest(
            F.lit(1), F.ceil(F.col("q") / 100.0 * F.col("n")).cast("long")
        ).alias("rn"),
    )
    return targets.join(ranked.select("rn", "norm"), "rn").select("q", "n", "norm")
