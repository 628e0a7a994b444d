"""Deduplication operators for training-data pipelines over `documents`.

All pure DataFrame ops (no Python UDFs): shingles via built-in string /
array functions, MinHash via k independent xxhash64 draws reduced with
``array_min``, SimHash via per-bit majority votes, banded LSH via
groupBy on band signatures. Each stage is a groupBy/join that shuffles
on content-derived keys — uniformly distributed by construction, so no
skew handling is needed beyond AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized(text: F.Column) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text group.

    Returns (doc_id, n_dupes) for group representatives.
    """
    return (
        docs.select(F.col(id_col), _normalized(F.col(text_col)).alias("_t"))
        .groupBy("_t")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dupes"))
        .drop("_t")
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """(id, shingle_hash:long) — k-word shingles hashed to 64-bit."""
    words = F.split(_normalized(F.col(text_col)), " ")
    n = F.size(words)
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idxs, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k))))
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) from a (id, shingle) table.

    h_i(x) = xxhash64(x, seed+i); one groupBy computing all k mins at once
    (single shuffle, k tiny agg columns — not k passes).
    """
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    g = sh.groupBy("id").agg(*aggs)
    return g.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_band_buckets(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bucket) — each signature hashed to one bucket per band."""
    assert bands * rows_per_band <= 1 << 10
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    return sigs.select(
        "id", F.posexplode(F.array(*band_cols)).alias("band", "bucket")
    )


def lsh_pairs_from_buckets(banded: DataFrame) -> DataFrame:
    """Distinct pairs (id_a < id_b) sharing ≥1 (band, bucket) — a self-join
    *within buckets* only, never a full cross join."""
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: pairs (id_a < id_b) sharing ≥1 band bucket."""
    return lsh_pairs_from_buckets(minhash_band_buckets(sigs, bands, rows_per_band))


def minhash_jaccard(sigs_a: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard per candidate pair from signature agreement."""
    s1 = sigs_a.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    s2 = sigs_a.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(s1, "id_a")
        .join(s2, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x))
                / F.size("sig_a")
            ).alias("jaccard_est"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.7,
    max_shingle_df: int = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing ≥1 shingle.

    |A∩B| from a groupBy on the inverted shingle index; |A∪B| = |A|+|B|−|A∩B|.

    ``max_shingle_df``: shingles whose document frequency exceeds this cap
    are dropped from the shingle sets entirely (standard stop-phrase
    filtering). Without it one boilerplate shingle shared by 10^6 docs
    explodes the inverted-index self-join into 10^12 pairs in a single
    group — the cap bounds any group to max_shingle_df² pairs. Dropped
    from sizes AND intersections symmetrically, so the returned value is
    the exact Jaccard of the capped shingle sets (mirrored in the DuckDB
    oracle). 0 disables the cap.
    """
    sh = shingles(docs, text_col, id_col, k)
    if max_shingle_df > 0:
        # document frequency per shingle (shingles are per-doc distinct
        # already); keep only shingles rare enough to join safely
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def token_hashes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, h: long) — one xxhash64 per normalized token occurrence.

    The simhash input table, exposed separately so the (engine-specific)
    hash primitive can be materialized and the vote/fold semantics
    oracle-checked in ANSI SQL downstream.
    """
    words = F.split(_normalized(F.col(text_col)), " ")
    return docs.select(F.col(id_col).alias("id"), F.explode(words).alias("t")).select(
        "id", F.xxhash64("t").alias("h")
    )


def simhash_from_hashes(tok: DataFrame, bits: int = 64) -> DataFrame:
    """(id, simhash: long) from a (id, h) token-hash table — per-bit
    majority vote: bit_j vote = +1 if set else −1; simhash bit_j = vote>0.
    One groupBy(id) with `bits` conditional sums, then bitwise OR-fold —
    JVM-side only."""
    def mask(j: int) -> F.Column:
        # 1<<63 overflows a signed-long literal; shiftleft wraps like Java
        return F.shiftleft(F.lit(1).cast("long"), j)

    votes = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(mask(j)) != 0, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, mask(j)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return votes.select("id", sim.alias("simhash"))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(id, simhash: long) — per-bit majority vote over token hashes."""
    return simhash_from_hashes(token_hashes(docs, text_col, id_col), bits)


def embedding_near_dupes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    bands: int = 8,
    band_bits: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: BANDED random-hyperplane LSH. Each of ``bands``
    independent signature tables hashes a vector to a ``band_bits``-bit
    bucket (sign of dot with deterministic pseudo-random planes); a pair
    is a candidate iff it collides in at least one band's FULL bucket,
    then the exact cosine is verified once per distinct candidate.

    Why banded (not one fixed-width signature): with a single table the
    bucket count is constant, so bucket population — and the within-
    bucket verify self-join — grows linearly with the corpus: O(N²/2^b)
    forever. Banding keeps recall high at the target threshold
    (P[collide] = 1-(1-p^band_bits)^bands with p = 1-θ/π; defaults give
    ~0.97 at cosine 0.98) while each band's bucket width stays 2^16 —
    and growing band_bits with log N keeps bucket population O(1).
    Planes derive from xxhash64(dim, plane) — deterministic, columnwise,
    no UDF.
    """
    v = embedding_signatures(emb, id_col, vec_col, bands, band_bits, seed)
    return near_dupe_pairs_from_signatures(v, bands=bands, threshold=threshold)


def embedding_signatures(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    band_bits: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, v, nrm, s0..s{bands-1}) — per-band random-hyperplane signatures.

    Exposed separately so the (engine-specific xxhash64-derived) plane
    signs can be materialized and the band join + exact-cosine verify
    oracle-checked in ANSI SQL downstream.
    """
    dims = F.size(F.col(vec_col))

    def plane_dot(i: int) -> F.Column:
        # pseudo-random +-1 per (dimension, plane) from a hash
        prods = F.zip_with(
            F.col(vec_col),
            F.transform(F.sequence(F.lit(0), dims - 1), lambda d: F.xxhash64(d, F.lit(seed + i))),
            lambda v, h: v * F.when(F.pmod(h, F.lit(2)) == 0, 1.0).otherwise(-1.0),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    band_cols = []
    for b in range(bands):
        sig = None
        for j in range(band_bits):
            bit = F.when(plane_dot(b * band_bits + j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            sig = bit if sig is None else sig.bitwiseOR(bit)
        band_cols.append(sig.cast("long").alias(f"s{b}"))

    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("nrm"), *band_cols
    ).localCheckpoint(eager=True)


def near_dupe_pairs_from_signatures(
    v: DataFrame, bands: int = 8, threshold: float = 0.98
) -> DataFrame:
    """Band-bucket join + exact-cosine verify over a signature table."""
    banded = v.select(
        "id", F.posexplode(F.array(*[F.col(f"s{b}") for b in range(bands)])).alias("band", "bucket")
    )
    # candidates: collide on (band, bucket); distinct BEFORE the exact
    # verify so multi-band collisions cost one cosine, not `bands`
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.aggregate(
                    F.zip_with("va", "vb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
                )
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dedup_clusters(
    pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) — transitive near-duplicate
    clusters: connected components over candidate pairs (id_a, id_b),
    cluster_id = min doc id reachable; docs in no pair are their own
    singleton cluster, and the min-id doc of each cluster is canonical
    (the one a dedup pipeline would KEEP).

    Scale shape: the pairs table is tiny relative to the corpus (it is
    the output of a banded LSH join), so the component iteration runs
    over pairs only; the corpus-sized table is touched once by the
    final left join. Reuses the large-star/small-star component
    operator — no new iteration logic.
    """
    from ..sources.edges import build_graph
    from .components import connected_components

    g = build_graph(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")), relabel=False
    )
    comp = connected_components(g, local_max_edges=0).select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )
    return (
        all_ids.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias(
                "is_canonical"
            ),
        )
    )


def winnow_hashes(
    docs: DataFrame, k: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, h) — xxhash64 of every k-token span with its
    position: the input of winnowing, and the materialize-for-oracle
    seam (xxhash64 has no DuckDB twin; everything past the hashes is
    exact SQL)."""
    from .curation import doc_ngrams

    g = doc_ngrams(docs, k, text_col, id_col)
    return g.select(id_col, "pos", F.xxhash64("gram").alias("h"))


def winnow_fingerprints_from_hashes(
    hashed: DataFrame, w: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fp_hash, fp_pos) — winnowing fingerprints
    (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): from
    every window of ``w`` consecutive k-gram hashes keep the minimum,
    rightmost on ties; distinct selections are the document's
    fingerprint set. Guarantee: two docs sharing any token run of
    length >= w + k - 1 share at least one fingerprint, while only
    ~2/(w+1) of all grams are kept — the density/recall dial of
    large-scale substring dedup.

    Scale: ONE shuffle on doc_id serves both windows (per-doc gram
    count + the ordered w-frame struct-min); selection is a JVM
    lexicographic min of (h, -pos), then a distinct bounded by the
    fingerprint density. No pairwise work; matching docs later is a
    groupBy/join on fp_hash (same shape as the LSH bucket join).
    """
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    whole = Window.partitionBy(id_col)
    sel = F.min(
        F.struct(F.col("h").alias("mh"), (-F.col("pos")).alias("np"))
    ).over(frame)
    # only full windows select (start <= n-w); docs with fewer than w
    # grams winnow their single truncated window at start 0
    return (
        hashed.withColumn("_sel", sel)
        .withColumn("_n", F.count("*").over(whole))
        .filter(F.col("pos") <= F.greatest(F.col("_n") - w, F.lit(0)))
        .select(
            id_col,
            F.col("_sel.mh").alias("fp_hash"),
            (-F.col("_sel.np")).cast("int").alias("fp_pos"),
        )
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Convenience: winnow_hashes |> winnow_fingerprints_from_hashes."""
    return winnow_fingerprints_from_hashes(
        winnow_hashes(docs, k, text_col, id_col), w, id_col
    )


def simhash_bands(sims: DataFrame, bands: int = 8, bits: int = 64) -> DataFrame:
    """(id, band, bucket) — the simhash split into ``bands`` contiguous
    bit-bands; bucket = ``simhash & band_mask`` (a plain AND on the
    signed two's-complement value — portable to any engine, no unsigned
    shifts needed)."""
    w = bits // bands
    if w * bands != bits:
        raise ValueError(f"bands={bands} must divide bits={bits}")
    cols = []
    for j in range(bands):
        mask = ((1 << w) - 1) << (j * w)
        if mask >= 1 << 63:
            mask -= 1 << 64  # signed 64-bit literal
        cols.append(F.col("simhash").bitwiseAND(F.lit(mask)).alias(f"b{j}"))
    return sims.select("id", F.posexplode(F.array(*cols)).alias("band", "bucket"))


def simhash_near_dupes(
    sims: DataFrame, bands: int = 8, bits: int = 64, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs of docs whose simhashes differ in at
    most ``max_hamming`` bits, found WITHOUT an all-pairs join.

    Banded exact-Hamming search, not an approximation: a pair at
    distance d touches at most d bands, so for d <= bands - 1 at least
    one band is untouched (pigeonhole) and the pair collides in that
    band's bucket — recall is exactly 1 for ``max_hamming < bands``.
    Cost is the within-bucket self-join only; simhash buckets are
    content-hash-distributed, so bucket sizes concentrate near
    N / 2**(bits/bands) per band.
    """
    if max_hamming >= bands:
        # a bare assert would vanish under python -O and silently lose
        # the recall-1 guarantee — this must be a hard error
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming ({max_hamming}) < bands ({bands})"
        )
    pairs = lsh_pairs_from_buckets(simhash_bands(sims, bands, bits))
    a = sims.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sims.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_by_source(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_distinct, n_dup_docs, dup_rate_r9) — per-source
    exact-duplicate pressure: how much of each source is byte-identical
    (after the shared normalization) to another doc OF THE SAME SOURCE.
    The corpus-health rollup a curation pipeline watches per crawl
    snapshot; rate = 1 - distinct/docs, one exact-int division.

    One groupBy over (source, normalized-text) then a per-source count —
    two shuffles on small keys, the text never leaves the first
    aggregation.
    """
    per_text = (
        docs.select("source", _normalized(F.col("text")).alias("_t"))
        .groupBy("source", "_t")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count("*").alias("n_distinct"),
            (F.sum("c") - F.count("*")).alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            "n_dup_docs",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_docs"), 9
            ).alias("dup_rate_r9"),
        )
    )


def source_overlap(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(source_a, source_b, n_pairs) — the cross-source near-duplicate
    contamination matrix: how many LSH candidate pairs join documents
    of each (unordered) source pair. The per-snapshot answer to "which
    crawls copy from each other" — a spike off the diagonal means one
    source republishes another's content, and the diagonal recovers
    per-source internal duplication.

    ``pairs``: (id_a, id_b) candidate pairs (minhash_lsh / simhash /
    embedding — any near-dup surface). Two broadcast-size joins against
    the (doc_id, source) dim; sources ordered lexically so each
    unordered pair counts once. Exact integers only.
    """
    src = docs.select(F.col("doc_id"), F.col("source"))
    j = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")), "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return j.groupBy("source_a", "source_b").agg(F.count("*").alias("n_pairs"))


def winnow_pairs(
    fps: DataFrame, min_shared: int = 2, max_hash_df: int = 10000
) -> DataFrame:
    """(id_a, id_b, n_shared) — candidate near-dup pairs sharing at
    least ``min_shared`` distinct winnowing fingerprints: the matching
    stage of MOSS, completing the winnow_fingerprints surface. By the
    SWA guarantee, docs sharing a token run of length >= w + k - 1
    share a fingerprint — so min_shared=2 demands two independent
    shared runs (or one long one), the standard false-positive damper.

    ``max_hash_df`` drops fingerprints appearing in more docs (the
    rare-shingle prefilter of ngram_jaccard): a boilerplate fingerprint
    shared by 10^6 docs would otherwise explode the bucket self-join
    quadratically. The cap is semantic and mirrored by the oracle.
    """
    d = fps.select("doc_id", "fp_hash").distinct()
    rare = (
        d.groupBy("fp_hash")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_hash_df)
        .select("fp_hash")
    )
    dd = d.join(rare, "fp_hash", "left_semi")
    return (
        dd.alias("x")
        .join(dd.alias("y"), "fp_hash")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
