"""Deterministic random-walk corpus generation and neighbor sampling.

Neither exists in the CUDA reference (it is Louvain-only,
/root/reference/main.cu); they extend the training-data-pipeline
surface: DeepWalk/node2vec-style walk corpora are the standard input
for skip-gram graph embeddings, and bounded per-vertex neighbor samples
are the standard minibatch input for GraphSAGE-style GNN training.

Determinism is the design center, not an afterthought. A 100 TB walk
job that cannot be re-run bit-identically cannot be checkpointed,
resumed, audited, or oracle-checked. Instead of RNG state (which is
per-task and reorder-sensitive in any distributed engine), every
"random" choice is a pure arithmetic mixer over (vertex, walk, step):

    mix(a, b, c) = ((a % 1000003) * 10007 + (b % 1000003) * 97
                    + c * 31 + salt) % 999983

All intermediates stay below ~1e10, so the expression is exact int64
arithmetic in ANY engine (no overflow, no wrap-semantics divergence —
DuckDB errors on int64 overflow where Spark non-ANSI wraps, so staying
small is what makes the side-by-side oracle possible). The mixer is a
hash for *spreading*, not cryptography; callers wanting stronger mixing
can raise ``salt`` per epoch to get decorrelated walk sets.

Choosing among X alternatives uses ``(h * X) div M`` (exact integer
floor division), NEVER ``h % X``: h is bounded by M = 999983, so a
modulo pick could reach only the first M units of a hub's range — a
hub with (biased) weighted degree above ~1e6, certain at 10^12-edge
scale, would silently never sample the tail of its adjacency, for
every walk and every salt. The rescale maps [0, M) onto [0, X) with
quantization granularity X/M (harmless for sampling); ``h * X`` stays
in int64 for X up to ~9e12 and overflows LOUDLY under ANSI mode past
that, never silently.

Scale notes (the part that matters at 10^12 edges):

* ``index_neighbors`` ranks each vertex's adjacency once with a single
  window (one shuffle by src); every walk step is then ONE equi-join
  against this static table — the standard distributed-walk shape.
  The indexed table is localCheckpointed so L steps reuse one scan.
* Each walk step joins the O(n_seeds) frontier against the adjacency —
  frontier-sized, not graph-sized, work per step.
* ``sample_neighbors`` is one window over the adjacency. On power-law
  hubs the per-src sort partition is the skew point; ``pre_thin``
  probabilistically pre-filters a hub's candidate set by the same mixer
  before ranking (keep-probability ~ 4k/expected-max-degree), bounding
  the window partition while leaving <=k semantics unchanged whenever
  the thinned set still has >= k survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.edges import GraphTables

# portable mixer constants (see module docstring)
_P = 1000003
_M = 999983


def _mix(a, b, c, salt: int):
    """Pure-arithmetic int64 mixer, identical in Spark and ANSI SQL."""
    return (
        (a % F.lit(_P)) * F.lit(10007)
        + (b % F.lit(_P)) * F.lit(97)
        + c * F.lit(31)
        + F.lit(salt)
    ) % F.lit(_M)


def index_neighbors(graph: GraphTables) -> DataFrame:
    """(src, dst, idx: 0-based rank of dst within src's adjacency,
    deg: src's unweighted degree). One window by src, materialized so
    every walk step / sample reuses it without re-shuffling."""
    w = Window.partitionBy("src").orderBy("dst")
    return (
        graph.edges.select("src", "dst")
        .withColumn("idx", F.row_number().over(w) - F.lit(1))
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .localCheckpoint(eager=True)
    )


def random_walks(
    graph: GraphTables,
    length: int = 8,
    seed_mod: int = 1,
    salt: int = 0,
    nbrs: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, step, vertex) — one deterministic walk of ``length``
    steps from every seed vertex (vid % seed_mod == 0; 1 = all).

    Step s from vertex v of walk w takes neighbor number
    (mix(v, w, s) * deg(v)) div M in dst-sorted adjacency order (the
    rescaled pick — module docstring). Walks never
    stall mid-way: the symmetric edge table has no sinks (every vertex
    with an in-edge has an out-edge, by construction in
    sources.edges.build_graph); an ISOLATED seed (in the vertex table
    but no edges) emits only its step-0 row — a stub walk, identical in
    the SQL oracle.

    ``nbrs``: optional prebuilt :func:`index_neighbors` output — pass it
    when generating several walk sets (epochs with different ``salt``)
    so the adjacency is ranked once (mirrors similarity.py's
    prebuilt-IVF-index reuse pattern).
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if nbrs is None:
        nbrs = index_neighbors(graph)
    seeds = graph.vertices.select(F.col("id").alias("vertex")).filter(
        F.col("id") % F.lit(seed_mod) == 0
    )
    cur = seeds.select(F.col("vertex").alias("walk_id"), F.lit(0).alias("step"), "vertex")
    out = [cur]
    for s in range(1, length + 1):
        pick = _mix(F.col("vertex"), F.col("walk_id"), F.lit(s), salt)
        cur = (
            cur.select("walk_id", F.col("vertex").alias("src"), pick.alias("h"))
            .join(nbrs, "src")
            .filter(F.col("idx") == F.expr(f"(h * deg) div {_M}"))
            .select("walk_id", F.lit(s).alias("step"), F.col("dst").alias("vertex"))
        )
        if s % 4 == 0:
            # truncate the L-join lineage like the superstep loops do
            cur = cur.localCheckpoint(eager=True)
        out.append(cur)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def _check_integer_weights(edges: DataFrame, caller: str) -> None:
    """One cheap existence probe; raises on fractional weights rather
    than silently truncating them (shared by every weighted walk)."""
    bad = edges.filter(F.col("weight") != F.floor("weight")).limit(1)
    if bad.count() > 0:
        raise ValueError(
            f"{caller} needs integer-valued weights "
            "(link multiplicities); found fractional weight"
        )


def index_weighted_neighbors(graph: GraphTables, check_integer: bool = True) -> DataFrame:
    """(src, dst, w_int, cum, tot) — weighted adjacency prepared for
    proportional sampling: w_int = integer edge weight, cum = exclusive
    prefix sum of w_int in dst order, tot = Σ w_int over src's edges.

    Weights must be integer-valued (they are link multiplicities by
    construction — sources.edges.canonicalize_edges sums unit links);
    integer arithmetic is what makes weight-proportional choices exact
    in every engine (no float cumsum comparisons that could tie-break
    differently at a boundary). ``check_integer`` runs one cheap
    existence probe and raises on fractional weights rather than
    silently truncating them.
    """
    if check_integer:
        _check_integer_weights(graph.edges, "index_weighted_neighbors")
    w = Window.partitionBy("src").orderBy("dst")
    return (
        graph.edges.select("src", "dst", F.col("weight").cast("long").alias("w_int"))
        .withColumn(
            "cum",
            F.coalesce(
                F.sum("w_int").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("tot", F.sum("w_int").over(Window.partitionBy("src")))
        .localCheckpoint(eager=True)
    )


def weighted_random_walks(
    graph: GraphTables,
    length: int = 8,
    seed_mod: int = 1,
    salt: int = 0,
    wnbrs: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, step, vertex) — like :func:`random_walks`, but each
    step samples a neighbor with probability PROPORTIONAL TO EDGE
    WEIGHT (the node2vec/DeepWalk convention on multigraph-derived
    weights): step s draws target = (mix(v, w, s) * tot(v)) div M and
    takes the unique neighbor whose [cum, cum + w_int) interval
    contains it — inverse-CDF sampling with the mixer as the uniform
    source, exact because every quantity is an integer (and rescaled
    rather than modulo-reduced so hubs with tot > M keep their whole
    adjacency reachable — module docstring).

    Same scale shape as the unweighted walk: one static indexed
    adjacency, one frontier-sized equi-join per step.
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if wnbrs is None:
        wnbrs = index_weighted_neighbors(graph)
    seeds = graph.vertices.select(F.col("id").alias("vertex")).filter(
        F.col("id") % F.lit(seed_mod) == 0
    )
    cur = seeds.select(F.col("vertex").alias("walk_id"), F.lit(0).alias("step"), "vertex")
    out = [cur]
    for s in range(1, length + 1):
        pick = _mix(F.col("vertex"), F.col("walk_id"), F.lit(s), salt)
        cur = (
            cur.select("walk_id", F.col("vertex").alias("src"), pick.alias("h"))
            .join(wnbrs, "src")
            .filter(
                (F.expr(f"(h * tot) div {_M}") >= F.col("cum"))
                & (F.expr(f"(h * tot) div {_M}") < F.col("cum") + F.col("w_int"))
            )
            .select("walk_id", F.lit(s).alias("step"), F.col("dst").alias("vertex"))
        )
        if s % 4 == 0:
            cur = cur.localCheckpoint(eager=True)
        out.append(cur)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_cooc) — skip-gram training pairs from a walk
    corpus (:func:`random_walks` output), the standard DeepWalk/node2vec
    embedding input: every ordered pair of vertices co-occurring within
    ``window`` steps on the same walk, counted across the corpus.

    One self-join keyed on walk_id with a bounded step-distance
    predicate + one groupBy — each walk contributes at most
    (length+1)·2·window pairs, so the join output is linear in corpus
    size, never quadratic in walk length. Directionless contexts
    (DeepWalk's convention): both (u before v) and (v before u) count
    toward (center=u, context=v).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select("walk_id", F.col("step").alias("sa"), F.col("vertex").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("sb"), F.col("vertex").alias("context"))
    d = F.col("sb") - F.col("sa")
    return (
        a.join(b, "walk_id")
        .filter((d != 0) & (F.abs(d) <= window))
        .groupBy("center", "context")
        .agg(F.count("*").alias("n_cooc"))
    )


def sample_neighbors(
    graph: GraphTables,
    k: int = 5,
    salt: int = 0,
    pre_thin: int = 0,
) -> DataFrame:
    """(src, dst, sample_rank: 1..k) — up to ``k`` neighbors per vertex,
    chosen deterministically by mixer order (ties broken by dst).

    ``pre_thin``: 0 = exact (window over the full adjacency). A value
    t > 0 keeps only neighbors with mix % t == 0 BEFORE ranking —
    the probabilistic hub-bound for power-law graphs (see module
    docstring); with thinning the per-src sample is a mixer-random
    subset and may return fewer than k rows for low-degree vertices,
    so it is a separate opt-in, never a silent fallback.
    """
    h = _mix(F.col("src"), F.col("dst"), F.lit(0), salt)
    cand = graph.edges.select("src", "dst").withColumn("h", h)
    if pre_thin > 0:
        cand = cand.filter(F.col("h") % F.lit(pre_thin) == 0)
    w = Window.partitionBy("src").orderBy("h", "dst")
    return (
        cand.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select("src", "dst", "sample_rank")
    )


def node2vec_walks(
    graph: GraphTables,
    length: int = 6,
    seed_mod: int = 1,
    salt: int = 0,
    ret_w: int = 1,
    near_w: int = 2,
    far_w: int = 4,
    adj: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, step, vertex) — SECOND-ORDER (node2vec) biased walks:
    the step out of ``cur`` depends on the previous vertex ``prev``.
    Each neighbor x of cur is weighted w(cur,x) * alpha, with integer
    bias alpha = ``ret_w`` if x == prev (node2vec's 1/p return bias),
    ``near_w`` if x is also a neighbor of prev (distance 1), ``far_w``
    otherwise (1/q exploration bias) — i.e. p = near_w/ret_w and
    q = near_w/far_w after normalization; the defaults (1, 2, 4) encode
    p=2, q=0.5, the exploration-leaning setting. All biases must be
    >= 1: a zero bias could empty a step's candidate mass entirely.

    The pick is the same exact integer inverse-CDF as
    :func:`weighted_random_walks`, but over PER-STEP cumulative sums
    (the bias depends on (prev, cur), so no static per-src prefix table
    exists — this is the structural cost of second-order walks in any
    engine). Per step: one equi-join frontier x adjacency, one
    (prev, dst) membership left-join against the same static adjacency,
    and one per-walk window over deg(cur) candidate rows (hub-degree
    partitions are the skew point, exactly as in sample_neighbors).

    Step 1 sets prev = cur: self-loops are filtered at ingest so the
    return branch cannot fire, and every candidate is a neighbor of
    prev, so the first hop degenerates to the plain weight-proportional
    step — the node2vec convention.

    ``adj``: optional prebuilt (src, dst, w_int) adjacency for reuse
    across epochs.
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if min(ret_w, near_w, far_w) < 1:
        raise ValueError("bias weights must be integers >= 1")
    if adj is None:
        _check_integer_weights(graph.edges, "node2vec_walks")
        adj = (
            graph.edges.select(
                "src", "dst", F.col("weight").cast("long").alias("w_int")
            )
            .localCheckpoint(eager=True)
        )
    pe = adj.select(
        F.col("src").alias("prev"), F.col("dst").alias("dst"), F.lit(1).alias("near")
    )
    seeds = graph.vertices.select(F.col("id").alias("vertex")).filter(
        F.col("id") % F.lit(seed_mod) == 0
    )
    cur = seeds.select(
        F.col("vertex").alias("walk_id"), F.col("vertex").alias("prev"), "vertex"
    )
    out = [cur.select("walk_id", F.lit(0).alias("step"), "vertex")]
    for s in range(1, length + 1):
        pick = _mix(F.col("vertex"), F.col("walk_id"), F.lit(s), salt)
        cand = (
            cur.select("walk_id", "prev", "vertex", pick.alias("h"))
            .join(adj, F.col("vertex") == F.col("src"))
            .drop("src")
            .join(pe, ["prev", "dst"], "left")
        )
        bw = (
            F.when(F.col("dst") == F.col("prev"), F.lit(ret_w))
            .when(F.col("near").isNotNull(), F.lit(near_w))
            .otherwise(F.lit(far_w))
            * F.col("w_int")
        )
        w = Window.partitionBy("walk_id")
        cand = (
            cand.withColumn("bw", bw)
            .withColumn(
                "cum",
                F.coalesce(
                    F.sum("bw").over(
                        w.orderBy("dst").rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .withColumn("tot", F.sum("bw").over(w))
        )
        t = F.expr(f"(h * tot) div {_M}")
        cur = (
            cand.filter((t >= F.col("cum")) & (t < F.col("cum") + F.col("bw")))
            .select("walk_id", F.col("vertex").alias("prev"), F.col("dst").alias("vertex"))
        )
        if s % 3 == 0:
            cur = cur.localCheckpoint(eager=True)
        out.append(cur.select("walk_id", F.lit(s).alias("step"), "vertex"))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
