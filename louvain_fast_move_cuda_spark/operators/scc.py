"""Strongly connected components of a directed edge table.

Not in the CUDA reference (batch undirected Louvain only,
/root/reference/main.cu); added graph-decomposition surface alongside
components.py (undirected CC) / mst.py / matching.py. Semantics from
the published min-label peeling family (the "coloring" SCC of Orzan
2004 / Slota et al. 2014, simplified to the deterministic min-label
variant):

Per outer round over the REMAINING graph:

1. **Trim**: a vertex with no in-edge or no out-edge cannot sit on a
   cycle — it is its own SCC. Peel iteratively (removing a layer can
   expose the next); on real link graphs this alone resolves the long
   acyclic tail.
2. **Forward labels** F(v) = min id that reaches v: min-label flooding
   along edge direction to a fixpoint.
3. **Backward labels** B(v) = min id v reaches: the same flooding on
   the reversed edges.
4. **Peel**: F and B are constant on an SCC (anything reaching one
   member reaches all members, via the within-SCC paths), so
   F(v) == B(v) == m identifies the COMPLETE SCC whose minimum member
   is m (m reaches v and v reaches m). At least the SCC of the global
   minimum resolves every round (F == B == that minimum), so the outer
   loop strictly shrinks. Removing whole SCCs is safe: an internal
   path of a surviving SCC can never traverse a removed one (if it
   did, the two would be mutually reachable — one SCC).

Every step is DataFrame joins/aggs — semi/anti joins for the peel, a
groupBy-min plus a join per flooding round — so the plan shuffles on
vertex keys only and partial-aggregates map-side. The min-label flood
is O(diameter) rounds per fixpoint; the budget contract mirrors the
k_core peel (``max_rounds``-style caps that RAISE on truncation —
never a silently-wrong label). At 10^12 edges the outer peel count is
small (power-law link graphs resolve in a handful of rounds once the
giant SCC's minimum floods it), and each round's work shrinks with the
remaining graph.

Output contract: (id, scc) with scc = min vertex id of the component —
algorithm-independent, so DuckDB can recompute it from a recursive-CTE
transitive closure as a hard oracle on driver-sized graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release(df: DataFrame) -> None:
    """Best-effort release of a localCheckpoint's storage blocks."""
    try:
        df._jdf.rdd().unpersist(False)
    except Exception:
        pass


def _min_label_fixpoint(
    vertices: DataFrame, edges: DataFrame, max_prop: int, side: str
) -> DataFrame:
    """(id, label) with label = min vertex id having a directed path TO
    id along ``edges`` (including id itself). Synchronous min flooding;
    one join + one groupBy-min + one change-count action per round.
    Raises if the fixpoint needs more than ``max_prop`` rounds."""
    labels = vertices.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=True
    )
    for _r in range(max_prop):
        cand = (
            edges.join(
                labels.select(F.col("id").alias("src"), F.col("label").alias("sl")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("sl").alias("cl"))
        )
        new = (
            labels.join(cand.withColumnRenamed("dst", "id"), "id", "left")
            .select("id", F.least("label", F.coalesce("cl", "label")).alias("label"))
            .localCheckpoint(eager=False)
        )
        n_changed = (
            new.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        old = labels
        labels = new
        _release(old)
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"scc: {side} min-label flood did not reach a fixpoint within "
        f"max_prop={max_prop} rounds — raise the budget (graph diameter "
        "exceeds it); a truncated flood would label SCCs wrongly"
    )


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_outer: int = 20,
    max_prop: int = 60,
    checkpointer=None,
) -> DataFrame:
    """(id, scc) — scc = min vertex id of each strongly connected
    component. ``vertices``: (id long); ``edges``: directed (src, dst)
    pairs (self-loops and duplicates tolerated). Raises if the peel
    needs more than ``max_outer`` outer rounds (never returns a partial
    decomposition — the k_core truncation contract).

    ``checkpointer``: optional plans.checkpoint.VertexIterationCheckpointer
    — each outer round durably saves (id, scc, done); a fresh call
    resumes from the latest committed round. The remaining graph is
    recovered by restricting the ORIGINAL edges to not-done vertices
    (the peel only ever removes whole vertex sets, so this is exact).
    """
    spark = vertices.sparkSession
    e_all = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    v = vertices.select("id").distinct().localCheckpoint(eager=True)
    done = spark.createDataFrame([], "id long, scc long")
    start_outer = 0
    if checkpointer is not None:
        state = checkpointer.load_latest(spark)
        if state is not None:
            it, saved, metric = state
            done = saved.filter(F.col("done")).select("id", "scc").localCheckpoint(
                eager=True
            )
            v = saved.filter(~F.col("done")).select("id").localCheckpoint(eager=True)
            start_outer = it + 1
            if metric.get("n_remaining") == 0:
                return done

    for _outer in range(start_outer, max_outer):
        if v.limit(1).count() == 0:
            break
        # trim rounds: no-in or no-out vertices are singleton SCCs
        e = (
            e_all.join(v.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(v.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        for _t in range(max_prop):
            alive = (
                v.join(e.select(F.col("src").alias("id")), "id", "left_semi")
                .join(e.select(F.col("dst").alias("id")), "id", "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = v.join(alive, "id", "left_anti")
            n_trim = trimmed.count()
            if n_trim == 0:
                _release(alive)
                break
            done = done.unionByName(
                trimmed.select("id", F.col("id").alias("scc"))
            ).localCheckpoint(eager=True)
            _release(v)
            v = alive
            e = (
                e.join(v.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(v.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
        if v.limit(1).count() == 0:
            if checkpointer is not None:
                checkpointer.save(
                    _outer,
                    done.select("id", "scc", F.lit(True).alias("done")),
                    {"n_remaining": 0},
                )
            break
        fwd = _min_label_fixpoint(v, e, max_prop, "forward")
        bwd = _min_label_fixpoint(
            v,
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            max_prop,
            "backward",
        )
        peeled = (
            fwd.withColumnRenamed("label", "fl")
            .join(bwd.withColumnRenamed("label", "bl"), "id")
            .filter(F.col("fl") == F.col("bl"))
            .select("id", F.col("fl").alias("scc"))
        )
        done = done.unionByName(peeled).localCheckpoint(eager=True)
        remaining = v.join(peeled, "id", "left_anti").localCheckpoint(eager=True)
        n_remaining = remaining.count()
        _release(v)
        v = remaining
        if checkpointer is not None:
            checkpointer.save(
                _outer,
                done.select("id", "scc", F.lit(True).alias("done")).unionByName(
                    v.select(
                        "id", F.lit(None).cast("long").alias("scc"),
                        F.lit(False).alias("done"),
                    )
                ),
                {"n_remaining": int(n_remaining)},
            )
        if n_remaining == 0:
            break
    else:
        if v.limit(1).count() > 0:
            raise RuntimeError(
                f"scc: decomposition incomplete after max_outer={max_outer} "
                "rounds — raise the budget; a partial peel would be wrong"
            )
    return done
