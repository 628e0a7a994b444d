"""Modularity Q and the fast-local-move gain ΔQ as column expressions.

Formulas match the CUDA reference exactly, but in float64 throughout
(the reference scores ΔQ in float32, operatorsDelta.h:19-20, and
accumulates Q in float64, community.h:104 — we need double end-to-end
for the 1e-6 allclose target, SURVEY.md §1.4).

Conventions (directed-symmetric edge list, SURVEY.md §1.1-1.2):
* every undirected edge {a,b}, a≠b appears as (a,b) and (b,a);
* a coarse self-loop (c,c) appears once, its stored weight already the
  full intra-community directed weight (phaseAggregation.cuh:84-90);
* m = total undirected weight = Σ directed weights / 2 (graph.cu:81);
* k_v = Σ weights with src=v; Σ_tot(c) = Σ k_v over members.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def community_weights(vertices: DataFrame) -> DataFrame:
    """Σ_tot per community from vertex state (id, k, comm) — community.h:18,38."""
    return vertices.groupBy(F.col("comm")).agg(F.sum("k").alias("ctot"))


def modularity(edges_cc: DataFrame, comm_weights: DataFrame, m: float) -> float:
    """Q = W_in/(2m) − Σ_c Σ_tot(c)²/(4m²)   (community.h:104).

    ``edges_cc`` must carry current community columns ``cs``/``cd``;
    W_in sums directed weights of intra-community edges (self-loops pass
    the cs==cd predicate trivially, matching ActualNeighboorhood,
    operatorsCommunity.h:67-79).
    """
    w_in = (
        edges_cc.filter(F.col("cs") == F.col("cd"))
        .agg(F.sum("w").alias("win"))
        .collect()[0]["win"]
    )
    w_in = float(w_in) if w_in is not None else 0.0
    sq = comm_weights.agg(F.sum(F.col("ctot") * F.col("ctot")).alias("s")).collect()[0]["s"]
    sq = float(sq) if sq is not None else 0.0
    return w_in / (2.0 * m) - sq / (4.0 * m * m)


def modularity_fused(edges_cc: DataFrame, comm_weights: DataFrame, m: float) -> float:
    """Same Q as :func:`modularity` in ONE Spark action.

    The two global reductions (W_in and ΣΣ_tot²) are 1-row aggregates
    cross-joined and collected together — the Spark analogue of the
    reference overlapping its two independent reductions on two CUDA
    streams (community.h:72,88). In an iterative driver loop, halving the
    per-round action count matters more than anything inside the plan.
    """
    a = edges_cc.filter(F.col("cs") == F.col("cd")).agg(F.sum("w").alias("win"))
    b = comm_weights.agg(F.sum(F.col("ctot") * F.col("ctot")).alias("s"))
    row = a.crossJoin(b).collect()[0]
    w_in = float(row["win"]) if row["win"] is not None else 0.0
    sq = float(row["s"]) if row["s"] is not None else 0.0
    return w_in / (2.0 * m) - sq / (4.0 * m * m)


def delta_q(
    wnc: Column, selfw: Column, k: Column, ctot_a: Column, ctot_c: Column, m: float
) -> Column:
    """ΔQ(n→c) = (w(n→c) − w(n→own))/m + k_n·(Σ_tot(a) − k_n − Σ_tot(c))/(2m²).

    Matches DeltaModularitySort/Hash (operatorsDelta.h:19-20,38-39) with
    total_weight = m; float64.
    """
    return (wnc - selfw) / F.lit(m) + (
        k * (ctot_a - k - ctot_c)
    ) / F.lit(2.0 * m * m)
