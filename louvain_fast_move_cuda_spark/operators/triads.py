"""Directed triad census (Holland-Leinhardt 16 types) over raw link pairs.

The motif census one step past reciprocity/quad_census: every unordered
vertex triple of the DIRECTED transcript link graph (reply + tool
chains, pre-canonicalization — the same `rawpairs` surface reciprocity
and directed PageRank read) is classified into one of the 16 triad
isomorphism classes (003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201,
120D/U/C, 210, 300 — igraph naming convention).

Method (the MapReduce-census decomposition — enumerate only CONNECTED
structure, derive the astronomically-many sparse types by subtraction):

* dyad pass — each unordered pair {x<y} gets a 2-bit code
  (1 = x->y only, 2 = y->x only, 3 = mutual); one groupBy.
* wedge pass — unordered triples with >= 2 connected dyads are
  enumerated once per connected-dyad pair sharing a vertex, deduped to
  (i < j < k), then the three dyad codes are fetched with three
  broadcast-eligible joins and folded into a 6-bit pattern
  ``c_ij + 4*c_ik + 16*c_jk``; a precomputed 64-entry lookup maps the
  pattern to its isomorphism class (generated at import by brute force
  over all 6 node permutations — no hand-written case table to get
  wrong, and the SAME constant feeds the DuckDB oracle literal).
* subtraction pass — exact integer identities close the census without
  touching the O(n^3) disconnected mass::

      n_012 = A*(n-2) - (asym dyads inside enumerated triples)
      n_102 = M*(n-2) - (mutual dyads inside enumerated triples)
      n_003 = C(n,3)  - (all other 15 counts)

  where A/M are the asymmetric/mutual dyad counts and every term is
  int64 (C(n,3) <= 1.7e14 at 100k vertices — far inside BIGINT).

Scale: the wedge pass is sum(deg_u(v)^2) over undirected support
degrees — linear on the chain-like transcript graph, quadratic through
a hub; ``max_center_degree`` drops high-degree wedge centers (result
then UNDERCOUNTS triads through them — quad_census's explicit-cap
philosophy). All counts are exact integers end to end: any engine,
any shuffle order, same census.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F

# Representative edge lists on nodes {0,1,2}, igraph triad_census
# convention (A=0, B=1, C=2): e.g. 021D = "A<-B->C", 030C = "A<-B<-C,
# A->C".  Patterns encode bit0=0->1, bit1=1->0, bit2=0->2, bit3=2->0,
# bit4=1->2, bit5=2->1 == c01 + 4*c02 + 16*c12 for 2-bit dyad codes.
_REPS = {
    "003": (),
    "012": ((0, 1),),
    "102": ((0, 1), (1, 0)),
    "021D": ((1, 0), (1, 2)),
    "021U": ((0, 1), (2, 1)),
    "021C": ((0, 1), (1, 2)),
    "111D": ((0, 1), (1, 0), (2, 1)),
    "111U": ((0, 1), (1, 0), (1, 2)),
    "030T": ((0, 1), (2, 1), (0, 2)),
    "030C": ((1, 0), (2, 1), (0, 2)),
    "201": ((0, 1), (1, 0), (1, 2), (2, 1)),
    "120D": ((1, 0), (1, 2), (0, 2), (2, 0)),
    "120U": ((0, 1), (2, 1), (0, 2), (2, 0)),
    "120C": ((0, 1), (1, 2), (0, 2), (2, 0)),
    "210": ((0, 1), (1, 2), (2, 1), (0, 2), (2, 0)),
    "300": ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)),
}

_BIT = {(0, 1): 1, (1, 0): 2, (0, 2): 4, (2, 0): 8, (1, 2): 16, (2, 1): 32}

TRIAD_TYPES = list(_REPS)  # canonical 16-type ordering for outputs


def _pattern(edges) -> int:
    return sum(_BIT[e] for e in edges)


def _build_lookup() -> list:
    """64-entry pattern -> type name, by brute-force isomorphism."""
    lookup = [None] * 64
    for name, rep in _REPS.items():
        for perm in itertools.permutations(range(3)):
            p = _pattern(tuple((perm[a], perm[b]) for a, b in rep))
            assert lookup[p] in (None, name), (p, lookup[p], name)
            lookup[p] = name
    assert all(v is not None for v in lookup)
    return lookup


TRIAD_LOOKUP = _build_lookup()


def triad_census(
    raw_pairs: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """(triad_type, n) — 16 rows, the full directed triad census.

    ``raw_pairs``: directed (a, b) links (duplicates fine — deduped
    here; self-loops dropped). Vertex universe = endpoints of the
    deduped link set, matching reciprocity/directed-PageRank.
    """
    spark = raw_pairs.sparkSession
    dd = (
        raw_pairs.filter(F.col("a") != F.col("b")).select("a", "b").distinct()
    )
    # 2-bit dyad codes on canonical x < y pairs
    u = (
        dd.select(
            F.least("a", "b").alias("x"),
            F.greatest("a", "b").alias("y"),
            F.when(F.col("a") < F.col("b"), 1).otherwise(0).alias("f"),
            F.when(F.col("a") > F.col("b"), 1).otherwise(0).alias("r"),
        )
        .groupBy("x", "y")
        .agg((F.max("f") + 2 * F.max("r")).alias("code"))
    )
    verts = dd.select(F.col("a").alias("v")).unionByName(
        dd.select(F.col("b").alias("v"))
    ).distinct()

    adj = u.select(F.col("x").alias("v"), F.col("y").alias("w")).unionByName(
        u.select(F.col("y").alias("v"), F.col("x").alias("w"))
    )
    if max_center_degree is not None:
        cdeg = adj.groupBy("v").agg(F.count("*").alias("d"))
        adj = adj.join(
            cdeg.filter(F.col("d") <= max_center_degree).select("v"),
            "v",
            "left_semi",
        )
    a2 = adj.select(F.col("v"), F.col("w").alias("w2"))
    triples = (
        adj.join(a2, "v")
        .filter(F.col("w") < F.col("w2"))
        .select(
            F.array_sort(F.array("v", "w", "w2")).alias("t")
        )
        .select(
            F.col("t")[0].alias("i"), F.col("t")[1].alias("j"), F.col("t")[2].alias("k")
        )
        .distinct()
    )
    # fetch the three dyad codes (i<j<k, so orientation matches the codes)
    c_ij = u.select(F.col("x").alias("i"), F.col("y").alias("j"), F.col("code").alias("c1"))
    c_ik = u.select(F.col("x").alias("i"), F.col("y").alias("k"), F.col("code").alias("c2"))
    c_jk = u.select(F.col("x").alias("j"), F.col("y").alias("k"), F.col("code").alias("c3"))
    coded = (
        triples.join(c_ij, ["i", "j"], "left")
        .join(c_ik, ["i", "k"], "left")
        .join(c_jk, ["j", "k"], "left")
        .select(
            (
                F.coalesce("c1", F.lit(0))
                + 4 * F.coalesce("c2", F.lit(0))
                + 16 * F.coalesce("c3", F.lit(0))
            ).alias("pattern"),
            (
                _is_asym("c1") + _is_asym("c2") + _is_asym("c3")
            ).alias("n_asym"),
            (
                _is_mut("c1") + _is_mut("c2") + _is_mut("c3")
            ).alias("n_mut"),
        )
    )
    lut = F.array(*[F.lit(t) for t in TRIAD_LOOKUP])
    enum_counts = (
        coded.groupBy(
            F.element_at(lut, F.col("pattern") + 1).alias("triad_type")
        )
        .agg(F.count("*").alias("n"))
    )
    # scalar side: n, A, M, and the dyad-incidence sums inside triples
    scal = (
        verts.agg(F.count("*").alias("nv"))
        .crossJoin(
            u.agg(
                F.coalesce(
                    F.sum(F.when(F.col("code") == 3, 1).otherwise(0)), F.lit(0)
                ).alias("mm"),
                F.coalesce(
                    F.sum(F.when(F.col("code") != 3, 1).otherwise(0)), F.lit(0)
                ).alias("aa"),
            )
        )
        .crossJoin(
            coded.agg(
                F.coalesce(F.sum("n_asym"), F.lit(0)).alias("asym_in"),
                F.coalesce(F.sum("n_mut"), F.lit(0)).alias("mut_in"),
            )
        )
        .crossJoin(
            enum_counts.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("enum_total"))
        )
    )
    spine = spark.createDataFrame(
        [(t,) for t in TRIAD_TYPES if t not in ("003", "012", "102")],
        "triad_type string",
    )
    dense = (
        spine.join(enum_counts, "triad_type", "left")
        .select("triad_type", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )
    derived = scal.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("012").alias("triad_type"),
                    (F.col("aa") * (F.col("nv") - 2) - F.col("asym_in"))
                    .cast("long")
                    .alias("n"),
                ),
                F.struct(
                    F.lit("102").alias("triad_type"),
                    (F.col("mm") * (F.col("nv") - 2) - F.col("mut_in"))
                    .cast("long")
                    .alias("n"),
                ),
                F.struct(
                    F.lit("003").alias("triad_type"),
                    (
                        F.expr("nv * (nv - 1) * (nv - 2) div 6")
                        - F.col("enum_total")
                        - (F.col("aa") * (F.col("nv") - 2) - F.col("asym_in"))
                        - (F.col("mm") * (F.col("nv") - 2) - F.col("mut_in"))
                    )
                    .cast("long")
                    .alias("n"),
                ),
            )
        ).alias("s")
    ).select("s.triad_type", "s.n")
    return dense.unionByName(derived)


def _is_asym(col: str):
    return F.when(F.col(col).isin(1, 2), 1).otherwise(0)


def _is_mut(col: str):
    return F.when(F.col(col) == 3, 1).otherwise(0)
