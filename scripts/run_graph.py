"""spark-submit entry point for the non-Louvain graph algorithms.

Usage (packaged via scripts/submit.sh):
    scripts/submit.sh scripts/run_graph.py --algo pagerank \
        --events /path/to/events.parquet \
        --output /path/to/out [--checkpoint-dir /path/to/ckpt]

--algo: pagerank | cc | lpa | triangles | hits | pagerank_directed |
        double_sweep | quad_census | mis | stress | node2vec |
        coloring | coreness | msf | closeness | matching |
        weighted_matching | s_core | triad_census | clique4 |
        densest | ppr_sweep
Input: --transcripts (transcript parquet) | --events (driver events
table) | --edge-file (whitespace edge-list text, reference GraphHost
ingest; with --weighted / --skip-lines).

With --checkpoint-dir every superstep durably saves its vertex state +
convergence metric (plans/checkpoint.py::VertexIterationCheckpointer);
re-running the same command resumes from the latest committed
iteration (north rule: resumable mid-iteration).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.operators.components import connected_components
from louvain_fast_move_cuda_spark.operators.labelprop import label_propagation
from louvain_fast_move_cuda_spark.operators.pagerank import pagerank
from louvain_fast_move_cuda_spark.operators.triangles import triangle_count
from louvain_fast_move_cuda_spark.plans.checkpoint import VertexIterationCheckpointer
from louvain_fast_move_cuda_spark.sources.edges import (
    GraphTables,
    canonicalize_edges,
    derive_edges_from_transcripts,
    symmetrize,
    vertex_weights,
)
from louvain_fast_move_cuda_spark.sources.transcripts import transcripts_from_events


def build_input_graph(spark, args) -> GraphTables:
    if args.edge_file:
        from louvain_fast_move_cuda_spark.sources.edgefile import edge_file_graph

        return edge_file_graph(
            spark, args.edge_file, weighted=args.weighted, skip_lines=args.skip_lines
        )
    if args.events:
        t = transcripts_from_events(spark.read.parquet(args.events))
    else:
        t = spark.read.parquet(args.transcripts)
    raw = derive_edges_from_transcripts(t)
    edges = symmetrize(canonicalize_edges(raw)).localCheckpoint(eager=True)
    verts = vertex_weights(edges).localCheckpoint(eager=True)
    m = float(edges.agg(F.sum("weight")).collect()[0][0]) / 2.0
    return GraphTables(edges=edges, vertices=verts, m=m, n_nodes=verts.count())


def build_raw_pairs(spark, args):
    """Directed (a, b) pairs for the direction-aware algorithms (HITS,
    directed PageRank) — pre-canonicalization, like the driver queries."""
    if args.edge_file:
        from louvain_fast_move_cuda_spark.sources.edgefile import read_edge_file

        return read_edge_file(
            spark, args.edge_file, weighted=args.weighted, skip_lines=args.skip_lines
        ).select("a", "b")
    if args.events:
        t = transcripts_from_events(spark.read.parquet(args.events))
    else:
        t = spark.read.parquet(args.transcripts)
    return derive_edges_from_transcripts(t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--algo",
        required=True,
        choices=[
            "pagerank", "cc", "lpa", "triangles",
            "hits", "pagerank_directed", "double_sweep", "quad_census",
            "mis", "stress", "node2vec",
            "coloring", "coreness", "msf", "closeness", "matching",
            "weighted_matching", "s_core",
            "triad_census", "clique4", "densest", "ppr_sweep",
        ],
    )
    ap.add_argument("--transcripts")
    ap.add_argument("--events")
    ap.add_argument("--edge-file")
    ap.add_argument("--weighted", action="store_true")
    ap.add_argument("--skip-lines", type=int, default=0)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--max-iter", type=int, default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    if args.algo in ("hits", "pagerank_directed", "triad_census"):
        raw = build_raw_pairs(spark, args)
        summary = {"algo": args.algo}
        if args.algo == "triad_census":
            from louvain_fast_move_cuda_spark.operators.triads import triad_census

            out = triad_census(raw)
            for r in out.collect():
                summary[f"n_{r['triad_type']}"] = int(r["n"])
            out.write.mode("overwrite").parquet(args.output)
            print(json.dumps(summary))
            return
        if args.algo == "hits":
            from louvain_fast_move_cuda_spark.operators.hits import hits

            out = hits(raw, max_iter=args.max_iter or 8)
            top = out.orderBy(F.desc("hub_r9"), F.asc("id")).first()
            summary["top_hub_id"] = int(top["id"]) if top is not None else None
        else:
            from louvain_fast_move_cuda_spark.operators.pagerank import (
                directed_pagerank,
            )

            out = directed_pagerank(raw, max_iter=args.max_iter or 20)
            summary["sum_rank_r9"] = float(
                out.agg(F.round(F.sum("rank_r9"), 6)).collect()[0][0]
            )
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return

    g = build_input_graph(spark, args)
    ckpt = (
        VertexIterationCheckpointer(args.checkpoint_dir, algo=args.algo)
        if args.checkpoint_dir
        else None
    )

    summary = {"algo": args.algo, "n_vertices": g.n_nodes}
    if args.algo == "double_sweep":
        from louvain_fast_move_cuda_spark.operators.distances import double_sweep

        out = double_sweep(g, max_hops=args.max_iter or 8)
        summary.update(out.collect()[0].asDict())
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "mis":
        from louvain_fast_move_cuda_spark.operators.mis import maximal_independent_set

        out = maximal_independent_set(g, max_rounds=args.max_iter or 12)
        summary["n_in_mis"] = out.filter(F.col("in_mis")).count()
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "stress":
        from louvain_fast_move_cuda_spark.operators.distances import stress_centrality

        out = stress_centrality(g, seed_mod=101, max_hops=args.max_iter or 4)
        top = out.orderBy(F.desc("stress"), F.asc("id")).first()
        summary["top_stress_id"] = int(top["id"]) if top is not None else None
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "node2vec":
        from louvain_fast_move_cuda_spark.operators.walks import node2vec_walks

        out = node2vec_walks(g, length=args.max_iter or 6, seed_mod=7)
        summary["n_walk_rows"] = out.count()
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "coloring":
        from louvain_fast_move_cuda_spark.operators.coloring import greedy_coloring

        out = greedy_coloring(g, max_rounds=args.max_iter or 32, checkpointer=ckpt)
        summary["n_colors"] = out.agg(F.countDistinct("color")).collect()[0][0]
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "coreness":
        from louvain_fast_move_cuda_spark.operators.graphstats import coreness

        out = coreness(g, max_rounds=args.max_iter or 32, checkpointer=ckpt)
        summary["max_coreness"] = int(out.agg(F.max("coreness")).collect()[0][0])
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "msf":
        from louvain_fast_move_cuda_spark.operators.mst import minimum_spanning_forest

        out = minimum_spanning_forest(g, max_rounds=args.max_iter or 16, checkpointer=ckpt)
        agg = out.agg(
            F.count("*").alias("n"), F.sum("weight").alias("w")
        ).collect()[0]
        summary["n_forest_edges"] = int(agg["n"])
        summary["forest_weight"] = float(agg["w"]) if agg["w"] is not None else 0.0
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "matching":
        from louvain_fast_move_cuda_spark.operators.matching import maximal_matching

        out = maximal_matching(g, max_rounds=args.max_iter or 16)
        summary["n_matched_pairs"] = out.count()
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "weighted_matching":
        from louvain_fast_move_cuda_spark.operators.matching import (
            greedy_weighted_matching,
        )

        # weights come from --weighted edge files; transcript ingest is
        # unit-weight, where this degenerates to a mixer-tie matching
        out = greedy_weighted_matching(g, max_rounds=args.max_iter or 20)
        agg = out.agg(F.count("*").alias("n"), F.sum("w").alias("tw")).collect()[0]
        summary["n_matched_pairs"] = int(agg["n"])
        summary["matched_weight"] = int(agg["tw"]) if agg["tw"] is not None else 0
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "s_core":
        from louvain_fast_move_cuda_spark.operators.graphstats import s_core

        out = s_core(g, s=2, max_rounds=args.max_iter or 30)
        summary["n_in_s_core"] = out.count()
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "closeness":
        from louvain_fast_move_cuda_spark.operators.distances import (
            closeness_centrality,
        )

        out = closeness_centrality(g, seed_mod=101, max_hops=args.max_iter or 6)
        top = out.orderBy(F.desc("closeness_r9"), F.asc("id")).first()
        summary["top_closeness_id"] = int(top["id"]) if top is not None else None
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "clique4":
        from louvain_fast_move_cuda_spark.operators.triangles import clique4_count

        out = clique4_count(g)
        r = out.collect()[0]
        summary["n_triangles"] = int(r["n_triangles"])
        summary["n_four_cliques"] = int(r["n_four_cliques"])
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "densest":
        from louvain_fast_move_cuda_spark.operators.graphstats import densest_subgraph

        out = densest_subgraph(g, max_rounds=args.max_iter or 32, checkpointer=ckpt)
        best = out.filter("is_best").collect()[0]
        summary["best_round"] = int(best["round"])
        summary["best_density_r9"] = float(best["density_r9"])
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "ppr_sweep":
        from louvain_fast_move_cuda_spark.operators.pagerank import ppr_sweep_cut

        seeds = g.vertices.select("id").filter(F.col("id") % 97 == 0)
        out = ppr_sweep_cut(g, seeds, max_iter=args.max_iter or 20, max_prefix=256)
        best = out.filter("is_best").collect()[0]
        summary["best_prefix"] = int(best["k"])
        summary["best_conductance_r9"] = (
            float(best["conductance_r9"]) if best["conductance_r9"] is not None else None
        )
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "quad_census":
        from louvain_fast_move_cuda_spark.operators.graphstats import quad_census

        out = quad_census(g)
        r = out.collect()[0]
        summary["n_wedges"] = int(r["n_wedges"])
        summary["n_four_cycles"] = int(r["n_four_cycles"])
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps(summary))
        return
    if args.algo == "pagerank":
        out = pagerank(g, max_iter=args.max_iter or 100, checkpointer=ckpt)
        summary["sum_rank"] = float(out.agg(F.sum("rank")).collect()[0][0])
    elif args.algo == "cc":
        out = connected_components(g, max_iter=args.max_iter or 50, checkpointer=ckpt)
        summary["n_components"] = out.agg(F.countDistinct("component")).collect()[0][0]
    elif args.algo == "lpa":
        out = label_propagation(g, max_iter=args.max_iter or 10, checkpointer=ckpt)
        summary["n_labels"] = out.agg(F.countDistinct("label")).collect()[0][0]
    else:  # triangles
        n = triangle_count(g)
        out = spark.createDataFrame([(n,)], "n_triangles long")
        summary["n_triangles"] = n
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
