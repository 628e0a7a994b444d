"""spark-submit entry point: transcripts parquet -> Louvain community labels.

Usage (packaged via scripts/submit.sh):
    scripts/submit.sh scripts/run_louvain.py \
        --transcripts /path/to/transcripts.parquet \
        --output /path/to/labels \
        [--checkpoint-dir /path/to/ckpt]   # resume-capable supersteps

With --events the input is the driver test `events` table, adapted to the
transcript shape (sources/transcripts.py::transcripts_from_events).

With --edge-file the input is a whitespace edge-list text file — the
reference's own ingest (GraphHost, graph.cu:17-87; e.g. its bundled
graph-power-law-10000-2-99-1.edge, main.cu:10) — with optional
--weighted and --skip-lines N header skip.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from louvain_fast_move_cuda_spark.operators.louvain import louvain
from louvain_fast_move_cuda_spark.plans.checkpoint import SuperstepCheckpointer
from louvain_fast_move_cuda_spark.sources.edges import (
    GraphTables,
    canonicalize_edges,
    derive_edges_from_transcripts,
    symmetrize,
    vertex_weights,
)
from louvain_fast_move_cuda_spark.sources.transcripts import transcripts_from_events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts")
    ap.add_argument("--events")
    ap.add_argument("--edge-file")
    ap.add_argument("--weighted", action="store_true")
    ap.add_argument("--skip-lines", type=int, default=0)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument(
        "--refine",
        action="store_true",
        help="run the C9 refine phase (Leiden connectivity guarantee: "
        "split disconnected communities; Q can only rise)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()

    from pyspark.sql import functions as F

    if args.edge_file:
        from louvain_fast_move_cuda_spark.sources.edgefile import edge_file_graph

        g = edge_file_graph(
            spark, args.edge_file, weighted=args.weighted, skip_lines=args.skip_lines
        )
    else:
        if args.events:
            t = transcripts_from_events(spark.read.parquet(args.events))
        else:
            t = spark.read.parquet(args.transcripts)
        raw = derive_edges_from_transcripts(t)
        edges = symmetrize(canonicalize_edges(raw)).localCheckpoint(eager=True)
        verts = vertex_weights(edges).localCheckpoint(eager=True)
        m = float(edges.agg(F.sum("weight")).collect()[0][0]) / 2.0
        g = GraphTables(edges=edges, vertices=verts, m=m, n_nodes=verts.count())

    ckpt = SuperstepCheckpointer(args.checkpoint_dir) if args.checkpoint_dir else None
    res = louvain(g, checkpointer=ckpt, refine=args.refine)
    res.labels.write.mode("overwrite").parquet(args.output)
    print(json.dumps({
        "modularity": res.modularity,
        "n_communities": res.n_communities,
        "levels": res.levels,
        "rounds": len([mt for mt in res.metrics if mt.get("round", -1) >= 0]),
    }))


if __name__ == "__main__":
    main()
