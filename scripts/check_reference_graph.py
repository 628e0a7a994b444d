"""One-command parity gate on the reference's own bundled test graph.

The CUDA reference ships exactly one graph in-repo:
``graph-power-law-10000-2-99-1.edge`` (10,000 vertices / 19,996 canonical
edges, the commented-in smoke run of main.cu:10). This script ingests it
through the engine's edge-file source, asserts the GraphHost-identical
parse counts (graph.cu:17-87), runs Louvain, and compares labels (exact)
and modularity (<= 1e-9) against the float64 single-process oracle
(tests/oracle.py — the same move rule re-implemented independently).

Exits nonzero on ANY mismatch; prints one JSON line either way:

    python scripts/check_reference_graph.py [--edge-file PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

DEFAULT_EDGE_FILE = "/root/reference/graph-power-law-10000-2-99-1.edge"
WANT_NODES = 10000
WANT_LINKS = 19996
Q_TOL = 1e-9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edge-file", default=DEFAULT_EDGE_FILE)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from louvain_fast_move_cuda_spark.operators.louvain import louvain
    from louvain_fast_move_cuda_spark.session import get_spark
    from louvain_fast_move_cuda_spark.sources.edgefile import (
        edge_file_graph,
        read_edge_file,
    )
    from oracle import louvain_oracle

    spark = get_spark(
        app_name="check-reference-graph", master=args.master, shuffle_partitions=8
    )
    failures: list[str] = []

    raw = read_edge_file(spark, args.edge_file)
    pairs = [(r.a, r.b) for r in raw.collect()]
    is_default = os.path.abspath(args.edge_file) == DEFAULT_EDGE_FILE
    if is_default and len(pairs) != WANT_LINKS:
        failures.append(f"raw pair count {len(pairs)} != {WANT_LINKS}")

    g = edge_file_graph(spark, args.edge_file, relabel=False)
    if is_default:
        if g.n_nodes != WANT_NODES:
            failures.append(f"n_nodes {g.n_nodes} != {WANT_NODES}")
        # total_weight = n_links for unweighted ingest (graph.cu:77-81)
        if g.m != float(WANT_LINKS):
            failures.append(f"m {g.m} != {float(WANT_LINKS)}")

    res = louvain(g)
    # canonical-dedup the raw pairs before the oracle: the ENGINE dedups
    # duplicate lines (canonicalize_edges, weight 1.0) while the oracle
    # would double-count them — a user-supplied --edge-file with repeated
    # lines must not produce a false parity failure (ADVICE r3). The
    # default reference file has no duplicates, so this is a no-op there.
    canon_pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    want_labels, q_want = louvain_oracle(canon_pairs)[:2]
    got_labels = {r.orig_id: r.community for r in res.labels.collect()}
    n_label_mismatch = sum(
        1 for k, v in want_labels.items() if got_labels.get(k) != v
    ) + sum(1 for k in got_labels if k not in want_labels)
    if n_label_mismatch:
        failures.append(f"{n_label_mismatch} label mismatches vs float64 oracle")
    dq = abs(res.modularity - q_want)
    if dq > Q_TOL:
        failures.append(f"|Q - Q_oracle| = {dq:.3e} > {Q_TOL}")

    print(
        json.dumps(
            {
                "edge_file": args.edge_file,
                "n_nodes": g.n_nodes,
                "n_links": int(g.m) if g.m == int(g.m) else g.m,
                "modularity": res.modularity,
                "modularity_oracle": q_want,
                "abs_q_delta": dq,
                "n_communities": res.n_communities,
                "failures": failures,
                "ok": not failures,
            }
        )
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
