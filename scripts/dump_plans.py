"""Dump .explain('formatted') for declared queries (judge evidence).

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, using the repo this
script is imported from (run it from a worktree of the round-start commit
for the _before plans). sf dir: $SPARK_GRAFT_SF_DIR or sf0.01 (plans are
size-independent; the smaller read keeps the dump fast).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from louvain_fast_move_cuda_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
