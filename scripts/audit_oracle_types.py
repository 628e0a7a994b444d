"""Enumerate Spark-vs-DuckDB result TYPE mismatches for every oracle.

The driver's hash canonicalization distinguishes bit-equal values of
different types (HUGEINT vs BIGINT, DECIMAL vs DOUBLE) — see round-4
failures.  This audit binds each oracle_sql() in DuckDB (no execution)
and compares the bind-time types against the Spark DataFrame schema.

    python scripts/audit_oracle_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from louvain_fast_move_cuda_spark.plans.oracle_types import type_mismatches  # noqa: E402
from louvain_fast_move_cuda_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="audit_oracle_types", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)  # may materialize oracle parquet
        except Exception as e:  # noqa: BLE001
            bad.append((name, [f"SPARK ERROR: {e}"]))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        try:
            rel = con.sql(oracles[name])
            msgs = type_mismatches(sdf.schema, rel.columns, rel.types)
        except Exception as e:  # noqa: BLE001
            bad.append((name, [f"DUCKDB BIND ERROR: {e}"]))
            print(f"[FAIL-duck ] {name}: {str(e)[:200]}")
            continue
        if msgs:
            bad.append((name, msgs))
            print(f"[TYPE-FAIL ] {name} ({time.time()-t0:.1f}s)")
            for m in msgs:
                print(f"             {m}")
        else:
            print(f"[types-ok  ] {name} ({time.time()-t0:.1f}s)")

    print(f"\n{len(bad)} queries with type mismatches")
    for n, ms in bad:
        print(f"  {n}: {ms[0]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
