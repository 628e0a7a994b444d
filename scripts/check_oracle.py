"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin on
the same sf dir, compares row count, column names, and order-insensitive
values (exact for ints/strings, raw-bit for doubles — stricter than any
hash the driver could use). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
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


def canon_rows(rows):
    out = []
    for r in rows:
        out.append(tuple(float(v) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = list(rel.types)
            drows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck ] {name}: {e}")
            continue
        msgs = []
        if sorted(scols) != sorted(dcols):
            msgs.append(f"cols spark={scols} duck={dcols}")
        # the driver's hash canonicalization is type-sensitive (r4:
        # HUGEINT/DECIMAL vs BIGINT/DOUBLE failed on bit-equal values),
        # so the local gate must be too
        msgs.extend(type_mismatches(sdf.schema, dcols, dtypes))
        if len(srows) != len(drows):
            msgs.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not msgs:
            # align columns by name, compare value multisets
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            sv = canon_rows([tuple(r[i] for i in sidx) for r in srows])
            dv = canon_rows([tuple(r[i] for i in didx) for r in drows])
            if sv != dv:
                diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
                msgs.append(f"values differ; first diffs {diff}")
        if msgs:
            failures.append((name, "; ".join(msgs)))
            print(f"[FAIL      ] {name}: {'; '.join(msgs)[:400]}")
        else:
            print(
                f"[OK        ] {name}: {len(srows)} rows, types-ok, "
                f"in {time.time()-t0:.1f}s"
            )

    print(f"\n{len(failures)} failures")
    for n, m in failures:
        print(f"  {n}: {m[:300]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
