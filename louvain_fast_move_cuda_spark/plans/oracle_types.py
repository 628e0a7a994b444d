"""Oracle type discipline: map DuckDB logical types <-> Spark types.

Round-4 driver failures (rich_club, katz, tool_latency, events_pivot,
quantile_sketch) were all bit-equal VALUES with mismatched TYPES: a naked
``sum(bigint)`` in DuckDB returns HUGEINT (and ``2.0 * x`` returns
DECIMAL), while the Spark plan emits BIGINT / DOUBLE, so the driver's
hash canonicalization diverges on equal scalars.  This module gives both
the local sweep (scripts/check_oracle.py) and the unit suite
(tests/test_oracle_types.py) one shared, strict mapping so a naked
aggregate can never again pass locally and fail the driver.

Usage::

    rel = duckdb_con.sql(oracle_sql)          # binds only, no execution
    mismatches = type_mismatches(spark_df.schema, rel.columns, rel.types)
"""

from __future__ import annotations

import re

# DuckDB logical type name -> acceptable Spark DataType.simpleString()s.
# Anything NOT in this table (HUGEINT, UHUGEINT, DECIMAL, UBIGINT, ...)
# has no exact Spark scalar twin and is always a mismatch: the fix is a
# CAST in the oracle SQL, never a relaxation here.  DuckDB TIMESTAMP is
# timezone-naive, so it matches both Spark timestamp flavors — r4 driver
# rows (hourly_rollup, sessions, tpch_q3/q18) confirm the driver treats
# them as equal.
_DUCK_TO_SPARK = {
    "BOOLEAN": ("boolean",),
    "TINYINT": ("tinyint",),
    "SMALLINT": ("smallint",),
    "INTEGER": ("int",),
    "BIGINT": ("bigint",),
    "FLOAT": ("float",),
    "DOUBLE": ("double",),
    "VARCHAR": ("string",),
    "BLOB": ("binary",),
    "DATE": ("date",),
    "TIMESTAMP": ("timestamp", "timestamp_ntz"),
    "TIMESTAMP WITH TIME ZONE": ("timestamp",),
}

_DECIMAL_RE = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")
_LIST_RE = re.compile(r"^(.*)\[\]$")


def duck_to_spark(duck_type: str) -> tuple[str, ...] | None:
    """Acceptable Spark simpleStrings for a DuckDB logical type, or None
    if there is no exact Spark twin (HUGEINT et al.)."""
    t = str(duck_type).strip().upper()
    m = _LIST_RE.match(t)
    if m:
        inner = duck_to_spark(m.group(1))
        return None if inner is None else tuple(f"array<{i}>" for i in inner)
    m = _DECIMAL_RE.match(t)
    if m:
        return (f"decimal({m.group(1)},{m.group(2)})",)
    return _DUCK_TO_SPARK.get(t)


def type_mismatches(spark_schema, duck_cols, duck_types):
    """Compare a Spark schema with DuckDB bind-time result types.

    Returns a list of human-readable mismatch strings (empty == OK).
    Column order is ignored (the driver sorts by name); column-NAME
    mismatches are reported too since the hash aligns by name.
    """
    s = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    d = {c: str(t) for c, t in zip(duck_cols, duck_types)}
    out = []
    for c in sorted(set(s) - set(d)):
        out.append(f"column {c!r} only in Spark result")
    for c in sorted(set(d) - set(s)):
        out.append(f"column {c!r} only in DuckDB result")
    for c in sorted(set(s) & set(d)):
        want = s[c]
        got = duck_to_spark(d[c])
        if got is None:
            out.append(
                f"column {c!r}: DuckDB type {d[c]} has no exact Spark twin "
                f"(Spark emits {want}) — CAST it in the oracle SQL"
            )
        elif want not in got:
            out.append(f"column {c!r}: Spark {want} vs DuckDB {d[c]} ({got[0]})")
    return out
