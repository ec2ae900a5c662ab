#!/usr/bin/env python
"""Oracle output-type audit: execute EVERY registered oracle against
DuckDB (sf0.001) and fail on output column types the external driver's
pandas canonicalizer mishandles — HUGEINT (reaches pandas as float64,
so Spark's '65994' hash-mismatches the oracle's '65994.0') and
list/struct/map cells (pandas sort_values raises on them).

tests/test_manifest.py pins this for the CURRENT driver window; this
audit covers the full registry because the window rotates — any key
may be in-window next round. Wired into scripts/release_check.py.

Usage: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

BAD_MARKERS = ("HUGEINT", "INT128", "STRUCT(", "MAP(")


def main() -> int:
    import __spark_entry__ as entrymod
    from smartpipeline_spark.testing import duckdb_connection

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb_connection(sf_dir)
    offenders: dict[str, list[str]] = {}
    oracles = entrymod.oracle_sql()
    for key, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            bad = [
                f"{name}: {t}"
                for name, t in zip(rel.columns, map(str, rel.types))
                if any(m in str(t).upper() for m in BAD_MARKERS)
                or "[]" in str(t)
            ]
        except Exception as e:  # an unrunnable oracle is its own failure
            bad = [f"<oracle failed to execute: {type(e).__name__}: {e}>"]
        if bad:
            offenders[key] = bad
            print(f"FAIL  {key}: {bad}", flush=True)
    print(
        f"audited {len(oracles)} oracles: "
        f"{len(offenders)} with driver-unfaithful output types"
    )
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main())
