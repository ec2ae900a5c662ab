#!/usr/bin/env python
"""Plan inspection: dump .explain('formatted') for the query inventory
and flag scale smells — missing filter pushdown, unpruned scans,
missing broadcasts, excess exchanges.

Usage: python scripts/explain_plans.py [key_prefix...] [--full]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from smartpipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    prefixes = [a for a in sys.argv[1:] if not a.startswith("--")] or None
    full = "--full" in sys.argv
    spark = get_spark("explain")
    for key, fn in sorted(entrymod.queries().items()):
        if prefixes and not any(key.startswith(p) for p in prefixes):
            continue
        try:
            p = plan_of(fn(spark, SF))
        except Exception as e:
            print(f"{key}: ERROR {e}")
            continue
        n_exchange = len(re.findall(r"\bExchange\b", p))
        n_bhj = len(re.findall(r"BroadcastHashJoin", p))
        n_smj = len(re.findall(r"SortMergeJoin", p))
        n_wsc = len(re.findall(r"WholeStageCodegen", p))
        pushed = re.findall(r"PushedFilters: \[(.*?)\]", p)
        pushed_n = sum(1 for x in pushed if x.strip())
        scans = re.findall(r"ReadSchema: (.*)", p)
        print(
            f"{key:28s} exch={n_exchange:2d} bhj={n_bhj} smj={n_smj} "
            f"codegen={n_wsc:2d} pushedFilterScans={pushed_n}/{len(pushed)}"
        )
        if full:
            for s in scans:
                print(f"    scan: {s.strip()[:120]}")
            print(p)
    spark.stop()


if __name__ == "__main__":
    main()
