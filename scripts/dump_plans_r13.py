#!/usr/bin/env python
"""Dump .explain('formatted') for a key list into plans/r13/.

Usage: python scripts/dump_plans_r13.py ROOT SUFFIX key [key ...]

ROOT is the repo checkout to load the registry from (so the same
script can render the r11 'before' worktree and the HEAD 'after'
tree); SUFFIX is 'before' or 'after'. Output goes to
/root/repo/plans/r13/<key>_<suffix>.txt regardless of ROOT.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT, SUFFIX = sys.argv[1], sys.argv[2]
KEYS = sys.argv[3:]
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.01"
OUT = "/root/repo/plans/r13"


def main():
    from smartpipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("plan-dump")
    qs = entrymod.queries()
    os.makedirs(OUT, exist_ok=True)
    for key in KEYS:
        if key not in qs:
            print(f"SKIP {key}: not in registry at {ROOT}")
            continue
        try:
            df = qs[key](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"PLAN BUILD ERROR: {e!r}\n"
        with open(os.path.join(OUT, f"{key}_{SUFFIX}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {key}_{SUFFIX}.txt ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
