#!/usr/bin/env python
"""Round-over-round bench regression gate.

Usage: python scripts/bench_compare.py OLD NEW [threshold]

OLD/NEW are bench result files — either the driver's BENCH_r{N}.json
(with a "parsed" envelope) or a raw bench.py JSON line. Prints a
per-query delta table and exits 1 if any query regressed more than
``threshold`` (default 0.25 = +25%) AND by more than an absolute
floor of 0.2s (sub-second queries jitter by more than 25% on a
shared box — flagging those is noise, the round-2 lesson).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read()
    data = json.loads(text)
    if "parsed" in data:
        data = data["parsed"]
    return data["queries"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    abs_floor = 0.2
    regressions = []
    print(f"{'query':<32} {'old':>8} {'new':>8} {'delta':>8}")
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            print(f"{name:<32} {o or '-':>8} {n or '-':>8} {'(added/removed)':>8}")
            continue
        pct = (n - o) / o if o else 0.0
        flag = ""
        if pct > threshold and (n - o) > abs_floor:
            flag = "  << REGRESSION"
            regressions.append((name, o, n, pct))
        print(f"{name:<32} {o:>8.3f} {n:>8.3f} {pct:>+7.0%}{flag}")
    ot, nt = sum(old.values()), sum(v for k, v in new.items() if k in old)
    print(f"{'TOTAL (shared keys)':<32} {ot:>8.3f} {nt:>8.3f} {(nt - ot) / ot:>+7.0%}")
    if regressions:
        print(f"\n{len(regressions)} regression(s) over {threshold:.0%}:")
        for name, o, n, pct in regressions:
            print(f"  {name}: {o:.3f}s -> {n:.3f}s ({pct:+.0%})")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
