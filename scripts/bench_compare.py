#!/usr/bin/env python
"""Round-over-round bench regression gate, with mechanical
plan-diff/git adjudication.

Usage:
    python scripts/bench_compare.py OLD NEW [threshold]
        [--plans-old PLANS_rN-1.txt --plans-new PLANS_rN.txt]
        [--git-since REV]

OLD/NEW are bench result files — either the driver's BENCH_r{N}.json
(with a "parsed" envelope) or a raw bench.py JSON line. Prints a
per-query delta table and exits 1 if any query regressed more than
``threshold`` (default 0.25 = +25%) AND by more than an absolute
floor of 0.2s (sub-second queries jitter by more than 25% on a
shared box — flagging those is noise, the round-2 lesson).

Adjudication (round-6 addition, after the round-5 ext_dsir_select
mis-adjudication): a flagged regression may only be attributed to
host variance if the key is genuinely code- and plan-unchanged, and
history shows that claim is exactly where adjudication goes wrong by
hand. When ``--plans-old/--plans-new`` are given, each regression is
joined against its per-key plan-fingerprint line in both files; when
``--git-since`` is given, the key's defining FUNCTION SPAN (resolved
through the live query registry, tracked through edits with ``git log
-L``) is checked for commits in ``REV..HEAD``. If either differs, the
tool prints an explicit REFUSAL of the "unchanged/host variance"
adjudication, naming the commits and the fingerprint diff — the r05
dsir case, replayed through this path, is auto-flagged as "code
changed (de8f398), plan changed" (pinned by tests/test_extensions.py).

Granularity (round-7 refinement): the git leg intersects commits with
the key's function span, not the whole file — round 6 refused the
q06/q09 adjudications because an UNRELATED query (q36b) had been added
to relational.py (file-level false positive; both plans unchanged,
both keys sub-second). A commit touching only other functions now
reports "file changed elsewhere — function span untouched" and stays
eligible; changes that route around the function body (shared helpers,
session confs) are still caught by the plan-fingerprint leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scan_lines(text: str) -> dict:
    """Round-9 bench layout: stdout carries sacrificial
    ``{"artifact": "plan_fp"|"detail", ...}`` lines followed by a
    small headline JSON line (the driver's 2000-char tail capture
    can orphan the evidence lines, never the timings). Merge whatever
    JSON lines survive; the detail line's full-precision timings win
    over the headline's rounded ones when both are present."""
    headline: dict = {}
    extras: dict = {}
    for line in text.splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in obj:
            headline = obj
        elif obj.get("artifact") == "plan_fp":
            extras["plan_fp"] = obj.get("plan_fp", {})
        elif obj.get("artifact") == "detail":
            for k in ("queries", "queries_min", "queries_cpu",
                      "queries_spill_gb", "reps", "isolation", "loadavg"):
                if k in obj:
                    extras[k] = obj[k]
    return {**headline, **extras} if headline else {}


def _parse(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        # raw multi-line bench stdout (round-9 two-line layout)
        data = _scan_lines(text)
        if not data:
            raise
        return data
    if "parsed" in data:
        parsed = data["parsed"]
        # driver envelope: parsed is the final JSON line only; pull
        # whatever evidence lines (plan_fp, full-precision detail)
        # survived truncation out of the captured tail
        tail = _scan_lines(data.get("tail", "") or "")
        if parsed is None:
            parsed = tail
        elif tail:
            parsed = {**parsed, **tail}
        data = parsed
    elif "metric" not in data and "queries" not in data:
        data = _scan_lines(text) or data
    return data


def load(path: str) -> dict[str, float]:
    return _parse(path)["queries"]


def load_pair(old_path: str, new_path: str) -> tuple[dict, dict, str]:
    """Per-key timings from two bench artifacts. When BOTH carry the
    round-8 ``queries_min`` field, compare the min-of-N floors — the
    contention-robust statistic — and say so; otherwise fall back to
    the longitudinal medians (comparing one file's median against the
    other's min would bias every delta)."""
    o, n = _parse(old_path), _parse(new_path)
    if "queries_min" in o and "queries_min" in n:
        # min-of-N is only comparable at equal N: a min-of-5 floor is
        # systematically lower than a min-of-3 one, which would bias
        # every delta the tool then adjudicates (a reps override via
        # SPARK_GRAFT_BENCH_REPS between rounds must not read as a
        # regression/improvement).
        if o.get("reps") == n.get("reps"):
            return o["queries_min"], n["queries_min"], "min-of-N"
        print(
            f"note: reps differ ({o.get('reps')} vs {n.get('reps')}) — "
            "min-of-N floors are not comparable; using medians"
        )
    return o["queries"], n["queries"], "median"


def load_embedded_fingerprints(path: str) -> dict[str, str]:
    """Round-8 bench artifacts embed per-key plan fingerprints
    (``plan_fp``); normalize exactly like the PLANS_r{N}.txt loader."""
    fps = _parse(path).get("plan_fp", {})
    return {k: " ".join(v.split()) for k, v in fps.items()}


def load_plan_fingerprints(path: str) -> dict[str, str]:
    """PLANS_r{N}.txt -> {key: fingerprint}. Lines look like
    ``ext_dsir_select  exch= 2 (reused=0) bhj=0 ... NESTEDLOOP=1``;
    comment/blank lines are skipped."""
    fps: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.rstrip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(None, 1)
            if len(parts) == 2 and "exch=" in parts[1]:
                fps[parts[0]] = " ".join(parts[1].split())
    return fps


def _fn_span(fn) -> tuple[str, int, int] | None:
    import inspect

    try:
        src = inspect.getsourcefile(fn)
        if not src or not os.path.abspath(src).startswith(REPO + os.sep):
            return None
        lines, start = inspect.getsourcelines(fn)
        return os.path.relpath(src, REPO), start, start + len(lines) - 1
    except Exception:
        return None


def defining_spans(
    key: str, depth: int = 2
) -> list[tuple[str, int, int]] | None:
    """Resolve a query key to the CURRENT source spans of its
    registered callable PLUS the repo-local functions it references,
    followed ``depth`` levels through each function's global names —
    registered query keys are usually thin wrappers over a library
    function (the r05 dsir regression lived in ``dsir_select``, not in
    the 10-line ``ext_dsir_select`` wrapper), so the wrapper span
    alone would miss most real changes. Imports the registry lazily —
    no Spark session is started."""
    import inspect

    sys.path.insert(0, REPO)
    try:
        import __spark_entry__ as entrymod

        fn = entrymod.queries().get(key)
        if fn is None:
            return None
        while hasattr(fn, "__wrapped__"):
            fn = fn.__wrapped__
        seen: set = set()
        spans: dict[tuple[str, int, int], None] = {}
        frontier = [(fn, 0)]
        while frontier:
            f, d = frontier.pop()
            if f in seen or not inspect.isfunction(f):
                continue
            seen.add(f)
            span = _fn_span(f)
            if span is None:
                continue
            spans[span] = None
            if d >= depth:
                continue
            co_names = f.__code__.co_names
            for name in co_names:
                g = f.__globals__.get(name)
                if inspect.isfunction(g):
                    frontier.append((g, d + 1))
                elif inspect.ismodule(g) and getattr(
                    g, "__file__", ""
                ).startswith(REPO + os.sep):
                    # module-attribute call style (`sources.table(...)`):
                    # the attribute name also appears in co_names, so any
                    # repo-local function reached as <module>.<attr> joins
                    # the frontier — without this the common
                    # `from ... import module` idiom was invisible to the
                    # git-evidence leg.
                    for attr in co_names:
                        m = getattr(g, attr, None)
                        if inspect.isfunction(m):
                            frontier.append((m, d + 1))
        return list(spans) or None
    except Exception:
        return None


def defining_file(key: str) -> str | None:
    spans = defining_spans(key)
    return spans[0][0] if spans else None


def _onelines(out: str) -> list[str]:
    import re

    return [
        l for l in out.splitlines() if re.match(r"^[0-9a-f]{7,40} ", l)
    ]


def commits_touching(path: str, since: str) -> list[str]:
    out = subprocess.run(
        ["git", "log", "--oneline", f"{since}..HEAD", "--", path],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return [l for l in out.stdout.splitlines() if l.strip()]


def commits_touching_spans(
    spans: list[tuple[str, int, int]], since: str
) -> list[str] | None:
    """Commits in ``since..HEAD`` whose diff intersects ANY of the
    given (file, start, end) line spans (``git log -L`` follows each
    range through edits; one invocation per file carries all of that
    file's ranges). Returns None when git cannot track a range (file
    renamed away, span outside the committed blob) — callers fall
    back to file-level evidence. NOTE the deliberate granularity: a
    commit that only touches UNRELATED functions in the same file no
    longer refuses adjudication (the round-6 q06/q09 false positives —
    an unrelated query ADDED to relational.py); changes that route
    around the tracked call graph (session confs, deeper helpers) are
    still caught by the plan-fingerprint leg."""
    by_file: dict[str, list[tuple[int, int]]] = {}
    for path, start, end in spans:
        by_file.setdefault(path, []).append((start, end))
    # spans carry WORKING-TREE line numbers (inspect.getsourcelines),
    # but `git log -L` resolves ranges against the HEAD blob —
    # uncommitted edits that shift lines would silently mis-scope the
    # evidence. A dirty defining file disqualifies span tracking;
    # returning None routes the caller to file-level commits_touching.
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", *by_file],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if dirty.returncode != 0 or dirty.stdout.strip():
        return None
    commits: dict[str, None] = {}
    for path, ranges in by_file.items():
        args = ["git", "log", "--oneline"]
        for start, end in ranges:
            args.append(f"-L{start},{end}:{path}")
        args.append(f"{since}..HEAD")
        out = subprocess.run(args, cwd=REPO, capture_output=True, text=True)
        if out.returncode != 0:
            return None
        for line in _onelines(out.stdout):
            commits[line] = None
    return list(commits)


def adjudicate(
    regressions: list[tuple[str, float, float, float]],
    plans_old: str | dict | None,
    plans_new: str | dict | None,
    git_since: str | None,
    *,
    cpu_old: dict | None = None,
    cpu_new: dict | None = None,
) -> list[str]:
    """For each flagged regression, gather the mechanical evidence and
    emit a verdict line. Returns the lines (also printed). The plans
    arguments accept either a PLANS_r{N}.txt path or an
    already-loaded {key: fingerprint} dict (the round-8 bench
    artifacts embed fingerprints directly).

    CPU co-primary (r10 verdict #2): when both artifacts carry the
    per-key ``queries_cpu`` medians, a wall regression with FLAT
    executor CPU (|delta| <= 15% or <= 0.2s) and an unchanged plan is
    SELF-ADJUDICATED as host variance — the exact evidence form the
    r9/r10 checkout-bisects established, now read straight from the
    artifact. A wall regression whose CPU moved too is NOT dismissed
    (could be real, could be contention inflating CPU — re-measure
    solo/idle)."""
    fps_old = (
        plans_old
        if isinstance(plans_old, dict)
        else load_plan_fingerprints(plans_old) if plans_old else {}
    )
    fps_new = (
        plans_new
        if isinstance(plans_new, dict)
        else load_plan_fingerprints(plans_new) if plans_new else {}
    )
    lines: list[str] = []
    for name, o, n, pct in regressions:
        facts = []
        changed = False
        plan_same = None
        cpu_flat = None
        if plans_old and plans_new:
            fo, fn_ = fps_old.get(name), fps_new.get(name)
            if fo != fn_:
                changed = True
                plan_same = False
                facts.append(f"plan changed [{fo or '(absent)'}] -> [{fn_ or '(absent)'}]")
            else:
                plan_same = True
                facts.append("plan fingerprint unchanged")
        if cpu_old and cpu_new and name in cpu_old and name in cpu_new:
            co, cn = cpu_old[name], cpu_new[name]
            cpu_pct = (cn - co) / co if co else 0.0
            cpu_flat = abs(cpu_pct) <= 0.15 or abs(cn - co) <= 0.2
            facts.append(
                f"executor CPU {co:.2f}s -> {cn:.2f}s "
                f"({cpu_pct:+.0%}{', flat' if cpu_flat else ''})"
            )
        if git_since:
            spans = defining_spans(name)
            if spans:
                files = sorted({s[0] for s in spans})
                commits = commits_touching_spans(spans, git_since)
                if commits is None:
                    # a range was untrackable -> conservative file-level
                    commits = []
                    for f in files:
                        commits += commits_touching(f, git_since)
                    scope = ", ".join(files)
                else:
                    scope = (
                        f"{len(spans)} call-graph span(s) in "
                        + ", ".join(files)
                    )
                if commits:
                    changed = True
                    shas = ", ".join(c.split()[0] for c in commits[:5])
                    more = f" +{len(commits) - 5} more" if len(commits) > 5 else ""
                    facts.append(
                        f"code changed ({shas}{more}) in {scope}"
                    )
                else:
                    facts.append(
                        f"no commits touched {scope} since {git_since}"
                    )
                    file_commits = []
                    for f in files:
                        file_commits += commits_touching(f, git_since)
                    if file_commits:
                        facts.append(
                            f"(file(s) changed elsewhere: "
                            f"{', '.join(sorted({c.split()[0] for c in file_commits})[:3])}"
                            f" — tracked spans untouched)"
                        )
            else:
                facts.append("defining file unresolved")
        if changed:
            verdict = 'ADJUDICATION REFUSED: "unchanged/host variance" is falsified — '
        elif cpu_flat is True and plan_same is True:
            verdict = (
                "SELF-ADJUDICATED host variance: wall swing with flat "
                "executor CPU and unchanged plan — "
            )
        elif cpu_flat is False:
            verdict = (
                "NOT dismissible from the artifact (CPU moved with wall; "
                "real regression or contention-inflated CPU — re-measure "
                "solo/idle) — "
            )
        else:
            verdict = "eligible for host-variance adjudication — "
        lines.append(f"  {name}: {verdict}{'; '.join(facts) or 'no evidence sources given'}")
    for ln in lines:
        print(ln)
    return lines


def main() -> int:
    args: list[str] = []
    opts: dict[str, str] = {}
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i].startswith("--"):
            opts[argv[i][2:]] = argv[i + 1] if i + 1 < len(argv) else ""
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) < 2:
        print(__doc__)
        return 2
    old, new, stat = load_pair(args[0], args[1])
    threshold = float(args[2]) if len(args) > 2 else 0.25
    abs_floor = 0.2
    regressions = []
    print(f"comparing per-key {stat} timings")
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
        print("\nper-key adjudication evidence:")
        # explicit PLANS files win; otherwise use the fingerprints the
        # round-8 bench artifacts embed (one-artifact adjudication)
        plans_old = opts.get("plans-old") or (
            load_embedded_fingerprints(args[0]) or None
        )
        plans_new = opts.get("plans-new") or (
            load_embedded_fingerprints(args[1]) or None
        )
        o_all, n_all = _parse(args[0]), _parse(args[1])
        adjudicate(
            regressions,
            plans_old,
            plans_new,
            opts.get("git-since"),
            cpu_old=o_all.get("queries_cpu"),
            cpu_new=n_all.get("queries_cpu"),
        )
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
