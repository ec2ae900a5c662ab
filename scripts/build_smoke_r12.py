#!/usr/bin/env python
"""Assemble SMOKE_r12.json from the raw tmux ladder log
(SMOKE_r12_raw.txt) — structured per-rung walls/CPU/spill plus the
round's adjudications against the r11 references."""

from __future__ import annotations

import json
import re

RAW = "/root/repo/SMOKE_r12_raw.txt"
OUT = "/root/repo/SMOKE_r12.json"


def main() -> None:
    text = open(RAW, errors="replace").read().replace("\r", "\n")
    # pair each rung's JSON with the header ABOVE it (a crashed rung
    # emits no JSON, so positional zip would misalign everything after)
    runs = {}
    cur = pre = None
    for line in text.splitlines():
        m = re.match(r"=== RUNG (\S+) \| pre-uptime:(.*)", line)
        if m:
            cur, pre = m.group(1), m.group(2).strip()
            continue
        m = re.match(r"=== RUNG (\S+) done rc=(\d+)[^|]*\| post-uptime:(.*)", line)
        if m and m.group(1) in runs:
            runs[m.group(1)]["rc"] = int(m.group(2))
            runs[m.group(1)]["post_uptime"] = m.group(3).strip()
            continue
        if cur and line.startswith('{"n_docs"'):
            runs[cur] = {"pre_uptime": pre, **json.loads(line)}

    def wall(tag, key):
        return runs[tag]["timings"][key]

    def cpu(tag):
        return runs[tag]["metrics"]["executorCpuSec"]

    import math

    def expo(lo, hi, factor=4.0):
        return round(math.log(hi / lo) / math.log(factor), 2)

    art = {
        "comment": (
            "Round-12 rungs, all solo via tmux with pre/post uptime stamped "
            "(sequential same-window runs; load shown is the prior rung's "
            "decay, cores were otherwise idle). HEAP-AWARE PERSIST "
            "(verdict #3): minhash 1024x on the DEFAULT 8g heap now runs "
            "AT/below the 16g wall — the r11 341s-vs-196.5s thrash gap is "
            "closed by persist_intermediate's DISK_ONLY choice when a "
            "frame's plan-estimated size crowds the unified pool; the 16g "
            "control's CPU reproduces r11's 16g CPU nearly bit-for-bit "
            "(5973 vs 5969), anchoring the window. AUTO-WIDTH EXTENSION "
            "(verdict #2): ExactSubstr / CCNet line dedup / pack_sequences "
            "/ epoch_shuffle driven purely through the library API with "
            "partitions='auto' defaults at 64x/256x/1024x — zero spill "
            "everywhere, every comparable wall at-or-under its prior-round "
            "reference (exactsubstr 64x 20.8s vs r5's 48.5s; line_dedup "
            "256x 8.6s vs r7's 42.9s; pack/epoch flat ~1-3s at every rung "
            "— their exchanges stay under the pressure floor by design). "
            "RAG 1024x octave (verdict #6): rung v4 carries BOTH r12 "
            "fixes born from the spill adjudication (see "
            "spill_attribution_1024x) — the 73GB 'BM25 build spill' three "
            "build variants were rewritten against was phase-attributed to "
            "the IVF query leg, which now scores map-side; the build "
            "repartitions doc rows pre-explode. v3 -> v4: rung wall 971s "
            "-> 336s, build 734.6 -> 252.8s, query leg 147.9 -> 41.6s "
            "(FASTER than the r11 256x reference: exponent -0.27), spill "
            "73.2 -> 0 GB. Part-2 rungs: the BM25 segment-manifest "
            "lifecycle (build/probe/4 deferred appends/multi-segment "
            "probe/compact/probe) at 64x/256x — zero spill, build "
            "exponent 0.50, compact 6.4s at 1.28M docs, compacted probe "
            "back at the 1-segment floor; and the incremental-ingest "
            "curve (quality gate -> dedup_against a GROWING persisted "
            "index -> classifier scoring -> CDC chunk accounting -> "
            "curated append): 3952 -> 6002 docs/s at 64x -> 256x with "
            "FLAT per-batch walls as the index grows, zero spill."
        ),
        "heap_aware_persist_1024x_minhash": {
            "8g": {
                "wall_s": wall("minhash_1024x_8g", "minhash_candidates_capped2"),
                "execCpuSec": cpu("minhash_1024x_8g"),
                "spillGB": runs["minhash_1024x_8g"]["metrics"]["memSpillGB"]
                + runs["minhash_1024x_8g"]["metrics"]["diskSpillGB"],
            },
            "16g": {
                "wall_s": wall("minhash_1024x_16g", "minhash_candidates_capped2"),
                "execCpuSec": cpu("minhash_1024x_16g"),
            },
            "r11_reference": {"8g_wall_s": 341.01, "16g_wall_s": 196.49},
            "est_join_rows_bit_equal_r11": runs["minhash_1024x_8g"]["counts"][
                "minhash_candidates_capped2_est_join_rows"
            ]
            == 36184589,
            "verdict_criterion": "8g within ~15% of 16g",
            "measured": "8g BEATS 16g",
        },
        "auto_width_ops_ladder": {
            tag.split("_")[1]: {
                "timings": runs[tag]["timings"],
                "execCpuSec": cpu(tag),
                "spillGB": runs[tag]["metrics"]["memSpillGB"]
                + runs[tag]["metrics"]["diskSpillGB"],
                "counts": {
                    k: v
                    for k, v in runs[tag]["counts"].items()
                    if k != "docs_storage_level"
                },
            }
            for tag in ("autoops_64x", "autoops_256x", "autoops_1024x")
            if tag in runs
        },
    }
    if "autoops_1024x" in runs and "autoops_256x" in runs:
        art["auto_width_exponents_256x_to_1024x"] = {
            k: expo(wall("autoops_256x", k), wall("autoops_1024x", k))
            for k in runs["autoops_1024x"]["timings"]
        }
    rag_tag = next(
        (
            t
            for t in (
                "rag_1024x_v5",
                "rag_1024x_v4",
                "rag_1024x_v3",
                "rag_1024x_final",
                "rag_1024x_retry",
                "rag_1024x",
            )
            if t in runs
        ),
        None,
    )
    if rag_tag:
        r = runs[rag_tag]
        art["rag_retrieval_1024x"] = {
            "rung": rag_tag,
            "wall_s": r["timings"].get("rag_retrieval_qps"),
            "qps": r["counts"].get("rag_queries_per_sec"),
            "ivf_build_s": r["counts"].get("rag_index_build_s"),
            "bm25_build_s": r["counts"].get("rag_bm25_build_s"),
            "execCpuSec": r["metrics"]["executorCpuSec"],
            "spillGB": r["metrics"]["memSpillGB"] + r["metrics"]["diskSpillGB"],
            "r11_reference_256x_wall_s": 60.73,
            "wall_exponent_vs_256x": (
                expo(60.73, r["timings"]["rag_retrieval_qps"])
                if r["timings"].get("rag_retrieval_qps")
                else None
            ),
        }
    # r12 spill adjudication: the rung-level 73GB was phase-attributed
    # by scripts/rag_phase_probe.py + scripts/bm25_build_probe.py to
    # the IVF query leg (NOT the BM25 build, which three variants had
    # been rewritten against); both fixes measured solo at 1024x.
    art["spill_attribution_1024x"] = {
        "rung_spill_gb_constant_across_3_bm25_variants": 73.16,
        "solo_bm25_build_spill_gb": 0.0,
        "phase_probe_vec_leg_spill_gb": 73.16,
        "fix_map_side_scored_ivf_candidates": {
            "shuffle_gb": {"before": 12.95, "after": 0.51},
            "spill_gb": {"before": 73.16, "after": 0.0},
            "vec_leg_wall_s": {"before_loaded": 209.6, "after_idle": 238.4},
            "vec_leg_cpu_s": {"before_loaded": 4922, "after_idle": 5498},
        },
        "fix_bm25_doc_repartition": {
            "solo_build_wall_s": {"exploded_words_repartition": 669.0, "doc_repartition": 249.9},
            "postings_rows_bit_equal": 124140544,
            "spill_gb": 0.0,
        },
    }
    for tag in ("bm25_maint_64x", "bm25_maint_256x", "bm25_maint_1024x"):
        if tag in runs:
            r = runs[tag]
            art.setdefault("bm25_index_maintenance", {})[tag.split("_")[-1]] = {
                "timings": r["timings"],
                "compact_report": r["counts"].get("bm25_maint_compact_report"),
                "execCpuSec": r["metrics"]["executorCpuSec"],
                "spillGB": r["metrics"]["memSpillGB"] + r["metrics"]["diskSpillGB"],
            }
    for tag in ("ingest_inc_64x", "ingest_inc_256x", "ingest_inc_1024x"):
        if tag in runs:
            r = runs[tag]
            art.setdefault("streaming_ingest_incremental", {})[
                tag.split("_")[-1]
            ] = {
                "wall_s": r["timings"].get("streaming_ingest_incremental"),
                "docs_per_sec": r["counts"].get("ingest_inc_docs_per_sec"),
                "docs_in": r["counts"].get("ingest_inc_docs_in"),
                "index_seed_s": r["counts"].get("ingest_inc_index_seed_s"),
                "batches": r["counts"].get("ingest_inc_batches"),
                "index_sigs_final": r["counts"].get("ingest_inc_index_sigs_final"),
                "execCpuSec": r["metrics"]["executorCpuSec"],
                "spillGB": r["metrics"]["memSpillGB"] + r["metrics"]["diskSpillGB"],
            }
    art["raw_runs"] = runs
    with open(OUT, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"wrote {OUT}: {list(art.keys())}")


if __name__ == "__main__":
    main()
