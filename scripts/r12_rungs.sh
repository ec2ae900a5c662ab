#!/bin/bash
# Round-12 measurement ladder — run SOLO via tmux (detached processes
# are reaped when the launching tool call exits; tmux panes survive).
# Each rung is its own python process (per-process isolation protocol);
# uptime is stamped before and after every rung so load contamination
# is adjudicable from the raw log.
set -u
OUT=/root/repo/SMOKE_r12_raw.txt
SF=/root/testdata/sf0.1
cd /root/repo

rung() {
  local tag="$1"; shift
  echo "=== RUNG $tag | pre-uptime: $(uptime)" >> "$OUT"
  local t0=$SECONDS
  "$@" >> "$OUT" 2>&1
  echo "=== RUNG $tag done rc=$? wall=$((SECONDS-t0))s | post-uptime: $(uptime)" >> "$OUT"
}

echo "==== r12 ladder start $(date -u +%FT%TZ) ====" >> "$OUT"

# 1+2: heap-aware persist validation (verdict #3): minhash 1024x at 8g
# must land within ~15% of the 16g wall (r11: 341s vs 196.5s).
rung minhash_1024x_8g  env SPARK_GRAFT_DRIVER_MEM=8g  python scripts/scale_smoke.py 1024 $SF --ops=minhash_candidates_capped2 --metrics
rung minhash_1024x_16g env SPARK_GRAFT_DRIVER_MEM=16g python scripts/scale_smoke.py 1024 $SF --ops=minhash_candidates_capped2 --metrics

# 3-5: the newly auto-sized corpus-wide ops (verdict #2) through the
# library API at 64x/256x/1024x.
AUTOOPS=exactsubstr_spans,line_dedup_kept_lines,pack_sequences_placed,epoch_shuffle_rows
rung autoops_64x   python scripts/scale_smoke.py 64   $SF --ops=$AUTOOPS --metrics
rung autoops_256x  python scripts/scale_smoke.py 256  $SF --ops=$AUTOOPS --metrics
rung autoops_1024x python scripts/scale_smoke.py 1024 $SF --ops=$AUTOOPS --metrics

# 6: RAG retrieval 1024x octave (verdict #6): target wall exponent
# <= ~1.1 vs the r11 256x indexed leg (60.7s).
rung rag_1024x python scripts/scale_smoke.py 1024 $SF --ops=rag_retrieval_qps --metrics

echo "==== r12 ladder end $(date -u +%FT%TZ) ====" >> "$OUT"
