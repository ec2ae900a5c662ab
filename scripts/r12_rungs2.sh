#!/bin/bash
# Round-12 ladder, part 2 — the two new lifecycle rungs, run SOLO via
# tmux with per-process isolation and pre/post uptime stamps (same
# protocol as r12_rungs.sh).
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

echo "==== r12 ladder part 2 start $(date -u +%FT%TZ) ====" >> "$OUT"

# headline RAG rung v4: both r12 fixes in (doc-repartition BM25 build,
# map-side-scored IVF candidates)
rung rag_1024x_v4 python scripts/scale_smoke.py 1024 $SF --ops=rag_retrieval_qps --metrics

MAINT=bm25_maint_build,bm25_maint_query_1seg,bm25_maint_appends4,bm25_maint_query_5seg,bm25_maint_compact,bm25_maint_query_compacted
rung bm25_maint_64x  python scripts/scale_smoke.py 64  $SF --ops=$MAINT --metrics
rung bm25_maint_256x python scripts/scale_smoke.py 256 $SF --ops=$MAINT --metrics

rung ingest_inc_64x  python scripts/scale_smoke.py 64  $SF --ops=streaming_ingest_incremental --metrics
rung ingest_inc_256x python scripts/scale_smoke.py 256 $SF --ops=streaming_ingest_incremental --metrics

echo "==== r12 ladder part 2 end $(date -u +%FT%TZ) ====" >> "$OUT"
