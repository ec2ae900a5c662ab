"""Probe: per-drain wall of the memory-sink streaming keys vs the
state-partition width (spark.sql.shuffle.partitions at trigger time).

Solo evidence for round 13: the session default (2x cores = 64 at
local[32]) makes every availableNow drain pay 64 state-store
partitions of commit I/O per trigger while the fixture aggregation
holds only a few hundred groups. Run:

    python scripts/stream_width_probe.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from smartpipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("stream_width_probe")

import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
KEYS = [
    "ext_stream_tumbling",
    "ext_stream_sliding",
    "ext_stream_session",
    "ext_stream_join",
    "ext_stream_outer_join",
    "ext_stream_dedup",
]

out = {}
for width in [None, 32, 16, 8]:
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if width is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        for key in KEYS:
            if key not in qs:
                continue
            best = []
            for _ in range(REPS):
                t0 = time.time()
                df = qs[key](spark, SF)
                df.write.format("noop").mode("overwrite").save()
                best.append(time.time() - t0)
            label = f"{key}@{width or 'sess'}"
            out[label] = {
                "min": round(min(best), 3),
                "med": round(sorted(best)[len(best) // 2], 3),
                "rows": df.count(),
            }
            print(label, out[label], flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

print(json.dumps(out))
