"""Measure the per-job scheduler floor of THIS box at THIS moment.

Round 9 established (SCALE.md "Bench-context caveat") that the driver
bench's cross-round deltas are polluted by VM-level degradation: the
same command measures 15-50% slower after hours of rehearsals, and the
~70 ms/job scheduler floor is the term that moves. This tool records
that floor as a stamp so any bench/rehearsal JSON can be
floor-normalized when compared across rounds.

Protocol: 20 trivial one-stage jobs (``spark.range(1000, numPartitions=1)
.count()``), timed individually after 3 discarded warmups (JVM/codegen
startup). The reported floor is the MEDIAN per-job wall time — median,
not mean, because GC pauses land on individual jobs and the floor is a
scheduler property, not a tail property. Also reports p10/p90 so a
bimodal (thermally-throttled) box is visible in the stamp itself.

Usage:
    python tools/bench_floor.py            # prints one JSON line
    python tools/bench_floor.py --out f.json

Other tools embed it:
    from tools.bench_floor import measure_floor
    stamp = measure_floor(spark)           # dict, reuses a live session
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WARMUP = 3
N_TIMED = 20


def measure_floor(spark) -> dict:
    for _ in range(N_WARMUP):
        spark.range(1000, numPartitions=1).count()
    per_job = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        spark.range(1000, numPartitions=1).count()
        per_job.append(time.perf_counter() - t0)
    per_job.sort()
    q = statistics.quantiles(per_job, n=10)
    return {
        "metric": "per_job_floor_seconds",
        "floor_median": round(statistics.median(per_job), 4),
        "floor_p10": round(q[0], 4),
        "floor_p90": round(q[-1], 4),
        "n_jobs": N_TIMED,
        "wall_clock_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def main() -> None:
    from trialstreamer_spark.session import get_spark

    stamp = measure_floor(get_spark("bench-floor"))
    line = json.dumps(stamp)
    print(line)
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        with open(out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
