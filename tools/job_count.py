"""Per-query Spark JOB count + wall time — the r9 verdict's requested
diagnostic (Next round #1): on this VM each job costs a ~70-85 ms
scheduler round-trip (tools/bench_floor.py), so under AQE — which
materializes every exchange as its own job — job count × floor is the
lower bound a sub-second query can ever reach. A query can only get
faster than that by REMOVING exchanges, not by tuning them.

Runs each named query with the standard offline preps applied (same
contract as bench.py), twice warm, then reports the SECOND run's job
count and best-of-2 wall time. Job attribution via job groups
(setJobGroup around the action).

Usage: python tools/job_count.py <sf_dir> <query> [query ...]
       python tools/job_count.py /root/testdata/sf0.1 nation_market_share
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trialstreamer_spark.plans.all_queries import QUERIES  # noqa: E402
from trialstreamer_spark.session import get_spark  # noqa: E402


def run_preps(spark, sf_dir: str) -> None:
    from trialstreamer_spark.io import prepare_buckets, warm_cache
    from trialstreamer_spark.operators.clustering import prepare_pq, prepare_semdedup
    from trialstreamer_spark.operators.dedup import prepare_dedup
    from trialstreamer_spark.operators.quality import prepare_curation
    from trialstreamer_spark.operators.retrieval import prepare_stats
    from trialstreamer_spark.operators.similarity import prepare_indexes
    from trialstreamer_spark.operators.temporal import prepare_temporal
    from trialstreamer_spark.streaming.parity import prepare_parity

    for prep in (warm_cache, prepare_buckets, prepare_indexes, prepare_dedup,
                 prepare_stats, prepare_pq, prepare_semdedup, prepare_curation,
                 prepare_temporal, prepare_parity):
        try:
            prep(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"prep {prep.__name__}: {exc}", file=sys.stderr)


def probe(spark, name: str, sf_dir: str) -> dict:
    sc = spark.sparkContext
    QUERIES[name](spark, sf_dir).count()  # warm (codegen + caches)
    times = []
    group = ""
    for i in range(2):
        group = f"probe-{name}-{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
        sc.setJobGroup(None, None)
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
    return {
        "query": name,
        "n_jobs": len(jobs),
        "best_s": round(min(times), 4),
        "floor_bound_s": round(len(jobs) * 0.075, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("job-count")
    spark.sparkContext.setLogLevel("ERROR")
    run_preps(spark, sf_dir)
    for name in names:
        print(json.dumps(probe(spark, name, sf_dir)))


if __name__ == "__main__":
    main()
