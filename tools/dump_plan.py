"""Dump .explain("formatted") for named queries to files — the audit
artifact the optimization rounds commit as plans/rNN/<query>_<tag>.txt.

Usage: python tools/dump_plan.py <sf_dir> <outdir> <tag> <query> [query ...]
       python tools/dump_plan.py /root/testdata/sf0.1 plans/r11 before nation_market_share
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trialstreamer_spark.plans.all_queries import QUERIES  # noqa: E402
from trialstreamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, outdir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    from tools.job_count import run_preps

    run_preps(spark, sf_dir)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)


if __name__ == "__main__":
    main()
