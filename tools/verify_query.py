"""Oracle-verify named queries against DuckDB at sf0.001 AND sf0.01 —
the per-change correctness gate of the optimization rounds (a touched
query is only kept once this passes; the full pytest suite re-checks
everything before the round ends).

Usage: python tools/verify_query.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_util import assert_matches  # noqa: E402
from trialstreamer_spark.plans.all_queries import ORACLES, QUERIES  # noqa: E402
from trialstreamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("verify-query")
    spark.sparkContext.setLogLevel("ERROR")
    failed = False
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            try:
                assert_matches(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
                print(f"OK   {name} @ {sf_dir}")
            except Exception as exc:  # noqa: BLE001
                failed = True
                print(f"FAIL {name} @ {sf_dir}: {exc}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
