"""DuckDB-only oracle timings for the heaps_sf10 decade (r10 VERDICT
#4): the r10 top-decade rows are Spark-side only (ratio=None); this
puts a measured oracle column (or an explicit reasoned skip) on the
named capped production dedup paths.

Each oracle runs in a SUBPROCESS with a hard wall-clock timeout —
unlike scale_rehearsal's SLOW_CUTOFF (which only stops REPEATS after a
run finishes), a single heaps_sf10 oracle can run for hours (DuckDB
took 404 s at heaps_sf1 for the prefix pairs), so the budget must bound
the FIRST run too. A timeout is recorded as
``duckdb_skipped: "timeout>Ns"`` — the reasoned skip the verdict asks
for, with the budget in the artifact. DuckDB's spill stays capped at
40 GB (same as scale_rehearsal) so an out-of-core blowup fails cleanly.

Usage: python tools/heaps_oracle.py out.json sf_dir timeout_s [names...]
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: The verdict-named capped production paths, measured in rising
#: r10-Spark-cost order so the cheap ones land even on a tight budget.
DEFAULT_NAMES = (
    "shingle_df_histogram",
    "dedup_jaccard_capped",
    "containment_pairs_capped",
    "dup_pair_jaccard_calibration",
    "jaccard_prefix_filter_pairs",
)


def _run_oracle(sql: str, sf_dir: str, q: mp.Queue) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='40GB'")
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    t0 = time.perf_counter()
    try:
        con.execute(sql).fetchall()
        q.put({"duckdb_s": round(time.perf_counter() - t0, 3)})
    except Exception as e:  # noqa: BLE001 — recorded, not fatal
        q.put({"duckdb_error": repr(e)[:200]})


def main() -> None:
    from trialstreamer_spark.plans.all_queries import ORACLES

    out_path, sf_dir, timeout_s = sys.argv[1], sys.argv[2], float(sys.argv[3])
    names = sys.argv[4:] or list(DEFAULT_NAMES)
    results: dict[str, dict] = {}
    for name in names:
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_run_oracle, args=(ORACLES[name], sf_dir, q))
        t0 = time.perf_counter()
        p.start()
        p.join(timeout_s)
        if p.is_alive():
            p.terminate()
            p.join(10)
            if p.is_alive():
                p.kill()
                p.join()
            row: dict = {"duckdb_skipped": f"timeout>{int(timeout_s)}s"}
        else:
            try:
                row = q.get_nowait()
            except Exception:  # noqa: BLE001
                row = {"duckdb_error": f"subprocess died rc={p.exitcode}"}
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        results[name] = row
        print(f"{name:32s} {row}", flush=True)
        with open(out_path, "w") as f:
            json.dump({"sf_dir": os.path.abspath(sf_dir),
                       "timeout_s": timeout_s, "queries": results}, f, indent=1)


if __name__ == "__main__":
    main()
