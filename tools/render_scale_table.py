"""Render scale_rehearsal.json as the SCALE.md markdown table plus a
straggler summary (queries >2x DuckDB at sf1), so the doc step after a
rehearsal is mechanical and the table can never drift from the JSON.

Run: python tools/render_scale_table.py [scale_rehearsal.json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "scale_rehearsal.json"
    runs = json.load(open(path))
    by_sf = {r["sf_dir"].rstrip("/").rsplit("/", 1)[-1]: r["queries"] for r in runs}
    small, big = by_sf.get("sf0.1", {}), by_sf.get("sf1", {})
    names = sorted(set(small) | set(big))

    def cell(row: dict | None, key: str):
        if not row:
            return "—"
        if key in row:
            return row[key]
        if key.endswith("_s") and f"{key[:-2]}_error" in row:
            return "FAIL"
        return "—"

    print("| query | sf0.1 Spark s | sf0.1 DuckDB s | sf0.1 ratio |"
          " sf1 Spark s | sf1 DuckDB s | sf1 ratio |")
    print("|---|---|---|---|---|---|---|")
    for n in names:
        s, b = small.get(n), big.get(n)
        print(f"| `{n}` | {cell(s, 'spark_s')} | {cell(s, 'duckdb_s')} |"
              f" {cell(s, 'ratio')} | {cell(b, 'spark_s')} |"
              f" {cell(b, 'duckdb_s')} | {cell(b, 'ratio')} |")

    print()
    lag = [(n, big[n]["ratio"], big[n]["spark_s"]) for n in names
           if isinstance(big.get(n, {}).get("ratio"), (int, float))
           and big[n]["ratio"] > 2]
    lag.sort(key=lambda t: -t[1])
    tot_s = sum(r.get("spark_s", 0) for r in big.values() if isinstance(r.get("spark_s"), (int, float)))
    tot_d = sum(r.get("duckdb_s", 0) for r in big.values() if isinstance(r.get("duckdb_s"), (int, float)))
    if tot_d:
        print(f"sf1 aggregate: Spark {tot_s:.1f}s vs DuckDB {tot_d:.1f}s "
              f"(ratio {tot_s / tot_d:.2f}) over {len(names)} queries")
    else:
        print("sf1 aggregate: no sf1 DuckDB timings in this run "
              "(sf0.1 half rendered above)")
    if big:
        print(f"sf1 stragglers >2x ({len(lag)}):")
        for n, r, s in lag:
            print(f"  {n}: {r}x at {s}s absolute")
    errs = [(n, k) for n, row in big.items() for k in row if k.endswith("_error")]
    if errs:
        print("sf1 errors:", errs)


if __name__ == "__main__":
    main()
