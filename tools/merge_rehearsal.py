"""Merge a named-filter rehearsal patch into the base rehearsal JSON:
per-query rows in the patch overwrite the base (same methodology,
re-measured after a plan change), everything else is untouched.

Run: python tools/merge_rehearsal.py base.json patch.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_path, patch_path = sys.argv[1], sys.argv[2]
    base = json.load(open(base_path))
    patch = json.load(open(patch_path))
    patched = 0
    by_dir = {r["sf_dir"]: r for r in base}
    for run in patch:
        dst = by_dir.get(run["sf_dir"])
        if dst is None:
            continue
        for name, row in run["queries"].items():
            dst["queries"][name] = row
            patched += 1
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"patched {patched} rows into {base_path}")


if __name__ == "__main__":
    main()
