"""List registered queries with NO green driver row in any
CORRECTNESS_r*.json, ranked oldest-first (VERDICT r8 #7).

These queries are hash-checked every round by the in-repo sf0.01 sweep
(tests/test_sf01_sweep.py) — correctness coverage is total either way —
but an external driver sample is the stronger, independent signal. Each
round's builder should nominate the head of this list for the driver;
the list shrinks automatically as CORRECTNESS files accumulate greens.

Age = the commit date the query name first appeared in the repo (git
log -S): an old never-sampled query has waited longest for independent
confirmation, so it sorts first.

Usage: python tools/never_green.py [-n TOP]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Pinned to the head of the list regardless of age (r9 VERDICT #4).
#: Of the four r2/r3 driver reds the verdict names, three
#: (latest_per_type, sessionize, recency_topk) already carry an r01
#: GREEN so they are not in this never-green list at all;
#: asof_join_last_click is the one whose driver record is red-only
#: (sweep-green for seven rounds — a fresh sample closes it).
#: rrf_fusion_topk entered the registry after r9's binding rehearsal.
#: Names not in the never-green set are skipped automatically.
NOMINATED: tuple[str, ...] = (
    "asof_join_last_click",
    "rrf_fusion_topk",
    # entered the registry in round 10 — never driver-sampled by
    # construction; scale-measured (sf1 0.51x) and sweep-covered.
    "crosslingual_pair_mining",
)


def never_driver_green() -> list[str]:
    from trialstreamer_spark.plans.all_queries import ORACLES, QUERIES

    seen: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            rows = json.load(open(f))
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if isinstance(r, dict) and r.get("hash_match"):
                seen.add(name)
    return sorted(n for n in QUERIES if n not in seen and n in ORACLES)


def first_commit_date(name: str) -> str:
    """ISO date of the oldest commit whose diff introduces the query
    name (registration string), or '?' if git can't say."""
    try:
        out = subprocess.run(
            ["git", "log", "--reverse", "--format=%cs", "-S",
             f'"{name}"', "--", "trialstreamer_spark"],
            cwd=REPO, capture_output=True, text=True, timeout=120,
        ).stdout.strip().splitlines()
        return out[0] if out else "?"
    except Exception:
        return "?"


def main() -> None:
    top = None
    if "-n" in sys.argv:
        top = int(sys.argv[sys.argv.index("-n") + 1])
    names = never_driver_green()
    dated = sorted(
        ((first_commit_date(n), n) for n in names),
        key=lambda t: (t[0] == "?", t[0], t[1]),
    )
    # nominations first (in NOMINATED order), then the rest oldest-first
    nom = [t for n in NOMINATED for t in dated if t[1] == n]
    dated = nom + [t for t in dated if t[1] not in NOMINATED]
    for date, name in dated[:top]:
        print(f"{date}  {name}")
    print(f"-- {len(names)} of registry never driver-sampled "
          f"(all sweep-covered at sf0.01)", file=sys.stderr)


if __name__ == "__main__":
    main()
