"""Per-query rotation age: the most recent NAMED re-verification event
(driver CORRECTNESS row, judge re-run, or builder rotation batch) for
every registered query — the freshness view behind ROTATION.md's
"oldest-rotation-first" maintenance policy (round-9 verdict task 3).

    python tools/rotation_age.py            # distribution + oldest 40
    python tools/rotation_age.py --all      # every query's age
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Judge re-run lists quoted in the round verdicts (by round).
JUDGE_RERUNS = {
    8: [
        "q25", "q55", "q100", "q111", "q116", "q139", "q150", "q170",
        "q218", "q263", "q283", "q304", "q321", "q339", "q355", "q359",
        "q362", "q368", "q370", "q371",
    ],
}


def compute_ages() -> dict[str, int]:
    sys.path.insert(0, REPO)
    from airflow_spotify_etl_spark.plans import all_queries

    full = sorted(all_queries())
    pref = {n.split("_")[0]: n for n in full}
    last: dict[str, int] = {}

    def mark(names, rnd):
        for n in names:
            if n in pref:
                n = pref[n]
            if n in set(full):
                last[n] = max(last.get(n, 0), rnd)

    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        d = json.load(open(path))
        keys = d.get("queries", d)
        mark([k for k in keys if k.startswith("q")], rnd)
    for path in glob.glob(os.path.join(REPO, "ROTATION_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        d = json.load(open(path))
        q = d.get("queries", {})
        keys = q if isinstance(q, list) else list(q)
        mark(keys, rnd)
    rot = open(os.path.join(REPO, "ROTATION.md")).read()
    for rnd in (6, 7):
        seg = rot.split(f"| r{rnd} |")
        if len(seg) > 1:
            mark(re.findall(r"q\d+_\w+", seg[1].split("\n")[0]), rnd)
    # r8 new-at-introduction block: EXACTLY q339-q371 were introduced (and
    # strict-selfchecked) in round 8. Bounded on both ends and regex-parsed
    # so later rounds' additions (q372+, and any future 4-digit numbers)
    # don't inherit an r8 stamp here — their rounds' CORRECTNESS/ROTATION
    # files are the source of truth (r9 advice, tools/rotation_age.py row).
    def _qnum(name: str) -> int:
        m = re.match(r"q(\d+)_", name)
        return int(m.group(1)) if m else -1

    mark([n for n in full if 339 <= _qnum(n) <= 371], 8)
    # r9 new-at-introduction block, same rule.
    mark([n for n in full if 372 <= _qnum(n) <= 387], 9)
    # r10 new-at-introduction block, same rule.
    mark([n for n in full if 388 <= _qnum(n) <= 404], 10)
    # r11 new-at-introduction block, same rule.
    mark([n for n in full if _qnum(n) == 405], 11)
    for rnd, names in JUDGE_RERUNS.items():
        mark(names, rnd)
    return {n: last.get(n, 0) for n in full}


def main() -> int:
    ages = compute_ages()
    dist = collections.Counter(ages.values())
    print("rotation-age distribution (round of last named event):")
    for rnd in sorted(dist):
        print(f"  r{rnd}: {dist[rnd]} queries")
    ordered = sorted(ages, key=lambda n: (ages[n], n))
    n_show = len(ordered) if "--all" in sys.argv else 40
    print(f"\noldest {min(n_show, len(ordered))}:")
    for n in ordered[:n_show]:
        print(f"  r{ages[n]}  {n}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:
        # stdout piped into head/less that closed early — not an error
        raise SystemExit(0)
