"""Floor-adjusted frozen-anchor drift check (r11, closes the r10
verdict's frozen-tail bookkeeping task).

Usage: python tools/frozen_drift.py [BENCH_FULL.json]

Compares the kept full-bench run against BASELINE_FROZEN.json's
never-re-anchored first-ever anchors with the floor adjustment the
round-10 BASELINE.md note mandates for sub-second rows:

    ratio_fa = (t - floor) / (frozen - floor)

and reports every row above 2x, split into EXPLAINED and UNEXPLAINED:

- explained: the row carries era='count' (frozen anchor measured with a
  count() action before commit b61158d, which Catalyst prunes — the
  documented methodology break) AND its frozen anchor is sub-second
  (< 1.0 s, the regime where the noop-write protocol alone moves the
  floor-adjusted ratio past ~2x), OR the row carries a per-row
  adjudication note (real-growth-fixed / deliberate-redesign rows whose
  frozen anchors are kept by policy).
- unexplained: everything else above 2x — these are REAL drift
  candidates and must be adjudicated (solo-idle re-measure, profile,
  or a new note) before the round closes.

Exit status 1 if any unexplained row exists, 0 otherwise. A frozen
anchor at or below the floor makes the adjusted ratio meaningless
(division by ~0); such rows are floor-dominated and follow the same
explained/unexplained split on the era/note markers alone.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "BENCH_FULL.json"
    )
    try:
        full = json.load(open(bench_path))
        frozen = json.load(open(os.path.join(HERE, "BASELINE_FROZEN.json")))
    except (OSError, ValueError) as ex:
        print(f"frozen_drift: cannot read inputs: {ex}", file=sys.stderr)
        return 1

    floor = float(full.get("floor_sec", 0.0))
    explained, unexplained = [], []
    for q, t in full["queries"].items():
        rec = frozen["queries"].get(q)
        if not rec:
            continue
        f = float(rec["sec"])
        if f - floor > 1e-3:
            ratio = (t - floor) / (f - floor)
        else:
            # floor-dominated anchor: raw ratio is the only number left
            ratio = t / f if f > 0 else float("inf")
        if ratio <= 2.0:
            continue
        row = {
            "query": q,
            "frozen_sec": f,
            "sec": t,
            "ratio_fa": round(ratio, 2),
            "era": rec.get("era"),
            "note": rec.get("note"),
        }
        if (rec.get("era") == "count" and f < 1.0) or rec.get("note"):
            explained.append(row)
        else:
            unexplained.append(row)

    out = {
        "floor_sec": floor,
        "bench_run_id": full.get("run_id"),
        "n_compared": sum(1 for q in full["queries"] if q in frozen["queries"]),
        "explained_over_2x": len(explained),
        "unexplained_over_2x": len(unexplained),
        "unexplained": unexplained,
    }
    print(json.dumps(out, indent=1))
    if unexplained:
        for r in unexplained:
            print(
                f"UNEXPLAINED {r['query']}: {r['sec']:.3f}s vs frozen "
                f"{r['frozen_sec']:.3f}s = {r['ratio_fa']}x floor-adjusted",
                file=sys.stderr,
            )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
