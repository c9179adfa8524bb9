"""Solo-idle per-query re-measurement (the BASELINE.md anchoring method).

Usage: python tools/idle_measure.py qNNN_name [qNNN_name ...]

For each named query: one untimed warmup noop-write at sf0.1, then the
median of 5 back-to-back timed noop-writes, printed as one JSON line per
query. Run this on an otherwise-idle machine — it exists so that anchor
maintenance and drift adjudication (VERDICT r9 next-round #1/#2) use the
same measurement the anchors were recorded with, not a loaded full-bench
reading (see BASELINE.md's variance note: full-bench sessions vary ±13%).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: idle_measure.py qNNN_name ...", file=sys.stderr)
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_IDLE_RUNS", "5"))

    from airflow_spotify_etl_spark.plans import all_queries
    from airflow_spotify_etl_spark.session import get_spark

    spark = get_spark("idle_measure")
    qs = all_queries()
    spark.range(1).count()

    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        med = round(statistics.median(samples), 3)
        out[name] = med
        print(
            json.dumps(
                {
                    "query": name,
                    "idle_median": med,
                    "samples": [round(s, 3) for s in samples],
                    "runs": runs,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )
    print(json.dumps({"idle_medians": out}), flush=True)


if __name__ == "__main__":
    main()
