"""Scaling-exponent bench: time queries at two scale factors in ONE session.

Usage:

    python tools/bench_scale.py SMALL_DIR BIG_DIR OUT_JSON [query ...]

For each query, runs a warmup at SMALL_DIR, then N timed noop-writes at
each dir (interleaved warm, same JVM — rule-31 fresh-session skew doesn't
apply to the RATIO but measuring both scales under identical warmth makes
the exponent trustworthy). Reports per query:

    {"t_small": s, "t_big": s, "ratio": t_big/t_small,
     "exponent": log(t_big/t_small) / log(rows_big/rows_small)}

where the row ratio is measured from the lineitem tables (the tiled
generator scales every fact table by the same factor). exponent ~1.0 is
linear, ~1.05 is n log n at a decade, >=1.3 means a superlinear term is
real at this decade and needs a diagnosis.

Incremental: appends one JSON line per query to OUT_JSON + '.partial' as
it goes (a killed run keeps its finished rows), then MERGES into any
existing OUT_JSON (per-query rows stamped with the measurement label/date
so one file carries the whole scaling table across rounds) and removes
the .partial on success. NOTE: after a merge, the TOP-LEVEL fields
(small_dir/big_dir/runs/stat) describe only the MOST RECENT run; the
authoritative provenance of each row is its own per-query "measured"
stamp, which survives merges (r9 advice, bench_scale.py row).

Coverage gate (the round-8 verdict's top-20 rule):

    python tools/bench_scale.py --check [BENCH_FULL.json] [BENCH_SF1.json]

lists any query in the top-20 cost ranks of the full bench that has no
sf1 scaling point, and exits 1 if one exists — run it after adding an
expensive query to know it needs an sf1 measurement at introduction.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # top-20 most expensive from BENCH_FULL.json (r7 closing run), plus
    # q92/q25 which the round-7 verdict named explicitly.
    "q230_percolation_robustness",
    "q111_copurchase_adamic_adar",
    "q170_lsh_band_sweep",
    "q251_poisson_bootstrap_ci",
    "q149_signature_tier_agreement",
    "q263_pca_power_iteration",
    "q139_exact_heavy_bigrams",
    "q218_kcore_trajectory",
    "q100_ivf_pq_search",
    "q147_pipeline_funnel",
    "q151_personalized_pagerank",
    "q130_lsh_recall_audit",
    "q57_item_pagerank",
    "q317_ann_tier_scoreboard",
    "q55_semantic_dedup",
    "q28_embedding_near_dups",
    "q108_quality_aware_keepers",
    "q328_minhash_accuracy_audit",
    "q213_edit_distance_pairs",
    "q129_range_boundaries",
    "q92_ensemble_near_dups",
    "q25_minhash_lsh_pairs",
]


def check_coverage(full_path: str, sf1_path: str, top_n: int = 20) -> int:
    """Exit 1 listing top-``top_n`` most expensive BENCH_FULL queries
    that have no sf1 scaling point in ``sf1_path``."""
    try:
        with open(full_path) as f:
            full = json.load(f)["queries"]
    except (OSError, KeyError, ValueError) as e:
        print(
            f"cannot read full-bench timings from {full_path}: {e}\n"
            "run `python bench.py` first (it writes BENCH_FULL.json), or "
            "pass the path explicitly: bench_scale.py --check FULL SF1"
        )
        return 1
    try:
        with open(sf1_path) as f:
            covered = set(json.load(f)["queries"])
    except (OSError, KeyError, ValueError):
        covered = set()
    top = sorted(full, key=full.get, reverse=True)[:top_n]
    missing = [n for n in top if n not in covered]
    for n in missing:
        print(f"MISSING sf1 point: {n} ({full[n]} s in {full_path})")
    print(
        f"top-{top_n} coverage: {top_n - len(missing)}/{top_n}"
        f" ({len(covered)} sf1 points total)"
    )
    return 1 if missing else 0


def main() -> int:
    if sys.argv[1:2] == ["--check"]:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        full = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            repo, "BENCH_FULL.json")
        sf1 = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
            repo, "BENCH_SF1.json")
        return check_coverage(full, sf1)
    small, big, out = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:] or DEFAULT_QUERIES
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))

    import duckdb

    con = duckdb.connect()
    rows = {
        d: con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/lineitem.parquet')"
        ).fetchone()[0]
        for d in (small, big)
    }
    decade = math.log10(rows[big] / rows[small])

    from airflow_spotify_etl_spark.plans import all_queries
    from airflow_spotify_etl_spark.session import get_spark

    spark = get_spark("bench-scale")
    qs = all_queries()
    spark.range(1).count()

    def timed(fn, d) -> float:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3)

    results: dict[str, dict] = {}
    partial = out + ".partial"
    for name in names:
        fn = qs[name]
        # warmup at the small dir (codegen + file listing)
        fn(spark, small).write.format("noop").mode("overwrite").save()
        t_small = timed(fn, small)
        t_big = timed(fn, big)
        ratio = round(t_big / t_small, 3)
        exponent = round(math.log10(max(ratio, 1e-9)) / decade, 3)
        results[name] = {
            "t_small": t_small,
            "t_big": t_big,
            "ratio": ratio,
            "exponent": exponent,
            "measured": time.strftime("%Y-%m-%d"),
        }
        line = json.dumps({"query": name, **results[name]})
        print(f"# {line}", file=sys.stderr, flush=True)
        with open(partial, "a") as f:
            f.write(line + "\n")

    payload = {
        "small_dir": small,
        "big_dir": big,
        "rows_small": rows[small],
        "rows_big": rows[big],
        "runs_per_point": runs,
        "stat": "median",
        "note": (
            "exponent = log(t_big/t_small)/log(rows_big/rows_small); "
            "1.0 linear, ~1.05 n log n over one decade; fixed per-query "
            "overhead (session, planning, dim scans) deflates exponents "
            "for sub-second queries"
        ),
        "queries": results,
    }
    # Merge into an existing OUT_JSON (newly measured rows win) so one
    # file carries the whole scaling table across rounds.
    try:
        with open(out) as f:
            prior = json.load(f)
        prior_queries = prior.get("queries", {})
        prior_queries.update(results)
        prior.update({k: v for k, v in payload.items() if k != "queries"})
        prior["queries"] = prior_queries
        payload = prior
    except OSError:
        pass
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    try:
        os.remove(partial)
    except OSError:
        pass
    print(json.dumps({"metric": "scale_exponent_median",
                      "value": round(statistics.median(
                          r["exponent"] for r in results.values()), 3),
                      "n_queries": len(results)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
