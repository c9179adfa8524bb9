"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, schema (column-name
set), and an order-insensitive value hash. Usage:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # Stable row order for comparison: sort by all columns stringified.
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c], o[c]
            # The driver hashes exact value strings — an integer column on one
            # side fetched as float64 on the other ("150" vs "150.0") diverges
            # even when numerically identical (DuckDB HUGEINT promotion).
            kinds = {sv.dtype.kind, ov.dtype.kind}
            if kinds == {"i", "f"} or ("f" in kinds and "O" in kinds):
                # int-vs-float ("150" vs "150.0") and Decimal-object-vs-
                # float ("9677.80" vs "9677.8") both break the driver's
                # exact value-string hash even when numerically equal —
                # the latter comes from Spark SQL DECIMAL literals
                # (`x / 100.0` is decimal division in Spark SQL; CAST the
                # numerator AS DOUBLE on both sides).
                problems.append(
                    f"dtype mismatch col {c!r}: spark={sv.dtype} oracle={ov.dtype}"
                    " (driver value-hash will differ; align the types)"
                )
            # Driver-strict: the driver's value hash is over exact value
            # strings with NO numeric tolerance, so selfcheck must be too
            # (an np.isclose pass here previously hid the q78 HUGEINT→float64
            # divergence for two rounds). Any float that isn't bit-identical
            # after the mandated round(...) on both sides is a real failure.
            ok = sv.astype(str).equals(ov.astype(str))
            if not ok:
                bad = (sv.astype(str) != ov.astype(str))
                idx = bad[bad].index[:3].tolist()
                examples = [(i, sv.iloc[i], ov.iloc[i]) for i in idx]
                problems.append(f"values differ in col {c!r}: {examples}")
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from airflow_spotify_etl_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {ex}")
            results[name] = {"pass": False, "err": f"spark: {type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            results[name] = {
                "pass": True, "mode": "rows-only", "rows": len(spark_pdf),
                "sec": round(time.time() - t0, 1),
            }
            n_pass += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {type(ex).__name__}: {ex}")
            results[name] = {"pass": False, "err": f"oracle: {type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"pass": False, "err": "; ".join(problems)[:500]}
            n_fail += 1
        else:
            print(f"pass {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            results[name] = {
                "pass": True, "mode": "strict-hash", "rows": len(spark_pdf),
                "sec": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "comparison": "driver-strict exact-string (no float tolerance)",
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "queries": results,
                },
                f,
                indent=1,
            )
            f.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
