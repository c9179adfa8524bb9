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
            if {sv.dtype.kind, ov.dtype.kind} == {"i", "f"}:
                problems.append(
                    f"dtype mismatch col {c!r}: spark={sv.dtype} oracle={ov.dtype}"
                    " (driver value-hash will differ; CAST the oracle)"
                )
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                import numpy as np

                svn = pd.to_numeric(sv, errors="coerce")
                ovn = pd.to_numeric(ov, errors="coerce")
                both_nan = svn.isna() & ovn.isna()
                close = np.isclose(svn.fillna(0), ovn.fillna(0), rtol=0, atol=1e-9)
                ok = (both_nan | close).all()
            else:
                ok = sv.astype(str).equals(ov.astype(str))
            if not ok:
                bad = (sv.astype(str) != ov.astype(str))
                idx = bad[bad].index[:3].tolist()
                examples = [(i, sv.iloc[i], ov.iloc[i]) for i in idx]
                problems.append(f"values differ in col {c!r}: {examples}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
