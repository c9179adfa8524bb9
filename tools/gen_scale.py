"""Tile a driver-generated testdata dir to a larger scale factor.

Usage:

    python tools/gen_scale.py SRC_DIR OUT_DIR FACTOR

Produces OUT_DIR/{table}.parquet with FACTOR shifted copies of each
SRC_DIR fact table (copy 0 is the identity, so the source data is a
subset of the output). The tiling preserves the driver generator's
distributions exactly while scaling every key domain linearly — the
property the sf0.1 -> sf1 scaling-exponent measurements need:

- dense surrogate keys are offset per copy by the table's key-domain
  size (custkey 15000/sf0.1, orderkey 150000, partkey 20000, suppkey
  1000, event_id 100000, user_id 1500, doc_id 5000, vec_id 2000),
  so keys stay dense and every FK keeps its exact per-key fan-out;
- `region`/`nation` stay fixed (categorical dims don't scale,
  mirroring TPC-H);
- `documents.text` gets a per-copy vocabulary remap (each word w in
  copy c>0 becomes w||'q'||c) so copies are NOT exact or near
  duplicates of each other — otherwise every doc would arrive with
  FACTOR-1 artificial near-dup siblings and the dedup-ladder pair
  streams would measure a planted-cluster artifact instead of plan
  scaling. Vocabulary growing with corpus size is the realistic
  Heaps-law shape anyway. n_chars is recomputed from the new text;
- `embeddings.embedding` gets a small deterministic per-copy,
  per-component jitter (hash-seeded, +/-0.05) so copied vectors are
  distinct directions rather than exact ties that would degenerate
  ANN top-k ordering;
- `events.ts` / order dates keep their window (event density per day
  scales with sf, as on a growing service).

Output is one single parquet FILE per table (DuckDB COPY), matching
the driver's layout so Spark, DuckDB, and tools/selfcheck.py can all
read the scaled dir unchanged.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

# table -> [(key_column, domain_size_per_sf0.1_unit_is_computed_live)]
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# FK column -> the table whose PK defines its offset domain
FK_DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> int:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    Path(out).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def rp(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    # key-domain sizes = max(key)+1 on the source (keys are dense 0-based)
    dom: dict[str, int] = {}
    for col, (tbl, pk) in FK_DOMAIN.items():
        if pk not in dom:
            dom[pk] = con.execute(f"SELECT max({pk})+1 FROM {rp(tbl)}").fetchone()[0]
        dom[col] = dom[pk]

    for t in ["region", "nation"]:
        con.execute(f"COPY (SELECT * FROM {rp(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied (fixed dim)")

    for t, keys in KEYED.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {rp(t)}").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + cc * {dom[c]} AS {c}")
            elif t == "customer" and c == "c_name":
                sel.append(
                    f"printf('Customer#%09d', c_custkey + cc * {dom['c_custkey']})"
                    " AS c_name"
                )
            elif t == "supplier" and c == "s_name":
                sel.append(
                    f"printf('Supplier#%09d', s_suppkey + cc * {dom['s_suppkey']})"
                    " AS s_name"
                )
            elif t == "documents" and c == "text":
                sel.append(
                    "CASE WHEN cc = 0 THEN text ELSE array_to_string("
                    "list_transform(string_split(text, ' '),"
                    " w -> concat(w, 'q', cc)), ' ') END AS text"
                )
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "CAST(CASE WHEN cc = 0 THEN n_chars ELSE length(array_to_string("
                    "list_transform(string_split(text, ' '),"
                    " w -> concat(w, 'q', cc)), ' ')) END AS BIGINT) AS n_chars"
                )
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN cc = 0 THEN embedding ELSE "
                    "list_transform(list_zip(embedding,"
                    " range(1, len(embedding)+1)),"
                    " p -> CAST(p[1] + ((CAST(hash(vec_id, p[2], cc) % 2001 AS BIGINT)"
                    " - 1000) / 1000.0) * 0.05 AS FLOAT)) END AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} FROM {rp(t)} "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS cc) copies) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
