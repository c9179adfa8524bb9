"""File sources: Parquet/CSV/JSON scans with explicit schemas.

The reference infers every schema dynamically (pandas dtype inference;
``to_sql`` DDL inference — spotify_etl2.py:220). Engine policy per SURVEY.md
§1.3 is the opposite: fixed, explicit ``StructType`` everywhere, so the
Parquet reader can prune columns and push filters without inference cost and
so a 100 TB scan never triggers a schema-merge pass over file footers.

Parquet scans here are the engine's hot path: Catalyst pushes predicates and
projections into the scan (visible as ``PushedFilters`` / ``ReadSchema`` in
``.explain("formatted")``), and ``spark.sql.files.maxPartitionBytes`` splits
files so each task reads ~128 MB regardless of total table size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TABLES", "SCHEMAS", "load_table", "load_tables", "register_views", "read_csv"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Explicit schemas for the star-schema test tables (TESTDATA.md). Matching the
# Parquet footers exactly keeps the vectorized reader on the fast path.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.LongType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.LongType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.LongType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts unit varies across generator versions (TIMESTAMP(NANOS) in older
    # fixtures, TIMESTAMP(MICROS) now) — load_table sniffs the parquet
    # footer and picks the matching read path; see _events_schema.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# parquet footer facts keyed on (path, mtime_ns, size): (row_groups, rows).
# load_table is called thousands of times per bench run; one driver-side
# footer read per file VERSION amortizes to nothing, and keying on the
# stat identity means a regenerated fixture (different row-group count)
# or a transient read failure never serves stale fan-out decisions in a
# long-lived session (ADVICE r11).
_FOOTER_CACHE: dict[tuple[str, int, int], tuple[int, int]] = {}


def _footer_facts(path: str) -> tuple[int, int] | None:
    """(num_row_groups, num_rows) from the local parquet footer, or None
    when the footer isn't locally readable (directory tables, remote
    stores — exactly the cases where the scan already splits fine)."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = (path, st.st_mtime_ns, st.st_size)
    if key not in _FOOTER_CACHE:
        try:
            import pyarrow.parquet as pq

            meta = pq.ParquetFile(path).metadata
            _FOOTER_CACHE[key] = (meta.num_row_groups, meta.num_rows)
        except Exception:
            _FOOTER_CACHE[key] = (-1, -1)
    rg, rows = _FOOTER_CACHE[key]
    return None if rg < 0 else (rg, rows)


# High-cardinality key per table for the opt-in scan fan-out: hash
# repartitioning on a (near-)unique key spreads evenly across any width
# (guide §2.5) and — unlike round-robin — needs no
# sortBeforeRepartition pass, which for a single-task scan would sort
# the whole table inside that one task before anything fans out.
_FANOUT_KEYS: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _maybe_parallelize(
    spark: SparkSession, df: DataFrame, path: str, name: str
) -> DataFrame:
    """Restore scan-stage parallelism for unsplittable small inputs —
    OPT-IN per query (``load_table(..., parallelize=True)``).

    A parquet file is splittable only at row-group boundaries; the bench
    fixtures are ONE row group each, so every scan — and everything
    Catalyst collapses into the scan stage: projections, expression
    ladders (md5 draws, n-gram explodes, array transforms) and partial
    aggregates — runs as a SINGLE task no matter how many cores the
    session has (optimization guide §2.5 "input skew: one huge
    unsplittable file… repartition immediately after the read").

    Hash-repartition on the table's unique key to the session's core
    count right after the read fixes that for queries whose scan stage
    does heavy per-row compute. It is OPT-IN because the exchange has a
    measured ~0.25 s fixed cost per query at bench scale (extra stage +
    AQE barrier) plus the table's shuffle bytes — a pure tax for the
    ~300 registry queries whose scan work is a cheap partial aggregate
    (solo-idle A/B: q05_global_stats 0.40→0.93 s under a blanket
    version; q251_poisson_bootstrap_ci 7.7→2.1 s with it where it
    belongs). Scale-adaptive, not a local[32] constant: the trigger is
    the measured footer fact ``row_groups < cores`` — a production
    table (many files/row groups, or a directory where the footer probe
    returns None) never triggers — and the width follows
    ``sparkContext.defaultParallelism`` so the driver's lower-core bench
    runs fan out to matching widths. Tables below 4 rows/core (tiny
    dims) are left alone. Results are partition-independent by
    construction (every query is DuckDB-oracle-paired, hash-checked
    order-insensitively) and re-verified by the strict selfcheck.
    Kill-switch: SPARK_GRAFT_SCAN_PARALLELIZE=0.
    """
    if os.environ.get("SPARK_GRAFT_SCAN_PARALLELIZE", "1") == "0":
        return df
    facts = _footer_facts(path)
    if facts is None:
        return df
    row_groups, rows = facts
    cores = spark.sparkContext.defaultParallelism
    if row_groups >= cores or rows < 4 * cores:
        return df
    return df.repartition(cores, F.col(_FANOUT_KEYS[name]))


def _events_ts_unit(path: str) -> str:
    """Sniff the physical time unit of events.ts from the parquet footer.

    Fixture generators have shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) for the same logical column; reading nanos with a
    micros schema (or vice versa) silently lands every timestamp in 1970.
    One driver-side footer read settles it. Falls back to micros (the
    Spark-native unit) when the footer isn't locally readable."""
    try:
        import pyarrow.parquet as pq

        return getattr(pq.ParquetFile(path).schema_arrow.field("ts").type, "unit", "us")
    except Exception:
        return "us"


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Scan one star-schema table with its explicit schema.

    ``parallelize=True`` opts the scan into the single-row-group fan-out
    (see _maybe_parallelize) — use it in queries whose scan stage does
    heavy per-row compute (hash ladders, n-gram explodes, vector folds),
    not for cheap aggregate scans."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _events_ts_unit(path) == "ns":
        # nanos → microsecond timestamp (`div` floors, matching DuckDB's
        # truncating ns→µs cast). Stays a narrow codegen'd projection.
        ns_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in SCHEMAS["events"].fields
            ]
        )
        df = spark.read.schema(ns_schema).parquet(path)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _maybe_parallelize(spark, df, path, name) if parallelize else df
    df = spark.read.schema(SCHEMAS[name]).parquet(path)
    return _maybe_parallelize(spark, df, path, name) if parallelize else df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    parallelize: bool | set[str] = False,
) -> dict[str, DataFrame]:
    par = parallelize if isinstance(parallelize, set) else (
        set(names or TABLES) if parallelize else set()
    )
    return {
        n: load_table(spark, sf_dir, n, parallelize=n in par)
        for n in (names or TABLES)
    }


def register_views(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    parallelize: bool | set[str] = False,
) -> None:
    """Register each table as a temp view so plans can mix SQL + DataFrame."""
    for name, df in load_tables(spark, sf_dir, names, parallelize).items():
        df.createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with explicit schema (reference S7: songs.csv; K1 round-trip).

    ``mode=PERMISSIVE`` mirrors the reference's per-row error tolerance
    (spotify_etl.py:239-255: try/except per record, skip bad rows) — corrupt
    rows become nulls instead of failing the scan.
    """
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Newline-delimited JSON scan with explicit schema — the interchange
    format raw API payloads and web-crawl corpora actually arrive in.
    PERMISSIVE like read_csv: malformed lines become null rows, not scan
    failures (reference F8 semantics). Splittable per line, so a 100 TB
    JSONL drop parallelizes like any text source; convert to parquet in
    the first pipeline stage — JSON parsing is the most expensive scan in
    the engine and should happen exactly once."""
    return (
        spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC scan with explicit schema — same columnar pushdown/pruning
    contract as parquet (PushedFilters + ReadSchema in the plan), for
    lakes standardized on ORC."""
    return spark.read.schema(schema).orc(path)
