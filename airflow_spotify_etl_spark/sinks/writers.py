"""Sinks (SURVEY.md §2.8 K1-K4).

- ``write_csv``       — K1: CSV write, local path or object store. The
  reference special-cases ``s3://`` with boto3 (spotify_etl.py:182-184);
  Spark handles both through the Hadoop FS layer — an ``s3://`` URI is
  rewritten to ``s3a://`` and the same writer runs (executors write in
  parallel, no driver bottleneck, unlike the reference's single
  ``to_csv`` buffer upload).
- ``append_table``    — K2: idempotent relational append. The reference's
  SQLite ``if_exists="append"`` double-inserts on re-run
  (spotify_etl2.py:220); here the anti-join guard (J4) makes the append
  exactly-once per key. Partitioned by date for pruning at scale. Sink
  existence is probed by attempting the read (AnalysisException → first
  run), so the same code works on local disk, HDFS, or s3a:// — no
  driver-local filesystem assumptions.
- ``append_jdbc``     — K2 RDBMS parity: the reference's ``to_sql(...
  SQLite...)`` (spotify_etl2.py:220) as ``df.write.jdbc(mode="append")``
  with the same anti-join idempotency guard reading the remote keys back.
- ``console_display`` — K3: formatted console output behind a flag
  (new.py:143-175, flag :224).
- ``summary_record``  — K4: the XCom summary dict (spotify_etl.py:275-281)
  as a collect of one multi-aggregate row.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import incremental_anti_append

__all__ = [
    "normalize_object_store_path",
    "write_csv",
    "append_table",
    "append_jdbc",
    "console_display",
    "summary_record",
]


def normalize_object_store_path(path: str) -> str:
    """``s3://`` → ``s3a://`` (the reference special-cases s3 with boto3,
    spotify_etl.py:182-184; Spark reaches S3 through the s3a Hadoop
    connector instead — same writer code for local and object-store)."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> str:
    """CSV with header; ``s3://`` → ``s3a://``. ``single_file`` coalesces to
    one part (only for small exports — the reference's outputs are ≤50 rows;
    large tables keep one file per partition)."""
    path = normalize_object_store_path(path)
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
    return path


def append_table(
    new: DataFrame,
    path: str,
    key: str,
    partition_date_col: str | None = None,
) -> int:
    """Idempotent append to a Parquet table; returns rows actually added."""
    try:
        existing = new.sparkSession.read.parquet(path)
    except AnalysisException:
        # Missing path or no parquet files yet — first run.
        existing = None
    fresh = incremental_anti_append(new, existing, key) if existing is not None else new
    # localCheckpoint (not cache): the count and the write must see identical
    # rows even if the source re-fetch would be non-deterministic.
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        writer = fresh.write.mode("append")
        if partition_date_col:
            writer = writer.partitionBy(partition_date_col)
        writer.parquet(path)
    return n


def append_jdbc(
    new: DataFrame,
    url: str,
    table: str,
    key: str,
    properties: dict | None = None,
) -> int:
    """K2 RDBMS parity — the reference's SQLite ``to_sql(if_exists="append")``
    (spotify_etl2.py:220) as a JDBC append, made idempotent by anti-joining
    against the remote table's key projection first (the reference
    double-inserts on re-run). Returns rows actually added.

    Scale: the key read-back is a single-column scan; for very large targets
    push a predicate (e.g. key > cursor) into the ``table`` query instead."""
    props = properties or {}
    spark = new.sparkSession
    try:
        existing = spark.read.jdbc(url, table, properties=props).select(key)
    except Exception:  # table absent on first run (driver-specific error)
        existing = None
    fresh = incremental_anti_append(new, existing, key) if existing is not None else new
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        fresh.write.jdbc(url, table, mode="append", properties=props)
    return n


def console_display(df: DataFrame, n: int = 20, enabled: bool = True) -> None:
    """K3 — display behind a boolean flag (the reference's
    ``display_tracks`` gated by a lowercased config flag, new.py:224)."""
    if enabled:
        df.show(n, truncate=False)


def summary_record(df: DataFrame, **aggs: F.Column) -> dict:
    """One multi-aggregate pass → dict (K4). Replaces the reference's
    stat-at-a-time passes (spotify_etl2.py:271-278) with a single scan."""
    row = df.agg(*[c.alias(name) for name, c in aggs.items()]).collect()[0]
    return row.asDict()
