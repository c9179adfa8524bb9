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
  exactly-once per key. Partitioned by date for pruning at scale.
- ``console_display`` — K3: formatted console output behind a flag
  (new.py:143-175, flag :224).
- ``summary_record``  — K4: the XCom summary dict (spotify_etl.py:275-281)
  as a collect of one multi-aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import incremental_anti_append

__all__ = ["write_csv", "append_table", "console_display", "summary_record"]


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> str:
    """CSV with header; ``s3://`` → ``s3a://``. ``single_file`` coalesces to
    one part (only for small exports — the reference's outputs are ≤50 rows;
    large tables keep one file per partition)."""
    if path.startswith("s3://"):
        path = "s3a://" + path[len("s3://"):]
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
    import os

    existing = None
    if os.path.exists(path) and any(
        f.startswith("part-") or f.endswith(".parquet")
        for _, _, fs in os.walk(path)
        for f in fs
    ):
        existing = new.sparkSession.read.parquet(path)
    fresh = incremental_anti_append(new, existing, key) if existing is not None else new
    fresh = fresh.cache()
    n = fresh.count()
    if n:
        writer = fresh.write.mode("append")
        if partition_date_col:
            writer = writer.partitionBy(partition_date_col)
        writer.parquet(path)
    fresh.unpersist()
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
