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
    "overwrite_partitions",
    "compact_table",
    "console_display",
    "display_tracks",
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


def write_jsonl(df: DataFrame, path: str) -> str:
    """Newline-delimited JSON (one object per line, one file per
    partition) — the corpus interchange format; ``s3://`` normalized like
    write_csv."""
    path = normalize_object_store_path(path)
    df.write.mode("overwrite").json(path)
    return path


def write_orc(df: DataFrame, path: str) -> str:
    """ORC with the same overwrite contract as the parquet writers."""
    path = normalize_object_store_path(path)
    df.write.mode("overwrite").orc(path)
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


def overwrite_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Replace ONLY the partitions present in ``df`` (dynamic partition
    overwrite), leaving every other partition untouched — the backfill /
    late-data-restatement primitive: re-deriving one day of a 100 TB
    partitioned table must rewrite that day's directory, not the table.
    Static overwrite (Spark's default) would truncate the whole table
    first; the session-conf flip to ``dynamic`` is scoped and restored."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def compact_table(
    spark,
    path: str,
    partition_col: str | None = None,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ceil(rows / target) files (per partition when ``partition_col`` is
    given, via one repartition on the partition key; AQE coalesces the
    shuffle into few outputs). Streaming appends and per-batch writes
    accrete small files whose open/footer overhead eventually dominates
    scans; periodic compaction is standard table maintenance. Returns the
    row count (sanity: unchanged by compaction). The rewrite stages to a
    sibling temp dir and swaps rename-first: original → .bak, staged →
    path, then delete .bak — at EVERY crash point a complete copy of the
    data exists on disk (before the first rename: original in place;
    between renames: .bak; after: the compacted table), unlike a
    delete-then-rename swap whose kill window strands the only copy at
    the temp name. A leftover .bak from a previous crash is recovered or
    cleared before staging."""
    import shutil
    from pathlib import Path

    bak = Path(path.rstrip("/") + "._compact_bak")
    p = Path(path)
    if bak.exists():
        if p.exists():
            shutil.rmtree(bak)  # prior swap completed; stale backup
        else:
            bak.rename(p)  # prior swap died between renames; recover
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    tmp = path.rstrip("/") + "._compact_tmp"
    if partition_col:
        (
            df.repartition(n_files, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    after = spark.read.parquet(tmp).count()
    if after != n:
        raise RuntimeError(
            f"compact_table: row count changed {n} -> {after}; "
            f"aborting swap, original table untouched at {path}"
        )
    p.rename(bak)
    Path(tmp).rename(p)
    shutil.rmtree(bak)
    return n


# "Table/relation does not exist" message fragments for the common JDBC
# dialects (Derby, Postgres, MySQL, SQLite, SQL Server, Oracle). ONLY these
# mean "first run"; anything else (auth, timeout, network, permission) must
# propagate — swallowing it and appending unguarded would silently defeat
# the idempotency guarantee (the reference's double-insert bug,
# spotify_etl2.py:220, reintroduced through the error path).
_TABLE_ABSENT_FRAGMENTS = (
    "does not exist",       # Derby "Table/View 'T' does not exist", Postgres, Oracle text
    "doesn't exist",        # MySQL
    "no such table",        # SQLite
    "invalid object name",  # SQL Server
    "ora-00942",            # Oracle code
)


def _jdbc_table_absent(exc: Exception) -> bool:
    msg = str(exc).lower()
    return any(f in msg for f in _TABLE_ABSENT_FRAGMENTS)


def _jdbc_key_scan(table: str, key_predicate: str | None) -> str:
    """The dbtable expression for the key read-back: the bare table, or —
    when the caller knows a key lower bound — a pushed-down subquery so the
    remote scan is bounded instead of the entire key column (at a large
    target table the unbounded read-back dominates the append). Spark still
    prunes the projection to the key column through the derived table with
    dialect-correct identifier quoting."""
    if key_predicate is None:
        return table
    return f"(SELECT * FROM {table} WHERE {key_predicate}) spark_graft_keys"


def append_jdbc(
    new: DataFrame,
    url: str,
    table: str,
    key: str,
    properties: dict | None = None,
    key_predicate: str | None = None,
) -> int:
    """K2 RDBMS parity — the reference's SQLite ``to_sql(if_exists="append")``
    (spotify_etl2.py:220) as a JDBC append, made idempotent by anti-joining
    against the remote table's key projection first (the reference
    double-inserts on re-run). Returns rows actually added.

    ``key_predicate`` (e.g. ``"played_at > '2026-01-01'"``) pushes a bound
    into the remote key scan (see _jdbc_key_scan); with a monotone key the
    caller passes its cursor and the read-back touches only the recent tail.
    Rows in ``new`` whose keys fall OUTSIDE the predicate are assumed
    already-deduped by the caller's cursor logic.

    First-run detection is by the driver's table-absent error ONLY
    (_jdbc_table_absent); transient failures re-raise rather than
    masquerading as an empty table and double-inserting."""
    props = properties or {}
    spark = new.sparkSession
    try:
        existing = spark.read.jdbc(
            url, _jdbc_key_scan(table, key_predicate), properties=props
        ).select(key)
    except Exception as exc:
        if not _jdbc_table_absent(exc):
            raise
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


def display_tracks(df: DataFrame, n: int = 50, enabled: bool = True) -> None:
    """K3 format parity — the reference's numbered per-track console layout
    (new.py:143-175): header with the track count, 80-dash separators, and
    per track the rank / name / artist / album lines, optional URL /
    played-at / explicit lines, popularity out of 100 and m:ss duration.
    Bounded collect (≤ n rows — the reference's payloads are ≤ 50)."""
    if not enabled:
        return
    rows = df.limit(n).collect()
    if not rows:
        print("No tracks to display")
        return
    print(f"\n\U0001f3b5 Your {len(rows)} Most Recently Played Tracks:\n")
    print("-" * 80)
    for t in rows:
        print(f"#{t['rank']}")
        print(f"\U0001f3b5 Track: {t['track_name']}")
        print(f"\U0001f464 Artist: {t['artist_name']}")
        print(f"\U0001f4bf Album: {t['album_name']}")
        if t["spotify_url"]:
            print(f"\U0001f517 URL: {t['spotify_url']}")
        if t["played_at"]:
            print(f"⏰ Played at: {t['played_at']}")
        print(f"⭐ Popularity: {t['popularity']}/100")
        dur = t["duration_ms"]
        print(f"⏱️  Duration: {dur // 60000}:{(dur % 60000) // 1000:02d}")
        if t["explicit"]:
            print("\U0001f6ab Explicit content")
        print("-" * 80)


def summary_record(df: DataFrame, **aggs: F.Column) -> dict:
    """One multi-aggregate pass → dict (K4). Replaces the reference's
    stat-at-a-time passes (spotify_etl2.py:271-278) with a single scan."""
    row = df.agg(*[c.alias(name) for name, c in aggs.items()]).collect()[0]
    return row.asDict()
