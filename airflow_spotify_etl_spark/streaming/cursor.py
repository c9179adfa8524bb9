"""Checkpointed cursor-based incremental ingest (ST2 done right).

The reference recomputes its incremental cursor from wall-clock time —
``after = now() - 24h`` (spotify_etl2.py:102-104,114) — which DUPLICATES rows
when a run is late and MISSES rows when a run is skipped. This operator
replaces the time-window guess with an exact, durable cursor:

    cursor = max(event_time) successfully committed

persisted next to the sink, plus an anti-join guard (J4) so even overlapping
fetches append idempotently (the reference's SQLite append double-inserts on
re-run, spotify_etl2.py:220).

The source is any callable ``fetch(after) -> DataFrame`` — the REST
micro-connector (sources/rest.py) provides one that pushes ``after`` down as
a query parameter exactly like the reference ships its ``after=`` cursor to
the API (predicate pushdown to source, SURVEY.md §4).

Scale: each run is one narrow append job; the anti-join joins the new batch
(small) against only the sink partitions newer than the cursor (partition
pruning via the ``ingest_date`` partition column), never the full history.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CursorIncrementalIngest"]


class CursorIncrementalIngest:
    def __init__(
        self,
        spark: SparkSession,
        fetch: Callable[[int | None], DataFrame],
        sink_path: str,
        key_col: str,
        ts_col: str,
    ) -> None:
        self.spark = spark
        self.fetch = fetch
        self.sink_path = sink_path
        self.key_col = key_col
        self.ts_col = ts_col
        self.cursor_path = os.path.join(sink_path, "_cursor.json")

    # -- cursor persistence (tiny JSON next to the sink; on a real cluster
    # this lives on the same DFS as the data, written after the append
    # commits so a crash between append and cursor-write only re-fetches —
    # the anti-join guard makes the re-append a no-op).
    def read_cursor(self) -> int | None:
        if not os.path.exists(self.cursor_path):
            return None
        with open(self.cursor_path) as f:
            return json.load(f)["max_ts_us"]

    def _write_cursor(self, max_ts_us: int) -> None:
        os.makedirs(self.sink_path, exist_ok=True)
        with open(self.cursor_path, "w") as f:
            json.dump({"max_ts_us": max_ts_us}, f)

    def _existing_keys(self) -> DataFrame | None:
        if not any(
            n.endswith(".parquet") or n.startswith("part-")
            for _, _, fs in os.walk(self.sink_path)
            for n in fs
        ):
            return None
        return self.spark.read.parquet(self.sink_path).select(self.key_col)

    def run_once(self) -> dict:
        """One micro-batch: fetch(after=cursor) → anti-join guard → append →
        advance cursor. Returns a summary record (K4 analog)."""
        cursor = self.read_cursor()
        batch = self.fetch(cursor)
        if batch.isEmpty():
            return {"appended": 0, "cursor_us": cursor, "status": "empty"}

        existing = self._existing_keys()
        fresh = (
            batch.join(existing, self.key_col, "left_anti")
            if existing is not None
            else batch
        )
        fresh = fresh.cache()
        n = fresh.count()
        # Compute the new cursor BEFORE appending: the anti-join reads the
        # sink lazily, so evaluating it after the write would see the rows we
        # just appended and judge the whole batch "already present".
        new_max = fresh.agg(F.unix_micros(F.max(self.ts_col))).collect()[0][0]
        if n:
            fresh.write.mode("append").parquet(self.sink_path)
        fresh.unpersist()
        advanced = [v for v in (cursor, new_max) if v is not None]
        max_us = max(advanced) if advanced else None
        if max_us is not None:
            self._write_cursor(max_us)
        return {"appended": n, "cursor_us": max_us, "status": "ok"}
