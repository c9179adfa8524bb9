"""PySpark-native Python Data Source for the REST connector (Spark ≥ 4).

SURVEY.md §4 lists the Python Data Source API as the idiomatic home for the
REST scan; this module implements it. Unlike the driver-side fetch in
``rest.py`` (fine for ≤50-doc payloads), a registered data source is a
first-class Catalyst relation:

    spark.dataSource.register(SpotifyRecentlyPlayedSource)
    spark.read.format("spotify_recently_played")
         .option("after_ms", cursor).option("limit", 50).load()
    spark.readStream.format("spotify_recently_played")...  # ST2 native

- **Batch reader**: one partition per fetch; ``after_ms``/``limit`` options
  are the pushed-down predicates (F5/F6 — the reference ships them as query
  params, spotify_etl2.py:102-117).
- **Streaming reader** (``SimpleDataSourceStreamReader``): the exact-cursor
  micro-batch source — offset = max ``played_at`` seen, checkpointed by
  Spark itself. This is ST2 "done right" at the ENGINE level: restart-safe
  offsets without the hand-rolled cursor file, replayable between offsets
  for recovery.

Air-gap/test seam: the ``payload_json`` option carries a canned
recently-played payload (the API response shape) — the same rows a live
transport would return; executors parse it without any network. A live
deployment instead sets ``token`` and leaves ``payload_json`` unset.

Rows are (played_at, track_json); downstream flattening is
``from_json(track_json, track_payload_schema().track) → flatten_with_defaults``
— identical to the rest.py path.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = ["SpotifyRecentlyPlayedSource", "SCHEMA_DDL"]

SCHEMA_DDL = "played_at string, track_json string"
_API = "https://api.spotify.com/v1/me/player/recently-played"
_TIMEOUT = 30  # reference parity (spotify_etl.py:69)


def _fetch_items(options: dict) -> list[dict]:
    """Return the payload's items — canned (payload_json) or live HTTP."""
    if options.get("payload_json"):
        return json.loads(options["payload_json"]).get("items", [])
    limit = min(max(int(options.get("limit", 50)), 1), 50)  # F6 clamp
    params = {"limit": limit}
    if options.get("after_ms"):
        params["after"] = int(options["after_ms"])  # F5 pushdown
    url = f"{_API}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(
        url, headers={"Authorization": f"Bearer {options['token']}"}
    )
    with urllib.request.urlopen(req, timeout=_TIMEOUT) as resp:  # noqa: S310
        return json.loads(resp.read().decode()).get("items", [])


def _to_rows(items: list[dict], after: str | None = None) -> list[tuple]:
    rows = [
        (it.get("played_at"), json.dumps(it.get("track", {})))
        for it in items
        if it.get("played_at")
    ]
    if after is not None:
        rows = [r for r in rows if r[0] > after]
    return sorted(rows)


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> list[InputPartition]:
        # One fetch = one partition (the API caps at 50 rows). A many-key
        # variant would return one InputPartition per key, fanning fetches
        # out across executors (the fetch_partitioned shape in rest.py).
        return [InputPartition(0)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _to_rows(_fetch_items(self.options))


class _StreamReader(SimpleDataSourceStreamReader):
    """Exact-cursor micro-batch stream: offset = {"cursor": max played_at}.

    Spark checkpoints the offset dicts; on restart it replays from the last
    committed offset via readBetweenOffsets — the gap/dup-free semantics the
    reference's wall-clock `after = now()-24h` cursor cannot give.

    Crash-recovery replay and the moving window: /recently-played only
    serves the latest 50 items, so a LIVE re-fetch during replay can return
    different rows than the original batch committed. Set ``wal_dir`` (a
    driver-visible path; this reader runs on the driver) and every fetched
    batch is persisted keyed by its (start, end) offsets, making
    ``readBetweenOffsets`` an exact storage replay — true exactly-once
    recovery against a non-replayable source. Without ``wal_dir`` the
    replay falls back to the live re-fetch (fine for canned payload_json
    and backfills; the reference has no recovery story at all — wall-clock
    cursor, SURVEY §2.10). WAL files are ≤50 rows each; GC of batches older
    than the retained checkpoint is the operator's cron job."""

    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self) -> dict:
        return {"cursor": ""}

    def _wal_path(self, start: dict, end: dict) -> str:
        import hashlib
        import os

        key = hashlib.md5(
            json.dumps([start, end], sort_keys=True).encode()
        ).hexdigest()
        return os.path.join(self.options["wal_dir"], f"batch-{key}.json")

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        import os

        rows = _to_rows(_fetch_items(self.options), after=start["cursor"] or None)
        new_cursor = rows[-1][0] if rows else start["cursor"]
        end = {"cursor": new_cursor}
        if self.options.get("wal_dir"):
            os.makedirs(self.options["wal_dir"], exist_ok=True)
            path = self._wal_path(start, end)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rows, f)
            os.replace(tmp, path)  # atomic: a replay never sees a torn file
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        import os

        if self.options.get("wal_dir"):
            path = self._wal_path(start, end)
            if os.path.exists(path):
                with open(path) as f:
                    return iter([tuple(r) for r in json.load(f)])
        rows = _to_rows(_fetch_items(self.options), after=start["cursor"] or None)
        return iter(r for r in rows if r[0] <= end["cursor"])


class SpotifyRecentlyPlayedSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spotify_recently_played"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
