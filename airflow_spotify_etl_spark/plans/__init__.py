"""Named query plans.

Each plan module exposes:
- ``QUERIES``: dict[name, Callable[[SparkSession, str], DataFrame]]
- ``ORACLES``: dict[name, str]  (ANSI SQL for the DuckDB oracle; omitted keys
  are non-SQL-expressible and get a rows-only check)

``all_queries()`` / ``all_oracles()`` merge every module for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    connector_plans,
    graph_plans,
    llm,
    multimodal_plans,
    relational,
    streaming_plans,
)

_MODULES = (
    relational,
    llm,
    streaming_plans,
    connector_plans,
    multimodal_plans,
    graph_plans,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged
