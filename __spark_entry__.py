"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators — every registered query carries an
ANSI-SQL DuckDB oracle (354/354; trained IVF is made exactly checkable by its
probe-all configuration, see plans/llm.py q27).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_spotify_etl_spark.plans import all_oracles, all_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: scan → filter → broadcast join → agg → sort → limit
    (SURVEY.md §7 Phase 0) on /root/testdata/sf0.001."""
    from airflow_spotify_etl_spark.plans.relational import q02_top_revenue_orders

    return q02_top_revenue_orders(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return all_oracles()
