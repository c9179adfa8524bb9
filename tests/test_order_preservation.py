"""Regression gate for the r10 sort-below-projection pattern.

q13/q45/q52/q112 sort the slim INPUT relation and rely on the heavy
projection above the sort being narrow (no shuffle/join/agg between
rows) so the output keeps the sorted presentation order. Spark
preserves row order through narrow projections as an implementation
behavior, not a contract — if a future change inside
repetition_metrics / redact_pii / quantize_int8 / the q13 JSON
projection introduces a wide step, the presentation order breaks
silently (the driver's correctness hash is order-insensitive, so only
this test would catch it).
"""
from __future__ import annotations

import pytest

from airflow_spotify_etl_spark.plans import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


@pytest.mark.parametrize(
    "qname,key",
    [
        ("q13_flatten_defaults", "event_id"),
        ("q45_repetition_metrics", "doc_id"),
        ("q52_pii_redaction", "doc_id"),
        ("q112_int8_quantization", "vec_id"),
    ],
)
def test_sorted_output_survives_projection(spark, qs, qname, key):
    rows = qs[qname](spark, SF).select(key).collect()
    got = [r[0] for r in rows]
    assert len(got) > 1, f"{qname} returned too few rows to check order"
    assert got == sorted(got), (
        f"{qname} output is no longer sorted by {key}: the projection "
        "above the input sort stopped being order-preserving"
    )
