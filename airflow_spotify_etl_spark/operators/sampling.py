"""Deterministic corpus sampling (north star: corpus mixing at 100 TB).

Training-data pipelines weight sources/languages by DOWN-SAMPLING strata to
target rates (e.g. C4's language mixing, The Pile's per-source epochs).
Doing it with ``df.sample`` would be non-reproducible across runs and
cluster layouts; hashing the row key instead gives:

- determinism: the same doc is kept or dropped on every run, any cluster —
  corpus builds become content-addressed and diffable;
- no shuffle: the filter is a narrow projection (hash + compare), fully
  whole-stage-codegen, pushed right against the scan;
- composability: different ``salt`` values draw independent samples
  (train/heldout splits that provably never overlap at the same salt).

The hash is the engine-portable md5 slice (operators/dedup._h32), so the
sampling decision is value-checkable by the DuckDB oracle (plans/llm.py
q47) — same argument as the MinHash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _h32

__all__ = ["stratified_sample"]

_BUCKETS = 10_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "smp",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row iff hash(salt‖id) mod 10000 < rate[stratum]·10000.

    ``rates`` maps stratum value → keep fraction in [0, 1]; strata not
    listed keep ``default_rate``. Adds a ``bucket`` column (the hash slot)
    so downstream can re-derive sub-samples without rehashing."""
    bucket = F.pmod(
        _h32(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.lit(_BUCKETS)
    )
    rate = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        thr = F.lit(int(r * _BUCKETS))
        rate = F.when(cond, thr) if rate is None else rate.when(cond, thr)
    threshold = (
        rate.otherwise(F.lit(int(default_rate * _BUCKETS)))
        if rate is not None
        else F.lit(int(default_rate * _BUCKETS))
    )
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < threshold)
