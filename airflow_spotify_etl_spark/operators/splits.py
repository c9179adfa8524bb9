"""Leakage-safe dataset splitting (north star: train/eval hygiene at 100 TB).

Splitting a training corpus row-by-row leaks: near-duplicate documents (and
trivially, same-domain boilerplate) land on both sides of the train/val
fence, inflating eval scores. The standard defense is GROUP-level splitting
— hash the provenance group (domain/source), not the row, so every document
of a group lands in the same split — plus an audit that joins the near-dup
cluster map against the split to count what still leaks across groups.

Both operators are narrow/deterministic by design:

- ``domain_split`` is a pure projection (portable md5-slice hash of the
  domain, compare against a percent threshold): zero shuffle, fully
  whole-stage-codegen, pushed against the scan; the same doc lands in the
  same split on every run, any cluster, any partitioning — and the oracle
  replays the decision exactly (same hash family as operators/sampling).
- ``split_leakage_audit`` consumes an already-computed component map
  (operators/dedup.connected_components — clustered docs only, a tiny
  relation next to the corpus) and aggregates per component: one
  |clustered-docs| join + one component-keyed aggregate. Nothing touches
  the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _h32

__all__ = ["domain_split", "split_leakage_audit"]


def domain_split(
    df: DataFrame,
    domain_col: str = "source",
    val_pct: int = 10,
    salt: str = "split",
    train_name: str = "train",
    val_name: str = "val",
) -> DataFrame:
    """Add a ``split`` column: ``val`` iff hash(salt‖domain) mod 100 <
    ``val_pct``, else ``train``. Hashing the DOMAIN (not the row id) is
    the leakage defense: all rows of a domain move together, so
    intra-domain near-dups can never straddle the fence."""
    slot = F.pmod(
        _h32(F.concat(F.lit(salt), F.col(domain_col).cast("string"))),
        F.lit(100),
    )
    return df.withColumn(
        "split", F.when(slot < val_pct, F.lit(val_name)).otherwise(F.lit(train_name))
    )


def split_leakage_audit(
    components: DataFrame,
    split_assign: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component",
    split_col: str = "split",
    val_name: str = "val",
) -> DataFrame:
    """Per near-dup cluster: member count per split and a ``leaky`` flag
    (cluster spans both splits — cross-fence duplicate contamination the
    domain split could not prevent, e.g. the same boilerplate on two
    domains). ``components`` is (id, component) from connected_components;
    ``split_assign`` is (id, split). Returns one row per component:
    (component, cluster_size, n_train, n_val, leaky)."""
    joined = components.join(split_assign, id_col)
    n_val = F.sum((F.col(split_col) == val_name).cast("long"))
    return (
        joined.groupBy(component_col)
        .agg(
            F.count("*").alias("cluster_size"),
            (F.count("*") - n_val).alias("n_train"),
            n_val.alias("n_val"),
        )
        .withColumn(
            "leaky", (F.col("n_train") > 0) & (F.col("n_val") > 0)
        )
    )
