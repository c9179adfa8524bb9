"""Leakage-safe splitting: domain atomicity, zero-shuffle decision plan,
and the cluster-vs-split audit's leaky flags on closed-form input."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_spotify_etl_spark.operators.splits import (
    domain_split,
    split_leakage_audit,
)


def test_domain_split_is_atomic_per_domain(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 7}") for i in range(200)], "doc_id long, source string"
    )
    out = domain_split(df, val_pct=40)
    per_domain = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r.n_splits == 1 for r in per_domain)
    # Deterministic: same input, same assignment, run to run.
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in domain_split(df, val_pct=40).collect()}
    assert a == b
    # With 7 domains and val_pct=40, both splits should be inhabited.
    assert {r.split for r in out.collect()} == {"train", "val"}


def test_domain_split_decision_is_shuffle_free(spark):
    """The split decision must be a pure projection riding the scan — no
    Exchange anywhere in the plan (the 100 TB contract: splitting the
    corpus costs one codegen'd pass, not a shuffle)."""
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = domain_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_split_leakage_audit_flags(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)],
        "doc_id long, component long",
    )
    assign = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "train"), (5, "val")],
        "doc_id long, split string",
    )
    rows = {
        r.component: (r.cluster_size, r.n_train, r.n_val, r.leaky)
        for r in split_leakage_audit(comp, assign).collect()
    }
    assert rows[1] == (2, 1, 1, True)  # spans both splits
    assert rows[3] == (2, 2, 0, False)  # train-only
    assert rows[5] == (1, 0, 1, False)  # singleton val


def test_contrastive_negatives_no_self_pairs_and_reproducible(spark):
    from airflow_spotify_etl_spark.operators.sampling import (
        contrastive_negatives,
    )

    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    a = contrastive_negatives(df, k=4, seed="s").orderBy(
        "doc_id", "neg_rank"
    ).collect()
    assert len(a) == 50 * 4
    assert all(r.neg_doc_id != r.doc_id for r in a)  # ring offset: impossible
    b = contrastive_negatives(df, k=4, seed="s").orderBy(
        "doc_id", "neg_rank"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = contrastive_negatives(df, k=4, seed="t").collect()
    assert {(r.doc_id, r.neg_rank, r.neg_doc_id) for r in c} != {
        (r.doc_id, r.neg_rank, r.neg_doc_id) for r in a
    }


def test_contrastive_negatives_degenerate_corpora(spark):
    from airflow_spotify_etl_spark.operators.sampling import (
        contrastive_negatives,
    )

    one = spark.range(0, 1).withColumnRenamed("id", "doc_id")
    assert contrastive_negatives(one, k=3).count() == 0  # nobody to pair
    two = spark.range(0, 2).withColumnRenamed("id", "doc_id")
    out = contrastive_negatives(two, k=3).collect()
    # N=2: every negative is the other doc, all k ranks present
    assert len(out) == 6 and all(r.neg_doc_id == 1 - r.doc_id for r in out)


def test_scaling_subsets_are_nested(spark):
    """The tier-p set (all docs with tier <= p) must be a strict subset
    of every larger tier — the property that lets a scaling-law sweep
    reuse each smaller run's data exactly."""
    from pyspark.sql import functions as F

    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("scale0:"), F.col("doc_id").cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("long"),
        F.lit(10_000),
    )
    d = docs.withColumn("u", u)
    sets = {
        p: {r.doc_id for r in d.filter(F.col("u") < p * 100).collect()}
        for p in (1, 2, 4, 8, 16, 32, 64)
    }
    for small, big in zip((1, 2, 4, 8, 16, 32), (2, 4, 8, 16, 32, 64)):
        assert sets[small] < sets[big]  # strict nesting
    # tier sizes are near their nominal percentage (hash uniformity)
    assert 30 <= len(sets[1]) <= 75   # ~50 of 5000
    assert 2700 <= len(sets[64]) <= 3600  # ~3200


def test_stratified_split_exact_quotas_and_tiny_strata(spark):
    """Every stratum hits floor(n/10) for val AND test exactly; strata
    under 10 docs put everything in train (no starved rand() wobble);
    assignment is deterministic."""
    import os, tempfile

    import airflow_spotify_etl_spark.plans.llm as llm

    rows = [(i, f"t{i}", "en", "s", 5) for i in range(47)]
    rows += [(100 + i, f"u{i}", "fr", "s", 5) for i in range(7)]  # tiny stratum
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            (r.lang, r.split): r.n_docs
            for r in llm.q136_stratified_split(spark, td).collect()
        }
        again = {
            (r.lang, r.split): r.n_docs
            for r in llm.q136_stratified_split(spark, td).collect()
        }
    assert out == again
    assert out[("en", "val")] == 4 and out[("en", "test")] == 4
    assert out[("en", "train")] == 39
    assert ("fr", "val") not in out and ("fr", "test") not in out
    assert out[("fr", "train")] == 7
