"""End-to-end corpus-pipeline test: junk filtered, exact dups collapsed,
planted near-dups removed, output partitioned by predicted language."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_spotify_etl_spark.pipelines.corpus import (
    quality_filter,
    run_corpus_pipeline,
)
from airflow_spotify_etl_spark.sources.files import load_table


def test_quality_filter_drops_junk(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "en", "s", 49),
            (2, "too short", "en", "s", 9),
            (3, "the the the the the the the the the the of of", "en", "s", 45),
            (4, "!!!! ???? #### %%%% &&&& **** (((( )))) @@@@ ^^^^", "en", "s", 49),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = [r.doc_id for r in quality_filter(df).select("doc_id").collect()]
    assert kept == [1]  # 2: too few words; 3: stopword soup; 4: no alnum


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    # Plant one exact duplicate and one near-duplicate of doc 0.
    base = docs.filter(F.col("doc_id") == 0).select("text").collect()[0]["text"]
    words = base.split(" ")
    near = " ".join(words[:-2] + ["slightly", "changed"])
    planted = spark.createDataFrame(
        [
            (100001, base, "en", "planted", len(base)),
            (100002, near, "en", "planted", len(near)),
        ],
        docs.schema,
    )
    out = str(tmp_path / "corpus")
    summary = run_corpus_pipeline(
        spark, docs.unionByName(planted), out, near_dup_threshold=0.7
    )

    assert summary["status"] == "success"
    assert summary["docs_in"] == docs.count() + 2
    # Exact dedup collapsed the identical copy…
    assert summary["docs_after_exact_dedup"] < summary["docs_in"]
    result = spark.read.parquet(out)
    ids = {r.doc_id for r in result.select("doc_id").collect()}
    assert 100001 not in ids  # exact dup of doc 0 (higher id loses)
    assert 100002 not in ids  # near dup of doc 0
    assert 0 in ids  # the keeper survives
    # Language-partitioned layout on disk.
    assert summary["n_langs"] >= 1
    assert any(p.name.startswith("pred_lang=") for p in (tmp_path / "corpus").iterdir())


def test_repetition_filter_drops_templated_mass(spark):
    from airflow_spotify_etl_spark.pipelines.corpus import repetition_filter

    df = spark.createDataFrame(
        [
            (1, "a varied document with many different interesting words inside"),
            (2, "spam " * 40 + "spam"),  # one token repeated 41x
        ],
        "doc_id long, text string",
    )
    kept = [r.doc_id for r in repetition_filter(df).select("doc_id").collect()]
    assert kept == [1]


def test_corpus_pipeline_mix_rates_downsample(spark, sf_dir, tmp_path):
    from airflow_spotify_etl_spark.pipelines.corpus import run_corpus_pipeline

    docs = load_table(spark, sf_dir, "documents")
    full = run_corpus_pipeline(spark, docs, str(tmp_path / "full"))
    mixed = run_corpus_pipeline(
        spark, docs, str(tmp_path / "mixed"), mix_rates={"en": 0.2}
    )
    assert mixed["docs_out"] < full["docs_out"]
    # non-en strata untouched: only the en partition shrank
    full_en = spark.read.parquet(str(tmp_path / "full")).filter(
        "pred_lang = 'en'"
    ).count()
    mixed_en = spark.read.parquet(str(tmp_path / "mixed")).filter(
        "pred_lang = 'en'"
    ).count()
    assert mixed_en < full_en
    assert (full["docs_out"] - full_en) == (mixed["docs_out"] - mixed_en)


def test_corpus_pipeline_weighted_sampling_stage(spark, sf_dir, tmp_path):
    """weight_col: weight 1.0 is a no-op; a length-proportional weight
    keeps a strict, deterministic subset (same set on a re-run)."""
    from airflow_spotify_etl_spark.pipelines.corpus import run_corpus_pipeline

    docs = load_table(spark, sf_dir, "documents")
    full = run_corpus_pipeline(spark, docs, str(tmp_path / "full"),
                               weight_col=F.lit(1.0))
    base = run_corpus_pipeline(spark, docs, str(tmp_path / "base"))
    assert full["docs_out"] == base["docs_out"]

    w = F.least(F.lit(1.0), F.length("text") / 400.0)
    s1 = run_corpus_pipeline(spark, docs, str(tmp_path / "w1"), weight_col=w)
    s2 = run_corpus_pipeline(spark, docs, str(tmp_path / "w2"), weight_col=w)
    assert 0 < s1["docs_out"] < base["docs_out"]
    ids1 = {r.doc_id for r in spark.read.parquet(str(tmp_path / "w1")).select("doc_id").collect()}
    ids2 = {r.doc_id for r in spark.read.parquet(str(tmp_path / "w2")).select("doc_id").collect()}
    assert ids1 == ids2


def test_perplexity_buckets_order_and_balance(spark, sf_dir):
    """CCNet terciles: per language the three buckets exist, sizes differ
    by at most ~2 (exact-percentile cuts on ties can shift a couple of
    docs), and mean scores order head > middle > tail."""
    from airflow_spotify_etl_spark.plans.llm import q107_perplexity_buckets

    rows = q107_perplexity_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        sizes = [b[k].n_docs for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= max(3, sum(sizes) // 3), lang
        assert b["head"].avg_score > b["middle"].avg_score > b["tail"].avg_score


def test_quality_aware_keeper_beats_min_id(spark):
    """Planted 2-doc near-dup cluster where the HIGHER doc_id has the
    higher classifier score: the quality-aware keeper must pick it, where
    q42's min-id rule would not. Built directly from the same operator
    composition as q108 (edges -> CC -> score window)."""
    from pyspark.sql import Window as W

    from airflow_spotify_etl_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from airflow_spotify_etl_spark.operators.text import hashed_linear_score

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base + " iota"), (2, base + " kappa"), (3, "totally different words here")],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs)
    scores = hashed_linear_score(docs).select("doc_id", "score")
    member = comp.join(scores, "doc_id")
    rn = F.row_number().over(
        W.partitionBy("component").orderBy(F.col("score").desc(), "doc_id")
    )
    keepers = (
        member.withColumn("rn", rn).filter("rn = 1").select("doc_id", "score")
    ).collect()
    assert len(keepers) == 1
    s = {r.doc_id: r.score for r in scores.collect()}
    want = max([1, 2], key=lambda d: (s[d], -d))
    assert keepers[0].doc_id == want


def test_pipeline_with_classifier_pii_and_excision(spark, tmp_path):
    """The round-5 stages wired end-to-end: planted PII is scrubbed from
    the OUTPUT text (and from the fingerprint input), a cross-doc
    repeated span survives in exactly one doc, and the classifier gate
    drops the lowest-scoring docs while keeping the corpus non-empty."""
    from airflow_spotify_etl_spark.operators.text import hashed_linear_score
    from airflow_spotify_etl_spark.pipelines.corpus import run_corpus_pipeline

    span = " ".join(f"shared{i}" for i in range(10))
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river " + span, "en"),
        (2, "a completely different sentence with the email bob@example.com inside "
            + span, "en"),
        (3, "yet another normal document with plenty of ordinary words to pass the gate", "en"),
        (4, "more clean text about data pipelines and distributed systems at scale", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # pick a threshold below every doc's score so the gate keeps all 4 —
    # the gate's dropping behavior is asserted separately below.
    scores = {r.doc_id: r.score for r in hashed_linear_score(docs).collect()}
    thr = min(scores.values())
    out_path = str(tmp_path / "corpus")
    summary = run_corpus_pipeline(
        spark,
        docs,
        out_path,
        min_words=3,
        classifier_min_score=thr,
        excise_spans=True,
        redact_pii_text=True,
    )
    assert summary["status"] == "success" and summary["docs_out"] >= 3

    out = {r.doc_id: r.text for r in spark.read.parquet(out_path).collect()}
    joined = " ".join(out.values())
    # span_excise rebuilds from lowercased tokens, so the redaction
    # token survives as "<email>"
    assert "bob@example.com" not in joined.lower()
    assert "<email>" in joined.lower()
    n_span_copies = sum("shared0 shared1" in t for t in out.values())
    assert n_span_copies == 1  # excision kept exactly one copy

    # the gate actually gates: a threshold above the max score empties it
    high = run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "corpus2"),
        min_words=3,
        classifier_min_score=max(scores.values()) + 0.1,
    )
    assert high["docs_out"] == 0
