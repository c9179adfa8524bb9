"""Property-based invariants (hypothesis): randomized inputs, exact
equalities. Example counts are kept small — every example spins Spark jobs —
but the shapes hypothesis explores (duplicate timestamps, single-key
streams, all-same-state runs, zero-token docs) are exactly the edges
hand-written fixtures miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, t_sec, event_id, state) streams: few users/states so runs merge and
# flip often; event ids unique so ordering is total.
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=50),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=40,
).map(
    lambda rows: [
        (u, t, i, s) for i, (u, t, s) in enumerate(rows)
    ]
)


@_slow
@given(stream=_events, cut=st.integers(min_value=0, max_value=50))
def test_scd2_apply_delta_equals_rebuild_on_random_streams(spark, stream, cut):
    """apply(runs(base), delta) == runs(base ∪ delta) for EVERY split
    point, including splits inside a run, at a state flip, before all
    events, and after all events."""
    from airflow_spotify_etl_spark.operators.incremental import (
        scd2_apply_delta,
        scd2_runs,
    )

    ev = spark.createDataFrame(
        [(u, float(t), str(i), s) for u, t, i, s in stream],
        "user_id long, tsec double, event_id string, event_type string",
    ).select(
        "user_id",
        F.timestamp_seconds("tsec").alias("ts"),
        "event_id",
        "event_type",
    )
    cutoff = F.timestamp_seconds(F.lit(cut))
    base_ev = ev.filter(F.col("ts") < cutoff)
    delta_ev = ev.filter(F.col("ts") >= cutoff)
    applied = scd2_apply_delta(scd2_runs(base_ev), delta_ev)
    full = scd2_runs(ev)
    assert applied.exceptAll(full).isEmpty() and full.exceptAll(applied).isEmpty()


@_slow
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=200),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=0, max_value=2000),
)
def test_token_budget_select_equals_serial_greedy(spark, docs, budget):
    from airflow_spotify_etl_spark.operators.sampling import token_budget_select

    rows = [(i, (i * 13) % 97 + 1, round(q, 4)) for i, q in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    got = {
        r.doc_id: r.cum_tokens
        for r in token_budget_select(df, budget=budget).collect()
    }
    cum, want = 0, {}
    for i, toks, score in sorted(rows, key=lambda r: (-r[2], r[0])):
        cum += toks
        if cum > budget:
            break
        want[i] = cum
    assert got == want


@_slow
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_chunk_dedup_invariants_on_random_corpora(spark, texts):
    """Global invariants, any corpus: (1) Σ n_kept == number of DISTINCT
    chunk texts corpus-wide (first-occurrence keeps exactly one copy of
    each); (2) n_kept ≤ n_chunks per doc; (3) every doc's cleaned text is
    a concatenation of a subset of its own chunks, in order."""
    from airflow_spotify_etl_spark.operators.dedup import chunk_dedup

    cw = 2
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_dedup(df, chunk_words=cw).collect()

    def chunks_of(text):
        w = [x for x in text.lower().split() if x]
        return [" ".join(w[i : i + cw]) for i in range(0, len(w), cw)]

    distinct = set()
    for t in texts:
        distinct.update(chunks_of(t))
    assert sum(r.n_kept for r in rows) == len(distinct)
    by_id = {r.doc_id: r for r in rows}
    assert set(by_id) == set(range(len(texts)))
    for i, t in enumerate(texts):
        r = by_id[i]
        assert r.n_chunks == len(chunks_of(t))
        assert 0 <= r.n_kept <= r.n_chunks
    # Serial recomputation of the whole operator for exact equality
    # (subsumes in-order-subset: kept chunks are the doc's own chunks
    # filtered to first global occurrence, in position order).
    seen, want = set(), {}
    for i, t in enumerate(texts):
        kept_chunks = []
        for c in chunks_of(t):
            if c not in seen:
                seen.add(c)
                kept_chunks.append(c)
        want[i] = " ".join(kept_chunks)
    assert {r.doc_id: r.text_clean for r in rows} == want


# Random corpora of short texts drawn from a small alphabet, so exact
# duplicates across the corpus/delta split occur frequently.
_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=6),
    min_size=1,
    max_size=24,
)


@_slow
@given(texts=_texts, cut=st.integers(min_value=0, max_value=24), m_bits=st.sampled_from([64, 4096]))
def test_bloom_novelty_equals_plain_antijoin_on_random_corpora(
    spark, texts, cut, m_bits
):
    """For every corpus/delta split and bloom size (including filters so
    tiny they saturate), the bloom-gated result must equal the plain
    content-hash anti-join — the q96 invariant, randomized."""
    from airflow_spotify_etl_spark.operators.dedup import bloom_novelty_filter

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.filter(F.col("doc_id") < cut)
    delta = df.filter(F.col("doc_id") >= cut)
    if corpus.isEmpty():
        want = {r.doc_id for r in delta.collect()}
    else:
        want = {
            r.doc_id
            for r in delta.join(
                corpus.select(F.md5("text").alias("_ch")).distinct(),
                F.md5(delta.text) == F.col("_ch"),
                "left_anti",
            ).collect()
        }
    got = {
        r.doc_id
        for r in bloom_novelty_filter(corpus, delta, m_bits=m_bits, j_hashes=3).collect()
    }
    assert got == want


@_slow
@given(texts=_texts)
def test_canonical_dedup_accounting_invariants(spark, texts):
    """On any corpus: per-source docs sum to the corpus, global kept
    count equals the number of distinct canonical forms, and kept never
    exceeds docs in any source."""
    from airflow_spotify_etl_spark.operators.dedup import canonical_dedup
    from airflow_spotify_etl_spark.operators.text import normalize_text

    rows = [(i, t, f"s{i % 3}") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = canonical_dedup(df).collect()
    n_forms = (
        df.select(F.md5(normalize_text(F.col("text"))).alias("ch"))
        .distinct()
        .count()
    )
    assert sum(r.n_docs for r in out) == len(rows)
    assert sum(r.n_kept for r in out) == n_forms
    assert all(0 <= r.n_kept <= r.n_docs for r in out)


# Random keyed tables for MERGE: small key space so update/insert/keep
# all occur; values distinguish which side won.
_kv = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(0, 100)),
    min_size=0,
    max_size=15,
)


@_slow
@given(base=_kv, delta=_kv)
def test_merge_upsert_partition_property(spark, base, delta):
    """For random base/delta: output keys = base-keys ∪ delta-keys exactly
    once each; every delta key carries the delta value (update wins),
    every base-only key carries the base value. Delta collapsed to one
    row per key first (max seq), mirroring the operator's LWW contract."""
    from airflow_spotify_etl_spark.operators.incremental import merge_upsert

    bmap = {}
    for k, v in base:
        bmap[k] = v  # later rows win in the dict; make base unique-keyed
    dmap = {}
    for i, (k, v) in enumerate(delta):
        dmap[k] = (v, i)
    bdf = spark.createDataFrame(
        [(k, v, -1) for k, v in bmap.items()] or [], "k long, v long, seq long"
    )
    ddf = spark.createDataFrame(
        [(k, v, i) for k, (v, i) in dmap.items()] or [], "k long, v long, seq long"
    )
    if not bmap and not dmap:
        return
    got = {r.k: r.v for r in merge_upsert(bdf, ddf, ["k"], order_col="seq").collect()}
    want = {**bmap, **{k: v for k, (v, _) in dmap.items()}}
    assert got == want


_texts = st.lists(
    st.lists(
        st.sampled_from([f"t{i}" for i in range(12)]), min_size=0, max_size=30
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@_slow
@given(texts=_texts)
def test_span_profile_invariants_on_random_corpora(spark, texts):
    """For any corpus: 0 ≤ n_dup ≤ n_windows; max_dup_run ≤ n_dup; a
    window count matching len-w+1; and every doc present exactly once."""
    from airflow_spotify_etl_spark.operators.dedup import span_dup_profile

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = span_dup_profile(docs, 4).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(texts)))
    for r in rows:
        n = len(texts[r.doc_id].split())
        expect_windows = max(0, n - 4 + 1)
        assert r.n_windows == expect_windows
        assert 0 <= r.n_dup_windows <= r.n_windows
        assert r.max_dup_run <= r.n_dup_windows


@_slow
@given(texts=_texts)
def test_span_excise_conservation_and_determinism(spark, texts):
    """Conservation: n_tokens == n_removed + len(text_clean tokens), and
    two runs over the same corpus agree exactly (the first-occurrence
    rank is totally ordered by (doc_id, wi) — no tie nondeterminism).
    NOTE deliberately NOT asserted: idempotence. Excision seams can
    create NEW duplicated windows (removed span joins its neighbors), so
    a second pass may legitimately remove more — the reason production
    substring dedup iterates to a fixpoint or length-filters first."""
    from airflow_spotify_etl_spark.operators.dedup import span_excise

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in span_excise(docs, 4).collect()}
    for r in out.values():
        kept = r.text_clean.split()
        assert r.n_tokens == r.n_removed + len(kept)
    again = {r.doc_id: r for r in span_excise(docs, 4).collect()}
    assert {k: (v.n_removed, v.text_clean) for k, v in out.items()} == {
        k: (v.n_removed, v.text_clean) for k, v in again.items()
    }


_corpora = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=2,
    max_size=12,
)


@_slow
@given(texts=_corpora)
def test_sparse_cosine_equals_numpy_reference(spark, texts):
    """sparse_cosine_pairs (capped inverted index, join-free expansion,
    integer dot/norms) == the obvious dense numpy count-vector cosine
    on every random corpus — including all-space, repeated-shingle, and
    sub-3-word docs."""
    import numpy as np

    from airflow_spotify_etl_spark.operators.dedup import sparse_cosine_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.dot, r.norm2_a, r.norm2_b)
        for r in sparse_cosine_pairs(df, threshold=0.0, max_df=10**6).collect()
    }

    # reference: trigram count vectors, explicit dot/norms
    def grams(t):
        w = t.split(" ")
        return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]

    counts = {i: {} for i, _ in rows}
    for i, t in rows:
        for g in grams(t):
            counts[i][g] = counts[i].get(g, 0) + 1
    want = {}
    ids = [i for i, _ in rows]
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = counts[ids[x]], counts[ids[y]]
            dot = sum(a[g] * b.get(g, 0) for g in a)
            if dot:  # pairs sharing no term never materialize
                na = sum(v * v for v in a.values())
                nb = sum(v * v for v in b.values())
                want[(ids[x], ids[y])] = (dot, na, nb)
    assert got == want


@_slow
@given(
    n=st.integers(min_value=1, max_value=60),
    seed=st.sampled_from(["s1", "s2", "s3"]),
    bs=st.integers(min_value=1, max_value=16),
)
def test_epoch_shuffle_is_exact_md5_permutation(spark, n, seed, bs):
    """The distributed bucket-offset rank must equal the naive global
    md5 sort for every corpus size, seed, and batch size — positions
    are a permutation of 0..n-1 and batches are contiguous cuts."""
    import hashlib

    from airflow_spotify_etl_spark.operators.layout import epoch_shuffle

    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, seed=seed, batch_size=bs).collect()
    want_order = sorted(
        range(n), key=lambda i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    )
    got = sorted(out, key=lambda r: r.global_pos)
    assert [r.doc_id for r in got] == want_order
    assert [r.global_pos for r in got] == list(range(n))
    assert all(r.batch_id == r.global_pos // bs for r in out)
