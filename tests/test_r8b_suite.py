"""Hand-computed worked-example pins for the round-8 batch-B queries
(q355+). The DuckDB oracle replays the same formula as the Spark plan,
so these planted closed-form fixtures are the only INDEPENDENT check
available in this container (scipy/sklearn absent, installs forbidden)
— every value below is derived by hand in the docstring."""

from __future__ import annotations

import pytest

from airflow_spotify_etl_spark.plans import all_queries
from airflow_spotify_etl_spark.sources.files import SCHEMAS


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["embeddings"]).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )


def test_q355_two_clusters_and_a_poisoned_label(spark, tmp_path, qs):
    """Two orthogonal clusters on the axes (cosine 1.0 within, 0.0
    across) plus one mislabeled vector v5=[3,0] carrying label 7:
    v1's NN candidates at cos 1.0 are {v2, v5} -> nbr_id ASC picks v2
    (label 0, agree); v2's NN is v1 (agree); v3/v4 pair up (agree);
    v5's NN at cos 1.0 is v1 (label 0 != 7, disagree). Expected:
    label 0 -> 2/2 agree (ppm 1,000,000), label 1 -> 2/2,
    label 7 -> 0/1 (ppm 0)."""
    _write_embeddings(spark, tmp_path, [
        (1, [1.0, 0.0], 0),
        (2, [2.0, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.0, 2.0], 1),
        (5, [3.0, 0.0], 7),
    ])
    rows = qs["q355_knn_label_agreement"](spark, str(tmp_path)).collect()
    got = {r.label: (r.n_probes, r.n_agree, r.agree_ppm) for r in rows}
    assert got == {
        0: (2, 2, 1_000_000),
        1: (2, 2, 1_000_000),
        7: (1, 0, 0),
    }


def test_q356_distinct_n_hand_values(spark, tmp_path, qs):
    """srcA doc 'a b a': 3 unigrams / 2 distinct -> 666666 ppm;
    bigrams {'a b','b a'} -> 2/2 -> 1,000,000. srcB doc 'x x x x':
    4/1 -> 250000; bigrams 3 x 'x x' -> 3/1 -> 333333. srcC one-word
    doc: 1/1 unigrams -> 1,000,000; zero bigrams -> NULL ppm."""
    _write_docs(spark, tmp_path, [
        (1, "a b a", "en", "srcA", 5),
        (2, "x x x x", "en", "srcB", 7),
        (3, "solo", "en", "srcC", 4),
    ])
    rows = qs["q356_distinct_n_diversity"](spark, str(tmp_path)).collect()
    got = {
        r.source: (r.n_unigrams, r.n_distinct1, r.distinct1_ppm,
                   r.n_bigrams, r.n_distinct2, r.distinct2_ppm)
        for r in rows
    }
    assert got == {
        "srcA": (3, 2, 666_666, 2, 2, 1_000_000),
        "srcB": (4, 1, 250_000, 3, 1, 333_333),
        "srcC": (1, 1, 1_000_000, 0, 0, None),
    }


def _order(okey, price, priority):
    from datetime import datetime

    return (okey, 1, "O", price, datetime(2024, 3, 1), priority)


def test_q357_woe_iv_hand_values(spark, tmp_path, qs):
    """bin0 (<50k): 3 good, 1 bad; bin1: 1 good, 1 bad. G=4, B=2.
    WoE0 = ln((3/4)/(1/2)) = ln(1.5) = 0.405465 -> 405465;
    IV0 = (0.75-0.5)*ln(1.5) = 0.101366 -> 101366.
    WoE1 = ln((1/4)/(1/2)) = ln(0.5) -> -693147;
    IV1 = (0.25-0.5)*ln(0.5) = 0.173287 -> 173287.
    IV total = 274653 on every row."""
    _write_orders(spark, tmp_path, [
        _order(1, 10_000.0, "3-MEDIUM"),
        _order(2, 20_000.0, "4-NOT SPECIFIED"),
        _order(3, 30_000.0, "5-LOW"),
        _order(4, 40_000.0, "1-URGENT"),
        _order(5, 60_000.0, "3-MEDIUM"),
        _order(6, 70_000.0, "2-HIGH"),
    ])
    rows = qs["q357_woe_iv"](spark, str(tmp_path)).collect()
    got = {r.price_bin: (r.n_good, r.n_bad, r.woe_micro, r.iv_micro,
                         r.iv_total_micro) for r in rows}
    assert got == {
        0: (3, 1, 405_465, 101_366, 274_653),
        1: (1, 1, -693_147, 173_287, 274_653),
    }


def test_q357_one_class_bin_is_null(spark, tmp_path, qs):
    """bin0 all-good (1/0) -> NULL WoE/IV; bin1 (1 good, 1 bad) with
    G=2, B=1: WoE1 = ln((1/2)/(1/1)) = ln(0.5) -> -693147,
    IV1 = (0.5-1.0)*ln(0.5) = 0.346574 -> 346574 = IV total (NULL
    terms count as 0)."""
    _write_orders(spark, tmp_path, [
        _order(1, 10_000.0, "5-LOW"),
        _order(2, 60_000.0, "3-MEDIUM"),
        _order(3, 70_000.0, "1-URGENT"),
    ])
    rows = qs["q357_woe_iv"](spark, str(tmp_path)).collect()
    got = {r.price_bin: (r.n_good, r.n_bad, r.woe_micro, r.iv_micro,
                         r.iv_total_micro) for r in rows}
    assert got == {
        0: (1, 0, None, None, 346_574),
        1: (1, 1, -693_147, 346_574, 346_574),
    }


def test_q358_delta_method_hand_values(spark, tmp_path, qs):
    """Two users on 'click': u1 values {1.0, 2.0} (x=3.0, y=2),
    u2 {3.0} (x=3.0, y=1). R = 6/3 = 2.0 -> r_micro 2,000,000.
    Residuals x - R*y: u1 -1.0, u2 +1.0 -> quad sum 2.0;
    Var = (2/1)*2/9 = 4/9, SE = 2/3 -> 666,667 micro.
    CI = 2 +/- 1.96*(2/3) = [0.693333, 3.306667]."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    _write_events(spark, tmp_path, [
        (1, t, 1, "click", 1.0, "{}"),
        (2, t, 1, "click", 2.0, "{}"),
        (3, t, 2, "click", 3.0, "{}"),
    ])
    r = qs["q358_delta_method_ratio_ci"](spark, str(tmp_path)).collect()[0]
    assert (r.event_type, r.n_users, r.n_events, r.sum_value_milli) == (
        "click", 2, 3, 6000)
    assert (r.r_micro, r.se_micro) == (2_000_000, 666_667)
    assert (r.ci_lo_micro, r.ci_hi_micro) == (693_333, 3_306_667)


def test_q358_single_user_is_null(spark, tmp_path, qs):
    """One user -> n-1 = 0 -> SE/CI undefined -> NULL (point estimate
    still reported)."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    _write_events(spark, tmp_path, [
        (1, t, 1, "click", 5.0, "{}"),
        (2, t, 1, "click", 7.0, "{}"),
    ])
    r = qs["q358_delta_method_ratio_ci"](spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.r_micro) == (1, 6_000_000)
    assert (r.se_micro, r.ci_lo_micro, r.ci_hi_micro) == (None, None, None)


def test_q359_compaction_plan_hand_groups(spark, tmp_path, qs):
    """Daily counts d1=600, d2=500, d3=300, d4=700 with target 1000:
    exclusive prefixes 0/600/1100/1400 -> groups 0,0,1,1.
    g0 = {d1,d2} 1100 rows (oversized), g1 = {d3,d4} 1000 rows
    (not oversized — the flag is strict >)."""
    from datetime import datetime, timedelta

    rows, eid = [], 0
    for day, cnt in enumerate([600, 500, 300, 700]):
        for _ in range(cnt):
            eid += 1
            rows.append((eid, datetime(2024, 3, 1, 8)
                         + timedelta(days=day), eid % 7, "view", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = qs["q359_compaction_plan"](spark, str(tmp_path)).collect()
    got = [(r.group_id, str(r.d_from), str(r.d_to), r.n_days, r.n_rows,
            r.oversized) for r in out]
    assert got == [
        (0, "2024-03-01", "2024-03-02", 2, 1100, True),
        (1, "2024-03-03", "2024-03-04", 2, 1000, False),
    ]


def test_q360_welch_anova_hand_values(spark, tmp_path, qs):
    """Type a: {1,2,3} (mean 2, var 1, w=3); type b: {2,4,6,8}
    (mean 5, var 20/3, w=0.6). W=3.6, weighted mean 2.5;
    numerator = 3*0.25 + 0.6*6.25 = 4.5; k=2 -> denominator 1 ->
    F* = 4.5 -> 4,500,000. Satterthwaite df2 = 1/Lambda with
    Lambda = (1/6)^2/2 + (5/6)^2/3 = 0.2453703... ->
    df2 = 4.075472 -> 4,075,472 micro (equals the Welch t^2 df
    for the same two samples)."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    rows = [(i + 1, t, i + 1, "a", float(v), "{}")
            for i, v in enumerate([1, 2, 3])]
    rows += [(i + 10, t, i + 10, "b", float(v), "{}")
             for i, v in enumerate([2, 4, 6, 8])]
    _write_events(spark, tmp_path, rows)
    r = qs["q360_welch_anova"](spark, str(tmp_path)).collect()[0]
    assert (r.k_groups, r.n_total, r.df1) == (2, 7, 1)
    assert r.f_welch_micro == 4_500_000
    assert r.df2_micro == 4_075_472


def test_q360_excludes_degenerate_groups(spark, tmp_path, qs):
    """Zero-variance type b ({5,5,5}) and singleton type c are
    excluded; only type a qualifies -> k=1 -> NULL F*/df2 with the
    group census still reported."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    rows = [(i + 1, t, i + 1, "a", float(v), "{}")
            for i, v in enumerate([1, 2, 3])]
    rows += [(i + 10, t, i + 10, "b", 5.0, "{}") for i in range(3)]
    rows += [(20, t, 20, "c", 9.0, "{}")]
    _write_events(spark, tmp_path, rows)
    r = qs["q360_welch_anova"](spark, str(tmp_path)).collect()[0]
    assert (r.k_groups, r.n_total, r.df1) == (1, 3, 0)
    assert (r.f_welch_micro, r.df2_micro) == (None, None)


def test_q361_ansari_bradley_hand_value(spark, tmp_path, qs):
    """en lengths {1,4} (tails), non-en {2,3} (middle), N=4: AB
    scores 1,2,2,1 -> T1 = 1+1 = 2; abar = 6/4, E[T1] = 3;
    Var = 4*(4*10-36)/(16*3) = 1/3; z = -1/sqrt(1/3) = -1.7320508
    -> -1,732,051 micro (negative = sample 1 in the tails = larger
    dispersion)."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "s", 1),
        (2, "t", "en", "s", 4),
        (3, "t", "de", "s", 2),
        (4, "t", "de", "s", 3),
    ])
    r = qs["q361_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    assert (r.source, r.n1, r.n2, r.t1_micro) == ("s", 2, 2, 2_000_000)
    assert r.z_micro == -1_732_051


def test_q361_tie_averaged_scores(spark, tmp_path, qs):
    """en {1,2}, non-en {2,2}: the length-2 tie spans ranks 2-4 with
    scores {2,2,1} -> averaged 5/3 each. T1 = 1 + 5/3 = 2.666667;
    sum a = 6, sum a^2 = 1 + 3*(5/3)^2 = 28/3; Var = 1/9 ->
    z = (-1/3)/(1/3) = -1 exactly in the reals. Under the micro
    quantization both inputs truncate a hair (t1 2.666667 > 8/3,
    sa2 9.333333 < 28/3), leaving z*1e6 at -999999.49... -> the
    deterministic quantized pin is -999,999 (one micro inside the
    exact value; both engines replay the identical chain)."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "s", 1),
        (2, "t", "en", "s", 2),
        (3, "t", "de", "s", 2),
        (4, "t", "de", "s", 2),
    ])
    r = qs["q361_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.t1_micro) == (2, 2, 2_666_667)
    assert r.z_micro == -999_999


def test_q361_one_sided_source_is_null(spark, tmp_path, qs):
    """A source with only English docs has no comparison sample ->
    NULL z (census still reported)."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "s", 3),
        (2, "t", "en", "s", 9),
    ])
    r = qs["q361_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.z_micro) == (2, 0, None)


def test_q362_lateness_tiers_hand_values(spark, tmp_path, qs):
    """Arrival order e1..e6 with event times 10:00:00, 09:59:59.5,
    10:00:30, 09:59:45, 09:00:00, 09:59:00: lateness vs the running
    max of earlier arrivals is 0 / 0.5s / 0 / 45s / 3630s / 90s ->
    tiers on_time x2, under_1s, under_1m, under_1h, 1h_plus; shares
    333333 and 166666 ppm (floor division)."""
    from datetime import datetime

    d = datetime
    rows = [
        (1, d(2024, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 3, 1, 9, 59, 59, 500000), 2, "view", 1.0, "{}"),
        (3, d(2024, 3, 1, 10, 0, 30), 3, "view", 1.0, "{}"),
        (4, d(2024, 3, 1, 9, 59, 45), 4, "view", 1.0, "{}"),
        (5, d(2024, 3, 1, 9, 0, 0), 5, "view", 1.0, "{}"),
        (6, d(2024, 3, 1, 9, 59, 0), 6, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q362_watermark_lateness_audit"](spark, str(tmp_path)).collect()
    got = {r.lateness_tier: (r.n_events, r.share_ppm) for r in out}
    assert got == {
        "0_on_time": (2, 333_333),
        "1_under_1s": (1, 166_666),
        "2_under_1m": (1, 166_666),
        "3_under_1h": (1, 166_666),
        "4_1h_plus": (1, 166_666),
    }


def test_q363_lift_gains_hand_values(spark, tmp_path, qs):
    """10 events valued 10..1 (rank = 11-value), purchases at values
    10, 9, 8 and 2 (ranks 1, 2, 3, 9 -> deciles 0, 1, 2, 8). Base
    rate 4/10: hit deciles (n=1, n_pos=1) lift = 10/4 = 2,500,000
    ppm; cumulative gains climb 250k/500k/750k then hold and reach
    1,000,000 at decile 8."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    rows = [
        (i + 1, t, i + 1,
         "purchase" if v in (10, 9, 8, 2) else "view", float(v), "{}")
        for i, v in enumerate([10, 9, 8, 7, 6, 5, 4, 3, 2, 1])
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q363_lift_gains"](spark, str(tmp_path)).collect()
    got = {r.decile: (r.n, r.n_pos, r.pos_rate_ppm, r.lift_ppm,
                      r.cum_gain_ppm) for r in out}
    assert got[0] == (1, 1, 1_000_000, 2_500_000, 250_000)
    assert got[1] == (1, 1, 1_000_000, 2_500_000, 500_000)
    assert got[2] == (1, 1, 1_000_000, 2_500_000, 750_000)
    assert got[3] == (1, 0, 0, 0, 750_000)
    assert got[8] == (1, 1, 1_000_000, 2_500_000, 1_000_000)
    assert got[9] == (1, 0, 0, 0, 1_000_000)


def test_q363_ties_break_by_event_id(spark, tmp_path, qs):
    """Two equal-value events split across the decile boundary by
    event_id order: 4 events, values {5,5,1,1}, purchase on event 2
    (the SECOND value-5 arrival). Ranks by (value DESC, event_id):
    e1=1, e2=2 -> deciles ((r-1)*10) div 4: e1 d0, e2 d2 -> the
    purchase lands in decile 2 deterministically."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    rows = [
        (1, t, 1, "view", 5.0, "{}"),
        (2, t, 2, "purchase", 5.0, "{}"),
        (3, t, 3, "view", 1.0, "{}"),
        (4, t, 4, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q363_lift_gains"](spark, str(tmp_path)).collect()
    got = {r.decile: (r.n, r.n_pos) for r in out}
    assert got == {0: (1, 0), 2: (1, 1), 5: (1, 0), 7: (1, 0)}


def test_q364_l_diversity_hand_values(spark, tmp_path, qs):
    """(en, srcA): 4 docs in 4 distinct length buckets -> l=4,
    H=ln4, entropy-l = exp(H) = 4.000; (en, srcB): 3 docs in ONE
    bucket (homogeneity attack) -> l=1, entropy-l = 1.000, flagged;
    (de, srcA): 2 docs in 2 buckets -> l=2, entropy-l = 2.000,
    flagged (below l=3)."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "srcA", 50),
        (2, "t", "en", "srcA", 150),
        (3, "t", "en", "srcA", 250),
        (4, "t", "en", "srcA", 350),
        (5, "t", "en", "srcB", 10),
        (6, "t", "en", "srcB", 20),
        (7, "t", "en", "srcB", 30),
        (8, "t", "de", "srcA", 50),
        (9, "t", "de", "srcA", 150),
    ])
    out = qs["q364_l_diversity"](spark, str(tmp_path)).collect()
    got = {(r.lang, r.source): (r.class_size, r.l_distinct,
                                r.entropy_l_milli, r.below_l3)
           for r in out}
    assert got == {
        ("en", "srcA"): (4, 4, 4000, False),
        ("en", "srcB"): (3, 1, 1000, True),
        ("de", "srcA"): (2, 2, 2000, True),
    }


def test_q365_t_closeness_hand_values(spark, tmp_path, qs):
    """Global buckets A(0-99) x3, B(100-199) x1 over two classes:
    srcX = {A, B} -> TVD = (|1/2-3/4| + |1/2-1/4|)/2 = 1/4 ->
    250000 ppm; srcY = {A, A} (skewed to A, bucket B absent) ->
    TVD = (|1-3/4| + |0-1/4|)/2 = 1/4 -> 250000 ppm, exercising the
    algebraic absent-bucket tail. Both exceed t = 0.2 -> flagged."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "srcX", 50),
        (2, "t", "en", "srcX", 150),
        (3, "t", "en", "srcY", 60),
        (4, "t", "en", "srcY", 70),
    ])
    out = qs["q365_t_closeness"](spark, str(tmp_path)).collect()
    got = {(r.lang, r.source): (r.class_size, r.t_ppm, r.above_t_02)
           for r in out}
    assert got == {
        ("en", "srcX"): (2, 250_000, True),
        ("en", "srcY"): (2, 250_000, True),
    }


def test_q365_identical_distribution_is_zero(spark, tmp_path, qs):
    """A class whose sensitive distribution equals the global one has
    t = 0 (no skewness leak)."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "srcX", 50),
        (2, "t", "en", "srcX", 150),
        (3, "t", "en", "srcY", 60),
        (4, "t", "en", "srcY", 160),
    ])
    out = qs["q365_t_closeness"](spark, str(tmp_path)).collect()
    assert all(r.t_ppm == 0 and not r.above_t_02 for r in out)


def test_q366_growth_accounting_hand_ledger(spark, tmp_path, qs):
    """u1 active d1,d2,d4 (retained d2, resurrected d4); u2 d1 only
    (churns d2); u3 d2,d3 (new d2, retained d3, churns d4). Ledger:
    d1 (2 active, 2 new), d2 (2 active, 1 new, 1 retained, 1 churn),
    d3 (1 active, 1 retained, 1 churn: u1), d4 (1 active,
    1 resurrected, 1 churn: u3). u1's d4 activity is right-censored
    (max day) — no churn past the data end. Every day satisfies
    active = new + retained + resurrected."""
    from datetime import datetime

    def ev(eid, day, uid):
        return (eid, datetime(2024, 3, day, 12), uid, "view", 1.0, "{}")

    _write_events(spark, tmp_path, [
        ev(1, 1, 1), ev(2, 2, 1), ev(3, 4, 1),
        ev(4, 1, 2),
        ev(5, 2, 3), ev(6, 3, 3),
    ])
    out = qs["q366_growth_accounting"](spark, str(tmp_path)).collect()
    got = {str(r.day): (r.n_active, r.n_new, r.n_retained,
                        r.n_resurrected, r.n_churned) for r in out}
    assert got == {
        "2024-03-01": (2, 2, 0, 0, 0),
        "2024-03-02": (2, 1, 1, 0, 1),
        "2024-03-03": (1, 0, 1, 0, 1),
        "2024-03-04": (1, 0, 0, 1, 1),
    }
    for n_active, n_new, n_ret, n_res, _ in got.values():
        assert n_active == n_new + n_ret + n_res


def test_lateness_monitor_equals_batch_q362(spark, tmp_path, qs):
    """Streaming twin of q362: the q362 hand fixture split into two
    arrival-ordered micro-batches (e1-e3, then e4-e6). The merged
    streaming profile must equal the batch q362 relation over the
    union (cross-batch lateness seeds from the earlier batch's max
    event time), and a foreachBatch RETRY of batch 0 must not move
    any row."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS
    from airflow_spotify_etl_spark.streaming.lateness_monitor import (
        _apply_lateness_batch,
        read_lateness_profile,
        run_lateness_monitor,
    )
    from datetime import datetime

    d = datetime
    rows1 = [
        (1, d(2024, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 3, 1, 9, 59, 59, 500000), 2, "view", 1.0, "{}"),
        (3, d(2024, 3, 1, 10, 0, 30), 3, "view", 1.0, "{}"),
    ]
    rows2 = [
        (4, d(2024, 3, 1, 9, 59, 45), 4, "view", 1.0, "{}"),
        (5, d(2024, 3, 1, 9, 0, 0), 5, "view", 1.0, "{}"),
        (6, d(2024, 3, 1, 9, 59, 0), 6, "view", 1.0, "{}"),
    ]
    src = str(tmp_path / "late_src")
    store = str(tmp_path / "late_store")
    ckpt = str(tmp_path / "late_ckpt")
    schema = SCHEMAS["events"]

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        run_lateness_monitor(spark, stream, store, ckpt)

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()

    got = {
        r.lateness_tier: (r.n_events, r.share_ppm)
        for r in read_lateness_profile(spark, store).collect()
    }
    batch_dir = tmp_path / "late_batch"
    spark.createDataFrame(rows1 + rows2, schema).write.parquet(
        str(batch_dir / "events.parquet")
    )
    want = {
        r.lateness_tier: (r.n_events, r.share_ppm)
        for r in qs["q362_watermark_lateness_audit"](
            spark, str(batch_dir)
        ).collect()
    }
    assert got == want
    assert got["0_on_time"] == (2, 333_333)

    # retry discipline: re-applying batch 0 reuses only priors with
    # batch < 0 (none) and overwrites its own partition -> no movement
    _apply_lateness_batch(
        spark, spark.createDataFrame(rows1, schema), store, 0
    )
    again = {
        r.lateness_tier: (r.n_events, r.share_ppm)
        for r in read_lateness_profile(spark, store).collect()
    }
    assert again == got


def test_q367_chapman_recovers_exact_population(spark, tmp_path, qs):
    """srcA texts {t1,t2,t3}, srcB {t2,t3,t4,t5}: n1=3, n2=4, m=2 ->
    Chapman floor(4*5/3) - 1 = 5 = the TRUE distinct population (the
    estimator is exactly unbiased here); coverage = 5/5 = 1,000,000
    ppm and the observed union equals the estimate."""
    _write_docs(spark, tmp_path, [
        (1, "t1", "en", "srcA", 2),
        (2, "t2", "en", "srcA", 2),
        (3, "t3", "en", "srcA", 2),
        (4, "t2", "en", "srcB", 2),
        (5, "t3", "en", "srcB", 2),
        (6, "t4", "en", "srcB", 2),
        (7, "t5", "en", "srcB", 2),
    ])
    r = qs["q367_capture_recapture"](spark, str(tmp_path)).collect()[0]
    assert (r.source_a, r.source_b) == ("srcA", "srcB")
    assert (r.n1, r.n2, r.m_overlap) == (3, 4, 2)
    assert (r.n_hat_chapman, r.n_union_observed, r.coverage_ppm) == (
        5, 5, 1_000_000)


def test_q368_semantic_decontamination_hand_values(spark, tmp_path, qs):
    """Probes 0=[1,0], 1=[0,1]; corpus 40=[2,0] (cos 1.0 / 0.0),
    41=[1,1] (cos 0.7071 to both), 42=[0,-3] (cos 0.0 / -1.0). At
    threshold 0.45: probe 0 flags {40, 41} (top = 40 at 1.0),
    probe 1 flags {41} (top = 41 at 0.7071); the distinct corpus
    removal is 2 (41 counts once despite hitting both probes)."""
    _write_embeddings(spark, tmp_path, [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 1),
        (40, [2.0, 0.0], 0),
        (41, [1.0, 1.0], 0),
        (42, [0.0, -3.0], 0),
    ])
    out = qs["q368_semantic_decontamination"](spark, str(tmp_path)).collect()
    got = {r.query_id: (r.n_flagged, r.top_match_id, r.top_cos,
                        r.n_corpus_contaminated) for r in out}
    assert got == {
        0: (2, 40, 1.0, 2),
        1: (1, 41, 0.7071, 2),
    }


def test_q369_delong_hand_values(spark, tmp_path, qs):
    """Positives (purchase) scored {2, 4}, negatives (view) {1, 3}:
    3 of 4 pairs concordant -> AUC = 0.75 (750,000 ppm). Placement
    values V10 = {1/2, 1}, V01 = {1, 1/2}; S10 = S01 = 0.125;
    SE = sqrt(0.125/2 + 0.125/2) = 0.353553 -> 353,553 micro;
    CI = 0.75 +/- 1.96*SE = [0.057035, 1.442965] (unclamped by
    design)."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    _write_events(spark, tmp_path, [
        (1, t, 1, "purchase", 2.0, "{}"),
        (2, t, 2, "purchase", 4.0, "{}"),
        (3, t, 3, "view", 1.0, "{}"),
        (4, t, 4, "view", 3.0, "{}"),
    ])
    r = qs["q369_auc_delong"](spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_ppm) == (2, 2, 750_000)
    assert r.se_micro == 353_553
    assert (r.ci_lo_micro, r.ci_hi_micro) == (57_035, 1_442_965)


def test_q369_single_class_is_null(spark, tmp_path, qs):
    """No negatives -> AUC undefined -> every statistic NULL (the
    census still reports)."""
    from datetime import datetime

    t = datetime(2024, 3, 1, 12)
    _write_events(spark, tmp_path, [
        (1, t, 1, "purchase", 2.0, "{}"),
        (2, t, 2, "purchase", 4.0, "{}"),
    ])
    r = qs["q369_auc_delong"](spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 0)
    assert (r.auc_ppm, r.se_micro, r.ci_lo_micro, r.ci_hi_micro) == (
        None, None, None, None)


def test_q370_mixing_audit_matches_md5_order(spark, tmp_path, qs):
    """Sources A = {1, 2}, B = {3, 4}: the expected same-source
    adjacency count under a uniform permutation is
    sum n(n-1)/N = 4/4 = 1 -> expected_same_micro 1,000,000. The
    OBSERVED count is derived independently here by replaying the
    md5('epoch0:'||id) read order with hashlib and counting adjacent
    same-source pairs — a second implementation of the definition,
    not a copy of the plan."""
    import hashlib

    srcs = {1: "A", 2: "A", 3: "B", 4: "B"}
    order = sorted(srcs, key=lambda i: hashlib.md5(
        f"epoch0:{i}".encode()).hexdigest())
    m = sum(
        1 for a, b in zip(order, order[1:]) if srcs[a] == srcs[b]
    )
    _write_docs(spark, tmp_path, [
        (i, "t", "en", f"src{srcs[i]}", 2) for i in srcs
    ])
    r = qs["q370_shuffle_mixing_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_rows, r.n_adjacent_pairs) == (4, 3)
    assert r.expected_same_micro == 1_000_000
    assert r.n_same_source == m
    assert r.mixing_ratio_ppm == (m * 4 * 1_000_000) // 4


def test_q370_all_singleton_sources_is_null(spark, tmp_path, qs):
    """Every source a singleton -> the uniform expectation's
    denominator is 0 -> ratio NULL (expectation 0, counts still
    reported)."""
    _write_docs(spark, tmp_path, [
        (i, "t", "en", f"src{i}", 2) for i in range(1, 4)
    ])
    r = qs["q370_shuffle_mixing_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_rows, r.n_adjacent_pairs, r.n_same_source) == (3, 2, 0)
    assert (r.expected_same_micro, r.mixing_ratio_ppm) == (0, None)


def test_q371_anderson_darling_no_ties_hand_value(spark, tmp_path, qs):
    """src0 lengths {1,3}, src1 {2,4} (perfect interleave, no ties):
    per pooled value the midrank terms give contributions
    3/16 * {4/3, 4/11, 4/11, 4/3} = {0.25, 0.0681818, ...} summing to
    A2 = 7/11 = 0.6363636 -> 636,364 micro (derived by hand from
    Scholz-Stephens A2akN with B = {0.5,1.5,2.5,3.5})."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "src0", 1),
        (2, "t", "en", "src0", 3),
        (3, "t", "en", "src1", 2),
        (4, "t", "en", "src1", 4),
    ])
    r = qs["q371_anderson_darling"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.n_values_used) == (2, 2, 4)
    assert r.a2_micro == 636_364


def test_q371_tie_midranks_hand_value(spark, tmp_path, qs):
    """With ties — src0 {1,1}, src1 {1,2}: pooled groups l = {3,1},
    midranks B = {1.5, 3.5}, M1 = {1, 2}, M2 = {0.5, 1.5}, both
    D = 0.75; contributions 3/16 * {4, 4/3} = {0.75, 0.25} ->
    A2 = 1.0 exactly (the H0 expectation) -> 1,000,000 micro."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "src0", 1),
        (2, "t", "en", "src0", 1),
        (3, "t", "en", "src1", 1),
        (4, "t", "en", "src1", 2),
    ])
    r = qs["q371_anderson_darling"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.n_values_used) == (2, 2, 2)
    assert r.a2_micro == 1_000_000


def test_q371_degenerate_single_value_is_null(spark, tmp_path, qs):
    """Every doc the same length -> the only pooled group has
    D = B(N-B) - N*l/4 = 0 -> no usable group -> NULL statistic."""
    _write_docs(spark, tmp_path, [
        (1, "t", "en", "src0", 5),
        (2, "t", "en", "src0", 5),
        (3, "t", "en", "src1", 5),
    ])
    r = qs["q371_anderson_darling"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.n_values_used) == (2, 1, 0)
    assert r.a2_micro is None
