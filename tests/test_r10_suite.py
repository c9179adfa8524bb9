"""Hand-computed worked-example pins for round-10 changes. Like the
r8b/r9 suites, every expected value is derived by hand in the
docstring — the DuckDB oracle replays the same formula as the Spark
plan, so planted closed-form fixtures are the only INDEPENDENT check
available in this container (scipy absent, installs forbidden)."""

from __future__ import annotations

import datetime

import pytest

from airflow_spotify_etl_spark.plans import all_queries
from airflow_spotify_etl_spark.sources.files import SCHEMAS


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )


def test_q362_null_ts_rows_excluded(spark, tmp_path, qs):
    """The r8b q362 6-event fixture plus a seventh row with NULL ts:
    the NULL-ts row must be EXCLUDED from the lateness profile (r9
    advice — before the fix it silently landed in '0_on_time'), so
    the tier table is byte-identical to the 6-row case: shares are
    n·10⁶ div 6, not div 7."""
    d = datetime.datetime
    rows = [
        (1, d(2024, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 3, 1, 9, 59, 59, 500000), 2, "view", 1.0, "{}"),
        (3, d(2024, 3, 1, 10, 0, 30), 3, "view", 1.0, "{}"),
        (4, d(2024, 3, 1, 9, 59, 45), 4, "view", 1.0, "{}"),
        (5, d(2024, 3, 1, 9, 0, 0), 5, "view", 1.0, "{}"),
        (6, d(2024, 3, 1, 9, 59, 0), 6, "view", 1.0, "{}"),
        (7, None, 7, "view", 1.0, "{}"),
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


def test_q378_null_ts_rows_excluded(spark, tmp_path, qs):
    """Same fixture: the watermark cost curve's n_events must be 6 at
    every candidate delay (the NULL-ts row can never be 'dropped' at
    any watermark, so counting it deflated every drop_ppm). Lateness
    values are 0/0.5s/0/45s/3630s/90s -> at delay 0 the 4 late rows
    drop (666_666 ppm of 6); at 1s the 3 over-1s rows; at 1m the
    3630s and 90s rows; at 10m and 1h only the 3630s row; the 1h
    bound itself drops it too (3630s > 3600s)."""
    d = datetime.datetime
    rows = [
        (1, d(2024, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 3, 1, 9, 59, 59, 500000), 2, "view", 1.0, "{}"),
        (3, d(2024, 3, 1, 10, 0, 30), 3, "view", 1.0, "{}"),
        (4, d(2024, 3, 1, 9, 59, 45), 4, "view", 1.0, "{}"),
        (5, d(2024, 3, 1, 9, 0, 0), 5, "view", 1.0, "{}"),
        (6, d(2024, 3, 1, 9, 59, 0), 6, "view", 1.0, "{}"),
        (7, None, 7, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q378_watermark_cost_curve"](spark, str(tmp_path)).collect()
    got = {r.delay_us: (r.n_events, r.n_dropped, r.drop_ppm) for r in out}
    assert got == {
        0: (6, 4, 666_666),
        1_000_000: (6, 3, 500_000),
        10_000_000: (6, 3, 500_000),
        60_000_000: (6, 2, 333_333),
        600_000_000: (6, 1, 166_666),
        3_600_000_000: (6, 1, 166_666),
    }


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )


_TS = datetime.datetime(2024, 3, 4, 12, 0, 0)  # Monday


def _ev(eid, user, value, ts=_TS, etype="view"):
    return (eid, ts, user, etype, float(value), "{}")


def test_q388_jarque_bera_hand_value(spark, tmp_path, qs):
    """Values 1..5 (milli 1000..5000): mean 3000; central moments
    m2 = (4+1+0+1+4)e6/5 = 2e6, m3 = 0 (symmetric), m4 =
    (16+1+0+1+16)e12/5 = 6.8e12. S = 0; K = 6.8/4 - 3 = -1.3;
    JB = 5/6 * (0 + 1.69/4) = 0.3520833... -> jb_micro 352083."""
    _write_events(spark, tmp_path, [_ev(i, i, v) for i, v in
                                    enumerate([1, 2, 3, 4, 5])])
    r = qs["q388_jarque_bera"](spark, str(tmp_path)).collect()[0]
    assert (r.n, r.skew_micro, r.exkurt_micro) == (5, 0, -1_300_000)
    assert r.jb_micro == 352_083


def test_q388_degenerate_zero_variance(spark, tmp_path, qs):
    """Two equal values: m2 = 0 -> all statistics NULL, n reported."""
    _write_events(spark, tmp_path, [_ev(1, 1, 2.0), _ev(2, 2, 2.0)])
    r = qs["q388_jarque_bera"](spark, str(tmp_path)).collect()[0]
    assert (r.n, r.skew_micro, r.exkurt_micro, r.jb_micro) == (
        2, None, None, None)


def test_q389_signed_rank_hand_value(spark, tmp_path, qs):
    """Five days, morning (09:00) vs evening (15:00) totals:
    (5,2) (1,4) (6,2) (2,2) (3,1) -> diffs +3000, -3000, +4000,
    0 (dropped), +2000. |d| groups ascending: 2000 (t=1, p=1,
    cum_less=0), 3000 (t=2, p=1, cum=1), 4000 (t=1, p=1, cum=3).
    W2 = 1*(0+1+1) + 1*(2+2+1) + 1*(6+1+1) = 15 (W+ = 7.5 — checks:
    average ranks 1, 2.5, 2.5, 4; positives 1+2.5+4 = 7.5).
    T = 6, M = 2*4*5*9 - 6 = 354;
    z = (15 - 10)*sqrt(12)/sqrt(354) = 0.9205746...."""
    import math

    d = datetime.datetime
    rows, eid = [], 0
    for day, (am, pm) in enumerate(
        [(5, 2), (1, 4), (6, 2), (2, 2), (3, 1)], start=1
    ):
        eid += 1
        rows.append(_ev(eid, eid, am, ts=d(2024, 3, day, 9, 0, 0)))
        eid += 1
        rows.append(_ev(eid, eid, pm, ts=d(2024, 3, day, 15, 0, 0)))
    _write_events(spark, tmp_path, rows)
    r = qs["q389_wilcoxon_signed_rank"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.w2) == (4, 15)
    assert r.z_micro == round(5 * math.sqrt(12) / math.sqrt(354) * 1e6)


def test_q389_all_zero_diffs(spark, tmp_path, qs):
    """Every day balanced -> zero qualifying days, NULL z."""
    d = datetime.datetime
    rows = [
        _ev(1, 1, 2, ts=d(2024, 3, 1, 9, 0)),
        _ev(2, 2, 2, ts=d(2024, 3, 1, 15, 0)),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q389_wilcoxon_signed_rank"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.z_micro) == (0, None)


def test_q390_bowker_hand_value(spark, tmp_path, qs):
    """User 1 type path a,b,a,b -> transitions a>b x2, b>a x1; user 2
    path a,a,c -> a>a dropped, a>c x1. Cells: (a,b) fwd 2 rev 1 ->
    term (2-1)^2*1e6 // 3 = 333333; (a,c) fwd 1 rev 0 -> 1000000.
    B_micro = 1333333, cells 2, transitions 4."""
    d = datetime.datetime
    rows = []
    for i, t in enumerate(["a", "b", "a", "b"]):
        rows.append((i + 1, d(2024, 3, 1, 8 + i), 1, t, 1.0, "{}"))
    for i, t in enumerate(["a", "a", "c"]):
        rows.append((10 + i, d(2024, 3, 1, 8 + i), 2, t, 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    r = qs["q390_bowker_symmetry"](spark, str(tmp_path)).collect()[0]
    assert (r.n_transitions, r.n_cells, r.bowker_b_micro) == (
        4, 2, 1_333_333)


def test_q391_cronbach_hand_value(spark, tmp_path, qs):
    """Items a/b, users 1/2: x = {u1: a=1000, b=2000; u2: a=4000,
    b=0 implicit}. N=2. Item a: ss - s^2/N = 1.7e7 - 2.5e7/2 =
    4.5e6; item b (u2's zero enters via N): 4e6 - 4e6/2 = 2e6;
    sum(var numerators) = 6.5e6. Totals 3000/4000: sst - st^2/N =
    2.5e7 - 4.9e7/2 = 5e5. alpha = 2*(1 - 6.5e6/5e5) = -24 (negative
    alpha is legal: items anticorrelate) -> -24000000."""
    rows = [
        _ev(1, 1, 1.0, etype="a"),
        _ev(2, 1, 2.0, etype="b"),
        _ev(3, 2, 4.0, etype="a"),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q391_cronbach_alpha"](spark, str(tmp_path)).collect()[0]
    assert (r.k_items, r.n_users, r.alpha_micro) == (2, 2, -24_000_000)


def test_q391_zero_total_variance(spark, tmp_path, qs):
    """Both users total 3000 -> var_total = 0 -> NULL alpha."""
    rows = [
        _ev(1, 1, 1.0, etype="a"),
        _ev(2, 1, 2.0, etype="b"),
        _ev(3, 2, 3.0, etype="a"),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q391_cronbach_alpha"](spark, str(tmp_path)).collect()[0]
    assert (r.k_items, r.n_users, r.alpha_micro) == (2, 2, None)


def test_q392_icc_hand_value(spark, tmp_path, qs):
    """u1 = [1,2,3] (n=3, s=6000, ss=1.4e7, s^2/n = 1.2e7); u2 = [5]
    (n=1, s=5000, ss=2.5e7, s^2/n = 2.5e7). a=2, N=4, SSW = 3.9e7 -
    3.7e7 = 2e6, SSB = 3.7e7 - 1.21e8/4 = 6.75e6; MSB = 6.75e6,
    MSW = 1e6; k0 = (4 - 10/4)/1 = 1.5; ICC = 5.75/7.25 =
    0.79310344... -> 793103."""
    rows = [_ev(1, 1, 1.0), _ev(2, 1, 2.0), _ev(3, 1, 3.0),
            _ev(4, 2, 5.0)]
    _write_events(spark, tmp_path, rows)
    r = qs["q392_icc_reliability"](spark, str(tmp_path)).collect()[0]
    assert (r.a_groups, r.n_total, r.k0_micro) == (2, 4, 1_500_000)
    assert r.icc_micro == 793_103


def test_q392_degenerate_single_group(spark, tmp_path, qs):
    """One user -> a < 2 -> NULLs."""
    rows = [_ev(1, 1, 1.0), _ev(2, 1, 2.0)]
    _write_events(spark, tmp_path, rows)
    r = qs["q392_icc_reliability"](spark, str(tmp_path)).collect()[0]
    assert (r.a_groups, r.n_total, r.k0_micro, r.icc_micro) == (
        1, 2, None, None)


def test_q393_kpss_hand_value(spark, tmp_path, qs):
    """Daily means 1000, 2000, 2000, 1000 (one event per day):
    n=4, S=6000, E = 4m - 6000 = [-2000, 2000, 2000, -2000],
    running sums [-2000, 0, 2000, 0]. num = 8e6, den0 = 1.6e7,
    kpss = 8e6/(4*1.6e7) = 0.125 -> 125000."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, v, ts=d(2024, 3, i + 1, 10, 0))
            for i, v in enumerate([1.0, 2.0, 2.0, 1.0])]
    _write_events(spark, tmp_path, rows)
    r = qs["q393_kpss_level"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.kpss_micro) == (4, 125_000)


def test_q393_constant_series_null(spark, tmp_path, qs):
    """Constant daily means -> E = 0 everywhere -> NULL statistic."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, 2.0, ts=d(2024, 3, i + 1, 10, 0))
            for i in range(3)]
    _write_events(spark, tmp_path, rows)
    r = qs["q393_kpss_level"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.kpss_micro) == (3, None)


def test_q394_arch_lm_hand_value(spark, tmp_path, qs):
    """Daily means alternate 1000/3000 over 5 days: E = 5m - 9000 =
    [-4000, 6000, -4000, 6000, -4000]; u = E^2 alternates 16e6/36e6.
    The 4 lag pairs alternate (16,36)/(36,16) exactly, so the
    regression of u_t on u_{t-1} is a perfect (negative) line:
    R^2 = 1 -> r2_micro 1000000, LM = 4*1 -> 4000000."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, v, ts=d(2024, 3, i + 1, 10, 0))
            for i, v in enumerate([1.0, 3.0, 1.0, 3.0, 1.0])]
    _write_events(spark, tmp_path, rows)
    r = qs["q394_arch_lm_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n1, r.r2_micro, r.arch_lm_micro) == (
        5, 4, 1_000_000, 4_000_000)


def test_q394_constant_null(spark, tmp_path, qs):
    """Constant daily means -> u constant 0 -> zero variance -> NULL."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, 2.0, ts=d(2024, 3, i + 1, 10, 0))
            for i in range(4)]
    _write_events(spark, tmp_path, rows)
    r = qs["q394_arch_lm_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.r2_micro, r.arch_lm_micro) == (3, None, None)


def test_q395_hodges_lehmann_hand_value(spark, tmp_path, qs):
    """Weekdays Mon 4 Mar (5.0), Tue 5 Mar (1.0), Wed 6 Mar (3.0);
    weekend Sat 9 Mar (2.0), Sun 10 Mar (3.0). Pairwise diffs
    (weekday - weekend): 3000, 2000, -1000, -2000, 1000, 0 ->
    sorted [-2000, -1000, 0, 1000, 2000, 3000], c=6, middles r=3,4 =
    0 and 1000 -> doubled median 1000."""
    d = datetime.datetime
    rows = [
        _ev(1, 1, 5.0, ts=d(2024, 3, 4, 10, 0)),
        _ev(2, 2, 1.0, ts=d(2024, 3, 5, 10, 0)),
        _ev(3, 3, 3.0, ts=d(2024, 3, 6, 10, 0)),
        _ev(4, 4, 2.0, ts=d(2024, 3, 9, 10, 0)),
        _ev(5, 5, 3.0, ts=d(2024, 3, 10, 10, 0)),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q395_hodges_lehmann_shift"](spark, str(tmp_path)).collect()[0]
    assert (r.n_weekday_days, r.n_weekend_days, r.n_pairs) == (3, 2, 6)
    assert r.hl_shift_x2_milli == 1000


def test_q395_no_weekend_null(spark, tmp_path, qs):
    """Only weekday days -> zero pairs -> NULL estimate."""
    d = datetime.datetime
    rows = [_ev(1, 1, 5.0, ts=d(2024, 3, 4, 10, 0))]
    _write_events(spark, tmp_path, rows)
    r = qs["q395_hodges_lehmann_shift"](spark, str(tmp_path)).collect()[0]
    assert (r.n_weekday_days, r.n_weekend_days, r.n_pairs,
            r.hl_shift_x2_milli) == (1, 0, 0, None)


def test_q396_identical_docs_zero_error(spark, tmp_path, qs):
    """Two IDENTICAL docs (and one unrelated): every signature slot
    matches, exact Jaccard = 1, so the only candidate pair reads
    err_ppm 0 / est_pos = true_pos at EVERY k — the sweep must report
    4 rows (k = 8, 16, 32, 64), each n_pairs=1, mean=max=0, fp=fn=0."""
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, same, "en", "s", len(same)),
        (2, same, "en", "s", len(same)),
        (3, "one two three four five six seven eight nine ten", "en",
         "s", 10),
    ]
    _write_docs(spark, tmp_path, rows)
    out = qs["q396_minhash_k_sweep"](spark, str(tmp_path)).collect()
    assert [r.k for r in out] == [8, 16, 32, 64]
    for r in out:
        assert (r.n_pairs, r.mean_err_ppm, r.max_err_ppm,
                r.n_false_pos, r.n_false_neg) == (1, 0, 0, 0, 0)


def test_q396_k64_row_equals_q328(spark, qs):
    """Cross-query consistency: the k=64 sweep row must reproduce the
    q328 audit exactly (same pairs, same full signature) on real
    sf0.001 data — the sweep generalizes the audit, it must not
    drift from it."""
    sf = "/root/testdata/sf0.001"
    sweep = {r.k: r for r in qs["q396_minhash_k_sweep"](spark, sf).collect()}
    audit = qs["q328_minhash_accuracy_audit"](spark, sf).collect()[0]
    r64 = sweep[64]
    assert r64.n_pairs == audit.n_pairs
    assert r64.mean_err_ppm == audit.mean_err_ppm
    assert r64.max_err_ppm == audit.max_err_ppm
    assert r64.n_false_pos == audit.n_false_pos
    assert r64.n_false_neg == audit.n_false_neg


def test_q397_overflow_hand_value(spark, tmp_path, qs):
    """Docs of 3, 5 and 100 whitespace tokens; corpus 108 tokens.
    L=64: one doc over (333333 ppm of 3), 36 tokens lost =
    36e6 // 108 = 333333 ppm. L >= 128: nothing over."""
    rows = [
        (1, "a b c", "en", "s", 5),
        (2, "a b c d e", "en", "s", 9),
        (3, " ".join(["w"] * 100), "en", "s", 199),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.max_len: r for r in
           qs["q397_context_overflow_curve"](spark, str(tmp_path)).collect()}
    assert sorted(out) == [64, 128, 256, 512, 1024]
    r = out[64]
    assert (r.n_docs, r.n_over, r.docs_over_ppm, r.tokens_lost,
            r.tokens_lost_ppm) == (3, 1, 333_333, 36, 333_333)
    for length in (128, 256, 512, 1024):
        r = out[length]
        assert (r.n_over, r.docs_over_ppm, r.tokens_lost,
                r.tokens_lost_ppm) == (0, 0, 0, 0)


def test_q398_granger_hand_value(spark, tmp_path, qs):
    """Daily (mean-milli y, count x): (1000,1), (2000,2), (1000,3),
    (3000,1), (1000,2) -> 4 lag pairs (y, a=y-1, b=x-1) = (2000,1000,1),
    (1000,2000,2), (3000,1000,3), (1000,3000,1). Centered moments:
    Cyy=Caa=2.75e6, Cbb=2.75, Cya=-2.25e6, Cyb=1750, Cab=-1250, det=6e6.
    RSS_r = 10e6/11, RSS_u = 2e6/3 -> F = (8/33)/(2/3) = 4/11 =
    0.363636 -> 363636; RSS ratio = 11/15 -> 733333."""
    d = datetime.datetime
    rows, eid = [], 0
    specs = [(1, [1.0]), (2, [2.0, 2.0]), (3, [1.0, 1.0, 1.0]),
             (4, [3.0]), (5, [1.0, 1.0])]
    for day, vals in specs:
        for v in vals:
            eid += 1
            rows.append(_ev(eid, eid, v, ts=d(2024, 3, day, 10, 0)))
    _write_events(spark, tmp_path, rows)
    r = qs["q398_granger_lag1"](spark, str(tmp_path)).collect()[0]
    assert (r.n_pairs, r.rss_ratio_micro, r.granger_f_micro) == (
        4, 733_333, 363_636)


def test_q398_degenerate_constant(spark, tmp_path, qs):
    """Constant y and x -> zero centered variance -> NULL F."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, 2.0, ts=d(2024, 3, i + 1, 10, 0))
            for i in range(5)]
    _write_events(spark, tmp_path, rows)
    r = qs["q398_granger_lag1"](spark, str(tmp_path)).collect()[0]
    assert (r.n_pairs, r.granger_f_micro) == (4, None)


def test_q399_seasonal_mk_hand_value(spark, tmp_path, qs):
    """Mondays 4/11/18 Mar at 1000/3000/5000 (S_Mon = 3 rising pairs,
    var 3*2*11 = 66), Tuesdays 5/12 Mar both 2000 (S_Tue = 0; the tie
    term 2*1*9 cancels the 2*1*9 variance -> 0). S = 3, Var = 66/18;
    z = (3-1)/sqrt(66/18)."""
    import math

    d = datetime.datetime
    rows = [
        _ev(1, 1, 1.0, ts=d(2024, 3, 4, 10, 0)),
        _ev(2, 2, 3.0, ts=d(2024, 3, 11, 10, 0)),
        _ev(3, 3, 5.0, ts=d(2024, 3, 18, 10, 0)),
        _ev(4, 4, 2.0, ts=d(2024, 3, 5, 10, 0)),
        _ev(5, 5, 2.0, ts=d(2024, 3, 12, 10, 0)),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q399_seasonal_mann_kendall"](spark, str(tmp_path)).collect()[0]
    assert (r.s_total, r.n_strata) == (3, 2)
    assert r.z_micro == round(2 / math.sqrt(66 / 18) * 1e6)


def test_q399_no_pairs_null(spark, tmp_path, qs):
    """One day per weekday stratum -> no within-stratum pairs,
    variance 0 -> NULL z."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, float(i + 1), ts=d(2024, 3, 4 + i, 10, 0))
            for i in range(3)]
    _write_events(spark, tmp_path, rows)
    r = qs["q399_seasonal_mann_kendall"](spark, str(tmp_path)).collect()[0]
    assert (r.s_total, r.z_micro) == (0, None)


def test_q400_dup_rate_hand_value(spark, tmp_path, qs):
    """Docs: two copies of an 11-char text (bucket ceil(log2 11) = 4),
    one 3-char unique (bucket 2), one 100-char unique (bucket 7).
    Bucket 4: 2 docs, both dup, ppm 1e6, droppable = 2 - 1 group = 1;
    buckets 2 and 7: clean."""
    rows = [
        (1, "hello world", "en", "s", 11),
        (2, "hello world", "en", "s", 11),
        (3, "xyz", "en", "s", 3),
        (4, "a" * 100, "en", "s", 100),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.len_bucket_log2: r for r in
           qs["q400_dup_rate_by_length"](spark, str(tmp_path)).collect()}
    assert sorted(out) == [2, 4, 7]
    r = out[4]
    assert (r.n_docs, r.n_dup_docs, r.dup_ppm, r.n_droppable) == (
        2, 2, 1_000_000, 1)
    for b in (2, 7):
        r = out[b]
        assert (r.n_docs, r.n_dup_docs, r.dup_ppm, r.n_droppable) == (
            1, 0, 0, 0)


def test_q401_quade_hand_value(spark, tmp_path, qs):
    """Two days, three types. Day 1: a=1, b=2, c=3 (ranks 1/2/3, range
    2000); day 2: a=5, b=5, c=1 (ranks 2.5/2.5/1 -> r2 5/5/2, range
    4000). Block weights q2 = 2/4. S4 = q2*(r2-4): day1 -4/0/4, day2
    4/4/-8. S4_j = 0/4/-4 -> B-sum 32; A-sum 128.
    F = (b-1)*32/(b*128 - 32) = 32/224 = 1/7 -> 142857."""
    d = datetime.datetime
    rows = [
        _ev(1, 1, 1.0, ts=d(2024, 3, 1, 9, 0), etype="a"),
        _ev(2, 2, 2.0, ts=d(2024, 3, 1, 10, 0), etype="b"),
        _ev(3, 3, 3.0, ts=d(2024, 3, 1, 11, 0), etype="c"),
        _ev(4, 4, 5.0, ts=d(2024, 3, 2, 9, 0), etype="a"),
        _ev(5, 5, 5.0, ts=d(2024, 3, 2, 10, 0), etype="b"),
        _ev(6, 6, 1.0, ts=d(2024, 3, 2, 11, 0), etype="c"),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q401_quade_test"](spark, str(tmp_path)).collect()[0]
    assert (r.b_days, r.k_types) == (2, 3)
    assert r.quade_f_micro == 142_857


def test_q401_degenerate_identical_blocks(spark, tmp_path, qs):
    """Every block ranks the types identically and ranges tie -> all
    the discrimination is between treatments: b*A = ... A = B exactly
    -> NULL F (division by zero guarded)."""
    d = datetime.datetime
    rows = []
    for day in (1, 2):
        rows.append(_ev(day * 10 + 1, 1, 1.0,
                        ts=d(2024, 3, day, 9, 0), etype="a"))
        rows.append(_ev(day * 10 + 2, 2, 2.0,
                        ts=d(2024, 3, day, 10, 0), etype="b"))
    _write_events(spark, tmp_path, rows)
    r = qs["q401_quade_test"](spark, str(tmp_path)).collect()[0]
    assert (r.b_days, r.k_types, r.quade_f_micro) == (2, 2, None)


def test_q402_siegel_hand_value(spark, tmp_path, qs):
    """Daily means 1000/3000/2000 on days 1/2/3. Per-day slope
    medians: d1 pairs {2000, 500} -> 1250; d2 {2000, -1000} -> 500;
    d3 {500, -1000} -> -250. Median of {-250, 500, 1250} = 500
    milli/day -> 500e6 micro."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, v, ts=d(2024, 3, i + 1, 10, 0))
            for i, v in enumerate([1.0, 3.0, 2.0])]
    _write_events(spark, tmp_path, rows)
    r = qs["q402_siegel_slopes"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.slope_micro_per_day) == (3, 500_000_000)


def test_q402_single_day_null(spark, tmp_path, qs):
    d = datetime.datetime
    _write_events(spark, tmp_path, [_ev(1, 1, 1.0, ts=d(2024, 3, 1))])
    r = qs["q402_siegel_slopes"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.slope_micro_per_day) == (1, None)


def test_q403_breusch_pagan_hand_value(spark, tmp_path, qs):
    """Daily means 1000/1000/1000/5000 on t=1..4. OLS by hand:
    b = (4*26000 - 10*8000)/(4*30 - 100) = 1200, a = -1000; fitted
    200/1400/2600/3800 -> residuals 800/-400/-1600/1200 (sum 0 and
    orthogonal to t, OLS checks). u = e^2 milli-quantized exactly;
    the expected R2/LM are recomputed below from those four
    hand-derived residuals only."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, v, ts=d(2024, 3, i + 1, 10, 0))
            for i, v in enumerate([1.0, 1.0, 1.0, 5.0])]
    _write_events(spark, tmp_path, rows)
    e = [800, -400, -1600, 1200]
    u = [x * x * 10**3 for x in e]
    t = [1, 2, 3, 4]
    n, su, st = 4, sum(u), sum(t)
    sut = sum(a * b for a, b in zip(u, t))
    suu = sum(a * a for a in u)
    stt = sum(a * a for a in t)
    r2 = (n * sut - su * st) ** 2 / ((n * suu - su * su) * (n * stt - st * st))
    r = qs["q403_breusch_pagan"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert r.r2_micro == round(r2 * 1e6)
    assert r.bp_lm_micro == round(4 * r2 * 1e6)


def test_q403_perfect_line_null(spark, tmp_path, qs):
    """Perfectly linear daily means -> all residuals 0 -> u has zero
    variance -> NULL statistics."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, float(i + 1), ts=d(2024, 3, i + 1, 10, 0))
            for i in range(4)]
    _write_events(spark, tmp_path, rows)
    r = qs["q403_breusch_pagan"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.r2_micro, r.bp_lm_micro) == (4, None, None)


def test_q404_pacf_hand_value(spark, tmp_path, qs):
    """Daily means 1000/2000/1000/2000: E = 4m - 6000 = [-2000, 2000,
    -2000, 2000]; c0 = 1.6e7, c1 = -1.2e7, c2 = 8e6 -> r1 = -0.75,
    r2 = 0.5; phi22 = (0.5 - 0.5625)/(1 - 0.5625) = -1/7."""
    d = datetime.datetime
    rows = [_ev(i + 1, i, v, ts=d(2024, 3, i + 1, 10, 0))
            for i, v in enumerate([1.0, 2.0, 1.0, 2.0])]
    _write_events(spark, tmp_path, rows)
    r = qs["q404_pacf_lag2"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.pacf1_micro) == (4, -750_000)
    assert r.pacf2_micro == round(-1 / 7 * 1e6)


def test_q404_constant_null(spark, tmp_path, qs):
    d = datetime.datetime
    rows = [_ev(i + 1, i, 2.0, ts=d(2024, 3, i + 1, 10, 0))
            for i in range(4)]
    _write_events(spark, tmp_path, rows)
    r = qs["q404_pacf_lag2"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.pacf1_micro, r.pacf2_micro) == (4, None, None)
