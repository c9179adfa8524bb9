"""Hand-computed worked-example pins for the round-8 statistics suite
(q340-q347). The DuckDB oracle replays the same formula as the Spark
plan, so these planted closed-form fixtures are the only INDEPENDENT
check available in this container (scipy absent, installs forbidden) —
every value below is derived by hand in the docstring."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from airflow_spotify_etl_spark.plans import all_queries
from airflow_spotify_etl_spark.sources.files import SCHEMAS


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )


def test_q340_hellinger_hand_value(spark, tmp_path, qs):
    """srcA lengths {1,2}, srcB {2,3} (one doc each): only v=2 is
    common; BC = sqrt(0.5*0.5) = 0.5 -> bc_pico 500000000000;
    H = sqrt(1-0.5) = 0.70710678 -> hellinger_micro 707107."""
    _write_docs(spark, tmp_path, [
        (1, "x", "en", "srcA", 1),
        (2, "xx", "en", "srcA", 2),
        (3, "yy", "en", "srcB", 2),
        (4, "yyy", "en", "srcB", 3),
    ])
    rows = qs["q340_hellinger_matrix"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_a, r.src_b, r.n_a, r.n_b, r.n_common_lengths) == (
        "srcA", "srcB", 2, 2, 1,
    )
    assert r.bc_pico == 500_000_000_000
    assert r.hellinger_micro == 707_107


def test_q340_identical_sources_zero_distance(spark, tmp_path, qs):
    """Identical distributions: BC = 1 exactly (every term
    sqrt(p*p) = p rounds exactly), Hellinger 0."""
    _write_docs(spark, tmp_path, [
        (1, "x" * 5, "en", "srcA", 5),
        (2, "x" * 7, "en", "srcA", 7),
        (3, "y" * 5, "en", "srcB", 5),
        (4, "y" * 7, "en", "srcB", 7),
    ])
    r = qs["q340_hellinger_matrix"](spark, str(tmp_path)).collect()[0]
    assert r.bc_pico == 1_000_000_000_000
    assert r.hellinger_micro == 0


def test_q341_dunn_hand_value(spark, tmp_path, qs):
    """Two groups, no ties: g0 values(ms) {1,2}, g1 {3,4} -> doubled
    ranks {2,4} vs {6,8}, R2 = (6, 14); a_num = 6*2-14*2 = -16, mean
    diff -2; vn = 4*5*3 = 60; var = 60*4/(12*3*4) = 5/3;
    z = -2/sqrt(5/3) = -1.5492."""
    _write_events(spark, tmp_path, [
        (1, datetime(2024, 3, 1), 0, "g0", 0.001, "{}"),
        (2, datetime(2024, 3, 1), 1, "g0", 0.002, "{}"),
        (3, datetime(2024, 3, 1), 2, "g1", 0.003, "{}"),
        (4, datetime(2024, 3, 1), 3, "g1", 0.004, "{}"),
    ])
    rows = qs["q341_dunn_posthoc"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.g_a, r.g_b, r.n_a, r.n_b) == ("g0", "g1", 2, 2)
    assert r.dunn_z == -1.5492


def test_q341_all_tied_is_null(spark, tmp_path, qs):
    """Every value identical -> tie correction removes all variance
    (vn = 0) -> z must be NULL, not a division error."""
    _write_events(spark, tmp_path, [
        (i, datetime(2024, 3, 1), i, ["g0", "g1"][i % 2], 0.005, "{}")
        for i in range(6)
    ])
    r = qs["q341_dunn_posthoc"](spark, str(tmp_path)).collect()[0]
    assert r.dunn_z is None


def test_q342_brown_forsythe_hand_value(spark, tmp_path, qs):
    """gA values(ms) {1,1,5,5}: m2 = 6, d = {4,4,4,4}; gB {1,3,3,5}:
    m2 = 6, d = {4,0,0,4}. S_A=16 Q_A=64, S_B=8 Q_B=32; A'=80, B'=72,
    SSB=8, SSW=16, W = ((8-2)/(2-1)) * 8/16 = 3.0."""
    vals_a = [0.001, 0.001, 0.005, 0.005]
    vals_b = [0.001, 0.003, 0.003, 0.005]
    rows = [
        (i + 1, datetime(2024, 3, 1), i, "gA", v, "{}")
        for i, v in enumerate(vals_a)
    ] + [
        (10 + i, datetime(2024, 3, 1), 10 + i, "gB", v, "{}")
        for i, v in enumerate(vals_b)
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q342_brown_forsythe"](spark, str(tmp_path)).collect()[0]
    assert (r.k, r.n) == (2, 8)
    assert r.w_micro == 3_000_000
    assert r.w_stat == 3.0


def test_q342_zero_within_variance_is_null(spark, tmp_path, qs):
    """All deviations within each group identical -> SSW = 0 -> W NULL
    (not inf/error): gA {1,1,5,5} (d all 4), gB {3,3} (d all 0)."""
    rows = [
        (1, datetime(2024, 3, 1), 0, "gA", 0.001, "{}"),
        (2, datetime(2024, 3, 1), 1, "gA", 0.001, "{}"),
        (3, datetime(2024, 3, 1), 2, "gA", 0.005, "{}"),
        (4, datetime(2024, 3, 1), 3, "gA", 0.005, "{}"),
        (5, datetime(2024, 3, 1), 4, "gB", 0.003, "{}"),
        (6, datetime(2024, 3, 1), 5, "gB", 0.003, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q342_brown_forsythe"](spark, str(tmp_path)).collect()[0]
    assert r.w_micro is None


def test_q343_cvm_hand_value(spark, tmp_path, qs):
    """src0 lengths {1,2}, src1 {2,3}: pooled cums give gap terms
    4+8+0 = 12; T = 12/(16*2*2/ (n m)... = 12/(N^2 n m / ...) —
    exactly S/(N^2 n m) = 12/(16*4) = 0.1875 -> t_micro 187500."""
    _write_docs(spark, tmp_path, [
        (1, "x", "en", "src0", 1),
        (2, "xx", "en", "src0", 2),
        (3, "yy", "en", "src1", 2),
        (4, "yyy", "en", "src1", 3),
    ])
    r = qs["q343_cramer_von_mises"](spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b, r.n_values) == (2, 2, 3)
    assert r.t_micro == 187_500
    assert r.t_stat == 0.1875


def test_q343_identical_distributions_zero(spark, tmp_path, qs):
    """Identical src0/src1 length distributions -> every ECDF gap is 0
    -> T exactly 0."""
    _write_docs(spark, tmp_path, [
        (1, "x", "en", "src0", 1),
        (2, "xxx", "en", "src0", 3),
        (3, "y", "en", "src1", 1),
        (4, "yyy", "en", "src1", 3),
    ])
    r = qs["q343_cramer_von_mises"](spark, str(tmp_path)).collect()[0]
    assert r.t_micro == 0


def test_q344_ljung_box_hand_value(spark, tmp_path, qs):
    """Daily counts {2,4,2,4} (4 contiguous days): d = {-4,4,-4,4},
    den = 64; r1 = -0.75, r2 = 0.5, r3 = -0.25 (lags 4..7 have no
    pairs); LB = 4*6*(0.5625/3 + 0.25/2 + 0.0625/1) = 9.0 ->
    lb_milli 9000."""
    rows, eid = [], 0
    for day, c in enumerate([2, 4, 2, 4]):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 8) + timedelta(days=day,
                                                          minutes=j),
                 eid, "click", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    r = qs["q344_ljung_box"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert r.den_s == "64"
    assert r.lb_milli == 9000


def test_q344_constant_series_is_null(spark, tmp_path, qs):
    """A constant daily series has zero variance -> every r_k is
    undefined -> LB must be NULL."""
    rows = [
        (i + 1, datetime(2024, 3, 1, 8) + timedelta(days=i), i,
         "click", 1.0, "{}")
        for i in range(5)
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q344_ljung_box"](spark, str(tmp_path)).collect()[0]
    assert r.lb_milli is None


def test_q345_yule_walker_hand_value(spark, tmp_path, qs):
    """Same {2,4,2,4} series: exact num1 = -48, num2 = 32, den = 64 ->
    r1_nano = -750000000, r2_nano = 500000000;
    phi1 = r1(1-r2)/(1-r1^2) = -0.375/0.4375 -> floor micro -857142
    (sign-split), phi2 = (r2-r1^2)/(1-r1^2) = -0.0625/0.4375 ->
    -142857."""
    rows, eid = [], 0
    for day, c in enumerate([2, 4, 2, 4]):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 8) + timedelta(days=day,
                                                          minutes=j),
                 eid, "click", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    r = qs["q345_yule_walker_ar2"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert r.r1_nano == -750_000_000
    assert r.r2_nano == 500_000_000
    assert r.phi1_micro == -857_142
    assert r.phi2_micro == -142_857


def test_q346_fleiss_hand_value(spark, tmp_path, qs):
    """Two docs, three raters (n_chars / token / distinct-token
    buckets): doc1 all-short (n_ij = (3,0,0), P_1 = 1); doc2 n_chars
    long but 10 short tokens (n_ij = (2,0,1), P_2 = 1/3). Pbar = 2/3,
    Pe = (5/6)^2+(1/6)^2 = 13/18, kappa = (2/3-13/18)/(5/18) = -0.2
    -> kappa_micro -200000. Ten distinct tokens of one char each."""
    toks = "a b c d e f g h i j"
    _write_docs(spark, tmp_path, [
        (1, toks, "en", "srcA", 100),
        (2, toks, "en", "srcA", 500),
    ])
    r = qs["q346_fleiss_kappa"](spark, str(tmp_path)).collect()[0]
    assert (r.n_docs, r.ss, r.c0, r.c1, r.c2) == (2, 14, 5, 0, 1)
    assert r.kappa_micro == -200_000


def test_q346_perfect_agreement_unanimous_null(spark, tmp_path, qs):
    """All raters always pick the same single category -> Pe = 1 ->
    kappa undefined -> NULL (the q308 degenerate discipline)."""
    toks = "a b c d e f g h i j"
    _write_docs(spark, tmp_path, [
        (1, toks, "en", "srcA", 100),
        (2, toks, "en", "srcA", 150),
    ])
    r = qs["q346_fleiss_kappa"](spark, str(tmp_path)).collect()[0]
    assert r.kappa_micro is None


def test_q347_page_perfect_trend_hand_value(spark, tmp_path, qs):
    """3 days x 3 alphabetical types with a strictly increasing volume
    trend each day -> per-day doubled ranks (2,4,6); S2 = (6,12,18);
    L2 = 6+24+54 = 84; E[L2] = 3*3*16/2 = 72; Var[L2] =
    3*9*4*8/36 = 24; z = 12/sqrt(24) = 2.4495 (the maximal L for
    k=3: perfect monotone agreement)."""
    rows, eid = [], 0
    for day in range(3):
        for t, c in (("ta", 1), ("tb", 2), ("tc", 3)):
            for j in range(c):
                eid += 1
                rows.append(
                    (eid, datetime(2024, 3, 1, 8)
                     + timedelta(days=day, minutes=j + ord(t[1])),
                     eid, t, 1.0, "{}")
                )
    _write_events(spark, tmp_path, rows)
    r = qs["q347_page_trend_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.k_types, r.l2, r.e2) == (3, 3, 84, 72)
    assert r.page_z == 2.4495


def test_q349_cochran_q_hand_value(spark, tmp_path, qs):
    """3 users in the last-7-day window: u1 purchases on days
    {d-6, d-5}, u2 on {d-6}, u3 on {d}. C = (2,1,0,0,0,0,1), T = 4,
    sum R^2 = 6; Q = (k-1)*Sum(kC-T)^2 / (k(kT-SumR^2))
    = 6*182/(7*22) = 7.0909 -> q_milli 7090 (floored)."""
    d0 = datetime(2024, 3, 10, 12)
    rows = [
        (1, d0 - timedelta(days=6), 1, "purchase", 10.0, "{}"),
        (2, d0 - timedelta(days=5), 1, "purchase", 10.0, "{}"),
        (3, d0 - timedelta(days=6), 2, "purchase", 10.0, "{}"),
        (4, d0, 3, "purchase", 10.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q349_cochran_q"](spark, str(tmp_path)).collect()[0]
    assert (r.k_days, r.n_blocks, r.t, r.sum_r2) == (7, 3, 4, 6)
    assert r.q_milli == 7090


def test_q349_degenerate_all_days_is_null(spark, tmp_path, qs):
    """One user purchasing on ALL 7 window days: kT = sum R^2 = 49 ->
    denominator 0 -> Q undefined -> NULL."""
    d0 = datetime(2024, 3, 10, 12)
    rows = [
        (i + 1, d0 - timedelta(days=i), 1, "purchase", 10.0, "{}")
        for i in range(7)
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q349_cochran_q"](spark, str(tmp_path)).collect()[0]
    assert r.q_milli is None


def test_q351_ordinal_association_hand_value(spark, tmp_path, qs):
    """2x2 grid: (h0,b0)x2, (h0,b1)x1, (h1,b0)x1, (h1,b1)x2 ->
    C = 2*2 = 4, D = 1*1 = 1, T_Y = 4; gamma = 3/5 = 0.6, Somers'
    d_yx = 3/9 = 0.333333."""
    b0, b1 = 0.05, 100.0  # value-ms buckets 0 and 1
    rows = [
        (1, datetime(2024, 3, 1, 0), 1, "click", b0, "{}"),
        (2, datetime(2024, 3, 1, 0), 2, "click", b0, "{}"),
        (3, datetime(2024, 3, 1, 0), 3, "click", b1, "{}"),
        (4, datetime(2024, 3, 1, 1), 4, "click", b0, "{}"),
        (5, datetime(2024, 3, 1, 1), 5, "click", b1, "{}"),
        (6, datetime(2024, 3, 1, 1), 6, "click", b1, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q351_ordinal_association"](spark, str(tmp_path)).collect()[0]
    assert (r.concordant, r.discordant, r.tied_y_only) == ("4", "1", "4")
    assert r.gamma_micro == 600_000
    assert r.somers_dyx_micro == 333_333


def test_q352_kendalls_w_perfect_concordance(spark, tmp_path, qs):
    """The q347 perfect-trend fixture (3 days, identical type ranking
    each day): A = 72, B = 24, W = A/(nB) = 1.0 exactly."""
    rows, eid = [], 0
    for day in range(3):
        for t, c in (("ta", 1), ("tb", 2), ("tc", 3)):
            for j in range(c):
                eid += 1
                rows.append(
                    (eid, datetime(2024, 3, 1, 8)
                     + timedelta(days=day, minutes=j),
                     eid, t, 1.0, "{}")
                )
    _write_events(spark, tmp_path, rows)
    r = qs["q352_kendalls_w"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.k_types) == (3, 3)
    assert r.w_micro == 1_000_000


def test_q352_all_tied_is_null(spark, tmp_path, qs):
    """Equal counts for every type on every day -> every block fully
    tied -> B = 0 -> W NULL."""
    rows, eid = [], 0
    for day in range(2):
        for t in ("ta", "tb"):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 8) + timedelta(days=day),
                 eid, t, 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    r = qs["q352_kendalls_w"](spark, str(tmp_path)).collect()[0]
    assert r.w_micro is None


def test_q353_turning_points_hand_value(spark, tmp_path, qs):
    """Series {2,4,2,4}: both interior points are strict extrema ->
    T = 2, n = 4; z = (2/3)/sqrt(35/90) = 1.069."""
    rows, eid = [], 0
    for day, c in enumerate([2, 4, 2, 4]):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 8) + timedelta(days=day,
                                                          minutes=j),
                 eid, "click", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    r = qs["q353_turning_point_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_turning_points) == (4, 2)
    assert r.z_turning == 1.069


def test_q354_cox_stuart_hand_value(spark, tmp_path, qs):
    """Strictly rising series {1,2,3,4}: pairs (1,3),(2,4) both up ->
    S+ = 2, m = 2, z = (4-2)/sqrt(2) = 1.4142."""
    rows, eid = [], 0
    for day, c in enumerate([1, 2, 3, 4]):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 8) + timedelta(days=day,
                                                          minutes=j),
                 eid, "click", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    r = qs["q354_cox_stuart_trend"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.s_plus, r.m) == (4, 2, 2)
    assert r.z_trend == 1.4142


def test_q354_constant_series_is_null(spark, tmp_path, qs):
    """Constant series: every pair tied -> m = 0 -> z NULL."""
    rows = [
        (i + 1, datetime(2024, 3, 1, 8) + timedelta(days=i), i,
         "click", 1.0, "{}")
        for i in range(4)
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q354_cox_stuart_trend"](spark, str(tmp_path)).collect()[0]
    assert r.z_trend is None
