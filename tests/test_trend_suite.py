"""Planted-fixture tests for the round-6 trend/rank suite
(q299 Kendall tau-b, q300 Theil-Sen, q301 Mann-Kendall,
q302 HyperLogLog, q303 RBO, q304 BH-FDR).

Fixtures use noon timestamps so session-timezone shifts can never move
an event across a date boundary (the q298 lesson).
"""

from __future__ import annotations

import hashlib
import math
from datetime import datetime

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def _write_events(spark, tmp_path, day_user_counts):
    """day_user_counts: list of (day_offset, [user ids, one per event])."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = []
    eid = 0
    for off, users in day_user_counts:
        for u in users:
            rows.append(
                (eid, datetime(2024, 3, 1 + off, 12, 0, 0), u, "t", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )


def test_q299_kendall_tau_hand_value(spark, tmp_path, qs):
    # daily (events, users): (2,1), (4,2), (4,1), (6,3)
    # C=4, D=0, Tx=1, Ty=1, N0=6 → tau_b = 4/sqrt(5·5) = 0.8
    _write_events(
        spark,
        tmp_path,
        [
            (0, [1, 1]),
            (1, [1, 1, 2, 2]),
            (2, [1, 1, 1, 1]),
            (3, [1, 1, 2, 2, 3, 3]),
        ],
    )
    r = qs["q299_kendall_tau"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert (r.concordant, r.discordant) == (4, 0)
    assert (r.ties_x, r.ties_y) == (1, 1)
    assert r.tau_b == 0.8


def test_q300_theil_sen_exact_linear(spark, tmp_path, qs):
    # y = 10 + 2t on 5 consecutive days → every pairwise slope is 2
    _write_events(
        spark,
        tmp_path,
        [(t, list(range(10 + 2 * t))) for t in range(5)],
    )
    r = qs["q300_theil_sen"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_pairs) == (5, 10)
    assert r.median_slope_nano == 2_000_000_000
    assert r.slope_per_day == 2.0


def test_q301_mann_kendall_increasing(spark, tmp_path, qs):
    # strictly increasing 5-day series: S = 10, var18 = 5·4·15 = 300,
    # z = 9/sqrt(300/18) = 2.2045 > 1.96 → 'increasing'
    _write_events(
        spark,
        tmp_path,
        [(t, list(range(10 + 2 * t))) for t in range(5)],
    )
    r = qs["q301_mann_kendall"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.s_stat, r.var18) == (5, 10, 300)
    assert r.trend == "increasing" and r.z_mk == pytest.approx(2.2045, 1e-3)


def _write_docs(spark, tmp_path, rows):
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    spark.createDataFrame(rows, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )


def test_q302_hll_matches_hashlib_mirror(spark, tmp_path, qs):
    toks = [f"tok{i}" for i in range(500)]
    text = " ".join(toks)
    _write_docs(spark, tmp_path, [(1, text, "en", "srcA", len(text))])
    r = qs["q302_hyperloglog_vocab"](spark, str(tmp_path)).collect()[0]
    # python mirror of the register construction
    regs: dict[int, int] = {}
    for t in set(toks):
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        j, w = h >> 24, h & 0xFFFFFF
        rho = 25 if w == 0 else 24 - int(math.floor(math.log2(w)))
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (25 - m) for m in regs.values()) + (256 - len(regs)) * (
        1 << 25
    )
    assert r.n_exact == 500
    assert r.reg_sum_s == s
    assert r.v_zero == 256 - len(regs)
    # a 256-register HLL is ~6.5% accurate; 40% is a generous sanity bound
    assert abs(r.hll_estimate - 500) / 500 < 0.4


def test_q303_rbo_identical_rankings(spark, tmp_path, qs):
    # identical token distributions in both sources → X_d = d and
    # RBO_min = 1 − p^20 (minus nano-floor dust)
    words = " ".join(f"w{i:02d} " * (40 - i) for i in range(30))
    _write_docs(
        spark,
        tmp_path,
        [
            (1, words, "en", "src0", len(words)),
            (2, words, "en", "src1", len(words)),
        ],
    )
    r = qs["q303_rank_biased_overlap"](spark, str(tmp_path)).collect()[0]
    assert r.overlap_at_20 == 20
    expected = 1 - 0.9**20
    assert abs(r.rbo_min - expected) < 1e-6


def test_q304_bh_mechanics_and_step_up(spark, tmp_path, qs):
    _write_events(
        spark,
        tmp_path,
        [(t, [u for u in range(20) for _ in range(1 + (u + t) % 3)])
         for t in range(3)],
    )
    rows = qs["q304_bh_fdr_control"](spark, str(tmp_path)).collect()
    assert len(rows) == 20
    assert sorted(r.rank for r in rows) == list(range(1, 21))
    # p_nano ordered with rank, within [0, 1e9]
    by_rank = sorted(rows, key=lambda r: r.rank)
    ps = [r.p_nano for r in by_rank]
    assert ps == sorted(ps) and 0 <= ps[0] and ps[-1] <= 10**9
    # step-up: rejected == (rank <= max passing rank)
    passing = [r.rank for r in rows if r.bh_pass]
    kmax = max(passing) if passing else 0
    for r in rows:
        assert r.rejected == (r.rank <= kmax)


def test_q305_chao1_hand_spectrum(spark, tmp_path, qs):
    # spectrum: 3 singletons, 2 doubletons, 1 tripleton →
    # V=6, N=3+4+3=10, chao1 = 6 + 3·2/(2·3) = 7.0, coverage = 1-3/10
    text = "s1 s2 s3 d1 d1 d2 d2 t1 t1 t1"
    _write_docs(spark, tmp_path, [(1, text, "en", "srcA", len(text))])
    r = qs["q305_chao1_vocab_richness"](spark, str(tmp_path)).collect()[0]
    assert (r.v_obs, r.n_tokens, r.n1, r.n2) == (6, 10, 3, 2)
    assert r.chao1_milli == 7000
    assert r.coverage_ppm == 700000


def test_q306_gini_hand_values(spark, tmp_path, qs):
    # user spends (cents): 100, 100, 200, 400 → T = ΣΣ|xi-xj| =
    # 2·(|100-100|+|100-200|·2+|100-400|·2+|200-400|) = 2·(0+200+600+200)
    # = 2000; gini = 2000/(2·4·800) = 0.3125; MD = 2000/12 = 166.667
    from datetime import datetime

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = [
        (0, datetime(2024, 3, 1, 12), 1, "t", 1.00, "{}"),
        (1, datetime(2024, 3, 1, 12), 2, "t", 1.00, "{}"),
        (2, datetime(2024, 3, 1, 12), 3, "t", 2.00, "{}"),
        (3, datetime(2024, 3, 1, 12), 4, "t", 4.00, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q306_gini_concentration"](spark, str(tmp_path)).collect()[0]
    assert r.n_users == 4
    assert r.total_cents == "800"
    assert r.gini_ppm == 312500
    assert r.mad_cents_milli == 166666  # floor(2000·1000/12)
    assert r.gini == 0.3125


def test_q307_spearman_hand_value(spark, tmp_path, qs):
    # same fixture as q299: doubled midranks x→(2,5,5,8), y→(3,6,3,8)
    # rho = (4·115 − 20·20)/sqrt((4·118−400)²) = 60/72 = 0.833333
    _write_events(
        spark,
        tmp_path,
        [
            (0, [1, 1]),
            (1, [1, 1, 2, 2]),
            (2, [1, 1, 1, 1]),
            (3, [1, 1, 2, 2, 3, 3]),
        ],
    )
    r = qs["q307_spearman_rho"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert r.sxy == 115
    assert r.spearman_rho == 0.833333


def test_q308_kappa_mechanics(spark, tmp_path, qs):
    texts = [
        (i, f"doc {i} " + "filler words here " * (3 + i % 5), "en",
         f"src{i % 2}", 60)
        for i in range(30)
    ]
    _write_docs(spark, tmp_path, texts)
    r = qs["q308_cohens_kappa"](spark, str(tmp_path)).collect()[0]
    assert r.n == r.n11 + r.n10 + r.n01 + r.n00 == 30
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000
    assert r.po_ppm == ((r.n11 + r.n00) * 1_000_000) // 30


def test_q309_ks_known_shift(spark, tmp_path, qs):
    # src0 lengths {10,20}, src1 {10,30}: D peaks at v=20 with
    # |2·2 − 1·2| = 2 → D = 0.5 → 500000 ppm
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a", "en", "src0", 10),
            (2, "b", "en", "src0", 20),
            (3, "c", "en", "src1", 10),
            (4, "d", "en", "src1", 30),
        ],
    )
    r = qs["q309_ks_two_sample"](spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.d_num, r.d_ppm) == (2, 2, "2", 500000)


def test_q310_hand_spectrum(spark, tmp_path, qs):
    # "a a b": V=2, N=3, n1=1, Σc²=5 → K = (5−3)·1e7//9 = 2222222,
    # Simpson = 2e6//6 = 333333, hapax = 1e6//2, TTR = 2e6//3
    _write_docs(spark, tmp_path, [(1, "a a b", "en", "srcA", 5)])
    r = qs["q310_lexical_concentration"](spark, str(tmp_path)).collect()[0]
    assert (r.v_obs, r.n_tokens, r.n1, r.sum_c2) == (2, 3, 1, "5")
    assert r.yule_k_milli == 2222222
    assert r.simpson_ppm == 333333
    assert (r.hapax_ppm, r.ttr_ppm) == (500000, 666666)


def test_q311_trim_and_winsorize_hand(spark, tmp_path, qs):
    # cents 1..19 plus 1000: k=1, trim drops {1, 1000}, winsorize
    # clips them to the rank-2/rank-19 values (2 and 19)
    from datetime import datetime

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    cents = list(range(1, 20)) + [1000]
    rows = [
        (i, datetime(2024, 3, 1, 12), i, "t", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q311_robust_means"](spark, str(tmp_path)).collect()[0]
    assert (r.n, r.k, r.v_lo, r.v_hi) == (20, 1, 2, 19)
    assert r.mean_milli_cents == 59500
    assert r.trimmed_milli_cents == 10500
    assert r.winsorized_milli_cents == 10500
    assert r.trimmed_mean == 0.105


def test_q312_cramers_v_extremes(spark, tmp_path, qs):
    # perfect dependence (diagonal 2x2) → V = 1
    dep = [
        (1, "a", "en", "src0", 1), (2, "b", "en", "src0", 1),
        (3, "c", "fr", "src1", 1), (4, "d", "fr", "src1", 1),
    ]
    _write_docs(spark, tmp_path, dep)
    r = qs["q312_categorical_effect_size"](spark, str(tmp_path)).collect()[0]
    assert (r.n, r.dof) == (4, 1)
    assert r.chi2_milli == 4000  # chi2 = n for a perfect 2x2
    assert r.cramers_v == 1.0 and r.contingency_c < 1.0


def test_q312_independence_is_zero(spark, tmp_path, qs):
    ind = [
        (1, "a", "en", "src0", 1), (2, "b", "en", "src1", 1),
        (3, "c", "fr", "src0", 1), (4, "d", "fr", "src1", 1),
    ]
    _write_docs(spark, tmp_path, ind)
    r = qs["q312_categorical_effect_size"](spark, str(tmp_path)).collect()[0]
    assert r.chi2_milli == 0 and r.cramers_v == 0.0


def test_q313_g_test_extremes(spark, tmp_path, qs):
    # perfect 2x2 dependence: G = 2·Σ o·ln(o·n/(r·c)) = 2·4·ln2 ≈ 5.545
    dep = [
        (1, "a", "en", "src0", 1), (2, "b", "en", "src0", 1),
        (3, "c", "fr", "src1", 1), (4, "d", "fr", "src1", 1),
    ]
    _write_docs(spark, tmp_path, dep)
    r = qs["q313_g_test"](spark, str(tmp_path)).collect()[0]
    import math

    assert r.dof == 1
    assert abs(r.g_stat - 8 * math.log(2)) < 1e-3
    assert abs(r.mutual_info_nats - math.log(2)) < 1e-5


def test_q314_truncation_changes_ranking(spark, tmp_path, qs):
    """One engineered decoy whose first 32 dims mimic the query but
    whose tail is huge orthogonal noise: the truncated tier ranks it
    first while the full scan ranks it last → recall@5 = 80%."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    def vec(head, tail):
        return [float(x) for x in (head + tail)]

    e1_head = [1.0] + [0.0] * 31
    rows = [(0, vec(e1_head, [0.0] * 32), 0)]  # the query (vec_id < 5)
    # five honest neighbors: aligned with the query in head AND tail
    for i in range(5):
        rows.append((5 + i, vec([1.0, 0.01 * i] + [0.0] * 30,
                                [0.0] * 32), 0))
    # the decoy: identical head, massive orthogonal tail
    rows.append((20, vec(e1_head, [50.0] * 32), 0))
    spark.createDataFrame(rows, SCHEMAS["embeddings"]).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.query_id: r for r in
           qs["q314_mrl_truncation_recall"](spark, str(tmp_path)).collect()}
    r = out[0]
    assert "20" in r.trunc32_top5.split(",")  # decoy wins the truncated tier
    assert r.n_overlap_at_5 == 4 and r.recall_pct == 80


def test_q315_hubness_planted_hub(spark, tmp_path, qs):
    """One central vector every other vector points at: its in-degree
    is n−1 while the periphery's stays small — max_deg pins the hub.
    All planted vec_ids are chosen to SURVIVE the query's md5 %8
    sampling filter (hashlib-verified: 1,5,6,8,21,26,30,33,39,59,61,
    77)."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    ids = [1, 5, 6, 8, 21, 26, 30, 33, 39, 59, 61, 77]
    rows = [(ids[0], [1.0] + [0.0] * 63, 0)]  # the hub
    # periphery: hub direction plus small unique orthogonal components
    for j, vid in enumerate(ids[1:], start=1):
        v = [1.0] + [0.0] * 63
        v[j] = 0.4
        rows.append((vid, [float(x) for x in v], 0))
    spark.createDataFrame(rows, SCHEMAS["embeddings"]).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    r = qs["q315_hubness_audit"](spark, str(tmp_path)).collect()[0]
    assert r.n == 12
    assert r.max_deg == 11  # every periphery vector's top-5 has the hub
    # the engineered hub must be flagged; the near-tied periphery may
    # add more (id tiebreaks concentrate in-links on low ids)
    assert r.n_hubs >= 1
    # mean degree is exactly k (every vector emits 5 edges)
    assert r.mean_deg == 5.0


def test_q316_mase_hand_series(spark, tmp_path, qs):
    """14 days alternating weekday pattern then a repeat: the seasonal
    lag-7 forecast is PERFECT (sae7=0) while naive-1 errs every day."""
    week = [10, 20, 10, 20, 10, 20, 10]
    _write_events(
        spark,
        tmp_path,
        [(t, list(range(c))) for t, c in enumerate(week + week)],
    )
    r = qs["q316_seasonal_backtest"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_scored) == (14, 7)
    assert r.sae7 == 0 and r.mae_seasonal == 0.0
    # scored days 7..13: the first (10 after 10) has e1=0, the other
    # six alternate by 10 → Σ|e1| = 60
    assert r.sae1 == 60
    assert r.mase_ppm == 0


def test_q308_kappa_degenerate_constant_labelers_is_null(spark, tmp_path, qs):
    """When BOTH labelers are constant, pe = 1 and the exact-integer
    denominator n^2 - (a1b1 + a0b0) is 0: kappa is undefined and
    kappa_ppm must be an EXPLICIT NULL (ADVICE r6 — the q304-style
    guard), never a divide-by-zero error. Identical short texts make
    both labelers REJECT every doc (si('lorem')=439 < 5000; gopher
    drops 1-word docs), concentrating the table in n00."""
    _write_docs(
        spark,
        tmp_path,
        [(i, "lorem", "en", "src0", 1) for i in range(6)],
    )
    r = qs["q308_cohens_kappa"](spark, str(tmp_path)).collect()[0]
    assert r.n == 6
    # one constant cell per labeler: the table is concentrated in a
    # single row AND a single column
    assert {r.n11, r.n10, r.n01, r.n00} <= {0, 6}
    assert r.kappa_ppm is None
    assert r.po_ppm == 1_000_000


def test_q319_tvd_hand_value(spark, tmp_path, qs):
    """Planted two-source fixture with hand-computed TVD: src A lengths
    {5:2, 7:2}, src B {5:1, 9:3} -> sum|p1-p2| = .25+.5+.75 = 1.5,
    TVD = 0.75 = 750000 ppm — exercising the inner-join-plus-totals
    identity (value 7 exists only in A, 9 only in B, 5 in both)."""
    docs = [
        (1, "abcde", "en", "srcA", 5),
        (2, "fghij", "en", "srcA", 5),
        (3, "abcdefg", "en", "srcA", 7),
        (4, "hijklmn", "en", "srcA", 7),
        (5, "klmno", "en", "srcB", 5),
        (6, "abcdefghi", "en", "srcB", 9),
        (7, "bcdefghij", "en", "srcB", 9),
        (8, "cdefghijk", "en", "srcB", 9),
    ]
    _write_docs(spark, tmp_path, docs)
    rows = qs["q319_source_tvd_matrix"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_a, r.src_b, r.n_a, r.n_b, r.n_common_lengths) == (
        "srcA", "srcB", 4, 4, 1,
    )
    assert r.tvd_ppm == 750_000


def test_q321_logrank_hand_value(spark, tmp_path, qs):
    """4 subjects, hand-computed log-rank: g0 = {dur 1 event, dur 4
    censored}, g1 = {dur 2 event, dur 4 event}. Terms: t=1 e1=.5
    v=.25; t=2 e1=1/3 v=2/9; t=4 e1=.5 v=.25 -> O1=1,
    E1_nano=1333333333, V_nano=722222222,
    z = -.333.../sqrt(.72222...) = -0.3922."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = [
        (1, datetime(2024, 3, 1, 12), 0, "click", 1.0, "{}"),
        (2, datetime(2024, 3, 2, 12), 0, "purchase", 1.0, "{}"),
        (3, datetime(2024, 3, 1, 12), 1, "click", 1.0, "{}"),
        (4, datetime(2024, 3, 3, 12), 1, "purchase", 1.0, "{}"),
        (5, datetime(2024, 3, 1, 12), 2, "click", 1.0, "{}"),
        (6, datetime(2024, 3, 1, 12), 3, "click", 1.0, "{}"),
        (7, datetime(2024, 3, 5, 12), 3, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q321_logrank_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n1_subjects, r.n2_subjects, r.o1, r.o2) == (2, 2, 1, 2)
    assert r.e1_nano == 1_333_333_333
    assert r.v_nano == 722_222_222
    assert r.logrank_z == -0.3922


def test_q321_logrank_zero_variance_is_null(spark, tmp_path, qs):
    """Degenerate guard (r8): when every event time has exactly one
    subject at risk, each hypergeometric variance term is 0 (the
    n1+n2>1 guard) so sum(v_nano)=0 — z must be NULL, not NaN/Inf.
    Fixture: g0 subject clicks day 0, purchases day 5 (dur 5, event);
    g1 subject clicks day 3, never purchases (censored at dur 2) —
    the only event time (t=5) has risk set {g0} alone."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = [
        (1, datetime(2024, 3, 1, 12), 0, "click", 1.0, "{}"),
        (2, datetime(2024, 3, 6, 12), 0, "purchase", 1.0, "{}"),
        (3, datetime(2024, 3, 4, 12), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q321_logrank_test"](spark, str(tmp_path)).collect()[0]
    assert (r.o1, r.o2, r.v_nano) == (1, 0, 0)
    assert r.logrank_z is None


def test_q333_planner_zero_converters_is_null(spark, tmp_path, qs):
    """Degenerate guard (r8): zero high-value converters -> p_ppm = 0
    -> the (p2-p1)^2 denominator is 0; n_per_arm and days_needed must
    be NULL, not an engine-divergent NaN cast."""
    from datetime import datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = [
        (u + 1, datetime(2024, 3, 1, 12) + timedelta(days=u % 10),
         u, "purchase", 50.0, "{}")
        for u in range(100)
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q333_ab_duration_planner"](spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.n_converters, r.p_ppm) == (100, 0, 0)
    assert r.n_per_arm is None
    assert r.days_needed is None


def test_q322_friedman_hand_value(spark, tmp_path, qs):
    """3 blocks x 3 treatments, no ties. Ranks per day: (1,2,3),
    (2,1,3), (1,2,3) -> R = (4,5,9); classic Q = 12/(nk(k+1))*SumR^2
    - 3n(k+1) = 122/3 - 36 = 4.6667. Doubled-rank identity: A = 56,
    B = 24, Q = 2*56/24 -> q_milli = 4666."""
    from datetime import datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    counts = {
        0: {"A": 1, "B": 2, "C": 3},
        1: {"A": 5, "B": 4, "C": 6},
        2: {"A": 2, "B": 3, "C": 9},
    }
    rows, eid = [], 0
    for d, per in counts.items():
        for typ, c in per.items():
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, datetime(2024, 3, 1, 12) + timedelta(days=d),
                     eid, typ, 1.0, "{}")
                )
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q322_friedman_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.k_types, r.a_stat, r.b_stat) == (3, 3, 56, 24)
    assert r.q_milli == 4666


def test_q323_durbin_watson_hand_value(spark, tmp_path, qs):
    """Daily counts (1,3,2,4): OLS b = 0.8, a = 1.3; residuals
    (-.3,.9,-.9,.3) -> DW = 6.12/1.8 = 3.4 exactly (alternating
    residuals -> strong negative autocorrelation). All intermediate
    integers divide exactly, so no floor slack anywhere."""
    from datetime import datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows, eid = [], 0
    for d, c in enumerate([1, 3, 2, 4]):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 12) + timedelta(days=d),
                 eid, "click", 1.0, "{}")
            )
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q323_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert r.slope_nano == 800_000_000
    assert r.sum_e2_nano2 == "1800000000000000000"
    assert r.sum_d2_nano2 == "6120000000000000000"
    assert r.dw_milli == 3400


def test_q323_durbin_watson_perfect_fit_is_null(spark, tmp_path, qs):
    """A perfectly linear series has zero residuals -> DW undefined ->
    explicit NULL (the q308 degenerate-guard discipline)."""
    from datetime import datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows, eid = [], 0
    for d, c in enumerate([1, 2, 3, 4]):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 12) + timedelta(days=d),
                 eid, "click", 1.0, "{}")
            )
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q323_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert r.sum_e2_nano2 == "0"
    assert r.dw_milli is None


def test_q324_page_hinkley_hand_value(spark, tmp_path, qs):
    """Counts (10,10,10,40): running means 10,10,10,17.5 -> terms
    0,0,0,22.5e9 -> PH peaks at 22500000000 nano on the spike day."""
    from datetime import date, datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows, eid = [], 0
    for d, c in enumerate([10, 10, 10, 40]):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1, 12) + timedelta(days=d),
                 eid, "click", 1.0, "{}")
            )
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q324_page_hinkley"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert r.peak_day_t == (date(2024, 3, 4) - date(1970, 1, 1)).days
    assert r.ph_max_nano == "22500000000"


def test_q326_vocab_curve_tie_slice_hand_value(spark, tmp_path, qs):
    """Spectrum 4x(c=4), 8x(c=2), 3x(c=1): V=15, N=35. K=10 lands
    mid-tie in the c=2 band -> covered = 16 + (10-4)*2 = 28 ->
    800000 ppm; K >= V covers everything."""
    toks = []
    for i in range(4):
        toks += [f"hi{i}"] * 4
    for i in range(8):
        toks += [f"mid{i}"] * 2
    for i in range(3):
        toks += [f"lo{i}"]
    _write_docs(spark, tmp_path, [(1, " ".join(toks), "en", "srcA", 5)])
    rows = {r.k: r for r in qs["q326_vocab_budget_curve"](
        spark, str(tmp_path)).collect()}
    assert rows[10].covered_tokens == 28
    assert rows[10].coverage_ppm == 800_000
    assert rows[10].vocab_used == 10
    for k in (100, 1000, 65536):
        assert rows[k].vocab_used == 15
        assert rows[k].covered_tokens == 35
        assert rows[k].coverage_ppm == 1_000_000


def test_q329_percentiles_hand_values(spark, tmp_path, qs):
    """srcA lengths 1..10 (one each): lower percentiles are exact order
    statistics -- p25 = ceil(2.5) = 3rd value = 3, p50 = 5, p90 = 9,
    p99 = ceil(9.9) = 10th = 10. srcB constant length -> all
    percentiles equal."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    docs = [(i, "x" * i, "en", "srcA", i) for i in range(1, 11)]
    docs += [(100 + i, "y" * 7, "en", "srcB", 7) for i in range(5)]
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r.source: r for r in qs["q329_source_length_percentiles"](
        spark, str(tmp_path)).collect()}
    a = rows["srcA"]
    assert (a.n_docs, a.p25, a.p50, a.p90, a.p99) == (10, 3, 5, 9, 10)
    b = rows["srcB"]
    assert (b.n_docs, b.p25, b.p50, b.p90, b.p99) == (5, 7, 7, 7, 7)


def test_q331_heaps_beta_exactly_one_for_all_unique_words(spark, tmp_path, qs):
    """If every token in the corpus is unique, V(N) = N exactly, so
    every quantized log point has x = y and the integer OLS slope is
    EXACTLY 1.0 (num = den) -> beta_micro = 1_000_000."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    uid = 0
    docs = []
    for d in range(12):
        words = []
        for _ in range(10 + d):
            words.append(f"u{uid}")
            uid += 1
        docs.append((d, " ".join(words), "en", "srcA", 10))
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    r = qs["q331_heaps_law_fit"](spark, str(tmp_path)).collect()[0]
    assert r.n_points >= 2
    assert r.vocab_full == r.n_tokens_full == uid
    assert r.beta_micro == 1_000_000


def test_q332_mood_hand_value(spark, tmp_path, qs):
    """srcA lengths {1,2,3}, srcB {4,5,6}: pooled lower median 3,
    perfect separation -> chi2 = N = 6.000 exactly (each of the four
    cells contributes 81/54 = 1.5)."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    docs = [(i, "x" * i, "en", "srcA", i) for i in (1, 2, 3)]
    docs += [(10 + i, "y" * i, "en", "srcB", i) for i in (4, 5, 6)]
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    r = qs["q332_mood_median_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_docs, r.median_len, r.n_sources, r.df) == (6, 3, 2, 1)
    assert r.chi2_milli == 6000


def test_q333_planner_hand_value(spark, tmp_path, qs):
    """100 users over 10 days, 25 high-value converters: p = .25,
    p2 = .275; the planner must equal the identical python double
    chain, and days = ceil(2n / daily_users)."""
    from datetime import datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows, eid = [], 0
    for u in range(100):
        eid += 1
        val = 300.0 if u < 25 else 50.0
        rows.append(
            (eid, datetime(2024, 3, 1, 12) + timedelta(days=u % 10),
             u, "purchase", val, "{}")
        )
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q333_ab_duration_planner"](spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.n_converters, r.n_days, r.p_ppm, r.daily_users) == (
        100, 25, 10, 250_000, 10,
    )
    p1 = 250_000 / 1e6
    p2 = 250_000 / 1e6 * 1.1
    z = 1.959964 + 0.841621
    want = int(round(
        (z * z) * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) / ((p2 - p1) * (p2 - p1))
        + 0.5
    ))
    assert r.n_per_arm == want
    assert r.days_needed == (2 * want + 9) // 10


def test_q334_stickiness_hand_value(spark, tmp_path, qs):
    """Planted windows: u0 active on the last day (DAU), u1 three days
    back (WAU only), u2 twenty days back (MAU only), u3 forty days
    back (outside). DAU=1, WAU=2, MAU=3; nesting DAU<=WAU<=MAU."""
    from datetime import datetime, timedelta

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    last = datetime(2024, 3, 31, 12)
    rows = [
        (1, last, 0, "click", 1.0, "{}"),
        (2, last - timedelta(days=3), 1, "click", 1.0, "{}"),
        (3, last - timedelta(days=20), 2, "click", 1.0, "{}"),
        (4, last - timedelta(days=40), 3, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = qs["q334_dau_mau_stickiness"](spark, str(tmp_path)).collect()[0]
    assert (r.dau, r.wau, r.mau) == (1, 2, 3)
    assert r.dau <= r.wau <= r.mau
    assert r.dau_mau_ppm == 333_333
    assert r.wau_mau_ppm == 666_666


def test_q335_rank_movers_hand_value(spark, tmp_path, qs):
    """Half 0 (even ids): 'alpha' x3, 'beta' x2, 'gamma' x1. Half 1
    (odd): 'beta' x3, 'alpha' x1, 'delta' x1. alpha 1->2 (+... delta
    -1), beta 2->1 (+1), gamma enters only A (NULL delta), delta only
    B (NULL delta)."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    docs = [
        (0, "alpha alpha alpha beta beta gamma", "en", "srcA", 6),
        (1, "beta beta beta alpha delta", "en", "srcA", 5),
    ]
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r.tok: (r.rank_a, r.rank_b, r.rank_delta) for r in
           qs["q335_token_rank_movers"](spark, str(tmp_path)).collect()}
    assert got == {
        "alpha": (1, 2, -1),
        "beta": (2, 1, 1),
        "gamma": (3, None, None),
        "delta": (None, 3, None),
    }


def test_q337_lorenz_hand_values(spark, tmp_path, qs):
    """10 customers spending 1..10 (one order each): each decile owns
    exactly one customer and cum share after decile d is
    d(d+1)/2 / 55 in ppm (floor)."""
    from datetime import datetime

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = [
        (i, i, "O", float(i), datetime(2024, 3, 1, 12), "1-URGENT")
        for i in range(1, 11)
    ]
    spark.createDataFrame(rows, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    got = {r.decile: r for r in qs["q337_lorenz_curve"](
        spark, str(tmp_path)).collect()}
    assert len(got) == 10
    for d in range(1, 11):
        assert got[d].n_customers == 1
        assert got[d].spend_cents == d * 100
        assert got[d].share_ppm == (d * 100 * 1_000_000) // 5500
        assert got[d].cum_share_ppm == (
            (d * (d + 1) // 2) * 100 * 1_000_000
        ) // 5500
    assert got[10].cum_share_ppm == 1_000_000


def test_q337_lorenz_tie_split(spark, tmp_path, qs):
    """25 customers ALL spending the same amount: the single tied
    value-group must be split exactly across deciles (floor rank
    boundaries: deciles own 2 or 3 customers each, summing to 25) and
    every decile's share equals its customer share."""
    from datetime import datetime

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = [
        (i, i, "O", 7.0, datetime(2024, 3, 1, 12), "1-URGENT")
        for i in range(25)
    ]
    spark.createDataFrame(rows, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    got = {r.decile: r for r in qs["q337_lorenz_curve"](
        spark, str(tmp_path)).collect()}
    sizes = [got[d].n_customers for d in range(1, 11)]
    assert sum(sizes) == 25 and set(sizes) <= {2, 3}
    for d in range(1, 11):
        assert got[d].spend_cents == got[d].n_customers * 700
        assert got[d].share_ppm == (got[d].spend_cents * 1_000_000) // (25 * 700)
    assert got[10].cum_share_ppm == 1_000_000
