"""Hand-computed worked-example pins for the round-9 queries
(q372 Bartlett, q373 DP sensitivity, q374 Kuiper weekday, q375 Grubbs).
The DuckDB oracle replays the same formula as the Spark plan, so these
planted closed-form fixtures are the only INDEPENDENT check available
in this container (scipy absent, installs forbidden) — every value
below is derived by hand in the docstring/comments."""

from __future__ import annotations

import datetime
import math

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


_TS = datetime.datetime(2024, 3, 4, 12, 0, 0)  # Monday


def _ev(eid, user, value, ts=_TS, etype="view"):
    return (eid, ts, user, etype, float(value), "{}")


def test_q372_bartlett_hand_value(spark, tmp_path, qs):
    """Two groups. A: values 1,2,3,4,5 -> v_m={1000..5000}, n=5,
    s=15000, ss=55e6; var_v = (55e6 - 225e6/5)/4/1e6 = 2.5.
    B: values 2,4,6,8 -> n=4, s=20000, ss=120e6;
    var_v = (120e6 - 4e8/4)/3/1e6 = 20/3.
    Quantized terms: lnterm A = round(4*ln(2.5)*1e6) = 3665163,
    B = round(3*ln(20/3)*1e6) = 5691969; ssw A = round(4*2.5e6)=1e7,
    B = round(3*20/3*1e6)=2e7; inv A = round(1e15/4)=25e13,
    B = round(1e15/3)=333333333333333.
    sp2 = 3e7/1e6/7 = 30/7; num = 7*ln(30/7) - 9.357132 = 0.8304876...
    C = 1 + (5.8333...e-1 - 1/7)/(3*(k-1)=3) = 1.1468254.
    T = num/C -> t_micro = round(num/C*1e6) = 724162."""
    rows = [_ev(i, i, v, etype="a") for i, v in enumerate([1, 2, 3, 4, 5])]
    rows += [_ev(10 + i, i, v, etype="b")
             for i, v in enumerate([2, 4, 6, 8])]
    _write_events(spark, tmp_path, rows)
    r = qs["q372_bartlett_test"](spark, str(tmp_path)).collect()[0]
    assert (r.k_groups, r.k_used, r.n_used) == (2, 2, 9)
    ln_sum = round(4 * math.log(2.5) * 1e6) + round(
        3 * math.log(20 / 3) * 1e6
    )
    ssw_sum = round(4 * 2.5 * 1e6) + round(3 * (20 / 3) * 1e6)
    inv_sum = round(1e15 / 4) + round(1e15 / 3)
    sp2 = ssw_sum / 1e6 / 7
    num = 7 * math.log(sp2) - ln_sum / 1e6
    c = 1.0 + (inv_sum / 1e15 - 1.0 / 7) / 3.0
    assert r.bartlett_t_micro == round(num / c * 1e6) == 724162
    assert r.c_micro == round(c * 1e6)


def test_q372_degenerate_paths(spark, tmp_path, qs):
    """One zero-variance group (excluded) + one real group -> k_used=1
    -> NULL statistics; counts still reported."""
    rows = [_ev(i, i, 5.0, etype="flat") for i in range(4)]
    rows += [_ev(10 + i, i, v, etype="vary") for i, v in enumerate([1, 3])]
    _write_events(spark, tmp_path, rows)
    r = qs["q372_bartlett_test"](spark, str(tmp_path)).collect()[0]
    assert (r.k_groups, r.k_used, r.n_used) == (2, 1, 2)
    assert r.bartlett_t_micro is None and r.c_micro is None


def test_q373_dp_sensitivity_hand_value(spark, tmp_path, qs):
    """One day, 3 users with |value| cent sums 100, 200, 300 (one user
    contributes -1.0 then 2.0 -> |100| + |200| = 300). total=600,
    max=300, p99 rank = ceil(0.99*3) = 3 -> contrib 300,
    share = 300e6 div 600 = 500000."""
    rows = [
        _ev(1, 1, 1.0),
        _ev(2, 2, 2.0),
        _ev(3, 3, -1.0),
        _ev(4, 3, 2.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q373_dp_sensitivity"](spark, str(tmp_path)).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_users, r.total_cents, r.max_user_cents) == (3, 600, 300)
    assert r.p99_user_cents == 300
    assert r.sensitivity_share_ppm == 500000


def test_q373_zero_total_share_null(spark, tmp_path, qs):
    _write_events(spark, tmp_path, [_ev(1, 1, 0.0), _ev(2, 2, 0.0)])
    r = qs["q373_dp_sensitivity"](spark, str(tmp_path)).collect()[0]
    assert r.total_cents == 0 and r.sensitivity_share_ppm is None
    assert r.p99_user_cents == 0


def _day_for_wd(wd: int) -> datetime.datetime:
    """A date whose epoch-day mod 7 equals wd (1970-01-01 is day 0)."""
    base = datetime.date(2024, 3, 7)  # epoch day 19789; 19789 % 7 == 0
    assert (base - datetime.date(1970, 1, 1)).days % 7 == 0
    d = base + datetime.timedelta(days=wd)
    return datetime.datetime(d.year, d.month, d.day, 9, 0, 0)


def test_q374_kuiper_uniform_and_point_mass(spark, tmp_path, qs):
    """'u': one event on each of the 7 weekday cells -> the discrete
    exact-uniform step CDF gives D+=0 and D-=1/7, so
    V*7n = 0 + 7 and v_ppm = 7e6 div 49 = 142857.
    'p': 4 events all on cell wd=3 -> D+ numerator at i=4:
    7*4 - 4*4 = 12; D- numerator at i=4: 4*4 - 7*0 = 16;
    v_ppm = 28e6 div 28 = 1000000 (V = 1)."""
    rows = [_ev(i, i, 1.0, ts=_day_for_wd(i), etype="u")
            for i in range(7)]
    rows += [_ev(10 + i, i, 1.0, ts=_day_for_wd(3), etype="p")
             for i in range(4)]
    _write_events(spark, tmp_path, rows)
    got = {r.event_type: (r.n_events, r.v_ppm)
           for r in qs["q374_kuiper_weekday"](spark, str(tmp_path)).collect()}
    assert got == {"u": (7, 142857), "p": (4, 1000000)}


def test_q374_rotation_invariance(spark, tmp_path, qs):
    """The same two-cell shape planted at different weekday anchors
    must score the same V — the circular property plain KS lacks.
    Shape: 3 events on one cell, 1 on the NEXT cell."""
    rows = [_ev(i, i, 1.0, ts=_day_for_wd(0), etype="r0")
            for i in range(3)] + [_ev(3, 3, 1.0, ts=_day_for_wd(1),
                                      etype="r0")]
    rows += [_ev(10 + i, i, 1.0, ts=_day_for_wd(4), etype="r4")
             for i in range(3)] + [_ev(13, 3, 1.0, ts=_day_for_wd(5),
                                       etype="r4")]
    _write_events(spark, tmp_path, rows)
    got = {r.event_type: r.v_ppm
           for r in qs["q374_kuiper_weekday"](spark, str(tmp_path)).collect()}
    assert got["r0"] == got["r4"]


def test_q375_grubbs_hand_value(spark, tmp_path, qs):
    """Daily counts [5,5,5,9]: n=4, S=24, SS=156, mean=6,
    var=(156-144)/3=4, s=2; max dev |9-6|=3 -> G=1.5 ->
    g_micro=1500000; outlier day = the 9-count day."""
    rows = []
    eid = 0
    for day, cnt in [(1, 5), (2, 5), (3, 5), (4, 9)]:
        for _ in range(cnt):
            rows.append(
                _ev(eid, eid, 1.0,
                    ts=datetime.datetime(2024, 3, day, 10, 0, 0))
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = qs["q375_grubbs_daily"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 4
    assert str(r.outlier_day) == "2024-03-04"
    assert r.outlier_count == 9
    assert r.g_micro == 1500000


def test_q375_degenerate_paths(spark, tmp_path, qs):
    """Constant series (zero variance) -> NULL statistic and NULL day;
    n_days still reported."""
    rows = []
    eid = 0
    for day in (1, 2, 3):
        for _ in range(4):
            rows.append(
                _ev(eid, eid, 1.0,
                    ts=datetime.datetime(2024, 3, day, 10, 0, 0))
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = qs["q375_grubbs_daily"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 3
    assert r.outlier_day is None and r.g_micro is None


def test_q376_holm_mechanics_and_vs_bh(spark, tmp_path, qs):
    """Holm step-down mechanics on the shared A/A family: ranks are a
    permutation, p ordered with rank, the pass rule replays the exact
    integer comparison, rejections are a PREFIX (stop at first
    failure), and Holm (FWER) never rejects more than BH (FDR) on the
    same family."""
    rows = [_ev(e, u, float(1 + (u * 7 + e) % 5))
            for e, u in ((i, i % 20) for i in range(120))]
    _write_events(spark, tmp_path, rows)
    rows_h = qs["q376_holm_stepdown"](spark, str(tmp_path)).collect()
    assert len(rows_h) == 20
    assert sorted(r.rank for r in rows_h) == list(range(1, 21))
    by_rank = sorted(rows_h, key=lambda r: r.rank)
    ps = [r.p_nano for r in by_rank]
    assert ps == sorted(ps) and 0 <= ps[0] and ps[-1] <= 10**9
    for r in by_rank:
        assert r.holm_pass == (r.p_nano * (20 - r.rank + 1) <= 50_000_000)
    # prefix property: rejected iff ALL ranks <= r passed
    seen_fail = False
    for r in by_rank:
        if not r.holm_pass:
            seen_fail = True
        assert r.rejected == (not seen_fail)
    n_holm = sum(r.rejected for r in rows_h)
    n_bh = sum(r.rejected
               for r in qs["q304_bh_fdr_control"](spark, str(tmp_path))
               .collect())
    assert n_holm <= n_bh


def _agreement_fixture(spark, tmp_path, reversed_dense):
    """20 docs: doc d holds 21-d 'spark' tokens padded to length 40
    with unique filler -> BM25 rank rb = d. Embeddings: 2-dim unit
    vectors at increasing angle from the query (1,0) -> dense rank
    rd = d (or 21-d when reversed)."""
    import math as m

    docs = []
    for d in range(1, 21):
        tf = 21 - d
        toks = ["spark"] * tf + [f"x{d}w{j}" for j in range(40 - tf)]
        text = " ".join(toks)
        docs.append((d, text, "en", "src", len(text)))
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    embs = [(0, [1.0, 0.0], 0)]
    for d in range(1, 21):
        pos = d if not reversed_dense else 21 - d
        th = 0.05 * pos
        embs.append((d, [m.cos(th), m.sin(th)], 0))
    spark.createDataFrame(embs, SCHEMAS["embeddings"]).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )


def test_q377_perfect_agreement(spark, tmp_path, qs):
    """Identical rankings -> overlap@k = k, jaccard 1e6, footrule 0."""
    _agreement_fixture(spark, tmp_path, reversed_dense=False)
    got = {r.k: (r.n_overlap, r.jaccard_ppm, r.footrule)
           for r in qs["q377_retrieval_agreement"](
               spark, str(tmp_path)).collect()}
    assert got == {5: (5, 1000000, 0), 10: (10, 1000000, 0),
                   20: (20, 1000000, 0)}


def test_q377_reversed_rankings(spark, tmp_path, qs):
    """Dense ranking reversed: same top-20 SET (overlap@20 = 20,
    footrule = sum|2d-21| = 200) but ZERO overlap at k = 5 and 10."""
    _agreement_fixture(spark, tmp_path, reversed_dense=True)
    got = {r.k: (r.n_overlap, r.jaccard_ppm, r.footrule)
           for r in qs["q377_retrieval_agreement"](
               spark, str(tmp_path)).collect()}
    assert got == {5: (0, 0, 0), 10: (0, 0, 0), 20: (20, 1000000, 200)}


def test_q378_watermark_curve_hand_values(spark, tmp_path, qs):
    """Arrival-ordered lateness [0, 0, 0.5s, 5s, 30s, 2h]:
    dropped at delay 0/1s/10s/1m/10m/1h = 4/3/2/1/1/1 of 6."""
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        _ev(1, 1, 1.0, ts=at(0)),         # first: on time
        _ev(2, 2, 1.0, ts=at(100)),       # new max: on time
        _ev(3, 3, 1.0, ts=at(99.5)),      # 0.5 s late
        _ev(4, 4, 1.0, ts=at(95)),        # 5 s late
        _ev(5, 5, 1.0, ts=at(70)),        # 30 s late
        _ev(6, 6, 1.0, ts=at(100 - 7200)),  # 2 h late
    ]
    _write_events(spark, tmp_path, rows)
    got = {r.delay_us: (r.n_events, r.n_dropped, r.drop_ppm)
           for r in qs["q378_watermark_cost_curve"](
               spark, str(tmp_path)).collect()}
    exp_drops = {0: 4, 1000000: 3, 10000000: 2, 60000000: 1,
                 600000000: 1, 3600000000: 1}
    assert got == {d: (6, n, n * 1000000 // 6)
                   for d, n in exp_drops.items()}


def test_delay_curve_monitor_equals_batch_q378(spark, tmp_path, qs):
    """Streaming twin of q378: the q378 hand fixture split into two
    arrival-ordered micro-batches (e1-e3, then e4-e6) with a
    foreachBatch RETRY of batch 0 in between drains. The merged
    delay-cost curve must equal the batch q378 relation over the
    union (cross-batch lateness seeds from the earlier batch's max
    event time), and the retry must not double-count."""
    from airflow_spotify_etl_spark.streaming.lateness_monitor import (
        _apply_delay_curve_batch,
        read_delay_curve,
        run_delay_curve_monitor,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows1 = [
        _ev(1, 1, 1.0, ts=at(0)),
        _ev(2, 2, 1.0, ts=at(100)),
        _ev(3, 3, 1.0, ts=at(99.5)),
    ]
    rows2 = [
        _ev(4, 4, 1.0, ts=at(95)),
        _ev(5, 5, 1.0, ts=at(70)),
        _ev(6, 6, 1.0, ts=at(100 - 7200)),
    ]
    src = str(tmp_path / "curve_src")
    store = str(tmp_path / "curve_store")
    ckpt = str(tmp_path / "curve_ckpt")
    schema = SCHEMAS["events"]

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        run_delay_curve_monitor(spark, stream, store, ckpt)

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    # RETRY: re-apply batch 0 — identical partial overwritten in place
    _apply_delay_curve_batch(
        spark, spark.createDataFrame(rows1, schema), store, 0
    )
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()

    got = {r.delay_us: (r.n_events, r.n_dropped, r.drop_ppm)
           for r in read_delay_curve(spark, store).collect()}
    # batch twin over the union written as one events table
    _write_events(spark, tmp_path, rows1 + rows2)
    want = {r.delay_us: (r.n_events, r.n_dropped, r.drop_ppm)
            for r in qs["q378_watermark_cost_curve"](
                spark, str(tmp_path)).collect()}
    assert got == want
    assert got[0] == (6, 4, 4 * 1000000 // 6)


def test_q379_gpd_hand_value(spark, tmp_path, qs):
    """30 days, one event per day with value k -> daily totals 100k
    cents. u = rank ceil(0.9*30)=27 -> 2700; exceedances {100,200,300}:
    m=200, s2=(140000-120000)/2=10000, m2/s2=4 ->
    xi = 0.5*(1-4) = -1.5, sigma = 0.5*200*5 = 500 cents."""
    rows = [_ev(k, k, float(k),
                ts=datetime.datetime(2024, 3, 1, 10, 0, 0)
                + datetime.timedelta(days=k))
            for k in range(1, 31)]
    _write_events(spark, tmp_path, rows)
    r = qs["q379_pot_gpd_fit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.u_cents, r.n_exceed) == (30, 2700, 3)
    assert r.xi_micro == -1500000
    assert r.sigma_cents_micro == 500000000


def test_q379_degenerate_equal_exceedances(spark, tmp_path, qs):
    """Exceedances all equal -> zero variance -> NULL estimates."""
    vals = [1.0] * 27 + [9.0, 9.0, 9.0]
    rows = [_ev(k, k, v,
                ts=datetime.datetime(2024, 3, 1, 10, 0, 0)
                + datetime.timedelta(days=k))
            for k, v in enumerate(vals, start=1)]
    _write_events(spark, tmp_path, rows)
    r = qs["q379_pot_gpd_fit"](spark, str(tmp_path)).collect()[0]
    assert r.n_exceed == 3
    assert r.xi_micro is None and r.sigma_cents_micro is None


def test_q380_record_hand_values(spark, tmp_path, qs):
    """Strictly increasing daily counts [1,2,3,4] -> R=4;
    H_4 = 25/12 -> expected_micro 2083333; z replayed from the same
    femto-quantized sums."""
    rows = []
    eid = 0
    for day, cnt in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for _ in range(cnt):
            rows.append(_ev(eid, eid, 1.0,
                            ts=datetime.datetime(2024, 3, day, 10, 0, 0)))
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = qs["q380_record_rate_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_records) == (4, 4)
    h_sum = sum(round(1e15 / k) for k in range(1, 5))
    v_sum = sum(round(1e15 / k) - round(1e15 / (float(k) * k))
                for k in range(1, 5))
    assert r.expected_micro == round(h_sum / 1e15 * 1e6) == 2083333
    z = (4 - h_sum / 1e15) / math.sqrt(v_sum / 1e15)
    assert r.z_micro == round(z * 1e6)


def test_q380_constant_two_days(spark, tmp_path, qs):
    """[5,5]: only day 1 is a (first) record -> R=1, H=1.5, V=0.25,
    z = (1-1.5)/0.5 = -1."""
    rows = []
    eid = 0
    for day in (1, 2):
        for _ in range(5):
            rows.append(_ev(eid, eid, 1.0,
                            ts=datetime.datetime(2024, 3, day, 10, 0, 0)))
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = qs["q380_record_rate_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_records) == (2, 1)
    assert r.z_micro == -1000000


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )


def test_q381_sweep_hand_values(spark, tmp_path, qs):
    """Eval doc 1 = 'a b c d e f g h'. Corpus: doc 10 identical (flags
    at every n), doc 11 shares only the 2-gram 'a b', doc 12 shares
    nothing -> contaminated 2/1/1/1 of 3 at n=2/4/6/8."""
    docs = [
        (1, "a b c d e f g h", "en", "s", 15),
        (2, "e1 e2 e3 e4 e5 e6 e7 e8", "en", "s", 23),
        (10, "a b c d e f g h", "en", "s", 15),
        (11, "x y a b q r s t", "en", "s", 15),
        (12, "m n o p q2 r2 s2 t2", "en", "s", 19),
    ]
    _write_docs(spark, tmp_path, docs)
    got = {r.n: (r.n_corpus_docs, r.n_contaminated, r.rate_ppm)
           for r in qs["q381_contamination_ngram_sweep"](
               spark, str(tmp_path)).collect()}
    assert got == {2: (3, 2, 666666), 4: (3, 1, 333333),
                   6: (3, 1, 333333), 8: (3, 1, 333333)}


def test_q382_hill_hand_value(spark, tmp_path, qs):
    """5 positive users with totals [1600, 800, 400, 200, 100] cents:
    k = min(100, 4) = 4, x_(k+1) = 100,
    xi = mean(ln16, ln8, ln4, ln2) replayed from micro-quantized
    terms. A user with negative total is excluded."""
    rows = [
        _ev(1, 1, 16.0), _ev(2, 2, 8.0), _ev(3, 3, 4.0),
        _ev(4, 4, 2.0), _ev(5, 5, 1.0), _ev(6, 6, -3.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = qs["q382_hill_tail_index"](spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.k, r.x_kplus1_cents) == (5, 4, 100)
    ln_sum = sum(round(math.log(x / 100) * 1e6)
                 for x in (1600, 800, 400, 200))
    assert r.hill_xi_micro == round(ln_sum / 1e6 / 4 * 1e6)


def test_q382_single_positive_user_empty(spark, tmp_path, qs):
    _write_events(spark, tmp_path, [_ev(1, 1, 5.0), _ev(2, 2, -1.0)])
    assert qs["q382_hill_tail_index"](spark, str(tmp_path)).count() == 0


def test_q383_expected_shortfall_hand_value(spark, tmp_path, qs):
    """30 days with totals 100k cents (k=1..30): tail size
    30 - ceil(27) = 3 -> top days {3000,2900,2800}, ES = 8700*1000/3
    = 2900000 milli, share = 8700e6 div 46500 = 187096 ppm."""
    rows = [_ev(k, k, float(k),
                ts=datetime.datetime(2024, 3, 1, 10, 0, 0)
                + datetime.timedelta(days=k))
            for k in range(1, 31)]
    _write_events(spark, tmp_path, rows)
    r = qs["q383_expected_shortfall"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_tail) == (30, 3)
    assert r.es_cents_milli == 2900000
    assert r.tail_share_ppm == 187096


def test_q383_empty_tail(spark, tmp_path, qs):
    """5 days: ceil(0.9*5) = 5 -> zero tail rows -> NULLs."""
    rows = [_ev(k, k, float(k),
                ts=datetime.datetime(2024, 3, 1, 10, 0, 0)
                + datetime.timedelta(days=k))
            for k in range(1, 6)]
    _write_events(spark, tmp_path, rows)
    r = qs["q383_expected_shortfall"](spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_tail) == (5, 0)
    assert r.es_cents_milli is None and r.tail_share_ppm is None


def test_q384_water_filling_hand_values(spark, tmp_path, qs):
    """Sources A=10, B=30, C=60 tokens; budget = 50. Ascending fits:
    A fully (10 + 10*2 = 30 <= 50); B fails (40 + 30 = 70) ->
    lambda = (50-10) div 2 = 20 -> A=10 uncapped, B=C=20 capped,
    total = 50 = budget exactly."""
    def words(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    docs = [
        (1, words("a", 10), "en", "A", 10),
        (2, words("b", 30), "en", "B", 30),
        (3, words("c", 25), "en", "C", 25),
        (4, words("d", 35), "en", "C", 35),
    ]
    _write_docs(spark, tmp_path, docs)
    got = {r.source: (r.n_tokens, r.allocated, r.capped)
           for r in qs["q384_token_water_filling"](
               spark, str(tmp_path)).collect()}
    assert got == {"A": (10, 10, False), "B": (30, 20, True),
                   "C": (60, 20, True)}
    assert sum(a for _, a, _ in got.values()) == 50


def test_q384_all_empty_texts(spark, tmp_path, qs):
    """Zero-token corpus: budget 0, everything fits at level 0 ->
    allocated 0, nothing capped."""
    docs = [(1, "", "en", "A", 0), (2, "", "en", "B", 0)]
    _write_docs(spark, tmp_path, docs)
    got = {r.source: (r.n_tokens, r.allocated, r.capped)
           for r in qs["q384_token_water_filling"](
               spark, str(tmp_path)).collect()}
    assert got == {"A": (0, 0, False), "B": (0, 0, False)}


def test_q385_by_mechanics_and_family_ordering(spark, tmp_path, qs):
    """BY mechanics on the shared A/A family: the pass rule replays
    the exact integer harmonic comparison, rejections are the step-up
    max-passing-rank set, and the dependence-robust BY never rejects
    more than plain BH on the same family."""
    rows = [_ev(e, u, float(1 + (u * 7 + e) % 5))
            for e, u in ((i, i % 20) for i in range(120))]
    _write_events(spark, tmp_path, rows)
    rows_by = qs["q385_benjamini_yekutieli"](spark, str(tmp_path)).collect()
    assert len(rows_by) == 20
    h_f = sum(round(1e15 / i) for i in range(1, 21))
    by_rank = sorted(rows_by, key=lambda r: r.rank)
    for r in by_rank:
        assert r.by_pass == (
            r.p_nano * 20 * h_f <= 50_000_000 * r.rank * 10**15
        )
    passing = [r.rank for r in rows_by if r.by_pass]
    kmax = max(passing) if passing else 0
    for r in rows_by:
        assert r.rejected == (r.rank <= kmax)
    n_by = sum(r.rejected for r in rows_by)
    n_bh = sum(r.rejected
               for r in qs["q304_bh_fdr_control"](spark, str(tmp_path))
               .collect())
    assert n_by <= n_bh


def test_q386_variogram_hand_values(spark, tmp_path, qs):
    """Daily counts [1,3,6,10,15] on days 1-5: lag-1 diffs {2,3,4,5}
    -> gamma = 54000 div 8 = 6750 milli; lag-2 {5,7,9} -> 155000 div 6
    = 25833; lag-4 {14} -> 98000; lag-8 no pairs -> NULL."""
    rows = []
    eid = 0
    for day, cnt in [(1, 1), (2, 3), (3, 6), (4, 10), (5, 15)]:
        for _ in range(cnt):
            rows.append(_ev(eid, eid, 1.0,
                            ts=datetime.datetime(2024, 3, day, 10, 0, 0)))
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = {r.lag_days: (r.n_pairs, r.gamma_milli)
           for r in qs["q386_variogram_profile"](
               spark, str(tmp_path)).collect()}
    assert got == {1: (4, 6750), 2: (3, 25833), 4: (1, 98000),
                   8: (0, None)}


def test_q387_hamilton_hand_values(spark, tmp_path, qs):
    """Sources A=3, B=3, C=1 docs, N=1000 slots: quotas 3000/7 and
    1000/7 -> floors 428/428/142 (sum 998, R=2); remainders 4/4/6 ->
    C then A (tie A<B) get the 2 leftover slots -> 429/428/143,
    total exactly 1000."""
    docs = [
        (1, "x", "en", "A", 1), (2, "x", "en", "A", 1),
        (3, "x", "en", "A", 1), (4, "x", "en", "B", 1),
        (5, "x", "en", "B", 1), (6, "x", "en", "B", 1),
        (7, "x", "en", "C", 1),
    ]
    _write_docs(spark, tmp_path, docs)
    got = {r.source: (r.n_docs, r.allocated, r.got_remainder_slot)
           for r in qs["q387_largest_remainder_apportionment"](
               spark, str(tmp_path)).collect()}
    assert got == {"A": (3, 429, True), "B": (3, 428, False),
                   "C": (1, 143, True)}
    assert sum(a for _, a, _ in got.values()) == 1000
