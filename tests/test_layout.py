"""Layout/skew operator tests: bucketed joins skip the shuffle; salted
variants match their plain counterparts exactly."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from airflow_spotify_etl_spark.operators.layout import (
    salted_count_distinct,
    salted_join,
    write_bucketed,
)
from airflow_spotify_etl_spark.sources.files import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "value")
    right = ev.select("event_id", "event_type")
    tl, tr = f"bl_{uuid.uuid4().hex[:8]}", f"br_{uuid.uuid4().hex[:8]}"
    write_bucketed(left, tl, ["event_id"], 8, sort_cols=["event_id"],
                   path=str(tmp_path / "l"))
    write_bucketed(right, tr, ["event_id"], 8, sort_cols=["event_id"],
                   path=str(tmp_path / "r"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(tl).join(spark.table(tr), "event_id")
        assert joined.count() == ev.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Matching bucket layout on the join key: sort-merge join with ZERO
        # shuffle exchanges — the pay-once-at-write co-location contract.
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
        spark.sql(f"DROP TABLE IF EXISTS {tr}")


def test_range_clustered_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """Each output file covers a disjoint ts range → parquet min/max stats
    let filtered scans skip whole files."""
    import pathlib

    from airflow_spotify_etl_spark.operators.layout import write_range_clustered

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "clustered")
    write_range_clustered(ev, out, ["ts"], n_files=8)

    files = sorted(str(p) for p in pathlib.Path(out).glob("*.parquet"))
    assert len(files) >= 4
    ranges = []
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # disjoint (boundary rows may touch)
    assert spark.read.parquet(out).count() == ev.count()


def test_salted_count_distinct_is_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        (r["event_type"], r["n_distinct_user_id"])
        for r in salted_count_distinct(ev, ["event_type"], "user_id", 8).collect()
    }
    assert salted == exact


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod("user_id", F.lit(5)))
    )
    plain = ev.join(dim, "user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("segment"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(ev, dim, "user_id", n_salts=8).agg(
        F.count("*").alias("n"), F.round(F.sum("segment"), 2).alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_join_rejects_outer_howes(spark):
    from airflow_spotify_etl_spark.operators.layout import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(df, df, "k", how=how)


def test_zorder_key_interleaves_bits(spark):
    """Morton-key unit check: zorder_key(x=0b11, y=0b01, 2 bits) =
    interleave x0 y0 x1 y1 = 1·1 + 1·2 + 1·4 + 0·8 = 7; and single-bit
    moves in either dim move the key locally."""
    from airflow_spotify_etl_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 0), (1, 0), (0, 1)], "x long, y long")
    got = df.select("x", "y", zorder_key(["x", "y"], bits=2).alias("z")).collect()
    z = {(r.x, r.y): r.z for r in got}
    assert z[(0, 0)] == 0
    assert z[(1, 0)] == 1   # x contributes even bit positions
    assert z[(0, 1)] == 2   # y contributes odd bit positions
    assert z[(3, 1)] == 7


def test_zordered_files_prune_on_both_dims(spark, tmp_path):
    """Z-order vs 1-D range clustering on uniform 2-D data. Box AREA is
    ~1/n_files for both layouts — the z-curve's win is how that area is
    SHAPED: range-clustering on x leaves every file covering the full y
    extent (a y-filter prunes nothing), while z-ordered files bound both
    dims, so filters on EITHER dimension skip files."""
    import pathlib

    from airflow_spotify_etl_spark.operators.layout import (
        write_range_clustered,
        write_zordered,
    )

    n = 1 << 14
    df = (
        spark.range(n)
        .withColumn("x", F.pmod(F.col("id") * 2654435761, F.lit(4096)))
        .withColumn("y", F.pmod(F.col("id") * 40503 + 17, F.lit(4096)))
    )

    def mean_extents(path):
        files = sorted(str(p) for p in pathlib.Path(path).glob("*.parquet"))
        assert len(files) >= 8
        xs, ys = [], []
        for f in files:
            r = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).collect()[0]
            xs.append((r[1] - r[0]) / 4096.0)
            ys.append((r[3] - r[2]) / 4096.0)
        return sum(xs) / len(xs), sum(ys) / len(ys)

    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=10)
    write_range_clustered(df, rpath, ["x"], n_files=16)

    zx, zy = mean_extents(zpath)
    rx, ry = mean_extents(rpath)
    assert spark.read.parquet(zpath).count() == n
    assert ry > 0.9          # 1-D layout: y completely unclustered
    assert rx < 0.15         # ... all clustering spent on x
    # z-order: BOTH dims bounded — mean extents well under the full range
    # (16 files over 2 dims -> ideal ~1/4 per dim; allow curve-straddling
    # boundary files to inflate that somewhat).
    assert zx < 0.6 and zy < 0.6
    # worst-case pruning dimension: the z layout must beat the 1-D
    # layout's unclustered dim decisively.
    assert max(zx, zy) < ry * 0.7


def test_skew_report_closed_form(spark):
    """Planted skew: key 'hot' holds 80 of 100 rows over 3 keys →
    skew_factor 2.4, recommended_salts ceil(80·3/100) = 3, top key
    listed first."""
    from airflow_spotify_etl_spark.operators.layout import skew_report

    rows = (
        [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    )
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, ["k"], top_k=2).collect()[0]
    assert r.n_rows == 100 and r.n_keys == 3 and r.max_key_rows == 80
    assert r.skew_factor == 2.4
    assert r.recommended_salts == 3
    assert r.top_keys.startswith("hot:80")


def test_epoch_shuffle_reproducible_and_batched(spark):
    from airflow_spotify_etl_spark.operators.layout import epoch_shuffle

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = epoch_shuffle(df, batch_size=32, seed="e1").orderBy("global_pos").collect()
    b = epoch_shuffle(df, batch_size=32, seed="e1").orderBy("global_pos").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # same seed → same epoch
    # positions are an exact permutation of 0..n-1
    assert [r.global_pos for r in a] == list(range(300))
    # every batch full except the last
    from collections import Counter

    sizes = Counter(r.batch_id for r in a)
    last = max(sizes)
    assert all(v == 32 for k, v in sizes.items() if k != last)
    assert sizes[last] == 300 % 32
    # a different seed is a different permutation
    c = epoch_shuffle(df, batch_size=32, seed="e2").orderBy("global_pos").collect()
    assert [r.doc_id for r in c] != [r.doc_id for r in a]


def test_epoch_shuffle_small_bucket_count_keeps_md5_order(spark):
    """n_buckets < 256 must produce the SAME global_pos as the default:
    global_pos is defined as the row's rank in md5(seed:id) order, so
    bucketing is only allowed to change parallelism, never the order.
    (A modulo-derived bucket breaks this — 0x0a would sort before 0x01 —
    which is why buckets are range-derived: floor(prefix·n/256).)"""
    import pytest

    from airflow_spotify_etl_spark.operators.layout import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    base = {
        r.doc_id: r.global_pos
        for r in epoch_shuffle(df, seed="e9").collect()
    }
    for n in (1, 10, 255):
        got = {
            r.doc_id: r.global_pos
            for r in epoch_shuffle(df, seed="e9", n_buckets=n).collect()
        }
        assert got == base, f"n_buckets={n} reordered the epoch"
    with pytest.raises(ValueError):
        epoch_shuffle(df, n_buckets=0)
    with pytest.raises(ValueError):
        epoch_shuffle(df, n_buckets=512)


def test_epoch_shuffle_rank_is_distributed(spark):
    """The global permutation must come from the bucket-offset
    decomposition: the row_number window is PARTITIONED by bucket, and
    the only single-partition exchange in the plan is the n_buckets-row
    offset relation (after its aggregate) — the corpus itself never
    funnels through one task."""
    from airflow_spotify_etl_spark.operators.layout import epoch_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # row_number over the data is bucket-partitioned
    import re

    rn = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert rn and all("_bucket" in ln for ln in rn), plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_range_boundaries_balance_and_edges(spark):
    from airflow_spotify_etl_spark.operators.layout import range_boundaries

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    out = {r.bucket: r for r in range_boundaries(df, "v", n_buckets=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    # uniform data → perfectly balanced buckets (within interpolation)
    assert all(240 <= r.n_rows <= 260 for r in out.values())
    assert out[0].lo is None and out[3].hi is None
    assert out[0].hi is not None and out[0].hi == out[1].lo
    # boundaries ascend
    bs = [out[0].hi, out[1].hi, out[2].hi]
    assert bs == sorted(bs)


def test_curriculum_order_tier_major_shuffled_within(spark):
    from airflow_spotify_etl_spark.operators.layout import curriculum_order

    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("int").alias("tier")
    )
    out = curriculum_order(df, "tier").orderBy("global_pos").collect()
    # positions are a permutation; tiers are non-decreasing along it
    assert [r.global_pos for r in out] == list(range(200))
    tiers = [r.tier for r in out]
    assert tiers == sorted(tiers)
    # within a tier the doc order is NOT the id order (it is shuffled)
    t0 = [r.doc_id for r in out if r.tier == 0]
    assert t0 != sorted(t0)
    # deterministic
    again = curriculum_order(df, "tier").orderBy("global_pos").collect()
    assert [r.doc_id for r in again] == [r.doc_id for r in out]


def test_interleave_closed_form_and_batch_mix(spark):
    """The closed-form position equals the naive (r, source) row_number
    on SKEWED source sizes, and the first batch contains every source
    that still has docs — the mix property interleaving exists for."""
    import os, tempfile

    import airflow_spotify_etl_spark.plans.llm as llm

    rows = [(i, f"t{i}", "en", "big", 5) for i in range(90)]
    rows += [(200 + i, f"u{i}", "en", "mid", 5) for i in range(30)]
    rows += [(400 + i, f"v{i}", "en", "tiny", 5) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = llm.q145_interleaved_batches(spark, td).orderBy("global_pos").collect()
    assert [r.global_pos for r in out] == list(range(126))
    # naive reference
    ranked = sorted(out, key=lambda x: (x.r, x.source))
    assert [r.global_pos for r in ranked] == list(range(126))
    # batch 0 (64 docs) holds all three sources; tiny is exhausted early
    b0 = {r.source for r in out if r.batch_id == 0}
    assert b0 == {"big", "mid", "tiny"}
    # the first 3*6 positions alternate through all sources while tiny lasts
    first18 = [r.source for r in out[:18]]
    assert first18.count("tiny") == 6


def test_q171_zorder_narrows_second_dimension(spark, sf_dir):
    """The audit must show the clustering trade: row-major leaves the
    second dimension's in-bucket range near the full domain (no pruning)
    while the Z-curve shrinks it by an order of magnitude, paying a
    bounded widening of the first."""
    from airflow_spotify_etl_spark.plans.relational import (
        q171_zorder_layout_audit,
    )

    out = {
        r.layout: r
        for r in q171_zorder_layout_audit(spark, sf_dir).collect()
    }
    rm, zo = out["rowmajor"], out["zorder"]
    assert zo.avg_suppkey_range < rm.avg_suppkey_range / 4
    assert rm.avg_suppkey_range > 0.8 * 65536  # rowmajor: no 2nd-dim pruning
    assert zo.avg_partkey_range < 0.5 * 65536  # z still prunes dim 1
