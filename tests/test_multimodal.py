"""Multimodal-column tests: binary round-trip, frame sampling, feature
determinism, resize stub plumbing, partition-aware layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_spotify_etl_spark.operators.multimodal import (
    extract_media_meta,
    frame_sample,
    media_features,
    resize_image,
    synthesize_media,
    write_media_partitioned,
)


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(0, 60).select(F.col("id").alias("media_id"))
    return synthesize_media(ids).localCheckpoint(eager=True)


def test_binary_roundtrip_matches_typed_meta(media):
    """pack → binary → parse must reproduce the typed meta struct exactly."""
    parsed = extract_media_meta(media)
    joined = media.select("media_id", "kind", "meta").join(parsed, "media_id", "inner")
    assert joined.count() == 60
    mismatches = joined.filter(
        (F.col("meta.width") != F.col("width"))
        | (F.col("meta.height") != F.col("height"))
        | (F.col("meta.sample_rate") != F.col("sample_rate"))
        | (F.col("meta.duration_ms") != F.col("duration_ms"))
        | (F.col("meta.n_frames") != F.col("n_frames"))
    )
    assert mismatches.count() == 0


def test_kinds_partition_the_id_space(media):
    counts = dict(
        media.groupBy("kind").count().rdd.map(lambda r: (r["kind"], r["count"])).collect()
    )
    assert counts == {"image": 20, "audio": 20, "video": 20}


def test_frame_sample_is_metadata_only(media):
    frames = frame_sample(media, every_n=4)
    rows = frames.filter(F.col("media_id") == 2).collect()  # video, n_frames=12
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    # No binary column in the plan's output — the blob never moves.
    assert "content" not in frames.columns


def test_features_are_deterministic_and_fixed_dim(media):
    f1 = media_features(media, dim=8).collect()
    f2 = media_features(media, dim=8).collect()
    m1 = {r.media_id: r.features for r in f1}
    m2 = {r.media_id: r.features for r in f2}
    assert m1 == m2
    assert all(len(v) == 8 for v in m1.values())
    assert all(0.0 <= x < 1.0 for v in m1.values() for x in v)


def test_resize_stub_rewrites_header_only(media):
    resized = resize_image(media, 32, 32)
    out = resized.collect()
    assert len(out) == 20  # images only
    assert all(r.width == 32 and r.height == 32 for r in out)
    # Round-trip the resized binary: header now carries the new dims.
    meta = extract_media_meta(resized.select("media_id", "content"))
    assert meta.filter((F.col("width") != 32) | (F.col("height") != 32)).count() == 0


def test_partitioned_layout_prunes_by_kind(spark, media, tmp_path):
    path = str(tmp_path / "media")
    write_media_partitioned(media, path)
    back = spark.read.parquet(path)
    assert back.count() == 60
    # Partition pruning: reading one kind touches only its directory.
    videos = back.filter(F.col("kind") == "video")
    assert videos.count() == 20
    plan = videos._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_binary_dedup_collapses_retagged_copies(spark):
    """Two blobs with identical payload but different typed headers are
    the same asset under skip_header=True (the re-encoded/re-tagged copy
    case) and different under skip_header=False; distinct payloads never
    collapse."""
    from airflow_spotify_etl_spark.operators.multimodal import (
        _HDR_LEN,
        binary_dedup,
    )

    payload_a = bytes(range(40))
    payload_b = bytes(range(1, 41))
    hdr1 = b"SPKM" + bytes(_HDR_LEN - 4)
    hdr2 = b"SPKM" + bytes([7] * (_HDR_LEN - 4))
    rows = [
        (1, hdr1 + payload_a),
        (2, hdr2 + payload_a),   # re-tagged copy of the same bytes
        (3, hdr1 + payload_b),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")

    by_payload = binary_dedup(media).collect()
    assert sorted((r.n_copies, r.keeper_id) for r in by_payload) == [
        (1, 3),
        (2, 1),
    ]
    whole_blob = binary_dedup(media, skip_header=False).collect()
    assert sorted(r.n_copies for r in whole_blob) == [1, 1, 1]


def test_binary_block_pairs_finds_appended_copies_only(spark):
    """An asset with bytes appended pairs with its original at high
    Jaccard; unrelated assets share no blocks; exact dedup (q110 tier)
    would have missed the tampered copy entirely."""
    from airflow_spotify_etl_spark.operators.multimodal import (
        binary_block_pairs,
        binary_dedup,
        synthesize_media,
    )

    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    media = synthesize_media(ids).select("media_id", "content")
    tampered = media.filter(F.col("media_id") == 3).select(
        (F.col("media_id") + 500).alias("media_id"),
        F.concat("content", F.unhex(F.lit("00112233445566778899aabbccddeeff"))).alias(
            "content"
        ),
    )
    allm = media.unionByName(tampered)
    pairs = binary_block_pairs(allm).collect()
    assert {(r.asset_a, r.asset_b) for r in pairs} == {(3, 503)}
    assert all(r.jaccard >= 0.45 for r in pairs)
    # exact tier is blind to it: every content_key has exactly one copy
    exact = binary_dedup(allm, id_col="media_id").collect()
    assert all(r.n_copies == 1 for r in exact)


def test_cdc_pairs_survive_insertion_where_fixed_blocks_fail(spark):
    """4 bytes INSERTED mid-payload: content-defined chunking still
    pairs the variant with its original (boundaries re-align after the
    edit), while fixed-offset blocking finds nothing — the limitation
    q132's docstring documents, closed by this tier."""
    from airflow_spotify_etl_spark.operators.multimodal import (
        _HDR_LEN,
        binary_block_pairs,
        binary_cdc_pairs,
        synthesize_media,
    )

    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    media = synthesize_media(ids).select("media_id", "content")
    ins = media.filter(F.col("media_id") == 3).select(
        (F.col("media_id") + 500).alias("media_id"),
        F.concat(
            F.expr(f"substring(content, 1, {_HDR_LEN} + 12)"),
            F.unhex(F.lit("deadbeef")),
            F.expr(f"substring(content, {_HDR_LEN} + 13, 2147483647)"),
        ).alias("content"),
    )
    allm = media.unionByName(ins)
    cdc = {(r.asset_a, r.asset_b) for r in binary_cdc_pairs(allm).collect()}
    assert (3, 503) in cdc
    fixed = binary_block_pairs(allm, threshold=0.3).collect()
    assert fixed == []
