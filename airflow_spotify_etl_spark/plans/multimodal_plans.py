"""Oracle-checked queries for the multimodal layer (operators/multimodal.py).

The fake SPKM container's header fields are closed-form functions of
media_id, so the SQL oracle recomputes what the binary ROUND-TRIP
(pack → Arrow batch → parse) must produce — a genuine end-to-end check of
the mapInPandas plumbing, not just of the arithmetic.

media ids come from the ``documents`` table (stable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    extract_media_meta,
    frame_sample,
    media_features,
    synthesize_media,
)
from ..sources.files import load_table

__all__ = ["QUERIES", "ORACLES"]


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return synthesize_media(ids)


def q34_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → typed-metadata extraction (decode-side header parse) over
    the opaque content column; the oracle recomputes the closed forms."""
    return extract_media_meta(_media(spark, sf_dir)).orderBy("media_id")


_Q34_SQL = """
SELECT doc_id AS media_id,
       (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
       CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id % 8) * 16 ELSE 0 END AS width,
       CASE WHEN doc_id % 3 = 0 THEN 48 + (doc_id % 6) * 16 ELSE 0 END AS height,
       CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 4) * 8000 ELSE 0 END AS sample_rate,
       CASE WHEN doc_id % 3 = 1 THEN 1000 + (doc_id % 60) * 500
            WHEN doc_id % 3 = 2 THEN 2000 + (doc_id % 30) * 1000
            ELSE 0 END AS duration_ms,
       CASE WHEN doc_id % 3 = 2 THEN 10 + doc_id % 20 ELSE 0 END AS n_frames,
       32 + doc_id % 64 AS payload_len
FROM documents
ORDER BY media_id
"""


def q35_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling plan for videos — metadata-only
    sequence-explode (the blob never moves)."""
    return frame_sample(_media(spark, sf_dir), every_n=4).orderBy(
        "media_id", "frame_idx"
    )


_Q35_SQL = """
SELECT doc_id AS media_id,
       10 + doc_id % 20 AS n_frames,
       unnest(range(0, 10 + doc_id % 20, 4)) AS frame_idx
FROM documents
WHERE doc_id % 3 = 2
ORDER BY media_id, frame_idx
"""


def q36_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed feature vectors. VALUE-checked: the stub hashes
    hex strings (DuckDB's sha256 is VARCHAR-only), so the oracle recomputes
    the payload chain, the feature digest, the little-endian u32 → float32
    quantization, and the fold sum — an end-to-end check that the binary
    payload generated in mapInPandas round-trips through Arrow byte-exact.
    Demonstrates the array<float> feature column feeding the ANN tier
    (operators/similarity.py)."""
    feats = media_features(_media(spark, sf_dir), dim=8)
    return feats.select(
        "media_id",
        F.round(
            F.aggregate(
                F.transform("features", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("feat_sum"),
    ).orderBy("media_id")


def _q36_sql() -> str:
    """DuckDB twin of q36: payload hex chain (≤3 digests cover the max
    95-byte payload), feature digest over the hex string, then each float_i
    = little-endian u32 of digest bytes [4i, 4i+4) / 2^32 cast through
    REAL (float32) exactly as the Arrow array<float> column stores it, and
    the fold sum accumulated in array order like Spark's F.aggregate."""

    def byte(j: int) -> str:  # 0-based byte j of the digest, as BIGINT
        return f"('0x' || substr(dhex, {2 * j + 1}, 2))::BIGINT"

    acc = "0.0"
    for i in range(8):
        le = " + ".join(f"{byte(4 * i + k)} * {256 ** k}" for k in range(4))
        acc = f"({acc} + CAST(CAST(({le}) / 4294967296.0 AS REAL) AS DOUBLE))"
    return f"""
WITH chain AS (
  SELECT doc_id AS media_id,
         2 * (32 + doc_id % 64) AS hexlen,
         sha256(doc_id::VARCHAR) AS d1
  FROM documents
), digest AS (
  SELECT media_id,
         sha256(substr(d1 || sha256(d1) || sha256(sha256(d1)), 1, hexlen))
           AS dhex
  FROM chain
)
SELECT media_id, round({acc}, 4) AS feat_sum
FROM digest
ORDER BY media_id
"""


def q110_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup over opaque binary content (operators/multimodal.
    binary_dedup): docs map onto 50 distinct media assets (media_id =
    doc_id % 50) so every asset has ~n/50 byte-identical copies; dedup
    groups by the payload digest and reports copies + keeper. The oracle
    recomputes the payload from the sha-chain (the q36 discipline) and
    replays the digest — certifying that the binary produced through the
    Arrow seam round-trips byte-exact into the dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select((F.col("doc_id") % 50).alias("media_id")).distinct()
    media = synthesize_media(ids)
    copies = docs.select(
        "doc_id", (F.col("doc_id") % 50).alias("media_id")
    ).join(media.select("media_id", "content"), "media_id")
    from ..operators.multimodal import binary_dedup

    return (
        binary_dedup(copies, content_col="content", id_col="doc_id")
        .withColumnRenamed("keeper_id", "keeper_doc_id")
        .orderBy("content_key")
    )


_Q110_SQL = """
WITH m AS (
  SELECT DISTINCT doc_id % 50 AS media_id FROM documents
), chain AS (
  SELECT media_id, 2 * (32 + media_id % 64) AS hexlen,
         sha256(media_id::VARCHAR) AS d1
  FROM m
), pay AS (
  SELECT media_id,
         substr(d1 || sha256(d1) || sha256(sha256(d1)), 1, hexlen) AS phex
  FROM chain
), copies AS (
  SELECT d.doc_id, p.phex
  FROM documents d JOIN pay p ON p.media_id = d.doc_id % 50
)
SELECT md5(phex) AS content_key,
       count(*) AS n_copies,
       min(doc_id) AS keeper_doc_id
FROM copies
GROUP BY 1
ORDER BY content_key
"""


def q132_binary_block_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy binary near-dup pairs (operators/multimodal.
    binary_block_pairs): 50 synthesized assets plus, for media_id < 10,
    a TAMPERED variant (id 1000+media_id) whose payload has 16
    sha-derived bytes APPENDED — the re-encoded-tail case exact dedup
    (q110) cannot see. Block-hash Jaccard pairs each variant with its
    original (shared prefix blocks dominate) and nothing else; the
    oracle replays the payload chains, the append, the 8-byte blocking,
    and the capped candidate pipeline in SQL."""
    from ..operators.multimodal import binary_block_pairs

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select((F.col("doc_id") % 50).alias("media_id")).distinct()
    media = synthesize_media(ids).select("media_id", "content")
    extra = F.unhex(
        F.substring(
            F.sha2(F.concat(F.lit("x"), F.col("media_id").cast("string")), 256),
            1,
            32,
        )
    )
    variants = (
        media.filter(F.col("media_id") < 10)
        .select(
            (F.col("media_id") + 1000).alias("media_id"),
            F.concat(F.col("content"), extra).alias("content"),
        )
    )
    allm = media.unionByName(variants)
    return binary_block_pairs(allm).orderBy("asset_a", "asset_b")


_Q132_SQL = """
WITH m AS (
  SELECT DISTINCT doc_id % 50 AS media_id FROM documents
), chain AS (
  SELECT media_id, 2 * (32 + media_id % 64) AS hexlen,
         sha256(media_id::VARCHAR) AS d1
  FROM m
), pay AS (
  SELECT media_id,
         substr(d1 || sha256(d1) || sha256(sha256(d1)), 1, hexlen) AS phex
  FROM chain
), variants AS (
  SELECT media_id + 1000 AS media_id,
         phex || substr(sha256('x' || media_id::VARCHAR), 1, 32) AS phex
  FROM pay WHERE media_id < 10
), allm AS (
  SELECT media_id, phex FROM pay
  UNION ALL SELECT media_id, phex FROM variants
), blocks AS (
  SELECT DISTINCT media_id,
         md5(substr(phex, i * 16 + 1, 16)) AS bh
  FROM (
    SELECT media_id, phex,
           unnest(range(0, CAST(ceil(len(phex) / 16.0) AS BIGINT))) AS i
    FROM allm
  )
), sizes AS (
  SELECT media_id, count(*) AS nb FROM blocks GROUP BY media_id
), capped AS (
  SELECT bh FROM blocks GROUP BY bh HAVING count(*) BETWEEN 2 AND 1000
), inter AS (
  SELECT a.media_id AS asset_a, b.media_id AS asset_b, count(*) AS inter
  FROM blocks a
  JOIN blocks b ON b.bh = a.bh AND a.media_id < b.media_id
  WHERE a.bh IN (SELECT bh FROM capped)
  GROUP BY 1, 2
)
SELECT asset_a, asset_b, inter,
       sa.nb AS blocks_a, sb.nb AS blocks_b,
       round(inter / CAST(sa.nb + sb.nb - inter AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.media_id = asset_a
JOIN sizes sb ON sb.media_id = asset_b
WHERE round(inter / CAST(sa.nb + sb.nb - inter AS DOUBLE), 4) >= 0.45
ORDER BY asset_a, asset_b
"""


def q133_binary_cdc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-robust binary near-dup (operators/multimodal.
    binary_cdc_pairs): the same 50 assets, but the tampered variants
    (media_id < 10 → id 1000+) have 4 bytes INSERTED mid-payload — the
    edit that shifts every later fixed-offset block and blinds q132.
    Content-defined boundaries re-align after the insertion, so the
    variants still pair with their originals. The oracle replays the
    rolling boundary rule, cumulative block assignment, block digests,
    and the capped Jaccard tail in SQL."""
    from ..operators.multimodal import _HDR_LEN, binary_cdc_pairs

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select((F.col("doc_id") % 50).alias("media_id")).distinct()
    media = synthesize_media(ids).select("media_id", "content")
    variants = media.filter(F.col("media_id") < 10).select(
        (F.col("media_id") + 1000).alias("media_id"),
        F.concat(
            F.expr(f"substring(content, 1, {_HDR_LEN} + 12)"),
            F.unhex(F.lit("deadbeef")),
            F.expr(f"substring(content, {_HDR_LEN} + 13, 2147483647)"),
        ).alias("content"),
    )
    allm = media.unionByName(variants)
    return binary_cdc_pairs(allm).orderBy("asset_a", "asset_b")


_Q133_SQL = """
WITH m AS (
  SELECT DISTINCT doc_id % 50 AS media_id FROM documents
), chain AS (
  SELECT media_id, 2 * (32 + media_id % 64) AS hexlen,
         sha256(media_id::VARCHAR) AS d1
  FROM m
), pay AS (
  SELECT media_id,
         substr(d1 || sha256(d1) || sha256(sha256(d1)), 1, hexlen) AS phex
  FROM chain
), variants AS (
  SELECT media_id + 1000 AS media_id,
         substr(phex, 1, 24) || 'deadbeef' || substr(phex, 25) AS phex
  FROM pay WHERE media_id < 10
), allm AS (
  SELECT media_id, phex FROM pay
  UNION ALL SELECT media_id, phex FROM variants
), pos AS (
  SELECT media_id, phex,
         CAST(unnest(range(1, len(phex) // 2 + 1)) AS INTEGER) AS p
  FROM allm
), flags AS (
  SELECT media_id, phex, p,
         CASE WHEN p >= 4
                AND ('0x' || substr(md5(substr(phex, 2 * p - 7, 8)), 1, 8))
                      ::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS b
  FROM pos
), assigned AS (
  SELECT media_id, phex, p,
         coalesce(sum(b) OVER (PARTITION BY media_id ORDER BY p
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS blk
  FROM flags
), spans AS (
  SELECT media_id, blk, min(p) AS a, max(p) AS z, min(phex) AS phex
  FROM assigned GROUP BY media_id, blk
), blocks AS (
  SELECT DISTINCT media_id,
         md5(substr(phex, 2 * (a - 1) + 1, 2 * (z - a + 1))) AS bh
  FROM spans
), sizes AS (
  SELECT media_id, count(*) AS nb FROM blocks GROUP BY media_id
), capped AS (
  SELECT bh FROM blocks GROUP BY bh HAVING count(*) BETWEEN 2 AND 1000
), inter AS (
  SELECT a.media_id AS asset_a, b.media_id AS asset_b, count(*) AS inter
  FROM blocks a
  JOIN blocks b ON b.bh = a.bh AND a.media_id < b.media_id
  WHERE a.bh IN (SELECT bh FROM capped)
  GROUP BY 1, 2
)
SELECT asset_a, asset_b, inter,
       sa.nb AS blocks_a, sb.nb AS blocks_b,
       round(inter / CAST(sa.nb + sb.nb - inter AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.media_id = asset_a
JOIN sizes sb ON sb.media_id = asset_b
WHERE round(inter / CAST(sa.nb + sb.nb - inter AS DOUBLE), 4) >= 0.3
ORDER BY asset_a, asset_b
"""


QUERIES = {
    "q34_media_meta": q34_media_meta,
    "q35_frame_sample": q35_frame_sample,
    "q36_media_features": q36_media_features,
    "q110_binary_dedup": q110_binary_dedup,
    "q132_binary_block_pairs": q132_binary_block_pairs,
    "q133_binary_cdc_pairs": q133_binary_cdc_pairs,
}

ORACLES = {
    "q34_media_meta": _Q34_SQL,
    "q35_frame_sample": _Q35_SQL,
    "q36_media_features": _q36_sql(),
    "q110_binary_dedup": _Q110_SQL,
    "q132_binary_block_pairs": _Q132_SQL,
    "q133_binary_cdc_pairs": _Q133_SQL,
}
