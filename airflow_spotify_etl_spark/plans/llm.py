"""LLM-training-data pipeline queries (SURVEY.md §7 Phase 3 / north star).

Text analysis, dedup, and embedding similarity over the ``documents`` and
``embeddings`` tables. Everything here is built-in Catalyst expressions
(higher-order array functions, regexp, md5) — no Python UDFs in any
oracle-checked path; approximate/sketch variants live in operators/dedup.py.
MinHash-LSH (q25) is fully value-checked — its md5-slice hash family is
engine-portable (see _q25_sql); SimHash/hyperplane-LSH stay rows-only (their
xxhash64 / float-dot hash families are not).

Scale notes:
- Text metrics are narrow per-row projections: no shuffle, fully
  whole-stage-codegen, linear scan at 100 TB.
- Exact dedup groups on md5(text): one shuffle on a well-distributed hash
  key — no skew by construction.
- Brute-force cosine top-k broadcasts the (small) query set against the
  corpus: no shuffle of the big side; per-partition top-k then a tiny final
  merge (row_number over ≤ k·n_queries rows). The LSH/IVF scale path is in
  operators/similarity.py.

Pinning convention — persist() vs localCheckpoint(eager=True) (ADVICE r6):
``localCheckpoint`` TRUNCATES lineage, so a lost executor/block fails the
job instead of recomputing, and ``eager=True`` materializes even if the
result is never consumed. The swap is therefore gated on ALL of: (1) the
pinned relation is a SMALL, bounded intermediate (post-dedup pair lists,
top-k slices, 1-row scalars — never a corpus-sized relation); (2) it is
fanned into 2+ downstream branches within a SINGLE plan invocation (the
re-materialization cost per invocation is paid once and saves >= 2 upstream
replays); and (3) it is NOT a multi-round iterative core — those REUSE one
cache entry across invocations via persist() (CacheManager keys on the
logical plan), and swapping them to localCheckpoint regressed
pagerank-family queries 2x before being reverted (BASELINE.md round-6
note, q266/q57/q151). Every localCheckpoint site in this file and
relational.py meets (1)-(3); iterative cores (graph.py rounds, PCA power
iteration) use persist().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.files import load_table

__all__ = ["QUERIES", "ORACLES"]

# Tiny deterministic stopword list used by both engines.
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def q18_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text metrics (north star: quality scoring —
    length / punctuation / stopword ratios). Narrow projection, no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        n_words.alias("n_words"),
        F.round(n_alpha / n_words, 4).alias("avg_word_len"),
        F.round(n_stop / n_words, 4).alias("stopword_ratio"),
        F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * (1 - n_stop / n_words), 4
        ).alias("quality_score"),
    ).orderBy("doc_id")


_Q18_SQL = f"""
WITH base AS (
  SELECT doc_id, length(text) AS len_chars,
         len(string_split(text, ' ')) AS n_words,
         length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alpha,
         len(list_filter(string_split(text, ' '),
             x -> list_contains({_STOPWORDS!r}, x))) AS n_stop
  FROM documents
)
SELECT doc_id, len_chars, n_words,
       round(n_alpha / n_words, 4)  AS avg_word_len,
       round(n_stop / n_words, 4)   AS stopword_ratio,
       round(least(n_words / 100.0, 1.0) * (1 - n_stop / n_words), 4) AS quality_score
FROM base
ORDER BY doc_id
"""


def q19_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (north star): whitespace tokens + a BPE-ish regex
    tokenizer (letter runs / digit runs / single punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    bpe_pattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), "\\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(bpe_pattern), 0)).alias(
            "bpe_tokens"
        ),
        F.size(F.array_distinct(F.split(F.lower("text"), "\\s+"))).alias(
            "distinct_words"
        ),
    ).orderBy("doc_id")


_Q19_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(text, '\s+'))    AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
       len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS distinct_words
FROM documents
ORDER BY doc_id
"""


def q20_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language/source profile (grouped agg over document metadata);
    the heuristic n-gram language IDENTIFIER (non-SQL-portable) is in
    operators/text.py with unit tests."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            # Unrounded exact division of an exact integer sum: identical
            # doubles in every engine. round(avg, 2) is the trap — Spark
            # rounds the shortest decimal repr, DuckDB the binary value.
            (F.sum("n_chars") / F.count("n_chars")).alias("avg_chars"),
            # total as exact integer — dividing an int sum by 1000 then
            # rounding lands exactly on .xx5 boundaries where Spark
            # (decimal-string HALF_UP) and DuckDB (binary-double) disagree.
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


_Q20_SQL = """
SELECT lang,
       count(*)                       AS n_docs,
       count(DISTINCT source)         AS n_sources,
       CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars,
       CAST(sum(n_chars) AS BIGINT)   AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def q21_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication by content hash (north star): md5-groupBy, keep
    the minimum doc_id per group. The hash key is uniformly distributed →
    shuffle is skew-free at any scale. Routed through the operator
    (operators/dedup.exact_dedup) so the oracle checks the operator itself,
    not a plan-local re-implementation."""
    from ..operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        "text_hash", "n_copies", F.col("keeper").alias("keeper_doc_id")
    ).orderBy("keeper_doc_id")


_Q21_SQL = """
SELECT md5(text) AS text_hash,
       count(*)  AS n_copies,
       min(doc_id) AS keeper_doc_id
FROM documents
GROUP BY md5(text)
ORDER BY keeper_doc_id
"""


def q22_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors (north star similarity-search
    baseline): query set = vec_id < 5, corpus = the rest. The query side is
    broadcast; dot products run via higher-order array functions in the JVM
    (zip_with + aggregate), entirely shuffle-free for the corpus scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    to_dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), to_dbl("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select(
        "vec_id", "label", to_dbl("embedding").alias("v")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    paired = corpus.join(F.broadcast(queries))
    scored = paired.withColumn(
        "cos",
        dot(F.col("qv"), F.col("v"))
        / (F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v")))),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "rank", "vec_id", F.round("cos", 4).alias("cosine_sim"), "label"
        )
        .orderBy("query_id", "rank")
    )


_Q22_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), s AS (
  SELECT query_id, vec_id, label,
         list_dot_product(qv, v) /
           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
  FROM c CROSS JOIN q
)
SELECT query_id, rank, vec_id, cosine_sim, label FROM (
  SELECT query_id, vec_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
         round(cos, 4) AS cosine_sim
  FROM s
)
WHERE rank <= 5
ORDER BY query_id, rank
"""


def q23_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (north star): canonicalize whitespace + case,
    then content-hash. Same normalization in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.lower(F.regexp_replace(F.col("text"), "\\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.sha2(canon, 256).alias("fingerprint_sha256"),
        F.length(canon).alias("canon_len"),
    ).orderBy("doc_id")


_Q23_SQL = r"""
SELECT doc_id,
       md5(lower(regexp_replace(text, '\s+', ' ', 'g')))        AS fingerprint,
       sha256(lower(regexp_replace(text, '\s+', ' ', 'g')))     AS fingerprint_sha256,
       length(lower(regexp_replace(text, '\s+', ' ', 'g')))     AS canon_len
FROM documents
ORDER BY doc_id
"""


def q24_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (north star dedup tier 2) —
    shingle self-join with the hot-bucket cap ON (a boilerplate shingle
    shared by 10^5 docs would otherwise make the self-join quadratic in that
    bucket at 100 TB); the oracle applies the identical cap."""
    from ..operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000).orderBy(
        "doc_a", "doc_b"
    )


_Q24_SQL = """
WITH sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), sh AS (
  -- hot-bucket cap mirrored from ngram_jaccard_pairs(max_bucket=1000)
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), sizes AS (
  -- pre-cap sizes: the cap bounds candidate generation only; Jaccard
  -- denominators stay the doc's true distinct-shingle count
  SELECT doc_id, count(*) AS n_shingles FROM sh_raw GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.n_shingles AS na, sb.n_shingles AS nb,
       round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) >= 0.5
ORDER BY doc_a, doc_b
"""


def q25_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (dedup tier 3, THE 100 TB scale path).

    VALUE-checked: the shingle hash is the engine-portable md5 slice
    (operators/dedup._h32), so the oracle recomputes the full pipeline —
    signatures, banding, capped buckets, exact-Jaccard verify — in DuckDB
    (_q25_sql). Band-bucket membership is compared by sig-tuple equality
    there, which is output-equivalent to Spark's xxhash64 band key: a hash
    collision could only ADD a candidate pair, and any pair either shares
    no capped shingle (dropped by the verify inner join in both engines) or
    gets the identical exact-Jaccard filter. Recall vs the exact tier is
    asserted in tests/test_dedup.py."""
    from ..operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.5).orderBy("doc_a", "doc_b")


def q81_minhash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup ingest (operators/dedup.minhash_lsh_pairs_delta):
    docs ≥ 400 arrive as a new batch and are near-dup-checked against the
    stored corpus WITHOUT a corpus self-join — delta bands probe the
    all-bands relation, candidates verify by exact Jaccard. The oracle is
    the full q25 pipeline filtered to pairs touching the delta, so a green
    hash proves the batch path finds exactly the pairs a full-corpus rerun
    would."""
    from ..operators.dedup import minhash_lsh_pairs_delta

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    return minhash_lsh_pairs_delta(corpus, delta, threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


def _q81_sql() -> str:
    return f"""
SELECT * FROM (
{_q25_sql()}
) q25_full
WHERE doc_a >= 400 OR doc_b >= 400
ORDER BY doc_a, doc_b
"""


def _q25_sql(r: int = 4) -> str:
    """DuckDB twin of minhash_lsh_pairs(threshold=0.5): same params (seeded
    from operators.dedup._hash_params so the two can never drift), same
    modulus, same band/bucket caps, same verify arithmetic as _Q24_SQL.
    ``r`` is rows-per-band (bands = 64 // r) — default matches q25's
    bands=16; q170's band sweep reuses the builder at r in {8, 4, 2}."""
    from ..operators.dedup import _MERSENNE, _hash_params

    params = ",\n    ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_hash_params(64))
    )
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM w
), hs AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh_raw
), params(i, a, b) AS (VALUES
    {params}
), sig AS (
  SELECT doc_id, p.i, min((p.a * h + p.b) % {_MERSENNE}) AS s
  FROM hs CROSS JOIN params p GROUP BY doc_id, p.i
), banded AS (
  -- band key = the r sig values themselves; tuple equality is
  -- output-equivalent to Spark's xxhash64 of the same tuple
  SELECT doc_id, i // {r} AS band, string_agg(s::VARCHAR, ',' ORDER BY i) AS bh
  FROM sig GROUP BY doc_id, i // {r}
), ok AS (
  SELECT band, bh FROM banded GROUP BY band, bh
  HAVING count(*) BETWEEN 2 AND 1000
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
), sh AS (
  -- hot-bucket cap mirrored from _sized_shingles(max_bucket=1000)
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh_raw GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       sa.n_shingles AS na, sb.n_shingles AS nb,
       round(i.inter / (sa.n_shingles + sb.n_shingles - i.inter), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.inter / (sa.n_shingles + sb.n_shingles - i.inter), 4) >= 0.5
ORDER BY i.doc_a, i.doc_b
"""


_Q25_SQL = _q25_sql()


def q26_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (dedup tier 4). VALUE-checked: the token hash
    is two portable 32-bit md5 slices (see simhash_signatures), so the
    oracle recomputes signatures, block buckets, and Hamming distances
    bit-for-bit (_Q26_SQL). Block-bucket membership compares the 16 sign
    bits directly — equality-equivalent to Spark's packed 16-bit block
    values."""
    from ..operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3).orderBy("doc_a", "doc_b")


_Q26_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), th AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi
  FROM toks
), sums AS (
  -- per (doc, bit j): sum of +-1 over token-hash bit j
  SELECT doc_id, j.j AS j,
         sum(CASE WHEN ((CASE WHEN j.j < 32 THEN lo ELSE hi END) >> (j.j % 32)::INT) & 1 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
  GROUP BY doc_id, j.j
), sig AS (
  -- the two 32-bit halves of the simhash, for the bit_count verify
  SELECT doc_id,
         CAST(sum(CASE WHEN j < 32 AND s > 0 THEN 1::BIGINT << j::INT ELSE 0 END) AS BIGINT) AS lo_sig,
         CAST(sum(CASE WHEN j >= 32 AND s > 0 THEN 1::BIGINT << (j - 32)::INT ELSE 0 END) AS BIGINT) AS hi_sig
  FROM sums GROUP BY doc_id
), blocked AS (
  -- pigeonhole blocks = 16 consecutive sign bits; bucket key is the bit
  -- string (equality-equivalent to Spark's packed 16-bit value)
  SELECT doc_id, j // 16 AS blk,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bv
  FROM sums GROUP BY doc_id, j // 16
), ok AS (
  -- max_block_bucket=1000 cap + singleton prune mirrored from simhash_pairs
  SELECT blk, bv FROM blocked GROUP BY blk, bv
  HAVING count(*) BETWEEN 2 AND 1000
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a
  JOIN ok ON ok.blk = a.blk AND ok.bv = a.bv
  JOIN blocked b ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.lo_sig, sb.lo_sig))
            + bit_count(xor(sa.hi_sig, sb.hi_sig)) AS INT) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.lo_sig, sb.lo_sig))
      + bit_count(xor(sa.hi_sig, sb.hi_sig)) <= 3
ORDER BY doc_a, doc_b
"""


def q27_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED IVF (driver-side Lloyd centroids) run at nprobe = nlist —
    the FAISS probe-all sanity configuration. Probing every cell makes the
    result exactly the brute-force top-k REGARDLESS of what the trained
    centroids are, so the fixed SQL oracle (exact scan, same tie-break)
    value-checks the whole trained pipeline: a bug in Lloyd's cell-id
    space, the assignment argmax (dropped or double-assigned vectors), the
    probe union, or the top-k merge would all break the hash. The
    selective-probe path (nprobe < nlist, where recall is approximate by
    design) is oracle-checked under hash-seeded centroids by q56 and
    recall-tested for trained centroids in tests/test_similarity.py."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return ivf_topk(corpus, queries, k=5, nlist=16, nprobe=16).orderBy(
        "query_id", "rank"
    )


# Probe-all IVF ≡ exact scan: brute-force cosine top-k with ivf_search's
# exact tie-break (cos DESC, vec_id ASC) and output rounding. Same float
# machinery the q22 oracle already hash-matches (sequential-fold dot
# products agree bit-for-bit between Spark's aggregate() and DuckDB's
# list_dot_product).
_Q27_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), s AS (
  SELECT query_id, vec_id,
         list_dot_product(qv, v) /
           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
  FROM c CROSS JOIN q
)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
         round(cos, 4) AS cosine_sim
  FROM s
)
WHERE rank <= 5
ORDER BY query_id, rank
"""


def q28_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH
    (north star near-dup tier for vectors). VALUE-checked: the plane matrix
    is a seeded constant embedded verbatim in the oracle (_q28_sql), which
    recomputes sketch bits, band buckets, and the exact-cosine verify with
    DuckDB's list_dot_product — the same float machinery the q22 oracle
    already hash-matches against Spark's array fold."""
    from ..operators.similarity import cosine_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    # The synthetic corpus's max off-diagonal cosine is ~0.51; threshold 0.45
    # exercises the candidate+verify path on real pairs.
    return cosine_pairs_lsh(emb, threshold=0.45).orderBy("vec_a", "vec_b")


def _lsh_pair_ctes() -> str:
    """CTE chain computing cosine_pairs_lsh(threshold=0.45)'s verified
    pairs, ending in a ``pairs(vec_a, vec_b, cosine_sim)`` CTE — shared by
    the q28 oracle (pairs as the answer) and the q55 oracle (pairs as the
    edge list of the dedup-cluster closure). The SAME seeded plane matrix
    (np.random.RandomState(42), mirroring operators/similarity.py), repr'd
    into literals — shortest-round-trip strings parse to identical doubles
    in both engines."""
    import numpy as np

    rng = np.random.RandomState(42)
    planes = rng.randn(16, 64).tolist()
    plane_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in p)}]::DOUBLE[])"
        for i, p in enumerate(planes)
    )
    cos = (
        "list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e))"
        " * sqrt(list_dot_product(vb.e, vb.e)))"
    )
    return f"""v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), planes(i, p) AS (VALUES
    {plane_rows}
), bits AS (
  -- sketch bit per plane; 4 consecutive bits per band (n_planes=16, bands=4)
  SELECT vec_id, i // 4 AS band,
         string_agg(CASE WHEN list_dot_product(e, p) > 0 THEN '1' ELSE '0' END,
                    '' ORDER BY i) AS bh
  FROM v CROSS JOIN planes
  GROUP BY vec_id, i // 4
), ok AS (
  -- max_band_bucket=1000 cap + singleton prune mirrored from cosine_pairs_lsh
  SELECT band, bh FROM bits GROUP BY band, bh HAVING count(*) BETWEEN 2 AND 1000
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bits a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bits b ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
), pairs AS (
  SELECT c.vec_a, c.vec_b, round({cos}, 4) AS cosine_sim
  FROM cand c
  JOIN v va ON va.vec_id = c.vec_a
  JOIN v vb ON vb.vec_id = c.vec_b
  WHERE round({cos}, 4) >= 0.45
)"""


def _q28_sql() -> str:
    return f"""
WITH {_lsh_pair_ctes()}
SELECT vec_a, vec_b, cosine_sim FROM pairs
ORDER BY vec_a, vec_b
"""


def q29_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial-NB language ID (north star text analysis): fit per-lang
    token profiles on the labeled corpus, predict per doc. VALUE-checked:
    both NB phases are relational (counts → log weights → matched-sum
    argmax), so the oracle replays them in SQL (_Q29_SQL); the score is
    rounded to 4 decimals in both engines — the matched-weight sum is the
    one place aggregation ORDER could perturb the last float bits.
    Accuracy-vs-labels asserted in tests/test_text.py."""
    from ..operators.text import fit_lang_profiles, predict_lang

    docs = load_table(spark, sf_dir, "documents")
    profiles = fit_lang_profiles(docs)
    out = predict_lang(docs, profiles)
    return out.select(
        "doc_id", "pred_lang", F.round("score", 4).alias("score"), "n_matched"
    ).orderBy("doc_id")


_Q29_SQL = r"""
WITH grams AS (
  SELECT * FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), counts AS (
  SELECT lang, tok, count(*) AS cnt FROM grams GROUP BY lang, tok
), totals AS (
  SELECT lang, sum(cnt) AS total FROM counts GROUP BY lang
), profiles AS (
  -- top_m=500 tokens per lang, weight = ln P(tok|lang)
  SELECT c.lang, c.tok, ln(c.cnt / t.total) AS weight
  FROM (
    SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rn
    FROM counts
  ) c JOIN totals t ON t.lang = c.lang
  WHERE c.rn <= 500
), doc_sizes AS (
  SELECT d.doc_id, coalesce(g.n, 0) AS n_tokens
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id) g
    USING (doc_id)
), scored AS (
  SELECT g.doc_id, p.lang,
         sum(p.weight) AS matched_weight, count(*) AS n_matched
  FROM grams g JOIN profiles p ON p.tok = g.tok
  GROUP BY g.doc_id, p.lang
), best AS (
  SELECT doc_id, lang AS pred_lang, score, n_matched FROM (
    SELECT s.doc_id, s.lang, s.n_matched,
           s.matched_weight + (ds.n_tokens - s.n_matched) * (-18.0) AS score,
           row_number() OVER (
             PARTITION BY s.doc_id
             ORDER BY s.matched_weight + (ds.n_tokens - s.n_matched) * (-18.0) DESC,
                      s.lang
           ) AS rn
    FROM scored s JOIN doc_sizes ds USING (doc_id)
  ) WHERE rn = 1
)
SELECT ds.doc_id, b.pred_lang,
       round(coalesce(b.score, ds.n_tokens * (-18.0)), 4) AS score,
       coalesce(b.n_matched, 0) AS n_matched
FROM doc_sizes ds LEFT JOIN best b USING (doc_id)
ORDER BY ds.doc_id
"""


def q42_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (dedup tier 5): exact-Jaccard pairs (the q24
    edges) resolved into connected components by iterative min-label
    propagation, then per-cluster keeper + size — the actual dedup
    decision a corpus build executes. Oracle: DuckDB recursive-CTE
    transitive closure over the identical edge list."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("component")
    )


# CTE chain ending in comp(doc_id, component) — shared by the q42 oracle
# (clusters as the answer) and the q84 oracle (clusters joined against the
# domain split for the leakage audit).
_Q42_CTES = """sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), sh AS (
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), sizes AS (
  -- pre-cap sizes: the cap bounds candidate generation only; Jaccard
  -- denominators stay the doc's true distinct-shingle count
  SELECT doc_id, count(*) AS n_shingles FROM sh_raw GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) >= 0.5
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT x.node, e.b FROM reach x JOIN edges e ON x.r = e.a
), comp AS (
  SELECT node AS doc_id, least(node, min(r)) AS component
  FROM reach GROUP BY node
)"""

_Q42_SQL = f"""
WITH RECURSIVE {_Q42_CTES}
SELECT component, count(*) AS cluster_size, min(doc_id) AS keeper_doc_id
FROM comp GROUP BY component ORDER BY component
"""


def q43_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary builder (tokenizer-training input): BPE-ish token
    frequencies + document frequencies, top 200. One explode + one grouped
    aggregate — the shuffle key (token) is capped by the top-K, and the
    count/count-distinct partials combine map-side."""
    docs = load_table(spark, sf_dir, "documents")
    bpe_pattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(bpe_pattern), 0)).alias(
            "token"
        ),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(200)
    )


_Q43_SQL = r"""
SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS token
  FROM documents
)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 200
"""


def q45_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (corpus quality): type-token ratio,
    top-token and top-bigram fractions per doc — the signals that drop
    templated/spam mass before LLM training."""
    from ..operators.text import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs).orderBy("doc_id")


_Q45_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS tok FROM w
), t AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct, max(c) AS top_cnt
  FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
  GROUP BY doc_id
), bi AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bi_cnt
  FROM (
    SELECT doc_id, bigram, count(*) AS c FROM (
      SELECT doc_id,
             unnest([w[i] || ' ' || w[i + 1] for i in range(1, len(w))]) AS bigram
      FROM w
    ) GROUP BY 1, 2
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(t.n_tokens, 0) AS n_tokens,
       round(t.n_distinct / t.n_tokens, 4) AS type_token_ratio,
       round(t.top_cnt / t.n_tokens, 4) AS top_token_frac,
       round(bi.top_bi_cnt / bi.n_bigrams, 4) AS top_bigram_frac
FROM documents d
LEFT JOIN t USING (doc_id)
LEFT JOIN bi USING (doc_id)
ORDER BY doc_id
"""


def q46_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Shannon entropy + 0-1 uniformity score
    (corpus quality: low entropy = templated text)."""
    from ..operators.text import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs).orderBy("doc_id")


_Q46_SQL = r"""
WITH counts AS (
  SELECT doc_id, tok, count(*) AS c FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY 1, 2
), agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_distinct,
         sum(c * ln(c)) AS clnc
  FROM counts GROUP BY doc_id
)
SELECT doc_id,
       round(ln(n) - clnc / n, 4) AS entropy,
       round(CASE WHEN n_distinct > 1
                  THEN (ln(n) - clnc / n) / ln(n_distinct)
                  ELSE 0.0 END, 4) AS entropy_norm
FROM agg
ORDER BY doc_id
"""


# Corpus-mixing rates for q47: down-weight the dominant language, keep the
# rest — the C4/Pile-style re-balancing a 100 TB build runs as its last
# filter stage.
_Q47_RATES = {"en": 0.5, "de": 1.0, "es": 0.25, "fr": 1.0, "zh": 0.1}


def q77_dedup_clusters_pointer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q42's clustering through the POINTER-DOUBLING path
    (connected_components(method='pointer'), log-diameter rounds): the
    same recursive-CTE transitive-closure oracle must hash-match, proving
    the scale algorithm — not just the O(diameter) default — produces the
    exact component labels."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs, method="pointer")
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("component")
    )


def q47_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket corpus mixing (operators/sampling.py):
    per-language keep rates, reproducible on any cluster, zero shuffle."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, _Q47_RATES)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    )


def _q47_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r * 10000)}" for s, r in sorted(_Q47_RATES.items())
    )
    return f"""
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('smp' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000
           AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b
WHERE bucket < CASE lang {cases} ELSE 10000 END
ORDER BY doc_id
"""


def q48_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing plan (operators/packing.py): shard by
    portable hash, running token total per shard, seq/offset assignment."""
    from ..operators.packing import pack_documents

    docs = load_table(spark, sf_dir, "documents")
    return pack_documents(docs, capacity=2048, n_shards=8).orderBy("doc_id")


_Q48_SQL = r"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
           AS n_tokens,
         ('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 8))::BIGINT % 8
           AS shard
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens, shard,
         CAST(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS start
  FROM base
)
SELECT doc_id, n_tokens, shard,
       start // 2048 AS seq,
       start % 2048 AS offset
FROM cum
ORDER BY doc_id
"""


def q49_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score: average log-probability of each doc's
    tokens under the CORPUS unigram distribution — outlier docs (gibberish,
    wrong-language, boilerplate) score far from the bulk and get cut by a
    percentile threshold downstream.

    Shape at 100 TB: the unigram model is one grouped count (skew-free
    token key), broadcast back into a per-doc average — same
    broadcast-model-scan shape as NB lang-ID (q29). Unseen tokens can't
    occur (the model is fit on the same corpus); a held-out variant would
    add the q29 floor term."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "\\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    total = toks.count()
    model = toks.groupBy("tok").agg(
        F.log(F.count("*") / F.lit(float(total))).alias("logp")
    )
    return (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("logp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_Q49_SQL = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), model AS (
  SELECT tok, ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM toks)) AS logp
  FROM toks GROUP BY tok
)
SELECT t.doc_id, count(*) AS n_tokens, round(avg(m.logp), 4) AS avg_logprob
FROM toks t JOIN model m USING (tok)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def q50_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination scan: flag corpus docs sharing any word
    n-gram with the eval set (here: the 5 lowest doc_ids stand in for an
    eval benchmark). The standard n-gram-collision screen (GPT-3 appendix C
    / PaLM style). Production uses 8-13 grams; this corpus's tiny synthetic
    vocabulary makes 4-grams the equivalent selectivity (8-grams collide
    on none of it, 3-grams on a third of it).

    Shape at 100 TB: eval-set shingles are tiny (benchmarks are MBs) —
    distinct them and broadcast into the corpus shingle stream; the corpus
    side is the same shuffle-free sequence-explode used everywhere
    (operators/dedup.shingle); one per-doc aggregate after the broadcast
    semi-match. No corpus self-join anywhere."""
    from ..operators.dedup import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    return ngram_contamination(corpus, eval_docs, n=4).orderBy("doc_id")


_Q50_SQL = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(w[i:i+3], ' ') for i in range(1, len(w) - 2)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), needles AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < 5
)
SELECT s.doc_id, count(*) AS n_shared_ngrams
FROM sh s JOIN needles n USING (shingle)
WHERE s.doc_id >= 5
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


_BM25_TERMS = ["spark", "vector", "hash"]


def _bm25_top20(docs: DataFrame) -> DataFrame:
    """Shared Okapi BM25 scorer (k1=1.2, b=0.75, _BM25_TERMS, top 20 by
    rounded score) — the ONE definition behind q51 and q257's keyword arm
    (VERDICT r6: the duplicated avgdl `.collect()[0]` seam). The corpus
    scalars (N, avgdl) are a deliberate bounded 1-row collect — term
    stats are tiny at any corpus size; the scan filters to query-term
    rows before the per-(doc,term) tf aggregate."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])
    k1, b = 1.2, 0.75
    tf = (
        toks.filter(F.col("tok").isin(_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    partial = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    return (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .withColumn("partial", partial)
        .groupBy("doc_id")
        .agg(F.round(F.sum("partial"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


def q51_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword scoring — targeted corpus curation (pull the docs most
    about a topic into a domain mix). Okapi BM25 with k1=1.2, b=0.75 over a
    fixed term set; top 20 by score.

    Shape at 100 TB: term stats (df) and corpus scalars (N, avgdl) are tiny
    — the scan filters to query-term rows FIRST (a pushed narrow filter),
    so the per-(doc,term) tf aggregate touches only matching tokens; df
    broadcasts back; one final per-doc sum + top-k. Ordering uses the
    ROUNDED score so the engine-vs-oracle sort can't diverge on last-bit
    float noise at the limit boundary."""
    return _bm25_top20(load_table(spark, sf_dir, "documents"))


def _q51_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return rf"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({terms}) GROUP BY 1, 2
), df AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
)
SELECT tf.doc_id,
       round(sum(
         ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
         * (tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
       ), 4) AS bm25
FROM tf
JOIN df USING (tok)
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN stats s
GROUP BY tf.doc_id
ORDER BY bm25 DESC, tf.doc_id
LIMIT 20
"""


def q52_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (operators/text.redact_pii): emails, NANP phones,
    IPv4s replaced with typed tokens, per-pattern match counts. The word-
    salad corpus carries no real PII, so the query SEEDS a deterministic
    email/phone/IP triple per doc (built from doc_id, identically in the
    oracle) — the value check then genuinely exercises the regex engines:
    any Java-vs-RE2 semantic drift in the patterns breaks the hash."""
    from ..operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    s = lambda c: c.cast("string")  # noqa: E731
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            s(F.col("doc_id")),
            F.lit("@example.com call 555-"),
            F.lpad(s(F.col("doc_id") % 900 + 100), 3, "0"),
            F.lit("-"),
            F.lpad(s(F.col("doc_id") % 10000), 4, "0"),
            F.lit(" from 10."),
            s(F.col("doc_id") % 256),
            F.lit(".0."),
            s(F.col("doc_id") % 100 + 1),
        ).alias("text"),
    )
    return redact_pii(seeded).orderBy("doc_id")


def _q52_sql() -> str:
    from ..operators.text import PII_PATTERNS

    email, phone, ipv4 = (
        PII_PATTERNS["email"],
        PII_PATTERNS["phone"],
        PII_PATTERNS["ipv4"],
    )
    return f"""
WITH seeded AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com call 555-'
              || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100 + 1)
           AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
         text, '{email}', '<EMAIL>', 'g'),
               '{phone}', '<PHONE>', 'g'),
               '{ipv4}', '<IP>', 'g') AS text_clean,
       len(regexp_extract_all(text, '{email}')) AS n_email,
       len(regexp_extract_all(text, '{phone}')) AS n_phone,
       len(regexp_extract_all(text, '{ipv4}')) AS n_ipv4
FROM seeded
ORDER BY doc_id
"""


def q53_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (operators/dedup.chunk_dedup): 8-word
    chunks, first corpus-wide occurrence wins, per-doc reconstruction —
    the paragraph-level pass that removes cross-document boilerplate
    whole-document dedup can't see."""
    from ..operators.dedup import chunk_dedup

    docs = load_table(spark, sf_dir, "documents")
    return chunk_dedup(docs, chunk_words=8).orderBy("doc_id")


_Q53_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), ix AS (
  SELECT doc_id, w,
         unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS ci
  FROM w
), chunks AS (
  SELECT doc_id, ci, array_to_string(w[ci*8+1 : ci*8+8], ' ') AS chunk
  FROM ix
), marked AS (
  SELECT doc_id, ci, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) = 1 AS keep
  FROM chunks
), per_doc AS (
  SELECT doc_id,
         count(*) AS n_chunks,
         CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_kept,
         coalesce(string_agg(chunk, ' ' ORDER BY ci) FILTER (WHERE keep), '')
           AS text_clean
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_chunks, 0) AS n_chunks,
       coalesce(p.n_kept, 0) AS n_kept,
       coalesce(p.text_clean, '') AS text_clean
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def q54_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-30 word bigrams with occurrence + doc frequencies
    (operators/text.top_ngrams) — the before/after curation stat that
    surfaces over-represented boilerplate heads."""
    from ..operators.text import top_ngrams

    docs = load_table(spark, sf_dir, "documents")
    return top_ngrams(docs, n=2, k=30)


_Q54_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
  FROM w
)
SELECT gram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM grams
GROUP BY gram
ORDER BY n_occurrences DESC, gram
LIMIT 30
"""


def q55_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup DECISION over embeddings: hyperplane-
    LSH near-dup pairs (the q28 machinery) resolved into clusters by
    min-label propagation, keep the lowest-id representative, emit the
    drop list. Oracle: the q28 SQL pipeline + the q42 recursive-CTE
    transitive closure, keeper = cluster min."""
    from ..operators.dedup import connected_components
    from ..operators.similarity import cosine_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_lsh(emb, threshold=0.45)
    comp = connected_components(pairs, a_col="vec_a", b_col="vec_b")
    return (
        comp.filter(F.col("doc_id") != F.col("component"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.col("component").alias("keeper_vec_id"),
        )
        .orderBy("vec_id")
    )


def _q55_sql() -> str:
    """q28's candidate+verify CTE chain feeding the q42 closure: pairs →
    bidirectional edges → min-reachable component, drop list = nodes whose
    component isn't themselves."""
    return f"""
WITH RECURSIVE {_lsh_pair_ctes()}, edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL
  SELECT vec_b, vec_a FROM pairs
), reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT x.node, e.b FROM reach x JOIN edges e ON x.r = e.a
), comp AS (
  SELECT node AS vec_id, least(node, min(r)) AS component
  FROM reach GROUP BY node
)
SELECT vec_id, component AS keeper_vec_id
FROM comp WHERE vec_id <> component
ORDER BY vec_id
"""


def q56_ivf_search_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE IVF search machinery (cell assignment argmax, nprobe
    probe selection, in-cell scoring, per-query top-k) under hash-seeded
    Lloyd-free centroids — the value-checkable twin of q27, whose trained
    centroids a fixed SQL string cannot replay. Seeds are the 16 corpus
    vectors with the smallest md5-slice hash of their id (engine-portable:
    DuckDB reproduces it as ('0x'||substr(md5(id),1,8))::BIGINT), so the
    oracle replays seeding, normalization, assignment, probing, and top-k
    exactly. Same plan shape as q27: assignment is a narrow argmax
    projection, probes broadcast, one top-k window."""
    from ..operators.similarity import hash_seed_centroids, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = hash_seed_centroids(corpus, nlist=16)
    return ivf_search(corpus, queries, cents, k=5, nprobe=4).orderBy(
        "query_id", "rank"
    )


# Replays operators/similarity.py end-to-end: seeds (md5-slice order, ties
# to lowest id, cell = hash-rank), unit centroids (x / sqrt(dot(cv,cv)) —
# same sequential fold the driver-side Python normalization performs),
# assignment argmax (ties to LOWEST cell: rn over dot DESC, cell ASC),
# probe selection (reverse(array_sort(struct(sim,cell))) ties to HIGHEST
# cell: rn over dot DESC, cell DESC), exact cosine + row_number top-k.
_Q56_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS cell,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), cents AS (
  SELECT cell,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS u
  FROM seeds
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT c.vec_id, c.v, cents.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, cents.u) DESC, cents.cell ASC
           ) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cents.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, cents.u) DESC, cents.cell DESC
           ) AS rn
    FROM q CROSS JOIN cents
  ) WHERE rn <= 4
), s AS (
  SELECT p.query_id, a.vec_id,
         list_dot_product(p.qv, a.v) /
           (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS cos
  FROM probes p JOIN assigned a USING (cell)
)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
         round(cos, 4) AS cosine_sim
  FROM s
)
WHERE rank <= 5
ORDER BY query_id, rank
"""


def q58_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (north star: heuristic corpus
    filtering — Rae et al. 2021's repetition/length/stopword rules): per
    doc, named boolean flags + the combined keep decision. One explode +
    two grouped aggregations (the scale-right shape for distinct-word
    stats — see the HOF-vs-explode note in operators/dedup.py); thresholds
    sit on exact integer-ratio doubles so the decision is engine-portable
    bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    d = g.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_c"),
        F.sum(F.length("word") * F.col("c")).alias("sum_len"),
        F.sum(
            F.when(F.col("word").isin(_STOPWORDS), F.col("c")).otherwise(0)
        ).alias("n_stop"),
    )
    mean_len = F.col("sum_len") / F.col("n_words")
    top_ratio = F.col("max_c") / F.col("n_words")
    dup_ratio = F.lit(1) - F.col("n_distinct") / F.col("n_words")
    flags = {
        "flag_word_count": F.col("n_words") >= 30,
        "flag_word_len": (mean_len >= 3) & (mean_len <= 10),
        "flag_top_word": top_ratio <= 0.12,
        "flag_dup_words": dup_ratio <= 0.6,
        "flag_stopwords": F.col("n_stop") >= 2,
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    return d.select(
        "doc_id",
        "n_words",
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(top_ratio, 4).alias("top_word_ratio"),
        F.round(dup_ratio, 4).alias("dup_word_ratio"),
        "n_stop",
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    ).orderBy("doc_id")


_Q58_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), g AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
), d AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS n_distinct,
         max(c) AS max_c,
         CAST(sum(length(word) * c) AS BIGINT) AS sum_len,
         CAST(coalesce(sum(c) FILTER (
           WHERE list_contains({_STOPWORDS!r}, word)), 0) AS BIGINT) AS n_stop
  FROM g GROUP BY doc_id
)
SELECT doc_id, n_words,
       round(sum_len / n_words, 4) AS mean_word_len,
       round(max_c / n_words, 4) AS top_word_ratio,
       round(1 - n_distinct / n_words, 4) AS dup_word_ratio,
       n_stop,
       n_words >= 30 AS flag_word_count,
       sum_len / n_words >= 3 AND sum_len / n_words <= 10 AS flag_word_len,
       max_c / n_words <= 0.12 AS flag_top_word,
       1 - n_distinct / n_words <= 0.6 AS flag_dup_words,
       n_stop >= 2 AS flag_stopwords,
       (n_words >= 30 AND sum_len / n_words >= 3 AND sum_len / n_words <= 10
        AND max_c / n_words <= 0.12 AND 1 - n_distinct / n_words <= 0.6
        AND n_stop >= 2) AS keep
FROM d ORDER BY doc_id
"""


def q59_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence PMI over the corpus (north star: collocation /
    phrase mining for tokenizer and n-gram vocabulary decisions). The
    vocabulary is BOUNDED FIRST (top 30 words by document frequency, ties
    lexicographic) and broadcast, so the per-doc pair expansion is capped at
    C(30,2) regardless of corpus size — the same prune-before-pairing
    discipline as the LSH tiers. PMI = ln(P(a,b) / (P(a)·P(b))) over
    document incidence."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    w = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    )
    vocab = (
        w.groupBy("word")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "word")
        .limit(30)
    )
    wv = w.join(F.broadcast(vocab), "word").select("doc_id", "word", "df")
    a, b = wv.alias("a"), wv.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(
            F.col("a.word").alias("word_a"),
            F.col("b.word").alias("word_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        p.select(
            "word_a",
            "word_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab") * F.lit(n_docs) / (F.col("df_a") * F.col("df_b"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_ab"), "word_a", "word_b")
        .limit(50)
    )


_Q59_SQL = """
WITH w AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  )
), vocab AS (
  SELECT word, count(*) AS df FROM w GROUP BY word
  ORDER BY df DESC, word LIMIT 30
), wv AS (
  SELECT w.doc_id, w.word, v.df FROM w JOIN vocab v USING (word)
), p AS (
  SELECT a.word AS word_a, b.word AS word_b, a.df AS df_a, b.df AS df_b,
         count(*) AS n_ab
  FROM wv a JOIN wv b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY 1, 2, 3, 4
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
)
SELECT word_a, word_b, n_ab,
       round(ln(n_ab * (SELECT n_docs FROM n) / (df_a * df_b)), 4) AS pmi
FROM p ORDER BY n_ab DESC, word_a, word_b LIMIT 50
"""


def q64_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords by TF-IDF (north star: keyword
    extraction for corpus indexing/routing; complements the corpus-level
    BM25 ranking of q51). tf = term_count/doc_len, idf = ln(N/df). One
    explode, two grouped aggregations (term-in-doc, then df), a broadcast
    of the df relation is NOT needed — df joins back on the word key whose
    cardinality is the vocabulary, and AQE picks the strategy. Top-3 via
    one row_number window per doc; ties break lexicographically."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    g = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    doclen = g.groupBy("doc_id").agg(F.sum("c").alias("n_words"))
    dfreq = g.groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        g.join(doclen, "doc_id")
        .join(dfreq, "word")
        .withColumn(
            "tfidf",
            (F.col("c") / F.col("n_words")) * F.log(F.lit(n_docs) / F.col("df")),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", F.col("word").alias("term"),
                F.round("tfidf", 6).alias("tfidf"))
        .orderBy("doc_id", "rank")
    )


_Q64_SQL = """
WITH g AS (
  SELECT doc_id, word, count(*) AS c FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY doc_id, word
), doclen AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words FROM g GROUP BY doc_id
), dfreq AS (
  SELECT word, count(*) AS df FROM g GROUP BY word
), scored AS (
  SELECT g.doc_id, g.word,
         (g.c / d.n_words)
           * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / f.df)
           AS tfidf
  FROM g JOIN doclen d USING (doc_id) JOIN dfreq f USING (word)
)
SELECT doc_id, rank, term, tfidf FROM (
  SELECT doc_id, word AS term,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word) AS rank,
         round(tfidf, 6) AS tfidf
  FROM scored
)
WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q69_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus downsampling (operators/sampling.py
    `weighted_sample`): keep each doc with probability proportional to a
    per-doc quality weight (here n_chars/max_chars — in production the
    LM/classifier score from q49/q58). The keep decision is
    hash-deterministic and quantized to integer thresholds, so the EXACT
    kept set replays in SQL. Plan: 1-row max broadcast + narrow codegen
    filter — zero data shuffles."""
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("mx"))
    d = docs.crossJoin(F.broadcast(mx)).withColumn(
        "w", F.col("n_chars") / F.col("mx")
    )
    return (
        weighted_sample(d, "w", salt="wsmp")
        .select("doc_id", "lang", "bucket", "keep_threshold")
        .orderBy("doc_id")
    )


_Q69_SQL = """
WITH mx AS (SELECT max(n_chars) AS mx FROM documents),
b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('wsmp' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000
           AS bucket,
         CAST(floor(n_chars / mx * 10000) AS BIGINT) AS keep_threshold
  FROM documents, mx
)
SELECT doc_id, lang, bucket, keep_threshold FROM b
WHERE bucket < keep_threshold
ORDER BY doc_id
"""


def q71_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-stratum quota sampling: exactly min(10, |stratum|) docs
    per source, chosen by deterministic hash order — the fixed-budget
    counterpart of rate-based mixing (q47), via operators/sampling.py
    `quota_sample`. row_number over the portable md5 order makes the
    chosen set content-addressed: any engine, any partitioning, same
    sample. The map-side pre-cut (each partition locally keeps its 10
    smallest hashes per stratum — exact, since the global top-k is a
    subset of the union of local top-ks) shrinks the window shuffle from
    |corpus| rows to ≤ k·strata·partitions."""
    from ..operators.sampling import quota_sample

    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, 10).orderBy("source", "rn")


_Q71_SQL = """
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('quota' || doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents
)
SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h
)
WHERE rn <= 10
ORDER BY source, rn
"""


def q79_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingestion chunking: fixed-size sliding windows WITH OVERLAP
    (size 64 tokens, stride 48 → 16-token overlap), the retrieval-corpus
    counterpart of q53's disjoint dedup chunks — overlap keeps answers
    that straddle a boundary retrievable. Pure codegen arithmetic:
    chunk count = 1 + ceil((n−size)/stride) via integer div (no float
    boundary), sequence + explode + slice; emits md5(chunk) so the
    exploded relation stays narrow (the chunk text itself never needs to
    leave the row it came from until embedding time)."""
    size, stride = 64, 48
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.expr(f"(size(split(text, ' ')) - {size} + {stride} - 1) div {stride}") + 1
    )
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(
                        F.slice(toks, i * stride + 1, size), " "
                    ),
                )
            ).alias("chunk_idx", "chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size(F.split("chunk", " ")).alias("n_chunk_tokens"),
            F.md5("chunk").alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_Q79_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
), counted AS (
  SELECT doc_id, w,
         CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 48 - 1) // 48 + 1 END
           AS n_chunks
  FROM base
), exploded AS (
  SELECT doc_id,
         CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx, w
  FROM counted
)
SELECT doc_id, chunk_idx,
       CAST(len(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS INTEGER)
         AS n_chunk_tokens,
       md5(array_to_string(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' '))
         AS chunk_hash
FROM exploded
ORDER BY doc_id, chunk_idx
"""


def q83_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split (operators/splits.domain_split): the
    split decision hashes the DOMAIN (source), not the row, so every doc
    of a domain lands on one side and intra-domain near-dups can never
    straddle the fence. The decision is a zero-shuffle codegen projection
    (portable md5-slice hash vs a percent threshold) — at 100 TB it rides
    the scan; the only exchange here is the per-(source, split) rollup
    that reports the resulting corpus composition."""
    from ..operators.splits import domain_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        domain_split(docs, val_pct=30)
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


_Q83_SQL = """
SELECT source,
       CASE WHEN ('0x' || substr(md5('split' || source), 1, 8))::BIGINT % 100 < 30
            THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def q84_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit (operators/splits.
    split_leakage_audit): near-dup clusters (the q42 machinery — capped
    Jaccard edges resolved by label-propagation connected components)
    joined against the domain split; a cluster with members on both sides
    is LEAKY — duplicate text the domain fence failed to contain (same
    boilerplate republished across domains), i.e. exactly the rows that
    inflate eval. Costs one |clustered-docs| join + one component-keyed
    aggregate on top of the cluster map; the corpus itself is never
    reshuffled. Oracle: the q42 recursive-closure CTEs + the same split
    CASE, composed."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs
    from ..operators.splits import domain_split, split_leakage_audit

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs)
    assign = domain_split(docs, val_pct=30).select("doc_id", "split")
    return split_leakage_audit(comp, assign).orderBy("component")


_Q84_SQL = f"""
WITH RECURSIVE {_Q42_CTES}, assign AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5('split' || source), 1, 8))::BIGINT % 100 < 30
              THEN 'val' ELSE 'train' END AS split
  FROM documents
)
SELECT component,
       count(*) AS cluster_size,
       count(*) FILTER (WHERE split = 'train') AS n_train,
       count(*) FILTER (WHERE split = 'val') AS n_val,
       count(*) FILTER (WHERE split = 'train') > 0
         AND count(*) FILTER (WHERE split = 'val') > 0 AS leaky
FROM comp JOIN assign USING (doc_id)
GROUP BY component ORDER BY component
"""


def q90_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (the q24 capped
    Jaccard tier) attributed to their source pair — which sources mirror
    each other's content, the audit that drives source-level dedup
    priorities and licensing review. The pair relation is candidate-sized
    (tiny next to the corpus), so the two source-lookup joins are cheap;
    sources are normalized least/greatest so the matrix is unordered-
    unique. Mean Jaccard is an avg of round-4 doubles re-rounded to 4 —
    the established engine-portable float discipline."""
    from ..operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("jaccard"), 4).alias("mean_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


_Q90_SQL = """
WITH sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), sh AS (
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh_raw GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b,
         round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) >= 0.5
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs,
       round(avg(jaccard), 4) AS mean_jaccard
FROM pairs
JOIN documents da ON da.doc_id = doc_a
JOIN documents db ON db.doc_id = doc_b
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


def q92_ensemble_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal near-dup evidence: LEXICAL pairs (capped n-gram
    Jaccard ≥ 0.5, the q24 tier) full-outer-merged with SEMANTIC pairs
    (hyperplane-LSH cosine ≥ 0.45 over the aligned embedding table, the
    q28 tier), labeled 'lexical' / 'semantic' / 'both'. Production dedup
    ensembles exactly this way — surface rewrites evade lexical shingles,
    templated boilerplate evades embeddings; the union catches both, and
    the provenance column is what a reviewer audits before dropping. Both
    evidence relations are candidate-sized, so the merge join is
    corpus-independent. Scores are coalesced to -1.0 sentinels (absent
    evidence) to keep the hashed output NULL-free."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.similarity import cosine_pairs_lsh

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000).select(
        "doc_a", "doc_b", "jaccard"
    )
    sem = cosine_pairs_lsh(emb, threshold=0.45).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        "cosine_sim",
    )
    merged = lex.join(sem, ["doc_a", "doc_b"], "full_outer")
    evidence = (
        F.when(F.col("jaccard").isNotNull() & F.col("cosine_sim").isNotNull(), "both")
        .when(F.col("jaccard").isNotNull(), "lexical")
        .otherwise("semantic")
    )
    return merged.select(
        "doc_a",
        "doc_b",
        evidence.alias("evidence"),
        F.coalesce("jaccard", F.lit(-1.0)).alias("jaccard"),
        F.coalesce("cosine_sim", F.lit(-1.0)).alias("cosine_sim"),
    ).orderBy("doc_a", "doc_b")


def _q92_sql() -> str:
    """Union the q24 lexical CTE chain (renamed to avoid colliding with
    the semantic chain's ``pairs``) with the q28 semantic chain from
    _lsh_pair_ctes(), full-outer-joined on the pair key."""
    return f"""
WITH {_lsh_pair_ctes()}, lex_sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), lex_sh AS (
  SELECT doc_id, shingle FROM lex_sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM lex_sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), lex_sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM lex_sh_raw GROUP BY doc_id
), lex_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM lex_sh a JOIN lex_sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), lex_pairs AS (
  SELECT doc_a, doc_b,
         round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) AS jaccard
  FROM lex_inter
  JOIN lex_sizes sa ON sa.doc_id = doc_a
  JOIN lex_sizes sb ON sb.doc_id = doc_b
  WHERE round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) >= 0.5
)
SELECT coalesce(l.doc_a, p.vec_a) AS doc_a,
       coalesce(l.doc_b, p.vec_b) AS doc_b,
       CASE WHEN l.jaccard IS NOT NULL AND p.cosine_sim IS NOT NULL THEN 'both'
            WHEN l.jaccard IS NOT NULL THEN 'lexical'
            ELSE 'semantic' END AS evidence,
       coalesce(l.jaccard, -1.0) AS jaccard,
       coalesce(p.cosine_sim, -1.0) AS cosine_sim
FROM lex_pairs l
FULL OUTER JOIN pairs p ON l.doc_a = p.vec_a AND l.doc_b = p.vec_b
ORDER BY doc_a, doc_b
"""


def q85_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch source mixing (operators/sampling.epoch_mixture):
    src0 upweighted 2.5x (every doc twice, a hash-chosen half a third
    time), src1 downsampled to 0.25, src2 at 1.75, src3 halved, the rest
    at 1.0 — the Pile-style mixture schedule as a zero-shuffle explode.
    Reported per source: input docs, emitted rows, max epoch."""
    from ..operators.sampling import epoch_mixture

    docs = load_table(spark, sf_dir, "documents")
    mixed = epoch_mixture(
        docs, {"src0": 2.5, "src1": 0.25, "src2": 1.75, "src3": 0.5}
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_emitted"),
            F.max("epoch").alias("max_epoch"),
        )
        .orderBy("source")
    )


_Q85_SQL = """
WITH w AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                     WHEN 'src2' THEN 1.75 WHEN 'src3' THEN 0.5
                     ELSE 1.0 END AS wt,
         ('0x' || substr(md5('epoch' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000
           AS h
  FROM documents
), reps AS (
  SELECT doc_id, source,
         CAST(floor(wt) AS INT)
           + CASE WHEN h < floor((wt - floor(wt)) * 10000) THEN 1 ELSE 0 END
           AS n_rep
  FROM w
), emitted AS (
  SELECT doc_id, source, unnest(range(1, n_rep + 1)) AS epoch
  FROM reps WHERE n_rep >= 1
)
SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_emitted,
       CAST(max(epoch) AS INT) AS max_epoch
FROM emitted GROUP BY source ORDER BY source
"""


def q86_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked data selection under a token budget (operators/
    sampling.token_budget_select): docs ordered by the q18 quality score
    (rounded to 4 decimals on BOTH engines so the order ties identically;
    doc_id breaks the remaining ties) are taken greedily until 10,000
    tokens. The running total is the distributed prefix-sum — range
    repartition + per-partition cumsum + bounded offset join — never a
    single-partition global window over the corpus."""
    from ..operators.sampling import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
    scored = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_tokens"),
        F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * (1 - n_stop / n_words), 4
        ).alias("quality_score"),
    )
    return (
        token_budget_select(scored, budget=10_000)
        .select("doc_id", "quality_score", "n_tokens", "cum_tokens")
        .orderBy("cum_tokens")
    )


_Q86_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         round(least(len(string_split(text, ' ')) / 100.0, 1.0)
               * (1 - len(list_filter(string_split(text, ' '),
                     x -> list_contains({_STOPWORDS!r}, x)))
                     / len(string_split(text, ' '))), 4) AS quality_score
  FROM documents
), c AS (
  SELECT doc_id, quality_score, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
              AS BIGINT) AS cum_tokens
  FROM base
)
SELECT doc_id, quality_score, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= 10000 ORDER BY cum_tokens
"""


def q93_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup report (north star: canonical-form
    dedup — case/punctuation/whitespace variants of one content are ONE
    document, the CCNet/C4 canonicalization pass plain md5 dedup misses).
    Canonicalize (lower, non-alnum → space, collapse, trim — all
    RE2-portable, operators/text.normalize_text) → md5 → global keeper =
    min doc_id per canonical hash (window over the uniform hash key: one
    skew-free exchange of the narrow (hash, id, source) projection; the
    text never shuffles) → per-source keep/drop accounting."""
    from ..operators.dedup import canonical_dedup

    docs = load_table(spark, sf_dir, "documents")
    return canonical_dedup(docs)


_Q93_SQL = """
WITH n AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS ch
  FROM documents
), k AS (
  SELECT doc_id, source, ch,
         min(doc_id) OVER (PARTITION BY ch) AS keeper
  FROM n
)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT ch) AS n_canonical,
       count(*) FILTER (WHERE doc_id = keeper) AS n_kept
FROM k
GROUP BY source
ORDER BY source
"""


def q94_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size-k deterministic uniform sample (north star: "exactly
    100k eval docs", not a rate that hits 100k in expectation): global
    top-k by the portable md5-slice hash — plans as TakeOrderedAndProject
    (per-partition heaps + bounded merge, no global sort or full exchange;
    plan-gated), and the k-sample is a PREFIX of any larger sample at the
    same salt. Routed through operators/sampling.exact_k_sample."""
    from ..operators.sampling import exact_k_sample

    docs = load_table(spark, sf_dir, "documents")
    return exact_k_sample(docs.select("doc_id", "source", "lang"), k=100)


_Q94_SQL = """
SELECT doc_id, source, lang,
       ('0x' || substr(md5('ek' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
FROM documents
ORDER BY h, doc_id
LIMIT 100
"""


def q95_diversity_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style diversity sampling (north star: semantic-cluster
    pruning of a training corpus): nearest-centroid assignment (argmax
    projection, zero shuffle) → keep the m=10 LEAST prototypical vectors
    per cell (lowest cosine to centroid — the kept set spreads over the
    cluster instead of stacking near-duplicates at its mode). Hash-seeded
    centroids (the q56 argument) make the ENTIRE pipeline — seeding,
    normalization, assignment argmax, per-cell diversity ranking —
    replayable by the SQL oracle."""
    from ..operators.similarity import diversity_cap, hash_seed_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = hash_seed_centroids(emb, nlist=16)
    return diversity_cap(emb, cents, m=10).orderBy("cell", "rank")


# Replays seeding (md5-slice order, ties to lowest id, cell = hash rank),
# unit centroids, assignment argmax (ties to LOWEST cell), per-cell cosine,
# and the diversity window (ASC — least prototypical first). Same portable
# pieces as _Q56_SQL.
_Q95_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS cell,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), cents AS (
  SELECT cell,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS u
  FROM seeds
), assigned AS (
  SELECT vec_id, cell, dot / sqrt(list_dot_product(v, v)) AS cs FROM (
    SELECT c.vec_id, c.v, cents.cell,
           list_dot_product(c.v, cents.u) AS dot,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, cents.u) DESC, cents.cell ASC
           ) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
)
SELECT cell, rank, vec_id, centroid_sim FROM (
  SELECT cell, vec_id,
         row_number() OVER (PARTITION BY cell ORDER BY cs ASC, vec_id) AS rank,
         round(cs, 4) AS centroid_sim
  FROM assigned
)
WHERE rank <= 10
ORDER BY cell, rank
"""


def q96_bloom_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated incremental exact dedup (north star: 100 TB ingest —
    don't anti-join every batch against the whole corpus): delta docs
    (doc_id ≥ 400, the q81 batch convention) screened by a Catalyst-built
    Bloom filter over corpus content hashes — bloom-absent docs are novel
    with ZERO join work (no false negatives), only bloom-present docs
    (dups + false positives) reach the exact anti-join. The bloom is
    correctness-neutral, so the oracle is the plain NOT EXISTS anti-join:
    a green hash proves the gated path returns exactly what the full join
    would."""
    from ..operators.dedup import bloom_novelty_filter

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    return (
        bloom_novelty_filter(corpus, delta)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_Q96_SQL = """
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id >= 400
  AND NOT EXISTS (
    SELECT 1 FROM documents c
    WHERE c.doc_id < 400 AND md5(c.text) = md5(d.text)
  )
ORDER BY d.doc_id
"""


def q97_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (north star: the COMPRESSED ANN
    scale path — at 100 TB the scored relation is (id, 4 codes), 64×
    smaller than raw vectors). Codebooks are subspace slices of the
    hash-seeded sample (operators/similarity.pq_codebooks), so encoding
    (per-subspace argmin), asymmetric scoring, and top-k all replay in
    the SQL oracle — the q56 argument applied to compression. Explicit
    left-to-right summation chain on both sides for float parity."""
    from ..operators.similarity import pq_adc_topk, pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    books = pq_codebooks(corpus, n_sub=4, n_codes=16)
    return pq_adc_topk(corpus, queries, books, k=5).orderBy("query_id", "rank")


# Replays pq_codebooks (same md5-slice seed order as _Q56_SQL, sliced into
# 4 subspaces), pq_encode (argmin ‖v_j−c‖² as argmax(dot − ‖c‖²/2), ties
# to the lowest code), and the ADC sum with the SAME left-to-right
# addition order as the Spark chain (the single-row max(CASE) pivot keeps
# each addend exact).
_Q97_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS code,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), books AS (
  SELECT s.code, t.j, list_slice(s.cv, t.j*16 + 1, t.j*16 + 16) AS cw
  FROM seeds s CROSS JOIN range(4) t(j)
), enc AS (
  SELECT vec_id, j, code FROM (
    SELECT c.vec_id, b.j, b.code,
           row_number() OVER (
             PARTITION BY c.vec_id, b.j
             ORDER BY list_dot_product(list_slice(c.v, b.j*16 + 1, b.j*16 + 16), b.cw)
                      - 0.5 * list_dot_product(b.cw, b.cw) DESC,
                      b.code ASC
           ) AS rn
    FROM c CROSS JOIN books b
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), terms AS (
  SELECT q.query_id, e.vec_id, e.j,
         list_dot_product(list_slice(q.qv, e.j*16 + 1, e.j*16 + 16), b.cw) AS d
  FROM q CROSS JOIN enc e JOIN books b ON b.j = e.j AND b.code = e.code
), adc AS (
  SELECT query_id, vec_id,
         ((max(CASE WHEN j = 0 THEN d END)
           + max(CASE WHEN j = 1 THEN d END))
           + max(CASE WHEN j = 2 THEN d END))
           + max(CASE WHEN j = 3 THEN d END) AS a
  FROM terms GROUP BY query_id, vec_id
)
SELECT query_id, rank, vec_id, adc_sim FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY a DESC, vec_id) AS rank,
         round(a, 4) AS adc_sim
  FROM adc
) WHERE rank <= 5
ORDER BY query_id, rank
"""


def q99_weighted_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size-k weighted-without-replacement sample (Efraimidis–
    Spirakis A-ES) of documents, weight = n_chars — "exactly 100 docs,
    longer docs proportionally likelier". Plans as TakeOrderedAndProject
    over a narrow projection: zero exchanges (plan-gated with q94). The
    hash-determinized competition keys replay in SQL, so the draw itself
    is oracle-checked, not just its size."""
    from ..operators.sampling import weighted_exact_k_sample

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_exact_k_sample(
        docs.select("doc_id", "source", "n_chars"), k=100, weight_col="n_chars"
    )
    return out.select(
        "doc_id", "source", "n_chars", F.round("es_key", 6).alias("es_key")
    )


_Q99_SQL = """
SELECT doc_id, source, n_chars,
       round(power(
         ((('0x' || substr(md5('wek' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
           / 4294967296.0),
         1.0 / CAST(n_chars AS DOUBLE)
       ), 6) AS es_key
FROM documents
WHERE CAST(n_chars AS DOUBLE) > 0
ORDER BY power(
         ((('0x' || substr(md5('wek' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
           / 4294967296.0),
         1.0 / CAST(n_chars AS DOUBLE)
       ) DESC, doc_id
LIMIT 100
"""


def q100_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search (the FAISS IVF16,PQ4 production composition):
    IVF cell pruning bounds WHICH rows score (nprobe=4 of 16 cells —
    partition pruning at scale), PQ/ADC bounds WHAT each row costs (4 int
    codes, 64× narrower than raw vectors). Centroids AND codebooks are
    hash-seeded from the same portable sample, so seeding, assignment,
    probe selection, encoding, ADC, and top-k ALL replay in the SQL
    oracle — the capstone of the q56/q97 oracle-checkable-ANN argument."""
    from ..operators.similarity import (
        hash_seed_centroids,
        ivf_pq_topk,
        pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = hash_seed_centroids(corpus, nlist=16)
    books = pq_codebooks(corpus, n_sub=4, n_codes=16)
    return ivf_pq_topk(corpus, queries, cents, books, k=5, nprobe=4).orderBy(
        "query_id", "rank"
    )


# Composes the proven fragments: _Q56_SQL's seeds/cents/assignment/probes
# (assignment ties → LOWEST cell, probe ties → HIGHEST cell) with
# _Q97_SQL's books/encoding/ADC pivot (explicit left-assoc addition).
_Q100_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS cell,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), cents AS (
  SELECT cell,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS u
  FROM seeds
), books AS (
  SELECT s.cell AS code, t.j, list_slice(s.cv, t.j*16 + 1, t.j*16 + 16) AS cw
  FROM seeds s CROSS JOIN range(4) t(j)
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT c.vec_id, c.v, cents.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, cents.u) DESC, cents.cell ASC
           ) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
), enc AS (
  SELECT vec_id, j, code FROM (
    SELECT c.vec_id, b.j, b.code,
           row_number() OVER (
             PARTITION BY c.vec_id, b.j
             ORDER BY list_dot_product(list_slice(c.v, b.j*16 + 1, b.j*16 + 16), b.cw)
                      - 0.5 * list_dot_product(b.cw, b.cw) DESC,
                      b.code ASC
           ) AS rn
    FROM c CROSS JOIN books b
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cents.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, cents.u) DESC, cents.cell DESC
           ) AS rn
    FROM q CROSS JOIN cents
  ) WHERE rn <= 4
), terms AS (
  SELECT p.query_id, a.vec_id, e.j,
         list_dot_product(list_slice(p.qv, e.j*16 + 1, e.j*16 + 16), b.cw) AS d
  FROM probes p
  JOIN assigned a USING (cell)
  JOIN enc e ON e.vec_id = a.vec_id
  JOIN books b ON b.j = e.j AND b.code = e.code
), adc AS (
  SELECT query_id, vec_id,
         ((max(CASE WHEN j = 0 THEN d END)
           + max(CASE WHEN j = 1 THEN d END))
           + max(CASE WHEN j = 2 THEN d END))
           + max(CASE WHEN j = 3 THEN d END) AS a
  FROM terms GROUP BY query_id, vec_id
)
SELECT query_id, rank, vec_id, adc_sim FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY a DESC, vec_id) AS rank,
         round(a, 4) AS adc_sim
  FROM adc
) WHERE rank <= 5
ORDER BY query_id, rank
"""


def q102_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/sampling.dsir_log_weights):
    score every doc by target-likeness under hashed unigram models, with
    the English subset standing in for the target distribution (in
    production: Wikipedia/books). The full pipeline — bucketing, both
    add-1-smoothed models, absent-bucket floors, per-doc log-ratio sum —
    replays in the oracle SQL, so the green hash certifies the model fit
    AND the scoring pass, not just row counts."""
    from ..operators.sampling import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(docs, docs.filter(F.col("lang") == "en"))


_Q102_SQL = r"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
  FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), tgt_toks AS (
  SELECT t.b FROM toks t JOIN documents d USING (doc_id) WHERE d.lang = 'en'
), rt AS (SELECT CAST(count(*) + 1024 AS DOUBLE) AS d FROM toks),
   tt AS (SELECT CAST(count(*) + 1024 AS DOUBLE) AS d FROM tgt_toks),
   rm AS (
  SELECT b, ln((count(*) + 1) / (SELECT d FROM rt)) AS logp_raw
  FROM toks GROUP BY b
), tm AS (
  SELECT b, ln((count(*) + 1) / (SELECT d FROM tt)) AS logp_tgt
  FROM tgt_toks GROUP BY b
), scored AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         round(sum(coalesce(tm.logp_tgt, -ln((SELECT d FROM tt)))
                   - rm.logp_raw), 4) AS log_weight
  FROM toks t
  JOIN rm USING (b)
  LEFT JOIN tm USING (b)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       coalesce(s.log_weight, 0.0) AS log_weight
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY doc_id
"""


def q103_span_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-free repeated-span profile (operators/dedup.
    span_dup_profile): dense 8-token windows (stride 1 — the alignment
    guarantee, see the operator docstring), occurrence-counted
    corpus-wide by md5; per doc the duplicated-window fraction and the
    longest consecutive duplicated run (window_words + run − 1 ≈ longest
    shared span in tokens). The oracle replays window extraction, the
    count-window, and the run-length grouping (wi − row_number)
    verbatim."""
    from ..operators.dedup import span_dup_profile

    docs = load_table(spark, sf_dir, "documents")
    return span_dup_profile(docs, window_words=8, stride=1).orderBy("doc_id")


_Q103_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), pos AS (
  SELECT doc_id,
         unnest(range(0, CASE WHEN len(w) >= 8
                              THEN len(w) - 8 + 1 ELSE 0 END)) AS wi,
         w
  FROM w
), wins AS (
  SELECT doc_id, wi,
         md5(array_to_string(w[wi + 1 : wi + 8], ' ')) AS wh
  FROM pos
), marked AS (
  SELECT doc_id, wi, count(*) OVER (PARTITION BY wh) > 1 AS dup FROM wins
), per_doc AS (
  SELECT doc_id, count(*) AS n_windows,
         CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM marked GROUP BY doc_id
), runs AS (
  SELECT doc_id, max(c) AS max_run FROM (
    SELECT doc_id, grp, count(*) AS c FROM (
      SELECT doc_id, wi,
             wi - row_number() OVER (PARTITION BY doc_id ORDER BY wi) AS grp
      FROM marked WHERE dup
    ) GROUP BY doc_id, grp
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_windows, 0) AS n_windows,
       coalesce(p.n_dup, 0) AS n_dup_windows,
       round(CASE WHEN coalesce(p.n_windows, 0) > 0
                  THEN p.n_dup / CAST(p.n_windows AS DOUBLE)
                  ELSE 0.0 END, 4) AS dup_frac,
       coalesce(r.max_run, 0) AS max_dup_run
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN runs r USING (doc_id)
ORDER BY doc_id
"""


def q104_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality-classifier inference (operators/text.
    hashed_linear_score): sigmoid over the mean hashed-bag-of-words
    weight, the fastText-shaped first-tier quality gate. The weight
    "lookup" is an md5 derivation folded into the projection, so the
    oracle replays the entire forward pass — hashing, weight generation,
    mean, sigmoid — in SQL."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    return hashed_linear_score(docs, n_buckets=4096)


_Q104_SQL = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), sc AS (
  SELECT doc_id, count(*) AS n_tokens,
         avg(('0x' || substr(md5('qw' ||
               ((('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096))::VARCHAR
             ), 1, 8))::BIGINT / 2147483648.0 - 1.0) AS m
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       round(1.0 / (1.0 + exp(-4.0 * coalesce(s.m, 0.0))), 4) AS score
FROM documents d LEFT JOIN sc s USING (doc_id)
ORDER BY doc_id
"""


def q105_winnowed_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint duplication profile (operators/dedup.
    winnowed_fingerprints — the MOSS/SIGMOD'03 algorithm): content-defined
    sparse selection (per k-run min of hash‖position keys) whose shared-
    fingerprint counts the oracle replays end-to-end — dense hashes,
    composite min-key window frame, distinct selection, cross-doc count.
    A green hash certifies the selection function itself, not just the
    rollup, because any selection difference changes which hashes
    survive into the counts."""
    from ..operators.dedup import winnowed_dup_profile

    docs = load_table(spark, sf_dir, "documents")
    return winnowed_dup_profile(docs, window_words=8, winnow_k=4).orderBy("doc_id")


_Q105_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), pos AS (
  SELECT doc_id,
         unnest(range(0, CASE WHEN len(w) >= 8
                              THEN len(w) - 8 + 1 ELSE 0 END)) AS wi,
         w
  FROM w
), wins AS (
  SELECT doc_id, wi,
         md5(array_to_string(w[wi + 1 : wi + 8], ' ')) || ':' ||
           lpad(wi::VARCHAR, 12, '0') AS key
  FROM pos
), sel AS (
  SELECT DISTINCT doc_id,
         min(key) OVER (
           PARTITION BY doc_id ORDER BY wi
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
         ) AS skey
  FROM wins
), fp AS (
  SELECT DISTINCT doc_id, substr(skey, 1, 32) AS wh FROM sel
), marked AS (
  SELECT doc_id, count(*) OVER (PARTITION BY wh) > 1 AS shared FROM fp
), per_doc AS (
  SELECT doc_id, count(*) AS n_fingerprints,
         CAST(sum(CASE WHEN shared THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_fingerprints, 0) AS n_fingerprints,
       coalesce(p.n_shared, 0) AS n_shared_fp,
       round(CASE WHEN coalesce(p.n_fingerprints, 0) > 0
                  THEN p.n_shared / CAST(p.n_fingerprints AS DOUBLE)
                  ELSE 0.0 END, 4) AS shared_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


def q106_kmv_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language vocabulary overlap via KMV sketches (operators/
    sketches.kmv_group_sketch + kmv_pair_overlap): per-language bottom-256
    distinct token-hash sketches, merged pairwise into union cuts that
    yield Jaccard and union-cardinality ESTIMATES — the sub-linear way to
    answer "how much vocabulary do these corpora share" without a
    pairwise exact join. The estimates are deterministic functions of the
    md5 hashes, so the oracle replays the sketch arithmetic end-to-end;
    estimator ACCURACY versus exact Jaccard is a separate pytest."""
    from ..operators.sketches import kmv_group_sketch, kmv_pair_overlap

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
            )
        ).alias("tok"),
    )
    mins = kmv_group_sketch(toks, "lang", "tok", k=256)
    return kmv_pair_overlap(mins, "lang", k=256)


_Q106_SQL = r"""
WITH toks AS (
  SELECT lang, tok FROM (
    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), hashed AS (
  SELECT DISTINCT lang, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM toks
), mins AS (
  SELECT lang, h FROM (
    SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= 256
), pairs AS (
  SELECT a.lang AS g1, b.lang AS g2
  FROM (SELECT DISTINCT lang FROM mins) a
  JOIN (SELECT DISTINCT lang FROM mins) b ON a.lang < b.lang
), per_hash AS (
  SELECT p.g1, p.g2, m.h,
         max(CASE WHEN m.lang = p.g1 THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN m.lang = p.g2 THEN 1 ELSE 0 END) AS in2
  FROM pairs p JOIN mins m ON m.lang IN (p.g1, p.g2)
  GROUP BY p.g1, p.g2, m.h
), cut AS (
  SELECT * FROM (
    SELECT g1, g2, h, in1, in2,
           row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
    FROM per_hash
  ) WHERE rn <= 256
)
SELECT g1, g2,
       count(*) AS k_used,
       CAST(sum(in1 * in2) AS BIGINT) AS n_both,
       round(CAST(sum(in1 * in2) AS DOUBLE) / count(*), 4) AS jaccard_est,
       CASE WHEN count(*) < 256 THEN count(*)
            ELSE CAST(floor((count(*) - 1) * 4294967296.0 / max(h)) AS BIGINT)
       END AS union_card_est
FROM cut
GROUP BY g1, g2
ORDER BY g1, g2
"""


def q107_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    doc with the corpus unigram LM (the q49 machinery), then split each
    LANGUAGE into head/middle/tail terciles by per-language exact
    percentile thresholds — the curation move that keeps the best third,
    trains on the middle, and drops the tail. Returns per (lang, bucket):
    doc count and mean score.

    Shape at 100 TB: scoring is the q49 broadcast-model scan; thresholds
    are one |langs|-row exact-percentile aggregate broadcast back into a
    narrow projection — no second scan of the scores, no sort. Bucketing
    compares the ROUNDED score (the q49 output discipline) against
    thresholds interpolated from those same rounded values, which is what
    keeps the cut engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "\\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    total = toks.count()
    model = toks.groupBy("tok").agg(
        F.log(F.count("*") / F.lit(float(total))).alias("logp")
    )
    scored = (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(F.round(F.avg("logp"), 4).alias("score"))
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    thr = scored.groupBy("lang").agg(
        F.percentile("score", 1.0 / 3).alias("t_lo"),
        F.percentile("score", 2.0 / 3).alias("t_hi"),
    )
    bucket = (
        F.when(F.col("score") >= F.col("t_hi"), F.lit("head"))
        .when(F.col("score") >= F.col("t_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(thr), "lang")
        .withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("lang", "bucket")
    )


_Q107_SQL = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), model AS (
  SELECT tok, ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM toks)) AS logp
  FROM toks GROUP BY tok
), scored AS (
  SELECT t.doc_id, round(avg(m.logp), 4) AS score
  FROM toks t JOIN model m USING (tok) GROUP BY t.doc_id
), sl AS (
  SELECT s.doc_id, s.score, d.lang
  FROM scored s JOIN documents d USING (doc_id)
), thr AS (
  SELECT lang, quantile_cont(score, 1.0/3) AS t_lo,
               quantile_cont(score, 2.0/3) AS t_hi
  FROM sl GROUP BY lang
)
SELECT sl.lang,
       CASE WHEN sl.score >= thr.t_hi THEN 'head'
            WHEN sl.score >= thr.t_lo THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       round(avg(sl.score), 4) AS avg_score
FROM sl JOIN thr USING (lang)
GROUP BY 1, 2
ORDER BY lang, bucket
"""


def q108_quality_aware_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup decision: the q42 near-dup clusters, but the
    keeper is the cluster's HIGHEST-quality member (hashed classifier
    score q104; ties broken by min doc_id) instead of min-id — what
    SemDeDup/DataComp actually do, since the duplicate you keep should be
    the best-written copy. Composes three oracle-proven pieces (Jaccard
    edges, CC closure, classifier forward pass) into one decision; the
    keeper window (score desc, doc_id) makes the choice deterministic
    even for byte-identical duplicates with tied scores."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs)
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    member = comp.join(scores, "doc_id")
    rn = F.row_number().over(
        W.partitionBy("component").orderBy(F.col("score").desc(), "doc_id")
    )
    ranked = member.withColumn("rn", rn)
    return (
        ranked.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "keeper_doc_id"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("score"))).alias(
                "keeper_score"
            ),
        )
        .orderBy("component")
    )


_Q108_SQL = f"""
WITH RECURSIVE {_Q42_CTES}, q_toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), q_scores AS (
  SELECT d.doc_id,
         round(1.0 / (1.0 + exp(-4.0 * coalesce(s.m, 0.0))), 4) AS score
  FROM documents d LEFT JOIN (
    SELECT doc_id,
           avg(('0x' || substr(md5('qw' ||
                 ((('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096))::VARCHAR
               ), 1, 8))::BIGINT / 2147483648.0 - 1.0) AS m
    FROM q_toks GROUP BY doc_id
  ) s USING (doc_id)
), ranked AS (
  SELECT c.component, c.doc_id, q.score,
         row_number() OVER (
           PARTITION BY c.component ORDER BY q.score DESC, c.doc_id
         ) AS rn
  FROM comp c JOIN q_scores q USING (doc_id)
)
SELECT component, count(*) AS cluster_size,
       max(CASE WHEN rn = 1 THEN doc_id END) AS keeper_doc_id,
       max(CASE WHEN rn = 1 THEN score END) AS keeper_score
FROM ranked GROUP BY component ORDER BY component
"""


def q109_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup excision (operators/dedup.span_excise): cut every
    non-first occurrence of a duplicated 8-token span out of the corpus
    and rebuild the surviving text — the Lee et al. 2022 surgery, not
    just its detection signal (q103). The oracle replays window hashing,
    first-occurrence ranking, coverage expansion, the anti-join, and the
    ordered text rebuild; a green hash certifies the rebuilt STRINGS."""
    from ..operators.dedup import span_excise

    docs = load_table(spark, sf_dir, "documents")
    return span_excise(docs, window_words=8).orderBy("doc_id")


_Q109_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), toks AS (
  SELECT doc_id, pos, w[pos + 1] AS tok FROM (
    SELECT doc_id, w, unnest(range(len(w))) AS pos FROM w
  )
), wins AS (
  SELECT doc_id, wi, md5(array_to_string(w[wi + 1 : wi + 8], ' ')) AS wh
  FROM (
    SELECT doc_id, w,
           unnest(range(0, CASE WHEN len(w) >= 8
                                THEN len(w) - 8 + 1 ELSE 0 END)) AS wi
    FROM w
  )
), losers AS (
  SELECT doc_id, wi FROM (
    SELECT doc_id, wi,
           row_number() OVER (PARTITION BY wh ORDER BY doc_id, wi) AS rn
    FROM wins
  ) WHERE rn > 1
), removed AS (
  SELECT DISTINCT doc_id, unnest(range(wi, wi + 8)) AS pos FROM losers
), kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM toks t ANTI JOIN removed r ON t.doc_id = r.doc_id AND t.pos = r.pos
), rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         array_to_string(list(tok ORDER BY pos), ' ') AS text_clean
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(t.n_tokens, 0) AS n_tokens,
       coalesce(t.n_tokens, 0) - coalesce(r.n_kept, 0) AS n_removed,
       coalesce(r.text_clean, '') AS text_clean
FROM documents d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
ORDER BY doc_id
"""


def q112_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization audit (operators/similarity.
    quantize_int8): per-vector scale, an md5 digest of the full int8 code
    sequence (array columns stringify differently across engines — the
    digest certifies every code byte-exactly), and the reconstruction
    error stats a pipeline gates on before switching its scoring tier to
    the 4×-smaller table."""
    from ..operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(emb)
    return q.select(
        "vec_id",
        "scale",
        F.md5(F.array_join("qvec", ",")).alias("codes_md5"),
        "max_abs_err",
        "cos_recon",
    ).orderBy("vec_id")


_Q112_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s
  FROM v
), q AS (
  SELECT vec_id, v, s,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS INTEGER))
              ELSE list_transform(v, x -> 0) END AS qvec
  FROM scaled
), r AS (
  SELECT vec_id, v, s, qvec,
         list_transform(qvec, c -> c * s / 127.0) AS recon
  FROM q
)
SELECT vec_id,
       round(s, 4) AS scale,
       md5(array_to_string(qvec, ',')) AS codes_md5,
       round(CASE WHEN s > 0 THEN
         list_max(list_transform(list_zip(v, recon),
                                 p -> abs(p[1] - p[2])))
         ELSE 0.0 END, 6) AS max_abs_err,
       round(CASE WHEN s > 0 THEN
         list_dot_product(v, recon)
         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(recon, recon)))
         ELSE 1.0 END, 6) AS cos_recon
FROM r
ORDER BY vec_id
"""


def q113_sq8_search_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search ON the int8 tier (q112's output) and audit it against the
    exact float scan (the q22 machinery): per query, top-5 by
    reconstructed cosine over int8 codes, reported as the overlap with
    the exact top-5 plus the quantized hit list. The integer dot product
    Σ qa·qb is EXACT arithmetic — no float-summation ordering between
    engines at all; only the per-pair scale/norm division is floating,
    and that's one deterministic expression per pair. This is the audit
    a pipeline runs before switching its scoring tier to the 4×-smaller
    table: recall@5 per query, not a global average that can hide a bad
    query."""
    from ..operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    qz = quantize_int8(emb).select("vec_id", "scale", "qvec")
    qside = qz.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qs"),
        F.col("qvec").alias("qq"),
    )
    cside = qz.filter(F.col("vec_id") >= 5)
    # integer dot (exact), norms of the int codes (exact ints under sqrt)
    idot = F.aggregate(
        F.zip_with("qq", "qvec", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inorm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    scored = cside.join(F.broadcast(qside)).select(
        "query_id",
        "vec_id",
        (
            idot.cast("double") / (inorm(F.col("qq")) * inorm(F.col("qvec")))
        ).alias("cos8"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos8").desc(), "vec_id")
    top8 = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id")
    )
    from ..operators.similarity import cosine_topk

    exact = cosine_topk(
        emb.filter(F.col("vec_id") >= 5),
        emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id"),
        k=5,
    ).select("query_id", "vec_id")
    hits = top8.join(exact, ["query_id", "vec_id"], "left_semi")
    return (
        top8.groupBy("query_id")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("_ids"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_overlap")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.array_join(F.transform("_ids", lambda x: x.cast("string")), ",").alias(
                "sq8_top5"
            ),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap_at_5"),
        )
        .orderBy("query_id")
    )


_Q113_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), qz AS (
  SELECT vec_id,
         list_max(list_transform(v, x -> abs(x))) AS s,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN list_transform(v, x -> CAST(round(
                     x / list_max(list_transform(v, y -> abs(y))) * 127)
                   AS INTEGER))
              ELSE list_transform(v, x -> 0) END AS qvec,
         v
  FROM v
), scored8 AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         CAST(list_dot_product(
           list_transform(q.qvec, x -> CAST(x AS BIGINT)),
           list_transform(c.qvec, x -> CAST(x AS BIGINT))) AS DOUBLE)
         / (sqrt(CAST(list_dot_product(
              list_transform(q.qvec, x -> CAST(x AS BIGINT)),
              list_transform(q.qvec, x -> CAST(x AS BIGINT))) AS DOUBLE))
            * sqrt(CAST(list_dot_product(
              list_transform(c.qvec, x -> CAST(x AS BIGINT)),
              list_transform(c.qvec, x -> CAST(x AS BIGINT))) AS DOUBLE)))
           AS cos8
  FROM qz q JOIN qz c ON q.vec_id < 5 AND c.vec_id >= 5
), top8 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos8 DESC, vec_id
           ) AS rank
    FROM scored8
  ) WHERE rank <= 5
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id
           ) AS rank
    FROM v q JOIN v c ON q.vec_id < 5 AND c.vec_id >= 5
  ) WHERE rank <= 5
)
SELECT t.query_id,
       array_to_string(list_sort(list(t.vec_id)), ',') AS sq8_top5,
       CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap_at_5
FROM top8 t
LEFT JOIN exact e ON e.query_id = t.query_id AND e.vec_id = t.vec_id
GROUP BY t.query_id
ORDER BY t.query_id
"""


def q115_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical cosine near-dup pairs
    (operators/dedup.sparse_cosine_pairs): count-weighted word-trigram
    vectors, inverted-index candidate generation with the df ≤ 1000
    hot-term cap, join-free pair expansion, ONE exact-integer dot-product
    rollup. Complements q24 (unweighted Jaccard) — cosine weighs repeated
    shingles, the signal that separates "shares a header once" from "is
    80% the same page". The dot and both norms are exact BIGINTs in the
    output, so the oracle hash-checks the whole candidate+score pipeline,
    and the one float (cosine) is a single correctly-rounded expression
    over those integers on both engines."""
    from ..operators.dedup import sparse_cosine_pairs

    docs = load_table(spark, sf_dir, "documents")
    return sparse_cosine_pairs(
        docs, n=3, min_df=2, max_df=1000, threshold=0.3
    ).orderBy("doc_a", "doc_b")


_Q115_SQL = """
WITH g AS (
  SELECT doc_id, shingle, count(*) AS c FROM (
    SELECT doc_id,
           unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in range(1, len(w) - 1)]) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  ) GROUP BY doc_id, shingle
), norms AS (
  SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS norm2 FROM g GROUP BY doc_id
), terms AS (
  -- min_df=2 (singleton terms form no pair), max_df=1000 hot-term cap
  SELECT shingle FROM g GROUP BY shingle
  HAVING count(*) BETWEEN 2 AND 1000
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM g a
  JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.shingle IN (SELECT shingle FROM terms)
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot, na.norm2 AS norm2_a, nb.norm2 AS norm2_b,
       round(dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE round(dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) >= 0.3
ORDER BY doc_a, doc_b
"""


def q117_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-iteration BPE merge scoring (operators/bpe.py) — tokenizer
    training at corpus scale. The corpus collapses to its VOCABULARY
    relation in one word-count pass; adjacent char pairs are counted on
    that vocab weighted by word frequency (subword-nmt's structure), so
    at 100 TB the pair space never sees corpus bytes. Exact integer
    counts end-to-end; the full iterative trainer (argmax → codegen
    merge fold → recount) is pytest-pinned to the Sennrich toy corpus."""
    from ..operators.bpe import bpe_merge_candidates

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_candidates(docs, top_k=20)


_Q117_SQL = """
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
), vocab AS (
  SELECT w, count(*) AS freq FROM words WHERE len(w) > 0 GROUP BY w
), pairs AS (
  SELECT w, freq, substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym
  FROM (
    SELECT w, freq, unnest(range(1, len(w))) AS i
    FROM vocab WHERE len(w) >= 2
  )
), agg AS (
  SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS n_occurrences,
         count(DISTINCT w) AS n_words
  FROM pairs GROUP BY 1, 2
)
SELECT row_number() OVER (ORDER BY n_occurrences DESC, left_sym, right_sym)
         AS rank,
       left_sym, right_sym, n_occurrences, n_words
FROM agg
ORDER BY n_occurrences DESC, left_sym, right_sym
LIMIT 20
"""


def q119_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet — the "data card" summary a training
    run records next to its checkpoints: volume (docs/chars/tokens),
    exact-duplicate rate, language mix, and the dominant language with
    its share. ONE corpus scan: the first aggregate groups to
    (source, lang, text-hash) — at most one row per distinct document —
    and every datasheet number rolls up from that narrow relation; the
    corpus text never shuffles (only the md5 and three integers do).
    The two ratios are single divisions of exact integers, rounded
    identically in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.groupBy(
        "source", "lang", F.md5("text").alias("ch")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.size(F.split("text", " "))).alias("toks"),
    )
    per_lang = base.groupBy("source", "lang").agg(
        F.sum("cnt").alias("lang_docs")
    )
    w = W.partitionBy("source").orderBy(F.col("lang_docs").desc(), "lang")
    top = (
        per_lang.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("lang_docs").alias("top_lang_docs"),
        )
    )
    per_source = base.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.countDistinct("ch").alias("n_distinct_texts"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("chars").alias("total_chars"),
        F.sum("toks").alias("total_tokens"),
    )
    return (
        per_source.join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_distinct_texts",
            F.round(
                (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
                / F.col("n_docs").cast("double"),
                4,
            ).alias("dup_rate"),
            "n_langs",
            "top_lang",
            "top_lang_docs",
            F.round(
                F.col("top_lang_docs").cast("double")
                / F.col("n_docs").cast("double"),
                4,
            ).alias("top_lang_share"),
            "total_chars",
            "total_tokens",
        )
        .orderBy("source")
    )


_Q119_SQL = """
WITH base AS (
  SELECT source, lang, md5(text) AS ch, count(*) AS cnt,
         CAST(sum(n_chars) AS BIGINT) AS chars,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY 1, 2, 3
), per_lang AS (
  SELECT source, lang, CAST(sum(cnt) AS BIGINT) AS lang_docs
  FROM base GROUP BY 1, 2
), top AS (
  SELECT source, lang AS top_lang, lang_docs AS top_lang_docs FROM (
    SELECT source, lang, lang_docs,
           row_number() OVER (PARTITION BY source
                              ORDER BY lang_docs DESC, lang) AS rn
    FROM per_lang
  ) WHERE rn = 1
), per_source AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
         count(DISTINCT ch) AS n_distinct_texts,
         count(DISTINCT lang) AS n_langs,
         CAST(sum(chars) AS BIGINT) AS total_chars,
         CAST(sum(toks) AS BIGINT) AS total_tokens
  FROM base GROUP BY 1
)
SELECT s.source, n_docs, n_distinct_texts,
       round(CAST(n_docs - n_distinct_texts AS DOUBLE)
             / CAST(n_docs AS DOUBLE), 4) AS dup_rate,
       n_langs, top_lang, top_lang_docs,
       round(CAST(top_lang_docs AS DOUBLE)
             / CAST(n_docs AS DOUBLE), 4) AS top_lang_share,
       total_chars, total_tokens
FROM per_source s JOIN top t ON t.source = s.source
ORDER BY s.source
"""


def q120_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair mining for contrastive training
    (operators/sampling.contrastive_negatives): 4 reproducible partners
    per document via the md5 ring offset over the epoch-shuffle dense
    index — self-pairs impossible by arithmetic, no corpus cross-join,
    one co-partitionable integer-key attach. The oracle replays the
    whole chain (rank, hash, modular offset, join) exactly."""
    from ..operators.sampling import contrastive_negatives

    docs = load_table(spark, sf_dir, "documents")
    return contrastive_negatives(docs, k=4, seed="neg0").orderBy(
        "doc_id", "neg_rank"
    )


_Q120_SQL = """
WITH idx AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5('neg0:idx:' || doc_id::VARCHAR), doc_id
         ) - 1 AS pos
  FROM documents
), n AS (
  SELECT count(*) AS n_total FROM documents
), cand AS (
  SELECT i.doc_id, i.pos, n.n_total, j.j AS neg_rank,
         ('0x' || substr(
            md5('neg0:' || i.doc_id::VARCHAR || ':' || j.j::VARCHAR), 1, 8
          ))::BIGINT AS h
  FROM idx i
  CROSS JOIN n
  CROSS JOIN (SELECT unnest(range(1, 5)) AS j) j
  WHERE n.n_total >= 2
)
SELECT c.doc_id, c.neg_rank, p.doc_id AS neg_doc_id
FROM (
  SELECT doc_id, neg_rank,
         (pos + 1 + (h % (n_total - 1))) % n_total AS neg_pos
  FROM cand
) c
JOIN idx p ON p.pos = c.neg_pos
ORDER BY c.doc_id, c.neg_rank
"""


def q122_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-centroid drift between two snapshot halves of
    the embeddings table (operators/similarity.embedding_drift):
    components quantize to integers so the per-dim sums are exact
    bigints under ANY aggregation order — the float-sum-across-rows
    hazard is designed out — and the only floats are the final
    per-label folds over 64 aggregated sums, bit-identical in SQL."""
    from ..operators.similarity import embedding_drift

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 250)
    new = emb.filter(F.col("vec_id") >= 250)
    return embedding_drift(old, new).orderBy("label")


_Q122_SQL = """
WITH q AS (
  SELECT label, j.j AS dim,
         CAST(round(embedding[j.j + 1]::DOUBLE * 10000) AS BIGINT) AS q,
         (vec_id < 250) AS is_old
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
), sums AS (
  SELECT label, is_old, dim, CAST(sum(q) AS BIGINT) AS s
  FROM q GROUP BY 1, 2, 3
), vecs AS (
  SELECT label, is_old,
         list_transform(list(s ORDER BY dim), v -> v::DOUBLE) AS svec
  FROM sums GROUP BY 1, 2
), counts AS (
  SELECT label, (vec_id < 250) AS is_old, count(*) AS n
  FROM embeddings GROUP BY 1, 2
), sides AS (
  SELECT v.label, v.is_old, v.svec, c.n
  FROM vecs v JOIN counts c ON c.label = v.label AND c.is_old = v.is_old
), j AS (
  SELECT o.label, o.svec AS so, o.n AS n_old, nw.svec AS sn, nw.n AS n_new
  FROM sides o JOIN sides nw
    ON nw.label = o.label AND o.is_old AND NOT nw.is_old
), m AS (
  SELECT label, n_old, n_new,
         round(list_dot_product(so, sn)
               / (sqrt(list_dot_product(so, so))
                  * sqrt(list_dot_product(sn, sn))), 6) AS centroid_cosine,
         list_transform(list_zip(sn, so),
                        p -> (p[1] / CAST(n_new AS DOUBLE)
                              - p[2] / CAST(n_old AS DOUBLE)) / 10000.0)
           AS md
  FROM j
)
SELECT label, n_old, n_new, centroid_cosine,
       round(sqrt(list_dot_product(md, md)), 6) AS mean_shift_l2,
       (centroid_cosine < 0.98) AS drift
FROM m
ORDER BY label
"""


def q123_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the documents table's quasi-identifiers
    (lang, source, length bucket) — the governance check a release
    pipeline runs before publishing: per equivalence class, its size;
    flagged when below k=5 (those rows are re-identifiable by their
    quasi-identifier combination alone and need suppression or
    generalization). One grouped count on a bounded composite key plus
    a 1-row summary join giving the table's anonymity level (the min
    class size — the k the release actually provides). All integers;
    the audit replays exactly in SQL.

    At 100 TB this is one map-side-combinable count on a low-cardinality
    key — audit cost is scan-bound, and the flagged classes (the only
    rows a human reviews) are bounded by the QI space, not the data."""
    docs = load_table(spark, sf_dir, "documents")
    qi = docs.select(
        "lang",
        "source",
        (F.floor(F.col("n_chars") / 100) * 100).alias("len_bucket"),
    )
    classes = qi.groupBy("lang", "source", "len_bucket").agg(
        F.count("*").alias("class_size")
    )
    level = classes.agg(F.min("class_size").alias("anonymity_level"))
    return (
        classes.crossJoin(F.broadcast(level))
        .select(
            "lang",
            "source",
            "len_bucket",
            "class_size",
            (F.col("class_size") < 5).alias("below_k"),
            "anonymity_level",
        )
        .orderBy("lang", "source", "len_bucket")
    )


_Q123_SQL = """
WITH classes AS (
  SELECT lang, source,
         CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket,
         count(*) AS class_size
  FROM documents GROUP BY 1, 2, 3
), level AS (
  SELECT min(class_size) AS anonymity_level FROM classes
)
SELECT lang, source, len_bucket, class_size,
       (class_size < 5) AS below_k, anonymity_level
FROM classes CROSS JOIN level
ORDER BY lang, source, len_bucket
"""


def q130_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall, driver-visible: the MinHash-LSH tier (q25) audited
    against the exact n-gram-Jaccard tier (q24) on the same corpus and
    threshold — pair counts on both sides, the intersection, and
    recall/precision. The pytest recall gate already pins this
    per-round; registering it as a query puts the number in the
    official correctness record with a full SQL replay (both tiers'
    oracles composed). Exact integer counts; two rounded divisions."""
    from ..operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    # Each tier's pair relation feeds TWO audit branches (its own count
    # and the intersection); localCheckpoint materializes the narrow
    # (doc_a, doc_b) relations once instead of re-running the dedup
    # pipelines per branch — pair counts are corpus-bounded and tiny.
    exact = (
        ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    lsh = (
        minhash_lsh_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    # Three 1-row aggregates composed with scalar crossJoins — the
    # audit itself is one tiny plan.
    out = (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(F.broadcast(lsh.agg(F.count("*").alias("n_lsh"))))
        .crossJoin(
            F.broadcast(
                exact.join(lsh, ["doc_a", "doc_b"]).agg(
                    F.count("*").alias("n_common")
                )
            )
        )
    )
    return out.select(
        "n_exact",
        "n_lsh",
        "n_common",
        F.when(
            F.col("n_exact") > 0,
            F.round(
                F.col("n_common").cast("double")
                / F.col("n_exact").cast("double"),
                4,
            ),
        ).alias("recall"),
        F.when(
            F.col("n_lsh") > 0,
            F.round(
                F.col("n_common").cast("double")
                / F.col("n_lsh").cast("double"),
                4,
            ),
        ).alias("precision"),
    )


def _q130_sql() -> str:
    return f"""
WITH exact_pairs AS (
  SELECT doc_a, doc_b FROM ({_Q24_SQL}) x
), lsh_pairs AS (
  SELECT doc_a, doc_b FROM ({_q25_sql()}) y
), m AS (
  SELECT (SELECT count(*) FROM exact_pairs) AS n_exact,
         (SELECT count(*) FROM lsh_pairs) AS n_lsh,
         (SELECT count(*) FROM exact_pairs e
            JOIN lsh_pairs l
              ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b) AS n_common
)
SELECT n_exact, n_lsh, n_common,
       CASE WHEN n_exact > 0
            THEN round(CAST(n_common AS DOUBLE) / n_exact, 4) END AS recall,
       CASE WHEN n_lsh > 0
            THEN round(CAST(n_common AS DOUBLE) / n_lsh, 4) END AS precision
FROM m
"""


def q134_scaling_subsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested deterministic subsets for scaling-law runs: every doc gets
    the SMALLEST power-of-two percentage tier it belongs to (1, 2, 4,
    …, 64, else 100), assigned by the portable md5-slice hash against
    fixed thresholds — so the 1% set is a strict subset of the 2% set,
    which is a subset of the 4% set, and so on (the nestedness property
    a scaling-law sweep needs: each larger run REUSES the smaller run's
    data exactly). Zero shuffles beyond the rollup: the tier is a pure
    projection; the output is per-tier doc counts plus the cumulative
    (nested) size each training run would read. Nestedness itself is
    pytest-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("scale0:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(10_000),
    )
    tier = (
        F.when(u < 100, 1)
        .when(u < 200, 2)
        .when(u < 400, 4)
        .when(u < 800, 8)
        .when(u < 1600, 16)
        .when(u < 3200, 32)
        .when(u < 6400, 64)
        .otherwise(100)
    )
    per_tier = (
        docs.select(tier.alias("tier_pct"))
        .groupBy("tier_pct")
        .agg(F.count("*").alias("n_docs"))
    )
    w = W.orderBy("tier_pct").rowsBetween(W.unboundedPreceding, 0)
    return (
        per_tier.withColumn("n_cumulative", F.sum("n_docs").over(w))
        .orderBy("tier_pct")
    )


_Q134_SQL = """
WITH t AS (
  SELECT CASE
           WHEN u < 100 THEN 1
           WHEN u < 200 THEN 2
           WHEN u < 400 THEN 4
           WHEN u < 800 THEN 8
           WHEN u < 1600 THEN 16
           WHEN u < 3200 THEN 32
           WHEN u < 6400 THEN 64
           ELSE 100 END AS tier_pct
  FROM (
    SELECT ('0x' || substr(md5('scale0:' || doc_id::VARCHAR), 1, 8))
             ::BIGINT % 10000 AS u
    FROM documents
  )
), per_tier AS (
  SELECT tier_pct, count(*) AS n_docs FROM t GROUP BY tier_pct
)
SELECT tier_pct, n_docs,
       CAST(sum(n_docs) OVER (ORDER BY tier_pct
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS n_cumulative
FROM per_tier
ORDER BY tier_pct
"""


def q136_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test assignment with EXACT integer quotas:
    within each language stratum, docs are ranked by the portable
    md5 hash (deterministic, reproducible) and the first ⌊n/10⌋ go to
    val, the next ⌊n/10⌋ to test, the rest to train — so every stratum
    hits its 10 % quotas exactly (floor semantics documented; no
    binomial wobble, unlike rand()-thresholding, which at small strata
    can starve a split entirely). Complements q83 (near-dup-group
    leakage safety): this is the proportional-allocation layer. One
    per-stratum window on the uniform hash key; output is the
    (lang, split) count matrix the training config records."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("split0:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(h, "doc_id")
    n = F.count("*").over(W.partitionBy("lang"))
    r = F.row_number().over(w)
    split = (
        F.when(r <= F.floor(n / 10), "val")
        .when(r <= 2 * F.floor(n / 10), "test")
        .otherwise("train")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


_Q136_SQL = """
WITH ranked AS (
  SELECT lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('split0:' || doc_id::VARCHAR), doc_id
         ) AS r,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       CASE WHEN r <= n // 10 THEN 'val'
            WHEN r <= 2 * (n // 10) THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n_docs
FROM ranked
GROUP BY 1, 2
ORDER BY lang, split
"""


def q137_dedup_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup effectiveness — the number that justifies the
    dedup pipeline's existence: raw token volume vs EFFECTIVE tokens
    (global exact-dedup keepers only, lowest doc_id wins, attributed to
    the keeper's source) and the savings ratio. The keeper decision is
    one count-window on the uniform md5 key (q21/q93 discipline — text
    never shuffles); both rollups are exact integers; savings is the
    single rounded division."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    raw = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("raw_tokens"),
    )
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    eff = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum(toks).alias("effective_tokens"),
        )
    )
    return (
        raw.join(eff, "source")
        .select(
            "source",
            "n_docs",
            "kept_docs",
            "raw_tokens",
            "effective_tokens",
            F.round(
                (F.col("raw_tokens") - F.col("effective_tokens")).cast(
                    "double"
                )
                / F.col("raw_tokens").cast("double"),
                4,
            ).alias("token_savings"),
        )
        .orderBy("source")
    )


_Q137_SQL = """
WITH toks AS (
  SELECT doc_id, source, text, len(string_split(text, ' ')) AS t
  FROM documents
), raw AS (
  SELECT source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS raw_tokens
  FROM toks GROUP BY source
), keepers AS (
  SELECT source, t FROM (
    SELECT source, t,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM toks
  ) WHERE rn = 1
), eff AS (
  SELECT source, count(*) AS kept_docs,
         CAST(sum(t) AS BIGINT) AS effective_tokens
  FROM keepers GROUP BY source
)
SELECT r.source, n_docs, kept_docs, raw_tokens, effective_tokens,
       round(CAST(raw_tokens - effective_tokens AS DOUBLE)
             / CAST(raw_tokens AS DOUBLE), 4) AS token_savings
FROM raw r JOIN eff e ON e.source = r.source
ORDER BY r.source
"""


def q139_exact_heavy_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter bigrams via the two-phase Misra-Gries pattern
    (operators/sketches.exact_heavy_hitters, m=1000): per-partition
    bounded summaries → exact recount of the candidate union — the full
    bigram key space never shuffles, yet the result is EXACT (the MG
    guarantee means no qualifying item can be missing, and the recount
    kills every false candidate). The oracle is the PLAIN
    GROUP BY HAVING cnt·1000 > n — partitioning cannot change the
    answer, which is the whole claim."""
    from ..operators.sketches import exact_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    # Guarded sequence: sequence(1, 0) in Spark is the DESCENDING [1, 0],
    # not empty, so a 1-word text would index element_at(w, 0) and throw —
    # emit an explicitly empty array for texts with < 2 words instead.
    bigrams = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN"
                " transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat_ws(' ', element_at(split(text, ' '), i),"
                " element_at(split(text, ' '), i + 1)))"
                " ELSE CAST(array() AS array<string>) END"
            )
        ).alias("bigram")
    )
    return exact_heavy_hitters(bigrams, "bigram", m=1000)


_Q139_SQL = """
WITH b AS (
  SELECT unnest([w[i] || ' ' || w[i + 1] for i in range(1, len(w))]) AS bigram
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
), n AS (
  SELECT count(*) AS n_total FROM b
)
SELECT bigram, count(*) AS cnt, n.n_total
FROM b CROSS JOIN n
GROUP BY bigram, n.n_total
HAVING count(*) * 1000 > n.n_total
ORDER BY cnt DESC, bigram
"""


def q141_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram — the shape report a dedup run
    publishes: how many clusters of each size exist, how many docs and
    how many would be DROPPED at each size (size − 1 per cluster), plus
    the singleton count (docs in no near-dup pair at all), derived by
    subtracting clustered docs from the corpus total. Composes the q42
    closure; everything after it is two tiny rollups. Exact integers
    throughout."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters")
    )
    clustered = sizes.agg(
        F.coalesce(F.sum("cluster_size"), F.lit(0)).alias("n_clustered")
    )
    total = docs.agg(F.count("*").alias("n_total"))
    singles = (
        clustered.crossJoin(F.broadcast(total))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("n_total") - F.col("n_clustered")).alias("n_clusters"),
        )
    )
    return (
        hist.unionByName(singles)
        .withColumn(
            "n_docs", F.col("cluster_size") * F.col("n_clusters")
        )
        .withColumn(
            "n_dropped_on_dedup",
            (F.col("cluster_size") - 1) * F.col("n_clusters"),
        )
        .orderBy("cluster_size")
    )


def _q141_sql() -> str:
    return f"""
WITH RECURSIVE {_Q42_CTES}
, csizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
), hist AS (
  SELECT cluster_size, count(*) AS n_clusters FROM csizes GROUP BY cluster_size
  UNION ALL
  SELECT 1 AS cluster_size,
         (SELECT count(*) FROM documents)
           - coalesce((SELECT sum(cluster_size) FROM csizes), 0) AS n_clusters
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * n_clusters AS BIGINT) AS n_dropped_on_dedup
FROM hist
ORDER BY cluster_size
"""


def q142_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model evaluation at corpus scale: the q29 NB language-ID
    predictions cross-tabulated against the gold ``lang`` labels — the
    confusion matrix plus per-actual-language recall share. The entire
    prediction pipeline is already SQL-replayable (q29), so the oracle
    composes it and the evaluation itself is two exact rollups + one
    rounded division; a green hash certifies predictions AND the eval
    arithmetic together. This is the pattern for evaluating ANY
    relational model in the engine against labels it trained beside."""
    from ..operators.text import fit_lang_profiles, predict_lang

    docs = load_table(spark, sf_dir, "documents")
    profiles = fit_lang_profiles(docs)
    preds = predict_lang(docs, profiles).select("doc_id", "pred_lang")
    j = preds.join(
        docs.select("doc_id", F.col("lang").alias("actual_lang")), "doc_id"
    )
    totals = j.groupBy("actual_lang").agg(
        F.count("*").alias("actual_total")
    )
    return (
        j.groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .join(totals, "actual_lang")
        .select(
            "actual_lang",
            "pred_lang",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double")
                / F.col("actual_total").cast("double"),
                4,
            ).alias("share_of_actual"),
        )
        .orderBy("actual_lang", "pred_lang")
    )


def _q142_sql() -> str:
    return f"""
WITH preds AS (
  SELECT doc_id, pred_lang FROM ({_Q29_SQL}) q29
), j AS (
  SELECT p.doc_id, p.pred_lang, d.lang AS actual_lang
  FROM preds p JOIN documents d USING (doc_id)
), totals AS (
  SELECT actual_lang, count(*) AS actual_total FROM j GROUP BY actual_lang
)
SELECT j.actual_lang, j.pred_lang, count(*) AS n_docs,
       round(CAST(count(*) AS DOUBLE) / any_value(t.actual_total), 4)
         AS share_of_actual
FROM j JOIN totals t ON t.actual_lang = j.actual_lang
GROUP BY j.actual_lang, j.pred_lang
ORDER BY j.actual_lang, j.pred_lang
"""


def q143_classifier_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection for the quality classifier: sweep the
    q104 score threshold and measure precision/recall against the q58
    heuristic gate as pseudo-labels — exactly how production pipelines
    calibrate a learned filter against the rule-based one before
    swapping it in (DCLM/CCNet practice). Thresholding happens on the
    ROUNDED score both engines share, counts are exact integers, and
    the P/R columns are guarded rounded divisions. One line per
    threshold — the table you pick the knee from."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select(
        "doc_id", "score"
    )
    labels = q58_gopher_quality_flags(spark, sf_dir).select(
        "doc_id", "keep"
    )
    j = scores.join(labels, "doc_id")
    th = F.explode(
        F.array(*[F.lit(x) for x in (0.3, 0.4, 0.5, 0.6, 0.7)])
    ).alias("threshold")
    e = j.select("score", "keep", th)
    pred = F.col("score") >= F.col("threshold")
    agg = e.groupBy("threshold").agg(
        F.sum(F.when(pred & F.col("keep"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~F.col("keep"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & F.col("keep"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~F.col("keep"), 1).otherwise(0)).alias("tn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 4
        ),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 4
        ),
    )
    return agg.select(
        "threshold", "tp", "fp", "fn", "tn",
        prec.alias("precision"), rec.alias("recall"),
    ).orderBy("threshold")


def _q143_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT s.score, l.keep, t.threshold
  FROM scores s
  JOIN labels l USING (doc_id)
  CROSS JOIN (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7]) AS threshold) t
), agg AS (
  SELECT threshold,
         CAST(sum(CASE WHEN score >= threshold AND keep THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(sum(CASE WHEN score >= threshold AND NOT keep THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(sum(CASE WHEN score < threshold AND keep THEN 1 ELSE 0 END)
              AS BIGINT) AS fn,
         CAST(sum(CASE WHEN score < threshold AND NOT keep THEN 1 ELSE 0 END)
              AS BIGINT) AS tn
  FROM e GROUP BY threshold
)
SELECT threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0
            THEN round(CAST(tp AS DOUBLE) / (tp + fp), 4) END AS precision,
       CASE WHEN tp + fn > 0
            THEN round(CAST(tp AS DOUBLE) / (tp + fn), 4) END AS recall
FROM agg
ORDER BY threshold
"""


def q145_interleaved_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-interleaved training order — the fix for homogeneous
    batches: docs are shuffled WITHIN each source (md5 rank) and then
    round-robin interleaved across sources, so every contiguous batch
    carries the corpus's source mix. The global position needs NO rank
    machinery at all: with the per-source size table broadcast as one
    array, pos(r, s) = Σ_s' min(r, n_s') + |{s' < s : n_s' > r}| — a
    pure codegen fold over ~source-count array entries per row, exactly
    the row_number the naive ORDER BY (r, source) would assign
    (the oracle proves the closed form). Even cheaper than the q116
    bucket-offset rank: one within-source window + a broadcast fold,
    zero extra exchanges."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("il0:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(key, "doc_id")
    ranked = docs.select("doc_id", "source").withColumn(
        "r", F.row_number().over(w) - 1
    )
    sizes = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("source", "n"))
            ).alias("sz")
        )
    )
    pos = F.expr(
        "aggregate(sz, 0L, (acc, x) -> acc + least(CAST(r AS BIGINT), x.n)"
        " + CASE WHEN x.source < source AND x.n > r THEN 1L ELSE 0L END)"
    )
    return (
        ranked.crossJoin(F.broadcast(sizes))
        .withColumn("global_pos", pos)
        .withColumn("batch_id", F.floor(F.col("global_pos") / 64))
        .select("doc_id", "source", "r", "global_pos", "batch_id")
        .orderBy("global_pos")
    )


_Q145_SQL = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('il0:' || doc_id::VARCHAR), doc_id
         ) - 1 AS r
  FROM documents
)
SELECT doc_id, source, r,
       row_number() OVER (ORDER BY r, source) - 1 AS global_pos,
       (row_number() OVER (ORDER BY r, source) - 1) // 64 AS batch_id
FROM ranked
ORDER BY global_pos
"""


def q146_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query IVF recall, driver-visible (the q113 audit pattern
    applied to the IVF tier): the q56 hash-seeded IVF search (nprobe
    4/16) against the q22 brute-force top-5 — per query, the pruned
    tier's hit list and its overlap with ground truth. Both pipelines
    already replay in SQL, so the composed oracle certifies the search
    AND the audit; the pytest recall gate becomes an official
    correctness row."""
    from ..operators.similarity import cosine_topk, hash_seed_centroids, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = hash_seed_centroids(corpus, nlist=16)
    ivf = ivf_search(corpus, queries, cents, k=5, nprobe=4).select(
        "query_id", "vec_id"
    )
    brute = cosine_topk(corpus, queries, k=5).select(
        "query_id", F.col("vec_id").alias("bvec")
    )
    hits = (
        ivf.alias("i")
        .join(
            brute.alias("b"),
            (F.col("i.query_id") == F.col("b.query_id"))
            & (F.col("i.vec_id") == F.col("b.bvec")),
            "left",
        )
        .select(
            F.col("i.query_id").alias("query_id"),
            F.col("i.vec_id").alias("vec_id"),
            F.col("b.bvec").isNotNull().alias("hit"),
        )
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.col("vec_id").cast("string")))
            ).alias("ivf_top5"),
            F.sum(F.col("hit").cast("long")).alias("n_overlap_at_5"),
        )
        .orderBy("query_id")
    )


def _q146_sql() -> str:
    return f"""
WITH ivf AS (
  SELECT query_id, vec_id FROM ({_Q56_SQL}) s
), brute AS (
  SELECT query_id, vec_id AS bvec FROM ({_Q22_SQL}) b
)
SELECT i.query_id,
       array_to_string(list_sort(list(i.vec_id::VARCHAR)), ',') AS ivf_top5,
       CAST(sum(CASE WHEN br.bvec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap_at_5
FROM ivf i
LEFT JOIN brute br ON br.query_id = i.query_id AND br.bvec = i.vec_id
GROUP BY i.query_id
ORDER BY i.query_id
"""


def q147_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one oracle-checked funnel: input →
    heuristic gate (q58 keep) → exact dedup (min-id keeper per md5
    among gate survivors) → near-dup dedup (min SURVIVING id per q42
    cluster; unclustered survivors pass) — per-stage counts and
    retention. Each stage is individually oracle-checked elsewhere;
    this row certifies their COMPOSITION, the thing a production corpus
    build actually runs (pipelines/corpus.py is the executable twin).
    All integers; ratios are single rounded divisions."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    gate = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    g = docs.join(gate, "doc_id").filter(F.col("keep"))
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (
        g.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    comp = connected_components(pairs)
    surv = exact.join(comp, "doc_id", "left")
    clustered_keep = (
        surv.filter(F.col("component").isNotNull())
        .groupBy("component")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    final = surv.filter(F.col("component").isNull()).select("doc_id").unionByName(
        clustered_keep
    )
    n_input = docs.agg(F.count("*").alias("n_input"))
    n_gate = g.agg(F.count("*").alias("n_after_gate"))
    n_exact = exact.agg(F.count("*").alias("n_after_exact"))
    n_final = final.agg(F.count("*").alias("n_after_neardup"))
    return (
        n_input.crossJoin(F.broadcast(n_gate))
        .crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_final))
        .select(
            "n_input",
            "n_after_gate",
            "n_after_exact",
            "n_after_neardup",
            F.round(
                F.col("n_after_neardup").cast("double")
                / F.col("n_input").cast("double"),
                4,
            ).alias("retention"),
        )
    )


def _q147_sql() -> str:
    return f"""
WITH RECURSIVE {_Q42_CTES}
, gate AS (
  SELECT doc_id FROM ({_Q58_SQL}) g WHERE keep
), gdocs AS (
  SELECT d.doc_id, d.text FROM documents d JOIN gate USING (doc_id)
), exact AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gdocs
  ) WHERE rn = 1
), surv AS (
  SELECT e.doc_id, c.component
  FROM exact e LEFT JOIN comp c USING (doc_id)
), final AS (
  SELECT doc_id FROM surv WHERE component IS NULL
  UNION ALL
  SELECT min(doc_id) FROM surv WHERE component IS NOT NULL GROUP BY component
)
SELECT (SELECT count(*) FROM documents) AS n_input,
       (SELECT count(*) FROM gate) AS n_after_gate,
       (SELECT count(*) FROM exact) AS n_after_exact,
       (SELECT count(*) FROM final) AS n_after_neardup,
       round(CAST((SELECT count(*) FROM final) AS DOUBLE)
             / (SELECT count(*) FROM documents), 4) AS retention
"""


def q148_contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination accounting per source — the release-gate view of
    q50's doc-level flags: how many docs each source contributes, how
    many carry eval-set n-gram collisions, the contamination rate, and
    the overlap-depth maximum (one deeply-contaminated doc is a
    different problem than many grazing ones). Composes the q50 scan
    (broadcast eval shingles, no corpus self-join) with one
    source-cardinality rollup; exact integers + one rounded rate."""
    from ..operators.dedup import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    flagged = ngram_contamination(corpus, eval_docs, n=4).select(
        "doc_id", "n_shared_ngrams"
    )
    j = corpus.select("doc_id", "source").join(flagged, "doc_id", "left")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("n_shared_ngrams").alias("n_contaminated"),
            F.coalesce(F.max("n_shared_ngrams"), F.lit(0)).alias(
                "max_shared_ngrams"
            ),
        )
        .withColumn(
            "contamination_rate",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_docs").cast("double"),
                4,
            ),
        )
        .orderBy("source")
    )


_Q148_SQL = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(w[i:i+3], ' ') for i in range(1, len(w) - 2)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), needles AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < 5
), flagged AS (
  SELECT s.doc_id, count(*) AS n_shared_ngrams
  FROM sh s JOIN needles n USING (shingle)
  WHERE s.doc_id >= 5
  GROUP BY s.doc_id
)
SELECT d.source,
       count(*) AS n_docs,
       count(f.n_shared_ngrams) AS n_contaminated,
       CAST(coalesce(max(f.n_shared_ngrams), 0) AS BIGINT)
         AS max_shared_ngrams,
       round(CAST(count(f.n_shared_ngrams) AS DOUBLE) / count(*), 4)
         AS contamination_rate
FROM documents d
LEFT JOIN flagged f ON f.doc_id = d.doc_id
WHERE d.doc_id >= 5
GROUP BY d.source
ORDER BY d.source
"""


def q149_signature_tier_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-tier dedup agreement, driver-visible: exact Jaccard (q24)
    as ground truth vs BOTH signature tiers — MinHash-LSH (q25) and
    SimHash (q26) — pair counts, per-tier overlap with truth, and
    recall. Completes the q130 audit across the whole signature family:
    one table says which approximate tier you can trust at this
    threshold (LSH recalls everything; SimHash's coarser 64-bit
    signature trades recall for cost — the number makes the trade
    visible). All three pipelines replay in the composed oracle.

    Cost note (r8): the exact tier and the LSH verify share ONE
    cached _sized_shingles pass (the dominant token-explode cost)
    via the operators' ``sh`` seam — byte-identical results, one
    corpus shingle pass instead of two."""
    from ..operators.dedup import (
        _sized_shingles,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = _sized_shingles(docs, "text", "doc_id", 3, 1000).localCheckpoint(
        eager=True
    )
    exact = (
        ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000, sh=sh)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    lsh = (
        minhash_lsh_pairs(
            docs, threshold=0.5, sh=sh.filter(F.col("_bucket_n") >= 2)
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    sim = (
        simhash_pairs(docs)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )

    def n(df, name):
        return df.agg(F.count("*").alias(name))

    def inter(a, b, name):
        return a.join(b, ["doc_a", "doc_b"]).agg(F.count("*").alias(name))

    out = (
        n(exact, "n_exact")
        .crossJoin(F.broadcast(n(lsh, "n_lsh")))
        .crossJoin(F.broadcast(n(sim, "n_simhash")))
        .crossJoin(F.broadcast(inter(lsh, exact, "lsh_hits")))
        .crossJoin(F.broadcast(inter(sim, exact, "simhash_hits")))
    )
    rec = lambda h: F.when(  # noqa: E731
        F.col("n_exact") > 0,
        F.round(F.col(h).cast("double") / F.col("n_exact").cast("double"), 4),
    )
    return out.select(
        "n_exact", "n_lsh", "n_simhash", "lsh_hits", "simhash_hits",
        rec("lsh_hits").alias("lsh_recall"),
        rec("simhash_hits").alias("simhash_recall"),
    )


def _q149_sql() -> str:
    return f"""
WITH exact_pairs AS (
  SELECT doc_a, doc_b FROM ({_Q24_SQL}) x
), lsh_pairs AS (
  SELECT doc_a, doc_b FROM ({_q25_sql()}) y
), sim_pairs AS (
  SELECT doc_a, doc_b FROM ({_Q26_SQL}) z
), m AS (
  SELECT (SELECT count(*) FROM exact_pairs) AS n_exact,
         (SELECT count(*) FROM lsh_pairs) AS n_lsh,
         (SELECT count(*) FROM sim_pairs) AS n_simhash,
         (SELECT count(*) FROM lsh_pairs l JOIN exact_pairs e
            ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b) AS lsh_hits,
         (SELECT count(*) FROM sim_pairs s JOIN exact_pairs e
            ON e.doc_a = s.doc_a AND e.doc_b = s.doc_b) AS simhash_hits
)
SELECT n_exact, n_lsh, n_simhash, lsh_hits, simhash_hits,
       CASE WHEN n_exact > 0
            THEN round(CAST(lsh_hits AS DOUBLE) / n_exact, 4) END
         AS lsh_recall,
       CASE WHEN n_exact > 0
            THEN round(CAST(simhash_hits AS DOUBLE) / n_exact, 4) END
         AS simhash_recall
FROM m
"""


def q156_boilerplate_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal (operators/dedup.boilerplate_excision):
    8-word chunks appearing in ≥ 2 distinct docs are excised from EVERY
    doc — including the first copy, which q53's keep-first rule retains.
    The pair of queries documents the policy difference on one chunking:
    q53 deduplicates, q156 censors."""
    from ..operators.dedup import boilerplate_excision

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_excision(docs, chunk_words=8, min_docs=2).orderBy("doc_id")


_Q156_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), ix AS (
  SELECT doc_id, w,
         unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS ci
  FROM w
), chunks AS (
  SELECT doc_id, ci, array_to_string(w[ci*8+1 : ci*8+8], ' ') AS chunk
  FROM ix
), f AS (
  SELECT chunk, count(DISTINCT doc_id) AS df_docs FROM chunks GROUP BY chunk
), marked AS (
  SELECT c.doc_id, c.ci, c.chunk, f.df_docs < 2 AS keep
  FROM chunks c JOIN f USING (chunk)
), per_doc AS (
  SELECT doc_id,
         count(*) AS n_chunks,
         CAST(coalesce(sum(CASE WHEN keep THEN 0 ELSE 1 END), 0) AS BIGINT)
           AS n_removed,
         coalesce(string_agg(chunk, ' ' ORDER BY ci) FILTER (WHERE keep), '')
           AS text_clean
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_chunks, 0) AS n_chunks,
       coalesce(p.n_removed, 0) AS n_removed,
       coalesce(p.text_clean, '') AS text_clean
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def q157_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth audit: per source, the doc/token/vocab
    counts of four NESTED corpus prefixes (quarters by the portable doc
    hash — same subset discipline as q134, so prefix 2 contains prefix 1
    by construction) plus the type-token ratio per prefix. A vocabulary
    that stops growing across prefixes signals templated/duplicated text;
    the curve is the standard corpus-health check before tokenizer
    training.

    Scale shape: no global rank — prefix membership is a pure hash range
    per doc. The word stream shuffles once into the (source, word)
    min-bucket aggregate (map-side combine, vocabulary-sized result);
    each vocab word then expands to at most 4 (source, prefix) rows and
    each doc-level token subtotal to at most 4 — both final aggregates
    are |sources|x4-bounded. TTR is the single rounded division of exact
    integers."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10)"
    ).cast("long")
    base = docs.select(
        "source",
        (h % 4).alias("bucket"),
        F.filter(
            F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
        ).alias("_w"),
    )
    # Doc-level subtotals fan out to the prefixes that contain the bucket.
    per_bucket = base.groupBy("source", "bucket").agg(
        F.count("*").alias("docs"), F.sum(F.size("_w")).alias("toks")
    )
    sizes = (
        per_bucket.select(
            "source",
            "docs",
            "toks",
            F.explode(F.sequence(F.col("bucket") + 1, F.lit(4))).alias("p"),
        )
        .groupBy("source", "p")
        .agg(F.sum("docs").alias("n_docs"), F.sum("toks").alias("n_tokens"))
    )
    # A word counts toward every prefix from its FIRST bucket onward.
    first = (
        base.select("source", "bucket", F.explode("_w").alias("word"))
        .groupBy("source", "word")
        .agg(F.min("bucket").alias("b0"))
    )
    vocab = (
        first.select(
            "source",
            F.explode(F.sequence(F.col("b0") + 1, F.lit(4))).alias("p"),
        )
        .groupBy("source", "p")
        .agg(F.count("*").alias("n_vocab"))
    )
    return (
        sizes.join(vocab, ["source", "p"])
        .select(
            "source",
            F.col("p").alias("prefix_quarter"),
            "n_docs",
            "n_tokens",
            "n_vocab",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("n_vocab").cast("double") / F.col("n_tokens"), 6
                ),
            ).alias("ttr"),
        )
        .orderBy("source", "prefix_quarter")
    )


_Q157_SQL = r"""
WITH base AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
           AS bucket,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), per_bucket AS (
  SELECT source, bucket, count(*) AS docs, CAST(sum(len(w)) AS BIGINT) AS toks
  FROM base GROUP BY source, bucket
), sizes AS (
  SELECT source, p, CAST(sum(docs) AS BIGINT) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS n_tokens
  FROM (SELECT *, unnest(range(bucket + 1, 5)) AS p FROM per_bucket)
  GROUP BY source, p
), first AS (
  SELECT source, word, min(bucket) AS b0
  FROM (SELECT source, bucket, unnest(w) AS word FROM base)
  GROUP BY source, word
), vocab AS (
  SELECT source, p, count(*) AS n_vocab
  FROM (SELECT source, unnest(range(b0 + 1, 5)) AS p FROM first)
  GROUP BY source, p
)
SELECT s.source, s.p AS prefix_quarter, s.n_docs, s.n_tokens, v.n_vocab,
       CASE WHEN s.n_tokens > 0
            THEN round(CAST(v.n_vocab AS DOUBLE) / s.n_tokens, 6) END AS ttr
FROM sizes s JOIN vocab v ON s.source = v.source AND s.p = v.p
ORDER BY s.source, prefix_quarter
"""


def q158_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty — the marginal-value audit behind
    source-mixing decisions (a source whose 8-gram mass mostly re-occurs
    in OTHER sources adds little new text; compare SlimPajama's
    cross-source redundancy analysis): per source, total 8-gram
    occurrences, the occurrences whose gram also appears in at least one
    other source, and the novel share.

    Scale shape: the gram stream is the shuffle-free sequence-explode
    carrying only (md5(gram), source); the per-(gram, source) and
    per-gram rollups combine map-side on the hash; the shared/novel mark
    is a same-key join of the |gram, source| relation against the
    |gram|-sized source-count relation (a boilerplate hot gram joins its
    ONE count row). Output is |sources| rows; the share is the single
    rounded division of exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
    )
    base = docs.select("source", words.alias("_w"))
    n = 8
    last = F.size("_w") - n + 1
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    grams = base.select("source", F.explode(idx).alias("_i"), "_w").select(
        "source",
        F.md5(F.expr(f"array_join(slice(_w, _i, {n}), ' ')")).alias("g"),
    )
    per_sg = grams.groupBy("g", "source").agg(F.count("*").alias("occ"))
    per_g = per_sg.groupBy("g").agg(
        F.count("*").alias("n_sources")
    )
    j = per_sg.join(per_g, "g")
    return (
        j.groupBy("source")
        .agg(
            F.sum("occ").alias("n_grams"),
            F.sum(
                F.when(F.col("n_sources") >= 2, F.col("occ")).otherwise(0)
            ).alias("n_shared"),
        )
        .select(
            "source",
            "n_grams",
            "n_shared",
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    (F.col("n_grams") - F.col("n_shared")).cast("double")
                    / F.col("n_grams"),
                    6,
                ),
            ).alias("novel_share"),
        )
        .orderBy("source")
    )


_Q158_SQL = r"""
WITH base AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT source, md5(array_to_string(w[i : i + 7], ' ')) AS g
  FROM (SELECT source, w, unnest(range(1, len(w) - 6)) AS i FROM base)
), per_sg AS (
  SELECT g, source, count(*) AS occ FROM grams GROUP BY g, source
), per_g AS (
  SELECT g, count(*) AS n_sources FROM per_sg GROUP BY g
)
SELECT s.source,
       CAST(sum(s.occ) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN p.n_sources >= 2 THEN s.occ ELSE 0 END) AS BIGINT)
         AS n_shared,
       CASE WHEN sum(s.occ) > 0
            THEN round(CAST(sum(s.occ) -
                   sum(CASE WHEN p.n_sources >= 2 THEN s.occ ELSE 0 END)
                 AS DOUBLE) / CAST(sum(s.occ) AS BIGINT), 6) END
         AS novel_share
FROM per_sg s JOIN per_g p USING (g)
GROUP BY s.source
ORDER BY s.source
"""


def q159_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length fit audit — the table a training run consults before
    fixing max_seq_len: per source and context budget L in {512, 1024,
    2048, 4096}, how many docs fit whole and what fraction of the token
    mass survives truncation at L (sum(min(tokens, L)) / sum(tokens)).
    One corpus scan computing each doc's whitespace token count, a
    4-way literal-array fan-out (each doc row expands to its four (L,
    fits, kept) contributions — no re-scan per budget), and a
    |sources|x4-bounded rollup. Kept-share is the single rounded
    division of exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit(""))
    )
    per_doc = docs.select("source", toks.cast("long").alias("n_tok"))
    fan = per_doc.select(
        "source",
        "n_tok",
        F.explode(F.array(*[F.lit(x) for x in (512, 1024, 2048, 4096)])).alias(
            "context_len"
        ),
    )
    return (
        fan.groupBy("source", "context_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("n_tok") <= F.col("context_len")).cast("long")
            ).alias("n_docs_fit"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.least(F.col("n_tok"), F.col("context_len").cast("long"))).alias(
                "n_tokens_kept"
            ),
        )
        .select(
            "source",
            "context_len",
            "n_docs",
            "n_docs_fit",
            "n_tokens",
            "n_tokens_kept",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("n_tokens_kept").cast("double") / F.col("n_tokens"),
                    6,
                ),
            ).alias("kept_share"),
        )
        .orderBy("source", "context_len")
    )


_Q159_SQL = r"""
WITH per_doc AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
), fan AS (
  SELECT source, n_tok, unnest([512, 1024, 2048, 4096]) AS context_len
  FROM per_doc
)
SELECT source, context_len,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_tok <= context_len THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_fit,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(least(n_tok, context_len)) AS BIGINT) AS n_tokens_kept,
       CASE WHEN sum(n_tok) > 0
            THEN round(CAST(sum(least(n_tok, context_len)) AS BIGINT)
                       / CAST(sum(n_tok) AS BIGINT)::DOUBLE, 6) END
         AS kept_share
FROM fan
GROUP BY source, context_len
ORDER BY source, context_len
"""


def q164_partition_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout / compaction-planner audit for a hypothetical
    ``PARTITIONED BY (source, lang)`` corpus write — the small-files
    check run before (or after) a big ingest: per partition, rows and
    exact text bytes, the file count a 64 MB target would produce, and
    the two planner flags (``needs_compaction`` — data present but
    under one target file; ``needs_split`` — more than 8 target files,
    so the partition key is too coarse / skewed and wants a sub-key or
    salt). Flags are integer comparisons on exact byte sums; the only
    float is the rounded avg-doc-bytes division.

    Scale shape: ONE grouped aggregate over the scan to |source×lang|
    rows — this audit never touches the data again; it reads the same
    numbers a real writer's commit stats would carry."""
    target = 64 * 1024 * 1024
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.octet_length("text").cast("long")).alias("text_bytes"),
    )
    files = F.ceil(F.col("text_bytes") / F.lit(float(target))).cast("long")
    return (
        per.select(
            "source",
            "lang",
            "n_rows",
            "text_bytes",
            files.alias("target_files"),
            F.when(
                F.col("n_rows") > 0,
                F.round(
                    F.col("text_bytes").cast("double") / F.col("n_rows"), 2
                ),
            ).alias("avg_doc_bytes"),
            ((F.col("text_bytes") > 0) & (F.col("text_bytes") < target)).alias(
                "needs_compaction"
            ),
            (files > 8).alias("needs_split"),
        )
        .orderBy("source", "lang")
    )


_Q164_SQL = """
WITH per AS (
  SELECT source, lang, count(*) AS n_rows,
         CAST(sum(octet_length(ENCODE(text))) AS BIGINT) AS text_bytes
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_rows, text_bytes,
       CAST(ceil(text_bytes / 67108864.0) AS BIGINT) AS target_files,
       CASE WHEN n_rows > 0
            THEN round(CAST(text_bytes AS DOUBLE) / n_rows, 2) END
         AS avg_doc_bytes,
       text_bytes > 0 AND text_bytes < 67108864 AS needs_compaction,
       CAST(ceil(text_bytes / 67108864.0) AS BIGINT) > 8 AS needs_split
FROM per
ORDER BY source, lang
"""


def q167_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-store health check — the pre-index audit an ANN build
    runs first: per label, vector count, dimension constancy, zero
    vectors (dead encoder outputs poison cosine math), and the mean
    squared norm. Norms are computed in QUANTIZED integer units
    (round(x·10⁴)² summed as BIGINTs) so the cross-row aggregation is
    order-independent and engine-exact — a raw float32 sum would differ
    between engines and between partitionings (the q122 drift lesson);
    every float32 element is cast to DOUBLE before scaling because
    DuckDB would otherwise multiply in single precision. One grouped
    pass; the mean is the single rounded division of exact integers."""
    em = load_table(spark, sf_dir, "embeddings")
    norm2q = F.expr(
        "aggregate(transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),"
        " CAST(0 AS BIGINT), (a, e) -> a + e * e)"
    )
    per = em.select(
        "label",
        F.size("embedding").alias("dim"),
        norm2q.alias("n2q"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            (F.min("dim") == F.max("dim")).alias("dims_constant"),
            F.max("dim").alias("dim"),
            F.sum((F.col("n2q") == 0).cast("long")).alias("n_zero_vecs"),
            F.sum("n2q").alias("_sum_n2q"),
        )
        .select(
            "label",
            "n_vecs",
            "dims_constant",
            "dim",
            "n_zero_vecs",
            F.round(
                F.col("_sum_n2q").cast("double")
                / (F.col("n_vecs") * F.lit(100000000)).cast("double"),
                6,
            ).alias("mean_sq_norm"),
        )
        .orderBy("label")
    )


_Q167_SQL = """
WITH per AS (
  SELECT label, len(embedding) AS dim,
         CAST(list_sum(list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
              AS BIGINT) AS n2q
  FROM embeddings
)
SELECT label,
       count(*) AS n_vecs,
       min(dim) = max(dim) AS dims_constant,
       max(dim) AS dim,
       CAST(sum(CASE WHEN n2q = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_vecs,
       round(CAST(sum(n2q) AS BIGINT)
             / CAST(count(*) * 100000000 AS DOUBLE), 6) AS mean_sq_norm
FROM per
GROUP BY label
ORDER BY label
"""


def q170_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-choice sweep — the tuning table behind q25's (16, 4)
    default: the SAME 64-hash signature banded three ways (8×8, 16×4,
    32×2), each tier's verified pairs audited against the exact q24
    tier. The S-curve midpoint (1/b)^(1/r) moves from ≈0.77 to ≈0.18
    across the sweep, so recall at the 0.5 threshold must be monotone
    in the band count — the property a corpus owner consults before
    spending the candidate budget. Signatures and caps are shared with
    q25 (one builder on both engines, so the sweep can never drift from
    the production tier). Exact integer counts; one rounded division
    per arm.

    Cost note (r8): the 64 minhashes and the sized verify shingles are
    each computed ONCE and localCheckpointed, then the three arms band
    the cached signature relation three ways (_band_candidates) and
    verify against the cached shingles — a per-arm rebuild would rerun
    the dominant signature pass 3× for byte-identical results (the
    oracle replays the per-arm derivation and matches either way)."""
    from ..operators.dedup import (
        _band_candidates,
        _jaccard_verify,
        _sized_shingles,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = (
        ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    ne = exact.agg(F.count("*").alias("n_exact"))
    sig = minhash_signatures(docs, "text", "doc_id", 64, 3).localCheckpoint(
        eager=True
    )
    sh = (
        _sized_shingles(docs, "text", "doc_id", 3, 1000)
        .filter(F.col("_bucket_n") >= 2)
        .localCheckpoint(eager=True)
    )
    arms = []
    for bands in (8, 16, 32):
        lsh = (
            _jaccard_verify(
                docs,
                _band_candidates(sig, bands, 64 // bands, 1000),
                "text",
                "doc_id",
                3,
                1000,
                0.5,
                sh=sh,
            )
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        arms.append(
            lsh.agg(F.count("*").alias("n_pairs"))
            .crossJoin(
                F.broadcast(
                    lsh.join(exact, ["doc_a", "doc_b"]).agg(
                        F.count("*").alias("n_hit")
                    )
                )
            )
            .select(
                F.lit(bands).alias("bands"),
                F.lit(64 // bands).alias("rows_per_band"),
                "n_pairs",
                "n_hit",
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return (
        out.crossJoin(F.broadcast(ne))
        .select(
            "bands",
            "rows_per_band",
            "n_pairs",
            "n_exact",
            "n_hit",
            F.when(
                F.col("n_exact") > 0,
                F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 4),
            ).alias("recall"),
        )
        .orderBy("bands")
    )


def _q170_sql() -> str:
    arms = []
    for bands in (8, 16, 32):
        r = 64 // bands
        arms.append(
            f"""SELECT {bands} AS bands, {r} AS rows_per_band,
       (SELECT count(*) FROM a{bands}) AS n_pairs,
       (SELECT n_exact FROM ne) AS n_exact,
       (SELECT count(*) FROM a{bands} l
          JOIN exact_pairs e
            ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b) AS n_hit"""
        )
    withs = ",\n".join(
        f"a{bands} AS (SELECT doc_a, doc_b FROM ({_q25_sql(64 // bands)}) s{bands})"
        for bands in (8, 16, 32)
    )
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH exact_pairs AS (
  SELECT doc_a, doc_b FROM ({_Q24_SQL}) x
), ne AS (
  SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact_pairs
),
{withs}
SELECT bands, rows_per_band, n_pairs, n_exact, n_hit,
       CASE WHEN n_exact > 0
            THEN round(CAST(n_hit AS DOUBLE) / n_exact, 4) END AS recall
FROM ({body}) u
ORDER BY bands
"""


def q172_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability-diagram) table for the quality
    classifier: q104 scores binned into deciles, each bin's mean score
    against the empirical keep-rate of the q58 pseudo-labels — the
    companion to q143's threshold sweep (that picks an operating point;
    this shows whether the scores MEAN anything as probabilities, the
    ECE ingredient). Discipline: the shared rounded score becomes an
    exact integer (round(score·10⁴)) ONCE; the bin is integer division
    of that integer (no float binning at the decile boundaries) and the
    bin's mean score is the single rounded division of the exact
    integer sum — a raw float mean would be aggregation-order-dependent."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    si = F.expr("CAST(round(score * 10000) AS BIGINT)")
    j = (
        scores.join(labels, "doc_id")
        .select(si.alias("si"), "keep")
        .select(
            F.least(F.greatest(F.expr("si div 1000"), F.lit(0)), F.lit(9))
            .cast("int")
            .alias("bin"),
            "si",
            "keep",
        )
    )
    return (
        j.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum("si").alias("_ssum"),
        )
        .select(
            "bin",
            "n",
            "n_keep",
            F.round(
                F.col("_ssum").cast("double") / (F.col("n") * F.lit(10000)),
                4,
            ).alias("mean_score"),
            F.round(F.col("n_keep").cast("double") / F.col("n"), 4).alias(
                "keep_rate"
            ),
        )
        .orderBy("bin")
    )


def _q172_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(round(s.score * 10000) AS BIGINT) AS si, l.keep
  FROM scores s JOIN labels l USING (doc_id)
), b AS (
  SELECT CAST(least(greatest(si // 1000, 0), 9) AS INTEGER) AS bin, si, keep
  FROM e
)
SELECT bin, count(*) AS n,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(CAST(sum(si) AS BIGINT) / CAST(count(*) * 10000 AS DOUBLE), 4)
         AS mean_score,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 4) AS keep_rate
FROM b
GROUP BY bin
ORDER BY bin
"""


def q179_label_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid affinity matrix — which embedding classes crowd
    each other (a near-1 cosine between two label centroids predicts
    ANN confusion and motivates merging or re-labeling before index
    build). Per label the QUANTIZED per-dimension sums (round(x·10⁴)
    BIGINTs — order-independent, the q122/q167 discipline) form the
    unnormalized centroid; all 45 unordered pairs of the 10-row
    centroid relation then get cos = num / √(a·b) where num, a, b are
    exact integer dot products (n factors cancel). √ is IEEE
    correctly-rounded, so the double chain over exact integers is
    engine-identical before the final round. The pairwise stage is a
    |labels|²-bounded self-join of a tiny relation — corpus cost is one
    grouped pass."""
    em = load_table(spark, sf_dir, "embeddings")
    # per-dim quantized sums: explode dims, sum per (label, dim)
    per = (
        em.select(
            "label",
            F.posexplode(
                F.expr(
                    "transform(embedding,"
                    " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
                )
            ).alias("dim", "q"),
        )
        .groupBy("label", "dim")
        .agg(F.sum("q").alias("s"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "s"))
            ).alias("_ds")
        )
        .select(
            "label", F.expr("transform(_ds, e -> e.s)").alias("vec")
        )
    )
    a = per.select(
        F.col("label").alias("label_a"), F.col("vec").alias("va")
    )
    b = per.select(
        F.col("label").alias("label_b"), F.col("vec").alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
    num = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (s, e) -> s + e)"
    )
    na = F.expr(
        "aggregate(transform(va, x -> x * x), CAST(0 AS BIGINT), (s, e) -> s + e)"
    )
    nb = F.expr(
        "aggregate(transform(vb, x -> x * x), CAST(0 AS BIGINT), (s, e) -> s + e)"
    )
    return (
        pairs.select(
            "label_a",
            "label_b",
            F.round(
                num.cast("double")
                / F.sqrt(na.cast("double") * nb.cast("double")),
                6,
            ).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )


_Q179_SQL = """
WITH q AS (
  SELECT label, dim - 1 AS dim, q
  FROM (
    SELECT label,
           unnest(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
             AS q,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
  )
), per AS (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s
  FROM q GROUP BY label, dim
), vecs AS (
  SELECT label, list(s ORDER BY dim) AS vec FROM per GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       round(CAST(list_sum(list_transform(range(1, len(a.vec) + 1),
                  i -> a.vec[i] * b.vec[i])) AS BIGINT)
             / sqrt(CAST(list_sum(list_transform(a.vec, x -> x * x))
                         AS BIGINT)::DOUBLE
                    * CAST(list_sum(list_transform(b.vec, x -> x * x))
                           AS BIGINT)::DOUBLE), 6)
         AS centroid_cosine
FROM vecs a JOIN vecs b ON a.label < b.label
ORDER BY label_a, label_b
"""


def q183_source_copy_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source copy-ring census — licensing/governance telemetry: sources
    connected by cross-source near-duplicate evidence (the q24 exact
    tier) are resolved into rings with the q42 min-label closure, here
    running on SOURCE names (min-label propagation needs only an
    orderable label — strings qualify). A ring of mirrors should be
    ingested once, not |ring| times; the census names each ring's
    members so the decision is actionable. The pair relation is
    candidate-sized; the closure runs on the |sources|-node graph —
    corpus cost is the one dedup tier already paid for."""
    from ..operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=1000)
    src = docs.select("doc_id", "source")
    sp = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .distinct()
    )
    comp = connected_components(sp, "src_a", "src_b")
    return (
        comp.groupBy(F.col("component").alias("ring"))
        .agg(
            F.count("*").alias("n_sources"),
            F.array_join(
                F.array_sort(F.collect_set("doc_id")), ","
            ).alias("members"),
        )
        .orderBy("ring")
    )


def _q183_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_Q24_SQL}) p
), sp AS (
  SELECT DISTINCT least(da.source, db.source) AS a,
                  greatest(da.source, db.source) AS b
  FROM pairs
  JOIN documents da ON da.doc_id = pairs.doc_a
  JOIN documents db ON db.doc_id = pairs.doc_b
  WHERE da.source <> db.source
), edges AS (
  SELECT a, b FROM sp UNION ALL SELECT b, a FROM sp
), nodes AS (
  SELECT DISTINCT a AS node FROM edges
), reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node, min(label) AS component FROM reach GROUP BY node
)
SELECT component AS ring,
       count(*) AS n_sources,
       string_agg(node, ',' ORDER BY node) AS members
FROM comp
GROUP BY component
ORDER BY ring
"""


def q192_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source — is a source's length
    distribution drifting away from the corpus mix? 10 equal-width bins
    over the global [min,max] (the q68 broadcast-min/max grid, full
    source×bin grid so zero bins are real terms), Laplace-smoothed
    shares (cnt+1)/(n+10) so empty bins stay defined, and the PSI term
    (p_a−p_e)·ln(p_a/p_e) evaluated as ONE identical float chain over
    exact integer counts on both engines — then QUANTIZED to integer
    micro-units per bin before the cross-bin sum (the q122 rule: never
    sum raw doubles across rows; sum their rounded integer images,
    which is order-independent). ln is the one libm call — round-6
    before the cast makes a cross-engine ulp flip a measure-zero event,
    same accepted risk as the q111 1/ln scoring. Scale: one corpus scan
    for the histogram, a |sources|×10 grid, zero shuffles beyond the
    two grouped counts. psi_micro ≥ 100000 (PSI > 0.1) flags the
    conventional 'shifting' threshold."""
    docs = load_table(spark, sf_dir, "documents")
    mm = docs.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    binned = docs.crossJoin(F.broadcast(mm)).select(
        "source",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(F.lit(9), F.expr("(n_chars - lo) * 10 div (hi - lo)"))
        )
        .cast("int")
        .alias("bin"),
    )
    actual = binned.groupBy("source", "bin").agg(F.count("*").alias("a"))
    expected = binned.groupBy("bin").agg(F.count("*").alias("g"))
    n_src = binned.groupBy("source").agg(F.count("*").alias("ns"))
    n_tot = binned.agg(F.count("*").alias("nt"))
    grid = (
        n_src.crossJoin(F.broadcast(expected))
        .join(actual, ["source", "bin"], "left")
        .withColumn("a", F.coalesce("a", F.lit(0)))
        .crossJoin(F.broadcast(n_tot))
    )
    pa = "(cast(a + 1 as double) / cast(ns + 10 as double))"
    pe = "(cast(g + 1 as double) / cast(nt + 10 as double))"
    contrib = (
        f"cast(round(({pa} - {pe}) * ln({pa} / {pe}) * 1e6) as bigint)"
    )
    per_src = grid.groupBy("source").agg(
        F.max("ns").alias("n_docs"),
        F.sum(F.expr(contrib)).alias("psi_micro"),
    )
    return per_src.select(
        "source", "n_docs", "psi_micro",
        (F.col("psi_micro") >= 100000).alias("shifting"),
    ).orderBy("source")


_Q192_SQL = """
WITH mm AS (
  SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
), binned AS (
  SELECT source,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(9, (n_chars - lo) * 10 // (hi - lo)) END
           AS INTEGER) AS bin
  FROM documents CROSS JOIN mm
), actual AS (
  SELECT source, bin, CAST(count(*) AS BIGINT) AS a
  FROM binned GROUP BY source, bin
), expected AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS g FROM binned GROUP BY bin
), n_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS ns FROM binned GROUP BY source
), n_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nt FROM binned
), grid AS (
  SELECT n_src.source, n_src.ns, expected.bin, expected.g,
         coalesce(actual.a, 0) AS a, n_tot.nt
  FROM n_src
  CROSS JOIN expected
  LEFT JOIN actual ON actual.source = n_src.source AND actual.bin = expected.bin
  CROSS JOIN n_tot
), terms AS (
  SELECT source, ns,
         CAST(round(((CAST(a + 1 AS DOUBLE) / CAST(ns + 10 AS DOUBLE))
                     - (CAST(g + 1 AS DOUBLE) / CAST(nt + 10 AS DOUBLE)))
                    * ln((CAST(a + 1 AS DOUBLE) / CAST(ns + 10 AS DOUBLE))
                         / (CAST(g + 1 AS DOUBLE) / CAST(nt + 10 AS DOUBLE)))
                    * 1e6) AS BIGINT) AS c
  FROM grid
)
SELECT source, max(ns) AS n_docs,
       CAST(sum(c) AS BIGINT) AS psi_micro,
       CAST(sum(c) AS BIGINT) >= 100000 AS shifting
FROM terms
GROUP BY source
ORDER BY source
"""


def q198_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Shannon entropy and Pielou evenness of the SOURCE
    mix — the diversity dial a pretraining mix is tuned by (evenness 1
    = sources contribute equally; → 0 = one source dominates the
    language). Per-(lang, source) counts from one scan; each −p·ln p
    term is a single float chain over exact integers QUANTIZED to
    micro-nats before the cross-source sum (the q122/q192 rule — the
    sum is an exact BIGINT, aggregation order can't move it). Evenness
    divides that integer by ln(n_sources) once at the end; single-source
    languages have zero entropy and NULL evenness (ln 1 = 0). ln is the
    accepted libm seam (q111). Scale: two grouped counts, a
    |langs×sources| term table, nothing corpus-sized past the first
    exchange."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang", "source").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("n"), F.count("*").alias("k")
    )
    terms = cnt.join(tot, "lang").select(
        "lang", "n", "k",
        F.expr(
            "cast(round(-(cast(c as double) / cast(n as double))"
            " * ln(cast(c as double) / cast(n as double)) * 1e6) as bigint)"
        ).alias("t"),
    )
    s = terms.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.max("k").alias("n_sources"),
        F.sum("t").alias("entropy_micro"),
    )
    even = (
        "case when n_sources <= 1 then null "
        "else cast(round(cast(entropy_micro as double)"
        " / ln(cast(n_sources as double))) as bigint) end"
    )
    return s.select(
        "lang", "n_docs", "n_sources", "entropy_micro",
        F.expr(even).alias("evenness_micro"),
    ).orderBy("lang")


_Q198_SQL = """
WITH cnt AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, source
), tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k
  FROM cnt GROUP BY lang
), terms AS (
  SELECT cnt.lang, tot.n, tot.k,
         CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
              AS BIGINT) AS t
  FROM cnt JOIN tot ON cnt.lang = tot.lang
), s AS (
  SELECT lang, max(n) AS n_docs, max(k) AS n_sources,
         CAST(sum(t) AS BIGINT) AS entropy_micro
  FROM terms GROUP BY lang
)
SELECT lang, n_docs, n_sources, entropy_micro,
       CASE WHEN n_sources <= 1 THEN NULL
            ELSE CAST(round(CAST(entropy_micro AS DOUBLE)
                            / ln(CAST(n_sources AS DOUBLE))) AS BIGINT) END
         AS evenness_micro
FROM s
ORDER BY lang
"""


def q202_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope of the corpus token-frequency curve — the
    sanity number for synthetic/natural text (natural language sits
    near −1; templated spam flattens it). Token counts → top-1000 by
    (count desc, token) — a TakeOrdered, never a global sort — then OLS
    on (ln rank, ln freq) where BOTH logs are quantized to integer
    micro-units per point before the regression sums (q122 rule), so
    the slope numerator/denominator are exact DECIMAL integers and the
    fitted slope is a truncating ·10³ quotient. The 1000-point window
    rank is a tiny single-partition sort by construction (bounded K,
    not corpus). R² omitted deliberately — slope + intercept carry the
    Zipf diagnosis. ln is the accepted libm seam."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(1000)
    )
    ranked = toks.select(
        "tok", "freq",
        F.row_number()
        .over(W.orderBy(F.col("freq").desc(), "tok"))
        .alias("rank"),
    )
    pts = ranked.select(
        F.expr("cast(round(ln(cast(rank as double)) * 1e6) as bigint)").alias("u"),
        F.expr("cast(round(ln(cast(freq as double)) * 1e6) as bigint)").alias("v"),
    )
    s = pts.agg(
        F.count("*").alias("k"),
        F.sum("u").alias("su"), F.sum("v").alias("sv"),
        F.sum(F.expr("cast(u as decimal(19,0)) * v")).alias("suv"),
        F.sum(F.expr("cast(u as decimal(19,0)) * u")).alias("suu"),
    )
    num = "(cast(k as decimal(19,0)) * suv - cast(su as decimal(19,0)) * sv)"
    den = "(cast(k as decimal(19,0)) * suu - cast(su as decimal(19,0)) * su)"
    slope = f"case when {den} = 0 then null else {num} * 1000 div {den} end"
    # intercept (in micro ln-units): (Σv − slope_milli·Σu/1000) / k
    return s.select(
        F.col("k").alias("n_points"),
        F.expr(slope).alias("slope_milli"),
        F.expr(f"round(cast({slope} as double) / 1e3, 4)").alias("slope"),
        F.expr(
            f"case when {den} = 0 then null else "
            f"(sv - ({slope}) * su div 1000) div k end"
        ).alias("intercept_micro"),
    )


_Q202_SQL = """
WITH toks AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY tok
  ORDER BY freq DESC, tok
  LIMIT 1000
), ranked AS (
  SELECT tok, freq,
         row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM toks
), pts AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS u,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS v
  FROM ranked
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS k,
         CAST(sum(u) AS HUGEINT) AS su, CAST(sum(v) AS HUGEINT) AS sv,
         CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS suv,
         CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu
  FROM pts
)
SELECT CAST(k AS BIGINT) AS n_points,
       CAST(CASE WHEN (k * suu - su * su) = 0 THEN NULL
                 ELSE (k * suv - su * sv) * 1000 // (k * suu - su * su) END
            AS BIGINT) AS slope_milli,
       round(CAST(CAST(CASE WHEN (k * suu - su * su) = 0 THEN NULL
                 ELSE (k * suv - su * sv) * 1000 // (k * suu - su * su) END
            AS BIGINT) AS DOUBLE) / 1e3, 4) AS slope,
       CAST(CASE WHEN (k * suu - su * su) = 0 THEN NULL
                 ELSE (sv - (CASE WHEN (k * suu - su * su) = 0 THEN NULL
                             ELSE (k * suv - su * sv) * 1000
                                  // (k * suu - su * su) END) * su // 1000) // k
            END AS BIGINT) AS intercept_micro
FROM s
"""


def q206_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing / Chao1 vocabulary-coverage telemetry — how much of
    the language is the corpus still missing? From token counts alone:
    the Good–Turing unseen-probability mass is n₁/N (singleton tokens
    over total tokens — EXACT as a ·10⁶ integer quotient), and the
    Chao1 richness estimate V + n₁²/(2n₂) says how many types a bigger
    crawl would surface (exact quotient; n₂=0 falls back to the
    bias-corrected V + n₁(n₁−1)/2 — the standard Chao1 variant, flagged
    in the output). Everything derives from the count-of-counts table:
    one token rollup (the only corpus-sized exchange), one tiny
    frequency-of-frequencies rollup, one row out."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    s = tok.agg(
        F.count("*").alias("v"),
        F.sum("f").alias("n"),
        F.sum(F.expr("cast(f = 1 as long)")).alias("n1"),
        F.sum(F.expr("cast(f = 2 as long)")).alias("n2"),
    )
    unseen = "cast(n1 as decimal(19,0)) * 1000000 div n"
    chao = (
        "case when n2 > 0 "
        "then v + cast(n1 as decimal(19,0)) * n1 div (2 * n2) "
        "else v + cast(n1 as decimal(19,0)) * (n1 - 1) div 2 end"
    )
    return s.select(
        F.col("v").alias("vocab_size"),
        F.col("n").alias("n_tokens"),
        F.col("n1").alias("singletons"),
        F.col("n2").alias("doubletons"),
        F.expr(unseen).alias("unseen_mass_micro"),
        F.expr(chao).cast("long").alias("chao1_estimate"),
        (F.col("n2") == 0).alias("bias_corrected_variant"),
    )


_Q206_SQL = """
WITH tok AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY tok
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(sum(f) AS BIGINT) AS n,
         CAST(sum(CAST(f = 1 AS BIGINT)) AS BIGINT) AS n1,
         CAST(sum(CAST(f = 2 AS BIGINT)) AS BIGINT) AS n2
  FROM tok
)
SELECT v AS vocab_size, n AS n_tokens, n1 AS singletons, n2 AS doubletons,
       CAST(CAST(n1 AS HUGEINT) * 1000000 // n AS BIGINT) AS unseen_mass_micro,
       CAST(CASE WHEN n2 > 0
                 THEN v + CAST(n1 AS HUGEINT) * n1 // (2 * n2)
                 ELSE v + CAST(n1 AS HUGEINT) * (n1 - 1) // 2 END
            AS BIGINT) AS chao1_estimate,
       (n2 = 0) AS bias_corrected_variant
FROM s
"""


def q207_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dups (operators/dedup.containment_pairs): the
    aggregator blind spot — pairs ≥90% contained but Jaccard < 0.5, so
    the exact-Jaccard tier (q24) ships both copies. Both cuts are
    integer cross-multiplies; the oracle replays the capped shingle
    pipeline with the same two inequalities."""
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs, containment_pct=90, max_bucket=1000
    ).orderBy("doc_a", "doc_b")


_Q207_SQL = """
WITH sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), sh AS (
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh_raw GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.n_shingles AS na, sb.n_shingles AS nb,
       CAST(CAST(inter AS BIGINT) * 1000000
            // least(sa.n_shingles, sb.n_shingles) AS BIGINT)
         AS containment_micro,
       CASE WHEN sa.n_shingles <= sb.n_shingles THEN 'a_in_b'
            ELSE 'b_in_a' END AS direction
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 100 * inter >= 90 * least(sa.n_shingles, sb.n_shingles)
  AND 3 * inter < sa.n_shingles + sb.n_shingles
ORDER BY doc_a, doc_b
"""


def q211_js_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each SOURCE's unigram distribution
    from the corpus distribution — the nonparametric drift dial for a
    pretraining mix (PSI q192 bins a scalar; this covers the whole
    vocabulary). The key scale trick: tokens ABSENT from a source
    contribute exactly 0.5·ln2·q_t, and Σq_t over them is
    (N − Σ_present g_t)/N — an INTEGER-sum closed form — so the query
    needs only an inner token join on the source's own vocabulary,
    never a per-source sweep of the full corpus vocabulary (which
    would be |sources|×|vocab|). Per-token terms are one identical
    float chain over exact integer counts, quantized to pico-nats
    before the cross-token sum (q122/q192/q200 rule); ln is the
    accepted libm seam. JS is bounded by ln2 so js_micro ≤ 693147."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("source"),
        F.explode(F.split(F.lower("text"), "\\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    cnt = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    glob = cnt.groupBy("tok").agg(F.sum("c").alias("g"))
    ns = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    ntot = glob.agg(F.sum("g").alias("nt"))
    p = "(cast(c as double) / cast(n as double))"
    q = "(cast(g as double) / cast(nt as double))"
    term = (
        f"cast(round((0.5 * {p} * ln(2 * {p} / ({p} + {q}))"
        f" + 0.5 * {q} * ln(2 * {q} / ({p} + {q}))) * 1e12) as bigint)"
    )
    per_src = (
        cnt.join(glob, "tok")
        .join(ns, "source")
        .crossJoin(F.broadcast(ntot))
        .groupBy("source")
        .agg(
            F.max("n").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum(F.expr(term)).alias("present_pico"),
            F.sum("g").alias("qnum"),
            F.max("nt").alias("nt"),
        )
    )
    tail = (
        "cast(round(0.5 * ln(2.0) * cast(nt - qnum as double)"
        " / cast(nt as double) * 1e12) as bigint)"
    )
    return per_src.select(
        "source", "n_tokens", "vocab",
        (F.col("present_pico") + F.expr(tail)).alias("js_pico"),
    ).select(
        "source", "n_tokens", "vocab", "js_pico",
        F.expr("js_pico div 1000000").alias("js_micro"),
    ).orderBy("source")


_Q211_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), gtok AS (
  SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM cnt GROUP BY tok
), ns AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
), ntot AS (
  SELECT CAST(sum(g) AS BIGINT) AS nt FROM gtok
), per_src AS (
  SELECT cnt.source,
         max(n) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CAST(round((0.5 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(2 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    / ((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       + (CAST(g AS DOUBLE) / CAST(nt AS DOUBLE))))
             + 0.5 * (CAST(g AS DOUBLE) / CAST(nt AS DOUBLE))
               * ln(2 * (CAST(g AS DOUBLE) / CAST(nt AS DOUBLE))
                    / ((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       + (CAST(g AS DOUBLE) / CAST(nt AS DOUBLE)))))
             * 1e12) AS BIGINT)) AS BIGINT) AS present_pico,
         CAST(sum(g) AS BIGINT) AS qnum,
         max(nt) AS nt
  FROM cnt
  JOIN gtok ON cnt.tok = gtok.tok
  JOIN ns ON cnt.source = ns.source
  CROSS JOIN ntot
  GROUP BY cnt.source
)
SELECT source, n_tokens, vocab,
       present_pico + CAST(round(0.5 * ln(2.0)
         * CAST(nt - qnum AS DOUBLE) / CAST(nt AS DOUBLE) * 1e12)
         AS BIGINT) AS js_pico,
       (present_pico + CAST(round(0.5 * ln(2.0)
         * CAST(nt - qnum AS DOUBLE) / CAST(nt AS DOUBLE) * 1e12)
         AS BIGINT)) // 1000000 AS js_micro
FROM per_src
ORDER BY source
"""


def q212_keyness_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood (G²) keyness: the 5 tokens most
    OVER-represented in each source vs the rest of the corpus — the
    standard corpus-linguistics keyword extractor (better than raw
    tf-idf for small counts because it is a proper 2×2 likelihood
    test). All four contingency cells derive from two grouped counts
    (a; g−a; n−a; rest) — one corpus scan, token-keyed shuffles only.
    The G² float chain runs once per (source, token) over exact
    integers, is micro-quantized BEFORE ranking (so the rank compares
    integers and ties break on the token string identically in both
    engines), and keeps only over-represented tokens via the integer
    cross-multiply a·N > n·g. The per-source top-5 rank is a keyed
    window — map-side WindowGroupLimit prunes before the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower("text"), "\\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    cnt = toks.groupBy("source", "tok").agg(F.count("*").alias("a"))
    gtok = cnt.groupBy("tok").agg(F.sum("a").alias("g"))
    ns = cnt.groupBy("source").agg(F.sum("a").alias("n"))
    ntot = gtok.agg(F.sum("g").alias("nt"))
    cells = (
        cnt.join(gtok, "tok")
        .join(ns, "source")
        .crossJoin(F.broadcast(ntot))
        .filter(F.expr("a * nt > n * g"))
        .withColumn("b", F.expr("g - a"))
        .withColumn("c", F.expr("n - a"))
        .withColumn("d", F.expr("(nt - n) - (g - a)"))
    )
    t = (
        "cast({o} as double) * ln(cast({o} as double) * cast(nt as double)"
        " / (cast({r} as double) * cast({col} as double)))"
    )
    g2 = (
        "cast(round(2.0 * ("
        f" (case when a = 0 then 0 else {t.format(o='a', r='n', col='g')} end)"
        f"+(case when b = 0 then 0 else {t.format(o='b', r='nt - n', col='g')} end)"
        f"+(case when c = 0 then 0 else {t.format(o='c', r='n', col='nt - g')} end)"
        f"+(case when d = 0 then 0 else {t.format(o='d', r='nt - n', col='nt - g')} end)"
        ") * 1e6) as bigint)"
    )
    scored = cells.select(
        "source", "tok", "a", "g", F.expr(g2).alias("g2_micro")
    )
    w = W.partitionBy("source").orderBy(
        F.col("g2_micro").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "rnk", "tok", "a", "g", "g2_micro")
        .orderBy("source", "rnk")
    )


_Q212_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS a
  FROM toks GROUP BY source, tok
), gtok AS (
  SELECT tok, CAST(sum(a) AS BIGINT) AS g FROM cnt GROUP BY tok
), ns AS (
  SELECT source, CAST(sum(a) AS BIGINT) AS n FROM cnt GROUP BY source
), ntot AS (
  SELECT CAST(sum(g) AS BIGINT) AS nt FROM gtok
), cells AS (
  SELECT cnt.source, cnt.tok, a, g, n, nt,
         g - a AS b, n - a AS c, (nt - n) - (g - a) AS d
  FROM cnt JOIN gtok ON cnt.tok = gtok.tok
  JOIN ns ON cnt.source = ns.source CROSS JOIN ntot
  WHERE a * nt > n * g
), scored AS (
  SELECT source, tok, a, g,
    CAST(round(2.0 * (
      (CASE WHEN a = 0 THEN 0 ELSE CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE)
        * CAST(nt AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(g AS DOUBLE))) END)
    + (CASE WHEN b = 0 THEN 0 ELSE CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE)
        * CAST(nt AS DOUBLE) / (CAST(nt - n AS DOUBLE) * CAST(g AS DOUBLE))) END)
    + (CASE WHEN c = 0 THEN 0 ELSE CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)
        * CAST(nt AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(nt - g AS DOUBLE))) END)
    + (CASE WHEN d = 0 THEN 0 ELSE CAST(d AS DOUBLE) * ln(CAST(d AS DOUBLE)
        * CAST(nt AS DOUBLE) / (CAST(nt - n AS DOUBLE) * CAST(nt - g AS DOUBLE))) END)
    ) * 1e6) AS BIGINT) AS g2_micro
  FROM cells
), ranked AS (
  SELECT source, tok, a, g, g2_micro,
         row_number() OVER (PARTITION BY source
                            ORDER BY g2_micro DESC, tok) AS rnk
  FROM scored
)
SELECT source, rnk, tok, a, g, g2_micro
FROM ranked WHERE rnk <= 5
ORDER BY source, rnk
"""


def q213_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup tier: Levenshtein <= 5 on the normalized
    80-char head — catches small in-place edits (typo fixes, version
    bumps) that exact hashing misses and that shingle tiers only see
    at much higher Jaccard cost. Candidate generation is LENGTH
    BLOCKING with overlap (each head lands in bucket len//8 and the
    next one up, so a pair within 5 edits always shares a bucket),
    each bucket CAPPED at 200 members (row_number by doc_id — the
    house join-free discipline: the quadratic term is bounded per
    bucket, never corpus-sized), and an integer length prefilter
    |la-lb| <= 5 runs before the O(len^2) levenshtein call. The
    DISTINCT collapses the two-bucket overlap. Both engines compute
    the same DP distance, so parity is exact integers throughout."""
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower("text"), "\\s+", " "), 1, 80
        ).alias("head"),
    ).withColumn("hl", F.length("head"))
    w = W.partitionBy(F.expr("hl div 8")).orderBy("doc_id")
    capped = (
        norm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 200)
        .drop("rn")
    )
    buckets = capped.withColumn("b", F.expr("hl div 8")).unionByName(
        capped.withColumn("b", F.expr("hl div 8 + 1"))
    )
    x = buckets.alias("x")
    y = buckets.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter(F.abs(F.col("x.hl") - F.col("y.hl")) <= 5)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.head").alias("ha"),
            F.col("y.head").alias("hb"),
            F.col("x.hl").alias("len_a"),
            F.col("y.hl").alias("len_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "lev", F.levenshtein("ha", "hb").cast("bigint")
        )
        .filter(F.col("lev") <= 5)
        .select("doc_a", "doc_b", "len_a", "len_b", "lev")
        .orderBy("doc_a", "doc_b")
    )


_Q213_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '\s+', ' ', 'g'), 1, 80) AS head
  FROM documents
), sized AS (
  SELECT doc_id, head, length(head) AS hl,
         row_number() OVER (PARTITION BY length(head) // 8
                            ORDER BY doc_id) AS rn
  FROM norm
), capped AS (
  SELECT doc_id, head, hl FROM sized WHERE rn <= 200
), buckets AS (
  SELECT doc_id, head, hl, hl // 8 AS b FROM capped
  UNION ALL
  SELECT doc_id, head, hl, hl // 8 + 1 AS b FROM capped
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.head AS ha, y.head AS hb, x.hl AS la, y.hl AS lb
  FROM buckets x JOIN buckets y
    ON x.b = y.b AND x.doc_id < y.doc_id
  WHERE abs(x.hl - y.hl) <= 5
)
SELECT doc_a, doc_b, la AS len_a, lb AS len_b,
       CAST(levenshtein(ha, hb) AS BIGINT) AS lev
FROM pairs
WHERE levenshtein(ha, hb) <= 5
ORDER BY doc_a, doc_b
"""


def q216_bag_of_words_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words (token-multiset) dedup tier: key = md5 of the
    SORTED token list — catches shuffled-sentence / reordered copies
    that exact md5 misses and canonical normalization (q93, which only
    folds case/punct/whitespace) also misses, at exact-dedup cost (one
    narrow hash shuffle, no pair generation at all — contrast the
    quadratic-bounded tiers q24/q213). Sort order is binary UTF-8 in
    both engines (byte order == code-point order), so the key is
    engine-portable. Three keys ladder the accounting: exact md5,
    canonical (case/whitespace-folded token JOIN, unsorted) and bag
    (sorted) — so reorder_only_dups = n_canon - n_bags isolates the
    dup mass visible ONLY to reordering, not double-counting the
    case/space dups the canonical tier already catches."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != "")
    keys = docs.select(
        "source",
        F.md5("text").alias("eh"),
        F.md5(F.concat_ws(" ", toks)).alias("ch"),
        F.md5(F.concat_ws(" ", F.sort_array(toks))).alias("bh"),
    )
    return (
        keys.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("eh").alias("n_exact"),
            F.countDistinct("ch").alias("n_canon"),
            F.countDistinct("bh").alias("n_bags"),
            (F.countDistinct("ch") - F.countDistinct("bh")).alias(
                "reorder_only_dups"
            ),
        )
        .orderBy("source")
    )


_Q216_SQL = r"""
WITH keys AS (
  SELECT doc_id, source,
         md5(text) AS eh,
         md5(array_to_string(list_filter(
             string_split_regex(lower(text), '\s+'), t -> t <> ''), ' '))
           AS ch,
         md5(array_to_string(list_sort(list_filter(
             string_split_regex(lower(text), '\s+'), t -> t <> '')), ' '))
           AS bh
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT eh) AS BIGINT) AS n_exact,
       CAST(count(DISTINCT ch) AS BIGINT) AS n_canon,
       CAST(count(DISTINCT bh) AS BIGINT) AS n_bags,
       CAST(count(DISTINCT ch) - count(DISTINCT bh) AS BIGINT)
         AS reorder_only_dups
FROM keys GROUP BY source ORDER BY source
"""


def q220_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search ("table value") by POSITIONAL inverted-index
    intersection — the search-engine primitive BM25 (q51) cannot
    express: postings are (token, doc, position) triples, the phrase
    match is a doc-keyed self-join of the two terms' postings with the
    adjacency predicate pos2 = pos1 + 1. The token filter applies
    BEFORE the join (the plan only ever shuffles the two query terms'
    postings, not the corpus index — at scale this is the posting-list
    skip, the selective predicate pushed below the join). Positions
    come from posexplode (deterministic ordinals), never an unordered
    row_number. Output: per-doc occurrence count and first position."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.split(F.lower("text"), "\\s+"), lambda t: t != ""
                )
            ).alias("pos", "tok"),
        )
        .filter(F.col("tok").isin("table", "value"))
    )
    t1 = toks.filter(F.col("tok") == "table").select(
        "doc_id", F.col("pos").alias("p1")
    )
    t2 = toks.filter(F.col("tok") == "value").select(
        "doc_id", F.col("pos").alias("p2")
    )
    hits = t1.join(t2, "doc_id").filter(F.col("p2") == F.col("p1") + 1)
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matches"),
            (F.min("p1") + 1).cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


_Q220_SQL = r"""
WITH lsts AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t <> '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, l[i] AS tok, i AS pos
  FROM lsts, UNNEST(generate_series(1, len(l))) AS t(i)
  WHERE l[i] IN ('table', 'value')
)
SELECT t1.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(t1.pos) AS BIGINT) AS first_pos
FROM toks t1
JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
WHERE t1.tok = 'table' AND t2.tok = 'value'
GROUP BY t1.doc_id
ORDER BY t1.doc_id
"""


def q232_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale token burstiness: the 25 tokens whose observed
    document frequency falls furthest below the Poisson expectation
    D·(1 − exp(−tf/D)) — bursty/topical words concentrate their
    occurrences in few documents (adaptation << 1e6), while function
    words track the Poisson line. This is the doc-level complement of
    the within-doc repetition metrics (q45) and the corpus-level
    Zipf fit (q202). One grouped (tf, df) scan; the exp chain runs
    once per surviving token over exact integers, is micro-quantized
    BEFORE the rank (integers compare identically), and ties break on
    the token string. tf >= 50 is the estimator noise floor; exp is
    the accepted libm seam (q111/q192)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id, explode(split(lower(text), '\\s+')) AS tok
            FROM documents
          ) WHERE tok <> ''
        ),
        stats AS (
          SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
          FROM toks GROUP BY tok
        ),
        d AS (SELECT count(*) AS nd FROM documents),
        scored AS (
          SELECT tok, tf, df, nd,
                 CAST(round(CAST(df AS DOUBLE)
                      / (CAST(nd AS DOUBLE)
                         * (1 - exp(-CAST(tf AS DOUBLE) / CAST(nd AS DOUBLE))))
                      * 1e6) AS BIGINT) AS adaptation_micro
          FROM stats CROSS JOIN d
          WHERE tf >= 50
        )
        SELECT tok, tf, df, adaptation_micro
        FROM scored
        ORDER BY adaptation_micro, tok
        LIMIT 25
        """
    )


_Q232_SQL = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), stats AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY tok
), d AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
scored AS (
  SELECT tok, tf, df, nd,
         CAST(round(CAST(df AS DOUBLE)
              / (CAST(nd AS DOUBLE)
                 * (1 - exp(-CAST(tf AS DOUBLE) / CAST(nd AS DOUBLE))))
              * 1e6) AS BIGINT) AS adaptation_micro
  FROM stats CROSS JOIN d
  WHERE tf >= 50
)
SELECT tok, tf, df, adaptation_micro
FROM scored
ORDER BY adaptation_micro, tok
LIMIT 25
"""


def q236_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per source — the
    classic curation-time readability screen, fully deterministic:
    words are letter runs, sentences are [.!?]+ runs (>=1 per doc),
    and the syllable heuristic counts [aeiouy]+ vowel groups plus one
    for each zero-vowel word (Flesch's every-word-has-a-syllable
    floor). All three corpus sums are exact BIGINTs < 2^53, so the
    final FRE/FKGL chains are single IEEE double expressions written
    identically in both engines (e0 literals force DOUBLE — a bare
    206.835 is DECIMAL in Spark SQL, the q175 trap); the per-source
    ratios are also emitted as exact integer micro quotients. Scale
    shape: one grouped partial-agg scan, no joins, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.expr("size(regexp_extract_all(lower(text), '[a-z]+', 0))")
        .alias("w"),
        F.expr("greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)")
        .alias("s"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            " + size(filter(regexp_extract_all(lower(text), '[a-z]+', 0),"
            "               x -> x not rlike '[aeiouy]'))"
        ).alias("y"),
    )
    g = per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("s").alias("sentences"),
        F.sum("y").alias("syllables"),
    )
    return g.select(
        "source", "n_docs", "words", "sentences", "syllables",
        F.expr("cast(words as decimal(19,0)) * 1000000 div sentences")
        .alias("wps_micro"),
        F.expr(
            "case when words > 0 then"
            " cast(syllables as decimal(19,0)) * 1000000 div words end"
        ).alias("spw_micro"),
        F.expr(
            "case when words > 0 then round(206.835e0"
            " - 1.015e0 * words / sentences"
            " - 84.6e0 * syllables / words, 4) end"
        ).alias("fre"),
        F.expr(
            "case when words > 0 then round(0.39e0 * words / sentences"
            " + 11.8e0 * syllables / words - 15.59e0, 4) end"
        ).alias("fkgl"),
    ).orderBy("source")


_Q236_SQL = r"""
WITH per AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))
           + len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                             x -> NOT regexp_matches(x, '[aeiouy]')))
           AS y
  FROM documents
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS words,
         CAST(sum(s) AS BIGINT) AS sentences,
         CAST(sum(y) AS BIGINT) AS syllables
  FROM per GROUP BY source
)
SELECT source, n_docs, words, sentences, syllables,
       CAST(CAST(words AS HUGEINT) * 1000000 // sentences AS BIGINT)
         AS wps_micro,
       CAST(CASE WHEN words > 0 THEN
            CAST(syllables AS HUGEINT) * 1000000 // words END AS BIGINT)
         AS spw_micro,
       CASE WHEN words > 0 THEN round(206.835e0
            - 1.015e0 * words / sentences
            - 84.6e0 * syllables / words, 4) END AS fre,
       CASE WHEN words > 0 THEN round(0.39e0 * words / sentences
            + 11.8e0 * syllables / words - 15.59e0, 4) END AS fkgl
FROM g
ORDER BY source
"""


def _kn_bigram_lm(docs: DataFrame) -> DataFrame:
    """Shared Kneser-Ney bigram LM table (q237 estimation, q249
    scoring): (prev_tok, next_tok, c, cp, nfw, np, nbb) over corpus
    letter-run tokens, with the q139 sequence guard. All counts exact;
    the d=3/4 probability numerator/denominator derive from these."""
    toks = docs.select(
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("w")
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN"
                " transform(sequence(1, size(w) - 1),"
                " i -> struct(element_at(w, i) AS p,"
                "             element_at(w, i + 1) AS t))"
                " ELSE CAST(array() AS array<struct<p:string,t:string>>)"
                " END"
            )
        ).alias("b")
    ).select(
        F.col("b.p").alias("prev_tok"), F.col("b.t").alias("next_tok")
    )
    cnt = bg.groupBy("prev_tok", "next_tok").agg(F.count("*").alias("c"))
    wp = W.partitionBy("prev_tok")
    wt = W.partitionBy("next_tok")
    enr = cnt.select(
        "prev_tok", "next_tok", "c",
        F.sum("c").over(wp).alias("cp"),
        F.count("*").over(wp).alias("nfw"),
        F.count("*").over(wt).alias("np"),
    )
    nb = cnt.agg(F.count("*").alias("nbb"))
    return enr.crossJoin(F.broadcast(nb))


def q237_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM (d=0.75): the top-20 conditional
    probabilities P(w|prev) = (c−d)/c(prev) + d·N₁₊(prev·)/c(prev) ·
    N₁₊(·w)/N₁₊(··) over corpus letter-run tokens — the classic LM
    smoothing where backoff mass goes to CONTINUATION counts (how many
    contexts a word completes), not raw frequency. d = 3/4 keeps the
    whole score rational: P = [(4c−3)·N₁₊(··) + 3·N₁₊(prev·)·N₁₊(·w)]
    / (4·c(prev)·N₁₊(··)), emitted as an exact integer micro quotient
    (DECIMAL/HUGEINT cross-multiplication, no floats anywhere). Scale
    shape: bigrams collapse to the (prev, next) count table in the
    first agg; context/continuation counts are keyed windows over that
    table; N₁₊(··) is a 1-row broadcast; the top-20 compiles to
    TakeOrderedAndProject (deterministic lexicographic tie-break).
    Bigram guard per the q139 sequence(1,0)-is-descending lesson."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _kn_bigram_lm(docs)
        .select(
            "prev_tok", "next_tok", "c", "cp", "np", "nfw", "nbb",
            F.expr(
                "cast((cast(4 * c - 3 as decimal(19,0)) * nbb"
                " + 3 * cast(nfw as decimal(19,0)) * np) * 1000000"
                " div (4 * cast(cp as decimal(19,0)) * nbb) as bigint)"
            ).alias("p_micro"),
        )
        .orderBy(F.desc("p_micro"), "prev_tok", "next_tok")
        .limit(20)
    )


_Q237_SQL = r"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents
), bg AS (
  SELECT w[i] AS prev_tok, w[i + 1] AS next_tok
  FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2
), cnt AS (
  SELECT prev_tok, next_tok, CAST(count(*) AS BIGINT) AS c
  FROM bg GROUP BY prev_tok, next_tok
), enr AS (
  SELECT prev_tok, next_tok, c,
         CAST(sum(c) OVER (PARTITION BY prev_tok) AS BIGINT) AS cp,
         CAST(count(*) OVER (PARTITION BY prev_tok) AS BIGINT) AS nfw,
         CAST(count(*) OVER (PARTITION BY next_tok) AS BIGINT) AS np
  FROM cnt
), nb AS (
  SELECT CAST(count(*) AS BIGINT) AS nbb FROM cnt
)
SELECT prev_tok, next_tok, c, cp, np, nfw, nbb,
       CAST((CAST(4 * c - 3 AS HUGEINT) * nbb
             + 3 * CAST(nfw AS HUGEINT) * np) * 1000000
            // (4 * CAST(cp AS HUGEINT) * nbb) AS BIGINT) AS p_micro
FROM enr CROSS JOIN nb
ORDER BY p_micro DESC, prev_tok, next_tok
LIMIT 20
"""


def q240_mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR-50 lexical diversity per source (moving-average type-token
    ratio, the standard length-robust alternative to raw TTR), computed
    EXACTLY without materializing any sliding window: summed over all
    n−w+1 windows, Σ(types per window) decomposes into per-POSITION
    contributions — token instance i is its window's first occurrence
    iff the window starts after i's previous occurrence, so it
    contributes max(0, min(i, n−w+1) − greatest(i−w+1, prev_i+1, 1) + 1)
    windows. One posexplode + one (doc, token)-keyed lag gives prev_i;
    everything else is exact integer arithmetic — O(tokens) total, the
    100 TB shape (a literal w-sized sliding window would be O(tokens·w)).
    Raw corpus TTR is emitted alongside for the length-bias contrast.
    Docs shorter than w=50 tokens have no window and are excluded from
    the MATTR numerator/denominator (standard MATTR); they still count
    in the TTR columns."""
    w_sz = 50
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("pos0", "tok"),
    ).select(
        "source", "doc_id", "tok", (F.col("pos0") + 1).alias("i")
    )
    n_per = toks.groupBy("source", "doc_id").agg(
        F.max("i").alias("n"), F.countDistinct("tok").alias("dt")
    )
    w_lag = W.partitionBy("doc_id", "tok").orderBy("i")
    prev = toks.select(
        "source", "doc_id", "tok", "i",
        F.coalesce(F.lag("i").over(w_lag), F.lit(0)).alias("prev"),
    )
    contrib = prev.join(
        n_per.select("doc_id", "n"), "doc_id"
    ).where(F.col("n") >= w_sz).select(
        "source",
        F.expr(
            f"greatest(least(i, n - {w_sz} + 1)"
            f" - greatest(i - {w_sz} + 1, prev + 1, 1) + 1, 0)"
        ).alias("c"),
    )
    mattr = contrib.groupBy("source").agg(
        F.sum("c").alias("type_instances")
    )
    wins = n_per.groupBy("source").agg(
        F.sum("n").alias("total_tokens"),
        F.sum("dt").alias("distinct_token_sum"),
        F.sum(
            F.when(F.col("n") >= w_sz, F.col("n") - w_sz + 1).otherwise(0)
        ).alias("windows"),
        F.count("*").alias("n_docs"),
    )
    return (
        wins.join(mattr, "source", "left")
        .select(
            "source", "n_docs", "total_tokens", "windows",
            F.coalesce("type_instances", F.lit(0)).alias("type_instances"),
            F.expr(
                f"case when windows > 0 then"
                f" cast(coalesce(type_instances, 0) as decimal(19,0))"
                f" * 1000000 div (cast(windows as decimal(19,0)) * {w_sz})"
                f" end"
            ).alias("mattr_micro"),
            F.expr(
                "case when total_tokens > 0 then"
                " cast(distinct_token_sum as decimal(19,0)) * 1000000"
                " div total_tokens end"
            ).alias("ttr_micro"),
        )
        .orderBy("source")
    )


_Q240_SQL = r"""
WITH toks AS (
  SELECT source, doc_id, w[i] AS tok, i
  FROM (SELECT source, doc_id,
               regexp_extract_all(lower(text), '[a-z]+') AS w
        FROM documents),
       unnest(generate_series(1, len(w))) AS u(i)
), n_per AS (
  SELECT source, doc_id, CAST(max(i) AS BIGINT) AS n,
         CAST(count(DISTINCT tok) AS BIGINT) AS dt
  FROM toks GROUP BY source, doc_id
), prev AS (
  SELECT source, doc_id, tok, i,
         coalesce(lag(i) OVER (PARTITION BY doc_id, tok ORDER BY i), 0)
           AS prev
  FROM toks
), contrib AS (
  SELECT p.source,
         greatest(least(p.i, n.n - 50 + 1)
                  - greatest(p.i - 50 + 1, p.prev + 1, 1) + 1, 0) AS c
  FROM prev p JOIN n_per n ON p.doc_id = n.doc_id
  WHERE n.n >= 50
), mattr AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS type_instances
  FROM contrib GROUP BY source
), wins AS (
  SELECT source,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum(dt) AS BIGINT) AS distinct_token_sum,
         CAST(sum(CASE WHEN n >= 50 THEN n - 50 + 1 ELSE 0 END) AS BIGINT)
           AS windows,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM n_per GROUP BY source
)
SELECT wins.source, n_docs, total_tokens, windows,
       CAST(coalesce(type_instances, 0) AS BIGINT) AS type_instances,
       CAST(CASE WHEN windows > 0 THEN
            CAST(coalesce(type_instances, 0) AS HUGEINT) * 1000000
            // (CAST(windows AS HUGEINT) * 50) END AS BIGINT) AS mattr_micro,
       CAST(CASE WHEN total_tokens > 0 THEN
            CAST(distinct_token_sum AS HUGEINT) * 1000000
            // total_tokens END AS BIGINT) AS ttr_micro
FROM wins LEFT JOIN mattr ON wins.source = mattr.source
ORDER BY wins.source
"""


def q249_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source perplexity under the corpus Kneser-Ney bigram LM
    (q237's shared _kn_bigram_lm) — in-engine model evaluation: which
    sources does the corpus-level LM model well? Each distinct bigram's
    log P is computed ONCE on the LM table as ln(num) − ln(den) of the
    exact d=3/4 rationals (BIGINT-routed casts, <2⁵³), nano-quantized
    BEFORE any accumulation, so per-source totals are exact integer
    sums of (multiplicity × lnp_nano) — order-independent (the q222
    discipline). Resubstitution scoring (the LM is estimated on the
    full corpus), so every doc bigram exists in the LM — no backoff
    path needed; PPL = exp(−avg lnP) runs once per source row. Scale
    shape: one keyed join of the (source, bigram) count table against
    the LM table; both are post-aggregation; truncating avg division
    is toward-zero in both engines (negative sums). Magnitude audit:
    |lnp_nano| ≤ ~3e10, so Σ mult·lnp_nano wraps BIGINT at ~3e8
    bigrams per source — it accumulates in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) and is emitted as a STRING on both sides
    (q78/q233 rule); avg_lnp_nano (≤ 3e10) stays BIGINT-safe."""
    docs = load_table(spark, sf_dir, "documents")
    lm = _kn_bigram_lm(docs).select(
        "prev_tok", "next_tok",
        F.expr(
            "cast(round((ln(cast(cast(cast(4 * c - 3 as decimal(19,0))"
            " * nbb + 3 * cast(nfw as decimal(19,0)) * np as bigint)"
            " as double))"
            " - ln(cast(cast(4 * cast(cp as decimal(19,0)) * nbb"
            " as bigint) as double))) * 1e9) as bigint)"
        ).alias("lnp_nano"),
    )
    occ = (
        docs.select(
            "source",
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            .alias("w"),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN"
                    " transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS p,"
                    "             element_at(w, i + 1) AS t))"
                    " ELSE CAST(array()"
                    " AS array<struct<p:string,t:string>>) END"
                )
            ).alias("b"),
        )
        .select(
            "source",
            F.col("b.p").alias("prev_tok"),
            F.col("b.t").alias("next_tok"),
        )
        .groupBy("source", "prev_tok", "next_tok")
        .agg(F.count("*").alias("mult"))
    )
    per = occ.join(lm, ["prev_tok", "next_tok"]).groupBy("source").agg(
        F.sum("mult").alias("n_bigrams"),
        F.sum(F.expr("CAST(mult AS DECIMAL(38,0)) * lnp_nano"))
        .alias("sum_lnp_nano"),
    )
    return per.select(
        "source", "n_bigrams",
        F.expr("CAST(sum_lnp_nano AS STRING)").alias("sum_lnp_nano"),
        F.expr("sum_lnp_nano div n_bigrams").alias("avg_lnp_nano"),
        F.expr(
            "round(exp(-cast(sum_lnp_nano div n_bigrams as double)"
            " / 1e9), 4)"
        ).alias("perplexity"),
    ).orderBy("source")


_Q249_SQL = r"""
WITH toks AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z]+') AS w
  FROM documents
), bg AS (
  SELECT source, w[i] AS prev_tok, w[i + 1] AS next_tok
  FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2
), cnt AS (
  SELECT prev_tok, next_tok, CAST(count(*) AS BIGINT) AS c
  FROM bg GROUP BY prev_tok, next_tok
), enr AS (
  SELECT prev_tok, next_tok, c,
         CAST(sum(c) OVER (PARTITION BY prev_tok) AS BIGINT) AS cp,
         CAST(count(*) OVER (PARTITION BY prev_tok) AS BIGINT) AS nfw,
         CAST(count(*) OVER (PARTITION BY next_tok) AS BIGINT) AS np
  FROM cnt
), nb AS (
  SELECT CAST(count(*) AS BIGINT) AS nbb FROM cnt
), lm AS (
  SELECT prev_tok, next_tok,
         CAST(round((ln(CAST(CAST(CAST(4 * c - 3 AS HUGEINT) * nbb
              + 3 * CAST(nfw AS HUGEINT) * np AS BIGINT) AS DOUBLE))
              - ln(CAST(CAST(4 * CAST(cp AS HUGEINT) * nbb AS BIGINT)
                   AS DOUBLE))) * 1e9) AS BIGINT) AS lnp_nano
  FROM enr CROSS JOIN nb
), occ AS (
  SELECT source, prev_tok, next_tok, CAST(count(*) AS BIGINT) AS mult
  FROM bg GROUP BY source, prev_tok, next_tok
), per AS (
  SELECT source, CAST(sum(mult) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(mult AS HUGEINT) * lnp_nano) AS HUGEINT)
           AS sum_lnp_nano
  FROM occ JOIN lm USING (prev_tok, next_tok)
  GROUP BY source
)
SELECT source, n_bigrams, CAST(sum_lnp_nano AS VARCHAR) AS sum_lnp_nano,
       CAST(sum_lnp_nano // n_bigrams AS BIGINT) AS avg_lnp_nano,
       round(exp(-CAST(CAST(sum_lnp_nano // n_bigrams AS BIGINT)
             AS DOUBLE) / 1e9), 4) AS perplexity
FROM per
ORDER BY source
"""


def q252_jackknife_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife for the corpus mean document length —
    the survey-statistics workhorse for clustered data (docs within a
    source are correlated, so the naive iid SE is too small; q251's
    bootstrap resamples rows, this resamples SOURCES). Each
    leave-source-out mean is the exact micro quotient
    (S − s_g)·10⁶ div (N − n_g); the jackknife variance
    (g−1)/g · Σ (m̂_(g) − m̄)² runs on micro-integers (one grouped
    collapse to g rows, 1-row totals broadcast), and only the final
    sqrt touches a double. Degenerate g < 2 or a source holding all
    docs → NULL. Output: one row per source with its leave-out mean
    and influence, plus the global jackknife SE repeated (the
    per-source grain is the deliverable — which source moves the
    corpus statistic most)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count("*").alias("n_g"),
        F.sum(F.expr("cast(n_chars as decimal(19,0))")).alias("s_g"),
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        "source", "n_g", "k", "n",
        F.expr(
            "case when n > n_g then"
            " cast((s - s_g) * 1000000 div (n - n_g) as bigint) end"
        ).alias("loo_mean_micro"),
        F.expr("cast(s * 1000000 div n as bigint)").alias("mean_micro"),
    )
    jk = loo.agg(
        F.sum(
            F.expr("cast(loo_mean_micro as decimal(19,0))")
        ).alias("sum_loo"),
        F.count("*").alias("kk"),
    ).select(
        F.expr("cast(sum_loo div kk as bigint)").alias("loo_bar_micro")
    )
    dev = loo.crossJoin(F.broadcast(jk)).select(
        "source", "n_g", "k", "loo_mean_micro", "mean_micro",
        "loo_bar_micro",
        F.expr(
            "(loo_mean_micro - mean_micro)"
        ).alias("influence_micro"),
        F.expr(
            "cast(loo_mean_micro - loo_bar_micro as decimal(19,0))"
            " * (loo_mean_micro - loo_bar_micro)"
        ).alias("d2"),
    )
    var = dev.agg(F.sum("d2").alias("ssq"), F.max("k").alias("k")).select(
        "k",
        F.expr(
            "case when k > 1 then round(sqrt(cast(cast(ssq * (k - 1)"
            " div k as bigint) as double)) / 1e6, 4) end"
        ).alias("jackknife_se"),
    )
    return (
        dev.select(
            "source", "n_g", "loo_mean_micro", "mean_micro",
            "influence_micro",
        )
        .crossJoin(F.broadcast(var.select("jackknife_se")))
        .orderBy("source")
    )


_Q252_SQL = """
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s_g
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(s_g) AS HUGEINT) AS s
  FROM g
), loo AS (
  SELECT source, n_g, k, n,
         CAST(CASE WHEN n > n_g THEN
              (s - s_g) * 1000000 // (n - n_g) END AS BIGINT)
           AS loo_mean_micro,
         CAST(s * 1000000 // n AS BIGINT) AS mean_micro
  FROM g CROSS JOIN tot
), jk AS (
  SELECT CAST(sum(CAST(loo_mean_micro AS HUGEINT))
              // count(*) AS BIGINT) AS loo_bar_micro
  FROM loo
), dev AS (
  SELECT source, n_g, k, loo_mean_micro, mean_micro,
         loo_mean_micro - mean_micro AS influence_micro,
         CAST(loo_mean_micro - loo_bar_micro AS HUGEINT)
           * (loo_mean_micro - loo_bar_micro) AS d2
  FROM loo CROSS JOIN jk
), var AS (
  SELECT max(k) AS k,
         CASE WHEN max(k) > 1 THEN
           round(sqrt(CAST(CAST(sum(d2) * (max(k) - 1) // max(k)
                 AS BIGINT) AS DOUBLE)) / 1e6, 4) END AS jackknife_se
  FROM dev
)
SELECT source, n_g, loo_mean_micro, mean_micro, influence_micro,
       jackknife_se
FROM dev CROSS JOIN var
ORDER BY source
"""


def q254_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta — the standard computational-stylometry distance
    between text collections: z-score each of the top-50 corpus words'
    relative frequency across sources, then Delta(s₁,s₂) = mean |z₁−z₂|.
    Flags sources with anomalous style (template farms, MT output) for
    curation. Exactness discipline: per-source relative frequencies are
    micro quotients; the across-source mean and population variance of
    each word's f_micro are exact integers; the ONLY float is one sqrt
    per (word) for σ, immediately floored to micro (sd_micro ≥ 1 guard
    avoids zero-division); z is a milli integer quotient, so every
    pairwise Delta is an exact integer mean. Scale shape: one token
    count collapse; the top-50 vocabulary is TakeOrdered and broadcast;
    the z matrix is |sources|·50; the pair expansion is
    |sources|²/2 — all bounded post-agg tables."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    cnt = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    n_s = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    top = (
        cnt.groupBy("tok").agg(F.sum("c").alias("ct"))
        .orderBy(F.desc("ct"), "tok").limit(50)
        .select("tok")
    )
    k_t = n_s.agg(F.count("*").alias("k"))
    grid = n_s.crossJoin(F.broadcast(top)).join(
        cnt, ["source", "tok"], "left"
    ).select(
        "source", "tok", "n",
        F.coalesce("c", F.lit(0)).alias("c"),
    ).select(
        "source", "tok",
        F.expr(
            "cast(cast(c as decimal(19,0)) * 1000000 div n as bigint)"
        ).alias("f_micro"),
    )
    stats = grid.groupBy("tok").agg(
        F.sum("f_micro").alias("sf"),
        F.sum(F.expr("cast(f_micro as decimal(19,0)) * f_micro"))
        .alias("sff"),
    ).crossJoin(F.broadcast(k_t)).select(
        "tok",
        F.expr("cast(sf div k as bigint)").alias("mu_micro"),
        F.expr(
            "greatest(cast(floor(sqrt(cast(cast((k * sff"
            " - cast(sf as decimal(19,0)) * sf) div (cast(k as"
            " decimal(19,0)) * k) as bigint) as double))) as bigint),"
            " cast(1 as bigint))"
        ).alias("sd_micro"),
    )
    z = grid.join(F.broadcast(stats), "tok").select(
        "source", "tok",
        F.expr(
            "cast(f_micro - mu_micro as decimal(19,0)) * 1000"
            " div sd_micro"
        ).cast("long").alias("z_milli"),
    )
    za = z.select(
        F.col("source").alias("sa"), "tok", F.col("z_milli").alias("za")
    )
    zb = z.select(
        F.col("source").alias("sb"), "tok", F.col("z_milli").alias("zb")
    )
    pairs = za.join(zb, "tok").where(F.col("sa") < F.col("sb"))
    return (
        pairs.groupBy("sa", "sb")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.expr("abs(za - zb)")).alias("sum_absdz_milli"),
        )
        .select(
            "sa", "sb", "n_words", "sum_absdz_milli",
            F.expr("sum_absdz_milli div n_words").alias("delta_milli"),
        )
        .orderBy("sa", "sb")
    )


_Q254_SQL = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
), cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), n_s AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
), top AS (
  SELECT tok FROM (
    SELECT tok, sum(c) AS ct FROM cnt GROUP BY tok
    ORDER BY ct DESC, tok LIMIT 50)
), k_t AS (
  SELECT CAST(count(*) AS BIGINT) AS k FROM n_s
), grid AS (
  SELECT n_s.source, top.tok,
         CAST(CAST(coalesce(cnt.c, 0) AS HUGEINT) * 1000000 // n_s.n
              AS BIGINT) AS f_micro
  FROM n_s CROSS JOIN top
  LEFT JOIN cnt ON cnt.source = n_s.source AND cnt.tok = top.tok
), stats AS (
  SELECT tok,
         CAST(sf // k AS BIGINT) AS mu_micro,
         greatest(CAST(floor(sqrt(CAST(CAST((k * sff
           - CAST(sf AS HUGEINT) * sf) // (CAST(k AS HUGEINT) * k)
           AS BIGINT) AS DOUBLE))) AS BIGINT), 1) AS sd_micro
  FROM (SELECT tok, CAST(sum(f_micro) AS HUGEINT) AS sf,
               CAST(sum(CAST(f_micro AS HUGEINT) * f_micro) AS HUGEINT)
                 AS sff
        FROM grid GROUP BY tok) CROSS JOIN k_t
), z AS (
  SELECT source, grid.tok,
         CAST(CAST(f_micro - mu_micro AS HUGEINT) * 1000 // sd_micro
              AS BIGINT) AS z_milli
  FROM grid JOIN stats ON grid.tok = stats.tok
)
SELECT a.source AS sa, b.source AS sb,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(abs(a.z_milli - b.z_milli)) AS BIGINT) AS sum_absdz_milli,
       CAST(CAST(sum(abs(a.z_milli - b.z_milli)) AS HUGEINT) // count(*)
            AS BIGINT) AS delta_milli
FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY sa, sb
"""


def q256_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance: given query vector vec_id=0, pick 5
    of the top-20 relevant embeddings that are relevant BUT mutually
    diverse — score(i) = 0.7·rel(i) − 0.3·max_{s∈S} sim(i,s), greedily
    — the retrieval-side diversity selector that complements corpus-
    side SemDeDup (q95) and contrastive mining (q120). The greedy loop
    is UNROLLED (5 steps) over bounded tables: candidates are
    TakeOrdered top-20 with the 20×20 sim matrix persisted, each step
    is an anti-join + max-sim aggregate + 1-row TakeOrdered pick, and
    the oracle replays the identical steps as CTEs. Cosines use the
    validated q22 zip_with/aggregate double chain (deterministic array-
    order folds in both engines); λ enters as e0 literals (7e-1/3e-1 —
    a bare 0.7 is DECIMAL in both SQL dialects). Ties break on
    vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    to_dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    q = emb.filter(F.col("vec_id") == 0).select(
        to_dbl("embedding").alias("qv")
    )
    cand = emb.filter(F.col("vec_id") > 0).select(
        "vec_id", "label", to_dbl("embedding").alias("v")
    )
    rel = cand.crossJoin(F.broadcast(q)).withColumn(
        "rel",
        dot(F.col("qv"), F.col("v"))
        / (F.sqrt(dot(F.col("qv"), F.col("qv")))
           * F.sqrt(dot(F.col("v"), F.col("v")))),
    ).select("vec_id", "label", "v", "rel")
    top = rel.orderBy(F.desc("rel"), "vec_id").limit(20).localCheckpoint(eager=True)
    a = top.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = top.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    sims = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .select(
            "ia", "ib",
            (dot(F.col("va"), F.col("vb"))
             / (F.sqrt(dot(F.col("va"), F.col("va")))
                * F.sqrt(dot(F.col("vb"), F.col("vb"))))).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    pick = (
        top.orderBy(F.desc("rel"), "vec_id").limit(1)
        .select("vec_id", "label", "rel",
                F.expr("7e-1 * rel").alias("score"))
    )
    picks = [pick]
    for _ in range(2, 6):
        sel_ids = picks[0].select("vec_id")
        for p in picks[1:]:
            sel_ids = sel_ids.unionByName(p.select("vec_id"))
        ms = (
            sims.join(
                F.broadcast(sel_ids.withColumnRenamed("vec_id", "ib")),
                "ib",
            )
            .groupBy("ia").agg(F.max("sim").alias("ms"))
        )
        step = (
            top.join(sel_ids, "vec_id", "left_anti")
            .join(ms, F.col("vec_id") == F.col("ia"))
            .select(
                "vec_id", "label", "rel",
                F.expr("7e-1 * rel - 3e-1 * ms").alias("score"),
            )
            .orderBy(F.desc("score"), "vec_id").limit(1)
        )
        picks.append(step)
    out = None
    for i, p in enumerate(picks, 1):
        row = p.select(
            F.lit(i).alias("rank"), "vec_id", "label",
            F.round("rel", 4).alias("relevance"),
            F.round("score", 4).alias("mmr_score"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rank")


_Q256_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), cand AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id > 0
), rel AS (
  SELECT vec_id, label, v,
         list_dot_product(qv, v)
         / (sqrt(list_dot_product(qv, qv))
            * sqrt(list_dot_product(v, v))) AS rel
  FROM cand CROSS JOIN q
), top AS (
  SELECT vec_id, label, v, rel FROM rel ORDER BY rel DESC, vec_id LIMIT 20
), sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))) AS sim
  FROM top a JOIN top b ON a.vec_id <> b.vec_id
), s1 AS (
  SELECT vec_id, label, rel, 7e-1 * rel AS score
  FROM top ORDER BY rel DESC, vec_id LIMIT 1
), sel1 AS (SELECT vec_id FROM s1),
m2 AS (
  SELECT ia, max(sim) AS ms FROM sims
  WHERE ib IN (SELECT vec_id FROM sel1) GROUP BY ia
), s2 AS (
  SELECT t.vec_id, t.label, t.rel, 7e-1 * t.rel - 3e-1 * m2.ms AS score
  FROM top t JOIN m2 ON m2.ia = t.vec_id
  WHERE t.vec_id NOT IN (SELECT vec_id FROM sel1)
  ORDER BY score DESC, t.vec_id LIMIT 1
), sel2 AS (SELECT vec_id FROM sel1 UNION ALL SELECT vec_id FROM s2),
m3 AS (
  SELECT ia, max(sim) AS ms FROM sims
  WHERE ib IN (SELECT vec_id FROM sel2) GROUP BY ia
), s3 AS (
  SELECT t.vec_id, t.label, t.rel, 7e-1 * t.rel - 3e-1 * m3.ms AS score
  FROM top t JOIN m3 ON m3.ia = t.vec_id
  WHERE t.vec_id NOT IN (SELECT vec_id FROM sel2)
  ORDER BY score DESC, t.vec_id LIMIT 1
), sel3 AS (SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3),
m4 AS (
  SELECT ia, max(sim) AS ms FROM sims
  WHERE ib IN (SELECT vec_id FROM sel3) GROUP BY ia
), s4 AS (
  SELECT t.vec_id, t.label, t.rel, 7e-1 * t.rel - 3e-1 * m4.ms AS score
  FROM top t JOIN m4 ON m4.ia = t.vec_id
  WHERE t.vec_id NOT IN (SELECT vec_id FROM sel3)
  ORDER BY score DESC, t.vec_id LIMIT 1
), sel4 AS (SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4),
m5 AS (
  SELECT ia, max(sim) AS ms FROM sims
  WHERE ib IN (SELECT vec_id FROM sel4) GROUP BY ia
), s5 AS (
  SELECT t.vec_id, t.label, t.rel, 7e-1 * t.rel - 3e-1 * m5.ms AS score
  FROM top t JOIN m5 ON m5.ia = t.vec_id
  WHERE t.vec_id NOT IN (SELECT vec_id FROM sel4)
  ORDER BY score DESC, t.vec_id LIMIT 1
)
SELECT rank, vec_id, label, round(rel, 4) AS relevance,
       round(score, 4) AS mmr_score
FROM (
  SELECT 1 AS rank, * FROM s1
  UNION ALL SELECT 2, * FROM s2
  UNION ALL SELECT 3, * FROM s3
  UNION ALL SELECT 4, * FROM s4
  UNION ALL SELECT 5, * FROM s5
)
ORDER BY rank
"""


def q257_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion hybrid retrieval: fuse the BM25 keyword
    ranking (q51's Okapi scorer over _BM25_TERMS) with the dense cosine
    ranking (q22's zip_with/aggregate scorer, query = vec_id 0) on
    doc_id == vec_id, RRF k=60 — the standard hybrid-search fusion a
    retrieval-augmented pipeline runs in front of an LLM. Top-10 fused.

    Exactness: ranks are integers, so the fused score is the exact
    rational 1/(60+rb) + 1/(60+rd); it is emitted as the exact BIGINT
    floor((num * 1e12) / den) (Spark `div` ≡ DuckDB `//`; num ≤ 240 so
    no overflow) and ordered on that integer — no float enters the
    comparison or the hash.

    Shape at 100 TB: each ranker ends in a TakeOrdered top-20 (BM25's
    scan filters to query-term tokens first; the dense pass broadcasts
    the 1-row query vector) — the fusion join, ranks, and final sort
    all run on two 20-row bounded tables."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # --- BM25 ranker (q51's scorer via the shared _bm25_top20, top-20) ---
    bm_top = _bm25_top20(docs)
    bm_rank = bm_top.withColumn(
        "rb",
        F.row_number().over(W.orderBy(F.col("bm25").desc(), "doc_id")),
    ).select("doc_id", "rb")

    # --- dense cosine ranker (q22's scorer, query vec_id = 0, top-20) ---
    to_dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731

    def dot(a, b_):
        return F.aggregate(
            F.zip_with(a, b_, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    qv = emb.filter(F.col("vec_id") == 0).select(to_dbl("embedding").alias("qv"))
    dense_top = (
        emb.filter(F.col("vec_id") > 0)
        .select("vec_id", to_dbl("embedding").alias("v"))
        .crossJoin(F.broadcast(qv))
        .withColumn(
            "cos",
            dot(F.col("qv"), F.col("v"))
            / (F.sqrt(dot(F.col("qv"), F.col("qv")))
               * F.sqrt(dot(F.col("v"), F.col("v")))),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(20)
    )
    de_rank = dense_top.withColumn(
        "rd",
        F.row_number().over(W.orderBy(F.col("cos").desc(), "vec_id")),
    ).select(F.col("vec_id").alias("doc_id"), "rd")

    fused = bm_rank.join(de_rank, "doc_id", "full_outer").select(
        "doc_id",
        F.col("rb"),
        F.col("rd"),
        F.when(
            F.col("rb").isNotNull() & F.col("rd").isNotNull(),
            (F.lit(120) + F.col("rb") + F.col("rd")).cast("bigint"),
        )
        .otherwise(F.lit(1).cast("bigint"))
        .alias("num"),
        F.when(
            F.col("rb").isNotNull() & F.col("rd").isNotNull(),
            ((F.lit(60) + F.col("rb")) * (F.lit(60) + F.col("rd"))).cast("bigint"),
        )
        .otherwise(
            (F.lit(60) + F.coalesce(F.col("rb"), F.col("rd"))).cast("bigint")
        )
        .alias("den"),
    )
    scored = fused.select(
        "doc_id",
        F.coalesce("rb", F.lit(0)).alias("bm25_rank"),
        F.coalesce("rd", F.lit(0)).alias("dense_rank"),
        F.expr("(num * 1000000000000L) div den").alias("rrf_pico"),
    )
    top10 = scored.orderBy(F.col("rrf_pico").desc(), "doc_id").limit(10)
    return (
        top10.withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("rrf_pico").desc(), "doc_id")),
        )
        .select("rank", "doc_id", "bm25_rank", "dense_rank", "rrf_pico")
        .orderBy("rank")
    )


def _q257_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return rf"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({terms}) GROUP BY 1, 2
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), bm_top AS (
  SELECT tf.doc_id,
         round(sum(
           ln((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
           * (tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
         ), 4) AS bm25
  FROM tf
  JOIN dfreq USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
  ORDER BY bm25 DESC, tf.doc_id
  LIMIT 20
), bm_rank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
  FROM bm_top
), q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), dense_top AS (
  SELECT vec_id,
         list_dot_product(qv, v)
         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
  FROM (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id > 0
  ) CROSS JOIN q
  ORDER BY cos DESC, vec_id
  LIMIT 20
), de_rank AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos DESC, vec_id) AS rd
  FROM dense_top
), fused AS (
  SELECT doc_id, rb, rd,
         CASE WHEN rb IS NOT NULL AND rd IS NOT NULL
              THEN CAST(120 + rb + rd AS BIGINT) ELSE CAST(1 AS BIGINT)
         END AS num,
         CASE WHEN rb IS NOT NULL AND rd IS NOT NULL
              THEN CAST((60 + rb) * (60 + rd) AS BIGINT)
              ELSE CAST(60 + coalesce(rb, rd) AS BIGINT)
         END AS den
  FROM bm_rank FULL OUTER JOIN de_rank USING (doc_id)
), scored AS (
  SELECT doc_id,
         coalesce(rb, 0) AS bm25_rank,
         coalesce(rd, 0) AS dense_rank,
         (num * 1000000000000) // den AS rrf_pico
  FROM fused
), top10 AS (
  SELECT * FROM scored ORDER BY rrf_pico DESC, doc_id LIMIT 10
)
SELECT row_number() OVER (ORDER BY rrf_pico DESC, doc_id) AS rank,
       doc_id, bm25_rank, dense_rank, CAST(rrf_pico AS BIGINT) AS rrf_pico
FROM top10
ORDER BY rank
"""


def q258_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 evaluation of the dense cosine retriever (q22's scorer,
    query set vec_id < 5, corpus = the rest) against label-derived
    graded relevance: gain 3 for an exact label match, 1 for an
    adjacent label (|Δ|=1), 0 otherwise — the retrieval-quality metric
    an embedding-pipeline regression suite tracks per release.

    Exactness: each DCG term gain·1e9/log2(rank+1) is a single
    deterministic double chain FLOORED to a BIGINT nano-unit before the
    per-query sum (the q249 quantize-pre-sum idiom), so the cross-row
    float-sum order can never differ between engines; NDCG is the one
    final rounded division of two exact BIGINTs.

    Shape at 100 TB: both the retrieved-rank and the ideal-rank windows
    are rank<=10 filters, which Catalyst runs as map-side
    WindowGroupLimit; the query set (5 rows + labels) broadcasts."""
    emb = load_table(spark, sf_dir, "embeddings")
    to_dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        to_dbl("embedding").alias("qv"),
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select(
        "vec_id", "label", to_dbl("embedding").alias("v")
    )
    scored = corpus.join(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        (
            dot(F.col("qv"), F.col("v"))
            / (F.sqrt(dot(F.col("qv"), F.col("qv")))
               * F.sqrt(dot(F.col("v"), F.col("v"))))
        ).alias("cos"),
        F.when(F.col("label") == F.col("qlabel"), F.lit(3))
        .when(F.abs(F.col("label") - F.col("qlabel")) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("gain"),
    )
    term = F.floor(
        F.col("gain") * F.lit(1000000000.0) / F.log2(F.col("rank") + F.lit(1))
    ).cast("bigint")
    ret = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    dcg = (
        scored.withColumn("rank", F.row_number().over(ret))
        .filter(F.col("rank") <= 10)
        .withColumn("t", term)
        .groupBy("query_id")
        .agg(F.sum("t").alias("dcg_nano"))
    )
    ideal = W.partitionBy("query_id").orderBy(F.col("gain").desc(), "vec_id")
    idcg = (
        scored.withColumn("rank", F.row_number().over(ideal))
        .filter(F.col("rank") <= 10)
        .withColumn("t", term)
        .groupBy("query_id")
        .agg(F.sum("t").alias("idcg_nano"))
    )
    return (
        dcg.join(idcg, "query_id")
        .select(
            "query_id",
            "dcg_nano",
            "idcg_nano",
            F.when(
                F.col("idcg_nano") > 0,
                F.round(
                    F.col("dcg_nano").cast("double") / F.col("idcg_nano"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


_Q258_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel,
         CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), scored AS (
  SELECT query_id, vec_id,
         list_dot_product(qv, v)
         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos,
         CASE WHEN label = qlabel THEN 3
              WHEN abs(label - qlabel) = 1 THEN 1
              ELSE 0 END AS gain
  FROM c CROSS JOIN q
), ret AS (
  SELECT query_id, gain,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
), dcg AS (
  SELECT query_id,
         CAST(sum(CAST(floor(gain * 1000000000.0 / log2(rank + 1)) AS BIGINT)) AS BIGINT) AS dcg_nano
  FROM ret WHERE rank <= 10 GROUP BY query_id
), ideal AS (
  SELECT query_id, gain,
         row_number() OVER (PARTITION BY query_id ORDER BY gain DESC, vec_id) AS rank
  FROM scored
), idcg AS (
  SELECT query_id,
         CAST(sum(CAST(floor(gain * 1000000000.0 / log2(rank + 1)) AS BIGINT)) AS BIGINT) AS idcg_nano
  FROM ideal WHERE rank <= 10 GROUP BY query_id
)
SELECT dcg.query_id, dcg_nano, idcg_nano,
       CASE WHEN idcg_nano > 0
            THEN round(CAST(dcg_nano AS DOUBLE) / idcg_nano, 6)
            ELSE 0.0 END AS ndcg_at_10
FROM dcg JOIN idcg ON dcg.query_id = idcg.query_id
ORDER BY dcg.query_id
"""


def q259_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (operators/sketches.count_min_sketch, depth=4,
    width=1024) over the document token stream, audited against exact
    counts for 25 probe tokens: the 20 most frequent (count desc, token)
    and the 5 least frequent (count asc, token). CMS guarantees
    est >= exact; `overcount` shows the collision inflation the width
    knob buys down.

    Shape at 100 TB: the sketch is 4·1024 additive cells built by one
    map-side-combinable groupBy — state independent of corpus size, the
    same mergeable-partial contract as the KMV/MG/HLL tiers; probes
    broadcast. Every output column is an exact BIGINT (driver-hash
    safe), and the md5-slice bucket hash is recomputed identically by
    the DuckDB oracle."""
    from ..operators.sketches import count_min_sketch

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    sketch = count_min_sketch(toks, "tok", depth=4, width=1024)

    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.col("exact_cnt").desc(), "tok").limit(20)
    rare = exact.orderBy(F.col("exact_cnt").asc(), "tok").limit(5)
    probes = top.unionByName(rare).distinct()

    rows = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("row")
    hashed = probes.select("tok", "exact_cnt", rows).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("tok"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1024,
    )
    est = (
        sketch.join(F.broadcast(hashed), ["row", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("counter").alias("cms_est"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.col("exact_cnt").desc(), "tok")


_Q259_SQL = r"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), rows_ AS (
  SELECT unnest([0, 1, 2, 3]) AS row
), cells AS (
  SELECT row,
         ('0x' || substr(md5(CAST(row AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
           % 1024 AS bucket,
         CAST(count(*) AS BIGINT) AS counter
  FROM toks CROSS JOIN rows_
  GROUP BY 1, 2
), exact_ AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY tok
), top AS (
  SELECT * FROM exact_ ORDER BY exact_cnt DESC, tok LIMIT 20
), rare AS (
  SELECT * FROM exact_ ORDER BY exact_cnt ASC, tok LIMIT 5
), probes AS (
  SELECT DISTINCT * FROM (SELECT * FROM top UNION ALL SELECT * FROM rare)
), hashed AS (
  SELECT tok, exact_cnt, row,
         ('0x' || substr(md5(CAST(row AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
           % 1024 AS bucket
  FROM probes CROSS JOIN rows_
), est AS (
  SELECT tok, exact_cnt, CAST(min(counter) AS BIGINT) AS cms_est
  FROM cells JOIN hashed USING (row, bucket)
  GROUP BY tok, exact_cnt
)
SELECT tok, exact_cnt, cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
ORDER BY exact_cnt DESC, tok
"""


def q260_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the q104 quality-classifier scores
    against the q58 keep pseudo-labels: the monotone-nondecreasing fit
    of per-decile keep rates via the exact minimax identity
    iso_i = max_{j<=i} min_{k>=i} rate(j..k) — what turns raw
    classifier scores into usable keep-probabilities (the fit q172's
    reliability diagram motivates).

    Exactness: interval rates are floored to BIGINT nanos via integer
    division (keep_sum·1e9 div n_sum), so every min/max comparison is
    over exact integers and the fixed-point resolution IS the operator
    definition — both engines and the planted Python mirror share it.

    Shape at 100 TB: corpus-size work is the one q172-style grouped
    pass into <=10 decile bins; the O(B^3) interval/minimax stages run
    on a 10-row bounded relation (broadcast joins only)."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    si = F.expr("CAST(round(score * 10000) AS BIGINT)")
    bins = (
        scores.join(labels, "doc_id")
        .select(si.alias("si"), "keep")
        .select(
            F.least(F.greatest(F.expr("si div 1000"), F.lit(0)), F.lit(9))
            .cast("int")
            .alias("bin"),
            "keep",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .localCheckpoint(eager=True)
    )
    j = bins.select(F.col("bin").alias("j"))
    k = bins.select(F.col("bin").alias("k"))
    m = bins.select(F.col("bin").alias("m"), "n", "n_keep")
    rates = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(m),
            (F.col("m") >= F.col("j")) & (F.col("m") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            F.expr("(sum(n_keep) * 1000000000L) div sum(n)").alias("r_nano")
        )
    )
    i = bins.select(F.col("bin").alias("i"))
    inner = (
        rates.join(
            F.broadcast(i),
            (F.col("k") >= F.col("i")) & (F.col("j") <= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("r_nano").alias("mn"))
    )
    iso = inner.groupBy("i").agg(F.max("mn").alias("iso_nano"))
    return (
        bins.join(iso, bins.bin == iso.i)
        .select(
            "bin",
            "n",
            "n_keep",
            F.round(F.col("n_keep").cast("double") / F.col("n"), 4).alias(
                "raw_rate"
            ),
            "iso_nano",
            F.round(F.col("iso_nano").cast("double") / 1e9, 4).alias(
                "iso_rate"
            ),
        )
        .orderBy("bin")
    )


def _q260_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(round(s.score * 10000) AS BIGINT) AS si, l.keep
  FROM scores s JOIN labels l USING (doc_id)
), bins AS (
  SELECT CAST(least(greatest(si // 1000, 0), 9) AS INTEGER) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
  FROM e GROUP BY 1
), rates AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST((sum(m.n_keep) * 1000000000) // sum(m.n) AS BIGINT) AS r_nano
  FROM bins j
  JOIN bins k ON j.bin <= k.bin
  JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
  GROUP BY 1, 2
), inner_ AS (
  SELECT i.bin AS i, r.j, min(r.r_nano) AS mn
  FROM rates r JOIN bins i ON r.k >= i.bin AND r.j <= i.bin
  GROUP BY 1, 2
), iso AS (
  SELECT i, CAST(max(mn) AS BIGINT) AS iso_nano FROM inner_ GROUP BY i
)
SELECT b.bin, b.n, b.n_keep,
       round(CAST(b.n_keep AS DOUBLE) / b.n, 4) AS raw_rate,
       iso.iso_nano,
       round(CAST(iso.iso_nano AS DOUBLE) / 1e9, 4) AS iso_rate
FROM bins b JOIN iso ON b.bin = iso.i
ORDER BY b.bin
"""


def q261_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turing / Good-Turing frequency re-estimation over the token
    unigram distribution: the frequency-of-frequencies table N_r and
    the adjusted count r* = (r+1)·N_{r+1}/N_r for the 20 smallest r — the
    classical smoothing companion to the Kneser-Ney LM (q237/q249) and
    the Zipf fit (q202); N_1/N is the unseen-mass estimate an OOV-rate
    monitor tracks.

    Exactness: r* is the exact BIGINT floor((r+1)·N_{r+1}·1e6 / N_r)
    (integer div both engines); rows where N_{r+1}=0 report 0 via the
    left join, matching the raw Turing estimate's degeneracy.

    Shape at 100 TB: one corpus groupBy (token counts) then a groupBy
    on the counts themselves — the freq-of-freqs relation is tiny and
    heavy-tailed; the r+1 self-join and the 20-smallest-r TakeOrdered run on it, never
    on the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("r"))
    fof = counts.groupBy("r").agg(F.count("*").alias("n_r"))
    nxt = fof.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next"))
    return (
        fof.join(nxt, "r", "left")
        .select(
            "r",
            "n_r",
            F.coalesce("n_next", F.lit(0)).alias("n_next"),
            F.expr(
                "((r + 1) * coalesce(n_next, 0L) * 1000000L) div n_r"
            ).alias("rstar_micro"),
        )
        .orderBy("r")
        .limit(20)
    )


_Q261_SQL = r"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), counts AS (
  SELECT tok, count(*) AS r FROM toks GROUP BY tok
), fof AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM counts GROUP BY r
), nxt AS (
  SELECT r - 1 AS r, n_r AS n_next FROM fof
)
SELECT fof.r, fof.n_r,
       CAST(coalesce(nxt.n_next, 0) AS BIGINT) AS n_next,
       CAST(((fof.r + 1) * coalesce(nxt.n_next, 0) * 1000000) // fof.n_r
            AS BIGINT) AS rstar_micro
FROM fof LEFT JOIN nxt ON fof.r = nxt.r
ORDER BY fof.r
LIMIT 20
"""


def q262_length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing audit for training-batch assembly:
    each document is assigned to the smallest power-of-two length
    bucket >= its whitespace token count (64..2048; longer docs land in
    the 2048 bucket TRUNCATED to the cap) and every bucket reports its
    padding waste and packing efficiency — the measurement that decides
    bucket boundaries before a padded-batch training run (the padded
    counterpart of q48's sequence packing).

    All-integer: tokens_kept = min(len, cap), padded = n_docs·cap,
    eff_ppm = kept·1e6 div padded — exact BIGINTs end to end.

    Shape at 100 TB: one narrow scan computing the token count per doc
    (size(split()) — no explode), one groupBy into <=6 buckets."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    lens = docs.select(
        F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(n).alias("len")
    )
    cap = (
        F.when(F.col("len") <= 64, 64)
        .when(F.col("len") <= 128, 128)
        .when(F.col("len") <= 256, 256)
        .when(F.col("len") <= 512, 512)
        .when(F.col("len") <= 1024, 1024)
        .otherwise(2048)
    )
    return (
        lens.select(cap.alias("bucket_cap"), "len")
        .groupBy("bucket_cap")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("len").alias("token_sum"),
            F.sum(F.least(F.col("len"), F.col("bucket_cap")).cast("long")).alias(
                "tokens_kept"
            ),
            F.sum(
                F.greatest(F.col("len") - F.col("bucket_cap"), F.lit(0)).cast(
                    "long"
                )
            ).alias("trunc_loss"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "token_sum",
            "tokens_kept",
            "trunc_loss",
            (F.col("n_docs") * F.col("bucket_cap")).cast("long").alias("padded"),
            F.expr(
                "(tokens_kept * 1000000L) div (n_docs * bucket_cap)"
            ).alias("eff_ppm"),
        )
        .orderBy("bucket_cap")
    )


_Q262_SQL = r"""
WITH lens AS (
  SELECT CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS len
  FROM documents
), b AS (
  SELECT CASE WHEN len <= 64 THEN 64
              WHEN len <= 128 THEN 128
              WHEN len <= 256 THEN 256
              WHEN len <= 512 THEN 512
              WHEN len <= 1024 THEN 1024
              ELSE 2048 END AS bucket_cap,
         len
  FROM lens
)
SELECT bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len) AS BIGINT) AS token_sum,
       CAST(sum(least(len, bucket_cap)) AS BIGINT) AS tokens_kept,
       CAST(sum(greatest(len - bucket_cap, 0)) AS BIGINT) AS trunc_loss,
       CAST(count(*) * bucket_cap AS BIGINT) AS padded,
       CAST((sum(least(len, bucket_cap)) * 1000000)
            // (count(*) * bucket_cap) AS BIGINT) AS eff_ppm
FROM b
GROUP BY bucket_cap
ORDER BY bucket_cap
"""


def q263_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance via EXACT
    INTEGER power iteration — the anisotropy probe an embedding
    pipeline runs before whitening or dimension pruning: reports the
    top-8 loading dimensions and the explained-variance share of the
    first component.

    Distributed work is ONE pass: dims are quantized to BIGINT
    (round(x·1e4), the q179/q122 idiom) and a double-explode produces
    the 64+4096 additive cells (n, s_i = Σq_i, P_ij = Σq_i·q_j) with
    map-side combine — shuffle volume is 4096 cells per partition
    regardless of corpus size. The 64x64 eigensolve then runs
    driver-side on the collected BOUNDED sketch (the same bounded-
    collect contract as the IVF centroids): scaled covariance
    C2 = sign·(|n·P − s·s|·1e6 div max), 12 power iterations with
    integer renormalization (sign·(|w|·1e6 div max|w|)), sign fixed by
    the largest-|loading| dimension, Rayleigh share_ppm =
    (vᵀC2v·1e6) div (vᵀv·trace). Every step is integer div on
    NONNEGATIVE operands, so floor == trunc and the DuckDB oracle
    (identical unrolled CTEs) matches bit for bit. At int64-straining
    corpus sizes the P sums route through DECIMAL(38,0)/HUGEINT —
    Spark's sum already widens; only the final cells are collected."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
            )
        ).alias("i", "qi"),
        F.expr(
            "transform(embedding,"
            " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
        ).alias("qarr"),
    )
    n = emb.count()
    s_rows = (
        dims.groupBy("i").agg(F.sum("qi").alias("s")).collect()
    )
    p_rows = (
        dims.select(
            "i",
            F.posexplode(
                F.expr("transform(qarr, x -> x * qi)")
            ).alias("j", "pij"),
        )
        .groupBy("i", "j")
        .agg(F.sum("pij").alias("p"))
        .collect()
    )
    s = {r.i: int(r.s) for r in s_rows}
    d = len(s)
    P = {(r.i, r.j): int(r.p) for r in p_rows}

    def sdiv(a: int, scale: int, m: int) -> int:
        # sign(a) * ((|a| * scale) div m): nonneg div only, floor == trunc
        return (-((-a * scale) // m)) if a < 0 else ((a * scale) // m)

    C = {
        (i, j): n * P[(i, j)] - s[i] * s[j]
        for i in range(d)
        for j in range(d)
    }
    cmax = max(abs(c) for c in C.values())
    C2 = {ij: sdiv(c, 1000000, cmax) for ij, c in C.items()} if cmax else C
    v = [1000000] * d
    for _ in range(12):
        w = [sum(C2[(i, j)] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        v = [sdiv(x, 1000000, m) for x in w] if m else w
    p_idx = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[p_idx] < 0:
        v = [-x for x in v]
    num = max(
        sum(C2[(i, j)] * v[i] * v[j] for i in range(d) for j in range(d)), 0
    )
    den = sum(x * x for x in v)
    trace = sum(C2[(i, i)] for i in range(d))
    share_ppm = (num * 1000000) // (den * trace) if den and trace else 0
    top = sorted(range(d), key=lambda i: (-abs(v[i]), i))[:8]
    rows = [
        (rank, i, v[i], share_ppm) for rank, i in enumerate(top, 1)
    ]
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("dim", IntegerType()),
            StructField("loading_micro", LongType()),
            StructField("share_ppm", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("rank")


def _q263_sql() -> str:
    it = []
    prev = "v0"
    for t in range(1, 13):
        it.append(
            f"""w{t} AS MATERIALIZED (
  SELECT c2.i, CAST(sum(c2.c * {prev}.v) AS BIGINT) AS w
  FROM c2 JOIN {prev} ON {prev}.i = c2.j GROUP BY c2.i
), m{t} AS MATERIALIZED (
  SELECT max(abs(w)) AS m FROM w{t}
), v{t} AS MATERIALIZED (
  SELECT i,
         CAST(CASE WHEN m = 0 THEN w
                   WHEN w < 0 THEN -(((-w) * 1000000) // m)
                   ELSE (w * 1000000) // m END AS BIGINT) AS v
  FROM w{t}, m{t}
)"""
        )
        prev = f"v{t}"
    iters = ",\n".join(it)
    return f"""
WITH dq AS MATERIALIZED (
  SELECT vec_id, dim - 1 AS i, q
  FROM (
    SELECT vec_id,
           unnest(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS q,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
  )
), nn AS MATERIALIZED (
  SELECT count(DISTINCT vec_id) AS n FROM dq
), s AS MATERIALIZED (
  SELECT i, CAST(sum(q) AS BIGINT) AS s FROM dq GROUP BY i
), p AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS p
  FROM dq a JOIN dq b USING (vec_id) GROUP BY 1, 2
), c AS MATERIALIZED (
  SELECT p.i, p.j, nn.n * p.p - sa.s * sb.s AS c
  FROM p
  JOIN s sa ON sa.i = p.i
  JOIN s sb ON sb.i = p.j
  CROSS JOIN nn
), cmax AS MATERIALIZED (
  SELECT max(abs(c)) AS m FROM c
), c2 AS MATERIALIZED (
  SELECT i, j,
         CAST(CASE WHEN m = 0 THEN c
                   WHEN c < 0 THEN -(((-c) * 1000000) // m)
                   ELSE (c * 1000000) // m END AS BIGINT) AS c
  FROM c, cmax
), v0 AS MATERIALIZED (
  SELECT i, CAST(1000000 AS BIGINT) AS v FROM s
),
{iters},
sfix AS (
  SELECT CASE WHEN (SELECT v FROM v12 ORDER BY abs(v) DESC, i LIMIT 1) < 0
              THEN -1 ELSE 1 END AS sgn
), vf AS MATERIALIZED (
  SELECT i, CAST(v * sgn AS BIGINT) AS v FROM v12, sfix
), ray AS (
  SELECT greatest(sum(CAST(c2.c AS HUGEINT) * va.v * vb.v), 0) AS num
  FROM c2 JOIN vf va ON va.i = c2.i JOIN vf vb ON vb.i = c2.j
), dent AS (
  SELECT (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) FROM vf) AS den,
         (SELECT CAST(sum(c) AS HUGEINT) FROM c2 WHERE i = j) AS trace
), share AS (
  SELECT CAST(CASE WHEN den = 0 OR trace = 0 THEN 0
                   ELSE (num * 1000000) // (den * trace) END AS BIGINT)
           AS share_ppm
  FROM ray, dent
)
SELECT CAST(row_number() OVER (ORDER BY abs(v) DESC, i) AS INTEGER) AS rank,
       CAST(i AS INTEGER) AS dim,
       v AS loading_micro,
       share_ppm
FROM vf, share
ORDER BY abs(v) DESC, i
LIMIT 8
"""


def q265_calibration_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration scorecard for the q104 quality classifier vs the q58
    keep pseudo-labels: Expected Calibration Error, Maximum Calibration
    Error (10 decile bins, the q172 binning) and the Brier score — the
    three numbers a model-quality dashboard tracks per release, here as
    one exact row.

    All-integer derivations: per-bin gap |k_b·1e4 − ssum_b| makes
    ECE = Σgap·1e6 div (N·1e4) and MCE = max_b (gap_b·1e6 div
    (n_b·1e4)); Brier = Σ(si − y·1e4)²·1e6 div (N·1e8). No float ever
    sums across rows.

    Shape at 100 TB: one score+label join (both sides hash-partitioned
    corpus scans) and one grouped pass into <=10 bins; the scorecard
    reduction is a 10-row aggregate."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    e = scores.join(labels, "doc_id").select(
        F.expr("CAST(round(score * 10000) AS BIGINT)").alias("si"),
        F.col("keep").cast("long").alias("y"),
    )
    binned = (
        e.select(
            F.least(F.greatest(F.expr("si div 1000"), F.lit(0)), F.lit(9))
            .cast("int")
            .alias("bin"),
            "si",
            "y",
            ((F.col("si") - F.col("y") * 10000)
             * (F.col("si") - F.col("y") * 10000)).alias("sqerr"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("k"),
            F.sum("si").alias("ssum"),
            F.sum("sqerr").alias("sq"),
        )
        .select(
            "n",
            "sq",
            F.abs(F.col("k") * 10000 - F.col("ssum")).alias("gap"),
            F.expr(
                "(abs(k * 10000 - ssum) * 1000000L) div (n * 10000L)"
            ).alias("bin_mce_ppm"),
        )
    )
    return binned.agg(
        F.sum("n").alias("n_docs"),
        F.expr(
            "(sum(gap) * 1000000L) div (sum(n) * 10000L)"
        ).alias("ece_ppm"),
        F.max("bin_mce_ppm").alias("mce_ppm"),
        F.expr(
            "(sum(sq) * 1000000L) div (sum(n) * 100000000L)"
        ).alias("brier_ppm"),
    )


def _q265_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(round(s.score * 10000) AS BIGINT) AS si,
         CAST(CASE WHEN l.keep THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM scores s JOIN labels l USING (doc_id)
), binned AS (
  SELECT CAST(least(greatest(si // 1000, 0), 9) AS INTEGER) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS k,
         CAST(sum(si) AS BIGINT) AS ssum,
         CAST(sum((si - y * 10000) * (si - y * 10000)) AS BIGINT) AS sq
  FROM e GROUP BY 1
)
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       CAST((sum(abs(k * 10000 - ssum)) * 1000000)
            // (sum(n) * 10000) AS BIGINT) AS ece_ppm,
       CAST(max((abs(k * 10000 - ssum) * 1000000) // (n * 10000))
            AS BIGINT) AS mce_ppm,
       CAST((sum(sq) * 1000000) // (sum(n) * 100000000) AS BIGINT)
         AS brier_ppm
FROM binned
"""


def q268_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a monotone trend of the q58 keep rate
    across the 10 ordered q104 score deciles — the inferential
    complement to the reliability table (q172) and the isotonic fit
    (q260): does keep-probability actually TREND with the classifier
    score, or is the calibration table noise?

    With decile weights w_i = i, the statistic uses only exact BIGINT
    moments (N, K, Σw·n, Σw·k, Σw²·n):
      z = (Σwk − K·Σwn/N) / sqrt(K(N−K)/(N(N−1)) · (Σw²n − (Σwn)²/N))
    computed as ONE deterministic double chain over those integers
    (every intermediate < 2^53) — the q248/q267 discipline.
    Magnitude audit: w ≤ 9 is domain-bounded, so Σw²·n ≤ 81·N stays
    BIGINT-safe to N ~ 1e17 docs — no DECIMAL widening needed.

    Shape at 100 TB: the q104/q58 corpus joins feed one grouped pass
    into <=10 bins; the test statistic is a 10-row reduction."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    e = scores.join(labels, "doc_id").select(
        F.least(
            F.greatest(F.expr("CAST(round(score * 10000) AS BIGINT) div 1000"),
                       F.lit(0)),
            F.lit(9),
        ).alias("w"),
        F.col("keep").cast("long").alias("y"),
    )
    bins = e.groupBy("w").agg(
        F.count("*").alias("n"), F.sum("y").alias("k")
    )
    mom = bins.agg(
        F.sum("n").alias("nn"),
        F.sum("k").alias("kk"),
        F.sum(F.expr("w * n")).alias("swn"),
        F.sum(F.expr("w * k")).alias("swk"),
        F.sum(F.expr("w * w * n")).alias("swwn"),
    )
    chain = (
        "(CAST(swk AS DOUBLE) - CAST(kk AS DOUBLE) * swn / nn)"
        " / sqrt(CAST(kk AS DOUBLE) * (CAST(nn AS DOUBLE) - kk)"
        "        / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0e0))"
        "        * (CAST(swwn AS DOUBLE)"
        "           - CAST(swn AS DOUBLE) * swn / nn))"
    )
    return mom.select(
        F.col("nn").alias("n_docs"),
        F.col("kk").alias("n_keep"),
        "swn",
        "swk",
        "swwn",
        F.round(F.expr(chain), 4).alias("z_trend"),
        F.round(F.expr(f"({chain}) * ({chain})"), 4).alias("chi2_1df"),
    )


def _q268_sql() -> str:
    chain = (
        "(CAST(swk AS DOUBLE) - CAST(kk AS DOUBLE) * swn / nn)"
        " / sqrt(CAST(kk AS DOUBLE) * (CAST(nn AS DOUBLE) - kk)"
        "        / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0e0))"
        "        * (CAST(swwn AS DOUBLE)"
        "           - CAST(swn AS DOUBLE) * swn / nn))"
    )
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT least(greatest(CAST(round(s.score * 10000) AS BIGINT) // 1000, 0), 9)
           AS w,
         CAST(CASE WHEN l.keep THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM scores s JOIN labels l USING (doc_id)
), bins AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS k
  FROM e GROUP BY w
), mom AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(k) AS BIGINT) AS kk,
         CAST(sum(w * n) AS BIGINT) AS swn,
         CAST(sum(w * k) AS BIGINT) AS swk,
         CAST(sum(w * w * n) AS BIGINT) AS swwn
  FROM bins
)
SELECT nn AS n_docs, kk AS n_keep, swn, swk, swwn,
       round({chain}, 4) AS z_trend,
       round(({chain}) * ({chain}), 4) AS chi2_1df
FROM mom
"""


def q269_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect-size suite for the src0-vs-src1 document-length
    comparison: Cliff's delta (the nonparametric dominance effect the
    Mann-Whitney test (q187) sizes), Cohen's d and Hedges' g — the
    practical-significance companions to the suite's p-value tests.

    Exactness: Cliff's concordance counts come from value-multiplicity
    tables — gt = Σ_v cx(v)·(#y < v) via ONE cumulative window over the
    bounded value domain (never an n1×n2 pair join); lt is derived as
    n1·n2 − gt − ties. delta_ppm is sign-split integer division (both
    engines floor NONNEGATIVE operands only). d and g are single
    deterministic double chains over exact moments.
    Magnitude audit: gt/lt/ties are PAIR counts (~n1·n2 ≈ N²/4) that
    wrap BIGINT at N ≈ 4.3e9 docs, and Σv² (v = n_chars ~1e5) wraps
    at ~1e9 docs — all four accumulate in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB), and the pair counts are emitted as STRINGS on
    both sides (int64-overflowing values must never ride a pandas
    fetch — the q78/q233 rule).

    Shape at 100 TB: two pushed source filters, grouped counts over the
    bounded length domain, one window + one join on that domain."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.col("n_chars").cast("long").alias("v")
    )
    cx = base.filter(F.col("source") == "src0").groupBy("v").agg(
        F.count("*").alias("cx")
    )
    cy = base.filter(F.col("source") == "src1").groupBy("v").agg(
        F.count("*").alias("cy")
    )
    dom = (
        cx.select("v")
        .unionByName(cy.select("v"))
        .distinct()
        .join(cx, "v", "left")
        .join(cy, "v", "left")
        .select(
            "v",
            F.coalesce("cx", F.lit(0)).alias("cx"),
            F.coalesce("cy", F.lit(0)).alias("cy"),
        )
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cum = dom.select(
        "v",
        "cx",
        "cy",
        F.coalesce(F.sum("cy").over(w), F.lit(0)).alias("y_below"),
    )
    conc = cum.agg(
        F.sum(F.expr("CAST(cx AS DECIMAL(38,0)) * y_below")).alias("gt"),
        F.sum(F.expr("CAST(cx AS DECIMAL(38,0)) * cy")).alias("ties"),
    )
    mom = base.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("ss"),
    )
    piv = (
        mom.groupBy()
        .pivot("source", ["src0", "src1"])
        .agg(F.first("n").alias("n"), F.first("s").alias("s"),
             F.first("ss").alias("ss"))
        .select(
            F.col("src0_n").alias("n1"), F.col("src0_s").alias("s1"),
            F.col("src0_ss").alias("ss1"),
            F.col("src1_n").alias("n2"), F.col("src1_s").alias("s2"),
            F.col("src1_ss").alias("ss2"),
        )
    )
    d_chain = (
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
        " / sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)"
        "         + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))"
        "        / (CAST(n1 AS DOUBLE) + n2 - 2.0e0))"
    )
    return (
        piv.crossJoin(F.broadcast(conc))
        .select(
            "n1",
            "n2",
            F.expr("CAST(gt AS STRING)").alias("gt"),
            F.expr(
                "CAST(CAST(n1 AS DECIMAL(38,0)) * n2 - gt - ties AS STRING)"
            ).alias("lt"),
            F.expr("CAST(ties AS STRING)").alias("ties"),
            F.expr(
                "CASE WHEN gt >= CAST(n1 AS DECIMAL(38,0)) * n2 - gt - ties"
                " THEN ((gt - (CAST(n1 AS DECIMAL(38,0)) * n2 - gt - ties))"
                "       * 1000000) div (CAST(n1 AS DECIMAL(38,0)) * n2)"
                " ELSE -((((CAST(n1 AS DECIMAL(38,0)) * n2 - gt - ties) - gt)"
                "         * 1000000) div (CAST(n1 AS DECIMAL(38,0)) * n2))"
                " END"
            ).alias("cliffs_delta_ppm"),
            F.round(F.expr(d_chain), 4).alias("cohens_d"),
            F.round(
                F.expr(
                    f"({d_chain}) * (1.0e0 - 3.0e0"
                    " / (4.0e0 * (CAST(n1 AS DOUBLE) + n2) - 9.0e0))"
                ),
                4,
            ).alias("hedges_g"),
        )
    )


_Q269_SQL = """
WITH base AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
  WHERE source IN ('src0', 'src1')
), cx AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cx FROM base
  WHERE source = 'src0' GROUP BY v
), cy AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cy FROM base
  WHERE source = 'src1' GROUP BY v
), dom AS (
  SELECT d.v, coalesce(cx.cx, 0) AS cx, coalesce(cy.cy, 0) AS cy
  FROM (SELECT DISTINCT v FROM (SELECT v FROM cx UNION ALL SELECT v FROM cy)) d
  LEFT JOIN cx ON cx.v = d.v
  LEFT JOIN cy ON cy.v = d.v
), cum AS (
  SELECT v, cx, cy,
         coalesce(sum(cy) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS y_below
  FROM dom
), conc AS (
  SELECT CAST(sum(CAST(cx AS HUGEINT) * y_below) AS HUGEINT) AS gt,
         CAST(sum(CAST(cx AS HUGEINT) * cy) AS HUGEINT) AS ties
  FROM cum
), mom AS (
  SELECT
    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN source = 'src0' THEN v ELSE 0 END) AS BIGINT) AS s1,
    CAST(sum(CASE WHEN source = 'src0' THEN CAST(v AS HUGEINT) * v
                  ELSE 0 END) AS HUGEINT) AS ss1,
    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN source = 'src1' THEN v ELSE 0 END) AS BIGINT) AS s2,
    CAST(sum(CASE WHEN source = 'src1' THEN CAST(v AS HUGEINT) * v
                  ELSE 0 END) AS HUGEINT) AS ss2
  FROM base
)
SELECT n1, n2,
       CAST(gt AS VARCHAR) AS gt,
       CAST(CAST(n1 AS HUGEINT) * n2 - gt - ties AS VARCHAR) AS lt,
       CAST(ties AS VARCHAR) AS ties,
       CAST(CASE WHEN gt >= CAST(n1 AS HUGEINT) * n2 - gt - ties THEN
              ((gt - (CAST(n1 AS HUGEINT) * n2 - gt - ties)) * 1000000)
                // (CAST(n1 AS HUGEINT) * n2)
            ELSE -((((CAST(n1 AS HUGEINT) * n2 - gt - ties) - gt) * 1000000)
                   // (CAST(n1 AS HUGEINT) * n2))
            END AS BIGINT) AS cliffs_delta_ppm,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                     + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                    / (CAST(n1 AS DOUBLE) + n2 - 2.0e0)), 4) AS cohens_d,
       round(((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                     + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                    / (CAST(n1 AS DOUBLE) + n2 - 2.0e0)))
             * (1.0e0 - 3.0e0 / (4.0e0 * (CAST(n1 AS DOUBLE) + n2) - 9.0e0)),
             4) AS hedges_g
FROM mom CROSS JOIN conc
"""


def q270_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-validity index over the embedding label
    clusters — the compactness-vs-separation score that says whether
    the labels are usable as retrieval shards or ANN training classes
    (the quantitative companion to q179's centroid-affinity matrix).

    Exact-arithmetic discipline: per label the quantized per-dim sums
    S (round(x·1e4), the q179 idiom), row count n, and the exact
    squared-norm total Q = ΣΣq² are BIGINTs; centroids become exact
    milli-scaled integers cq = sign·(|S|·1000 div n); scatter
    s = sqrt(Q/n − dot(cq,cq)/1e6) and centroid distance
    d = sqrt(dot(cq_i−cq_j, cq_i−cq_j))/1e3 are single deterministic
    double chains over those integers, and every cross-row reduction
    (max over peers, mean over labels) happens on NANO-FLOORED
    integers, never on floats.

    Shape at 100 TB: one grouped corpus pass to |labels|·64 cells +
    |labels| (n, Q) rows; the pair stage is a broadcast self-join of
    the 10-row centroid relation."""
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = F.expr(
        "transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
    )
    per_dim = (
        emb.select("label", F.posexplode(qarr).alias("dim", "q"))
        .groupBy("label", "dim")
        .agg(F.sum("q").alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("_ds"))
        .select("label", F.expr("transform(_ds, e -> e.s)").alias("svec"))
    )
    nq = emb.select(
        "label",
        F.expr(
            "aggregate(transform(embedding,"
            " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
        ).alias("rowq"),
    ).groupBy("label").agg(
        F.count("*").alias("n"), F.sum("rowq").alias("qq")
    )
    cent = per_dim.join(nq, "label").select(
        "label",
        "n",
        "qq",
        F.expr(
            "transform(svec, s -> CASE WHEN s >= 0 THEN (s * 1000) div n"
            " ELSE -(((-s) * 1000) div n) END)"
        ).alias("cq"),
    ).localCheckpoint(eager=True)
    scat = cent.select(
        "label",
        "n",
        "cq",
        F.expr(
            "sqrt(CAST(qq AS DOUBLE) / n"
            " - CAST(aggregate(cq, CAST(0 AS BIGINT),"
            "        (acc, x) -> acc + x * x) AS DOUBLE) / 1.0e6)"
        ).alias("s"),
    )
    a = scat.select(
        F.col("label").alias("la"), F.col("cq").alias("ca"), F.col("s").alias("sa")
    )
    b = scat.select(
        F.col("label").alias("lb"), F.col("cq").alias("cb"), F.col("s").alias("sb")
    )
    # The d2 = 0 guard matters for PLAN SAFETY, not semantics: Catalyst
    # inlines this expression into the peer-join predicate, where it runs
    # on the yet-unfiltered la == lb self-pairs (d2 = 0) inside the BNLJ
    # bound condition — an unguarded division throws DIVIDE_BY_ZERO under
    # ANSI even though those rows are later discarded.
    pairs = (
        a.join(F.broadcast(b), F.col("la") != F.col("lb"))
        .select(
            "la",
            "lb",
            F.expr(
                "aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("d2"),
            "sa",
            "sb",
        )
        .select(
            "la",
            "lb",
            F.expr(
                "CASE WHEN d2 > 0 THEN"
                " CAST(floor((sa + sb) / (sqrt(CAST(d2 AS DOUBLE)) / 1.0e3)"
                "      * 1.0e9) AS BIGINT)"
                " ELSE CAST(NULL AS BIGINT) END"
            ).alias("ratio_nano"),
        )
    )
    worst = pairs.groupBy("la").agg(F.max("ratio_nano").alias("ratio_nano"))
    peer = (
        pairs.join(worst, ["la", "ratio_nano"])
        .groupBy("la", "ratio_nano")
        .agg(F.min("lb").alias("peer"))
    )
    db = worst.agg(
        F.expr("sum(ratio_nano) div count(*)").alias("db_nano")
    )
    return (
        scat.join(peer, scat.label == peer.la)
        .crossJoin(F.broadcast(db))
        .select(
            "label",
            "n",
            F.round("s", 4).alias("scatter"),
            "peer",
            "ratio_nano",
            "db_nano",
        )
        .orderBy("label")
    )


_Q270_SQL = """
WITH dq AS MATERIALIZED (
  SELECT label,
         unnest(list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS q,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), per AS MATERIALIZED (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s FROM dq GROUP BY 1, 2
), svecs AS MATERIALIZED (
  SELECT label, list(s ORDER BY dim) AS svec FROM per GROUP BY label
), nq AS MATERIALIZED (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rowq) AS BIGINT) AS qq
  FROM (
    SELECT label,
           list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                     * CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
             AS rowq
    FROM embeddings
  ) GROUP BY label
), cent AS MATERIALIZED (
  SELECT svecs.label, n, qq,
         list_transform(svec,
           s -> CASE WHEN s >= 0 THEN (s * 1000) // n
                ELSE -(((-s) * 1000) // n) END) AS cq
  FROM svecs JOIN nq ON nq.label = svecs.label
), scat AS MATERIALIZED (
  SELECT label, n, cq,
         sqrt(CAST(qq AS DOUBLE) / n
              - CAST(list_sum(list_transform(cq, x -> x * x)) AS DOUBLE)
                / 1.0e6) AS s
  FROM cent
), rawpairs AS MATERIALIZED (
  SELECT a.label AS la, b.label AS lb, a.s AS sa, b.s AS sb,
         CAST(list_sum(list_transform(
              range(1, len(a.cq) + 1),
              i -> (a.cq[i] - b.cq[i]) * (a.cq[i] - b.cq[i]))) AS BIGINT) AS d2
  FROM scat a JOIN scat b ON a.label <> b.label
), pairs AS MATERIALIZED (
  SELECT la, lb,
         CASE WHEN d2 > 0 THEN
           CAST(floor((sa + sb) / (sqrt(CAST(d2 AS DOUBLE)) / 1.0e3)
                * 1.0e9) AS BIGINT)
         ELSE CAST(NULL AS BIGINT) END AS ratio_nano
  FROM rawpairs
), worst AS MATERIALIZED (
  SELECT la, CAST(max(ratio_nano) AS BIGINT) AS ratio_nano
  FROM pairs GROUP BY la
), peer AS MATERIALIZED (
  SELECT p.la, p.ratio_nano, min(p.lb) AS peer
  FROM pairs p JOIN worst w ON w.la = p.la AND w.ratio_nano = p.ratio_nano
  GROUP BY 1, 2
), db AS MATERIALIZED (
  SELECT CAST(sum(ratio_nano) // count(*) AS BIGINT) AS db_nano FROM worst
)
SELECT s.label, s.n, round(s.s, 4) AS scatter, peer.peer,
       peer.ratio_nano, db.db_nano
FROM scat s
JOIN peer ON peer.la = s.label
CROSS JOIN db
ORDER BY s.label
"""


def q271_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per embedding label — the
    POINT-level cluster-validity companion to q270's centroid-only
    Davies-Bouldin: for every vector, a = distance to its own label
    centroid, b = min distance to any other centroid,
    s = (b − a)/max(a, b); per-label mean silhouette says which labels
    are well-separated enough to shard an ANN index on.

    Scale shape: the 10 milli-integer centroids collapse into ONE
    broadcast row (array of structs), so the per-vector a/b pass is a
    zero-shuffle projection with nested array folds — no N×L explode,
    no groupBy(vec_id); the only shuffle is the final per-label mean.

    Exactness: centroid cells and per-pair squared distances are exact
    BIGINTs; per-row s is one deterministic double chain, floored to
    micro BIGINTs BEFORE the per-label sum (double floor rounds toward
    −∞ identically in both engines, so negative s is safe); the mean
    is one final rounded division."""
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = (
        "transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
    )
    per_dim = (
        emb.select("label", F.posexplode(F.expr(qarr)).alias("dim", "q"))
        .groupBy("label", "dim")
        .agg(F.sum("q").alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("_ds"))
        .select("label", F.expr("transform(_ds, e -> e.s)").alias("svec"))
    )
    nl = emb.groupBy("label").agg(F.count("*").alias("n"))
    cent = per_dim.join(nl, "label").select(
        F.struct(
            F.col("label").alias("clabel"),
            F.expr(
                "transform(svec, s -> CASE WHEN s >= 0 THEN (s * 1000) div n"
                " ELSE -(((-s) * 1000) div n) END)"
            ).alias("cq"),
        ).alias("c")
    )
    cents = cent.agg(
        F.array_sort(F.collect_list("c")).alias("_cents")
    )
    d2 = (
        "aggregate(zip_with(rq, c.cq, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    fold_min = (
        f"aggregate({{src}}, CAST(NULL AS BIGINT),"
        f" (acc, c) -> CASE WHEN acc IS NULL OR ({d2}) < acc"
        f" THEN ({d2}) ELSE acc END)"
    )
    rowd = (
        emb.select(
            "label",
            F.expr(f"transform({qarr}, q -> q * 1000)").alias("rq"),
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "label",
            F.expr(
                fold_min.format(
                    src="filter(_cents, c -> c.clabel = label)"
                )
            ).alias("a2"),
            F.expr(
                fold_min.format(
                    src="filter(_cents, c -> c.clabel != label)"
                )
            ).alias("b2"),
        )
    )
    s_micro = (
        "CASE WHEN greatest(a2, b2) > 0 THEN"
        " CAST(floor((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))"
        "      / sqrt(CAST(greatest(a2, b2) AS DOUBLE)) * 1.0e6) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    return (
        rowd.select("label", F.expr(s_micro).alias("sm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.sum("sm").alias("sm_sum"))
        .select(
            "label",
            "n",
            "sm_sum",
            F.round(
                F.col("sm_sum").cast("double") / F.col("n") / 1e6, 6
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


_Q271_SQL = """
WITH dq AS MATERIALIZED (
  SELECT label,
         unnest(list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS q,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), per AS MATERIALIZED (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s FROM dq GROUP BY 1, 2
), svecs AS MATERIALIZED (
  SELECT label, list(s ORDER BY dim) AS svec FROM per GROUP BY label
), nl AS MATERIALIZED (
  SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
), cent AS MATERIALIZED (
  SELECT svecs.label AS clabel,
         list_transform(svec,
           s -> CASE WHEN s >= 0 THEN (s * 1000) // n
                ELSE -(((-s) * 1000) // n) END) AS cq
  FROM svecs JOIN nl ON nl.label = svecs.label
), cents AS MATERIALIZED (
  SELECT list({'clabel': clabel, 'cq': cq} ORDER BY clabel) AS cs FROM cent
), rowd AS MATERIALIZED (
  SELECT label,
         list_min(list_transform(
           list_filter(cs, c -> c.clabel = label),
           c -> list_sum(list_transform(range(1, len(rq) + 1),
                  i -> (rq[i] - c.cq[i]) * (rq[i] - c.cq[i]))))) AS a2,
         list_min(list_transform(
           list_filter(cs, c -> c.clabel <> label),
           c -> list_sum(list_transform(range(1, len(rq) + 1),
                  i -> (rq[i] - c.cq[i]) * (rq[i] - c.cq[i]))))) AS b2
  FROM (
    SELECT label,
           list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) * 1000)
             AS rq
    FROM embeddings
  ) CROSS JOIN cents
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN greatest(a2, b2) > 0 THEN
              CAST(floor((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
                   / sqrt(CAST(greatest(a2, b2) AS DOUBLE)) * 1.0e6) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS sm_sum,
       round(CAST(sum(CASE WHEN greatest(a2, b2) > 0 THEN
              CAST(floor((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
                   / sqrt(CAST(greatest(a2, b2) AS DOUBLE)) * 1.0e6) AS BIGINT)
            ELSE 0 END) AS DOUBLE) / count(*) / 1e6, 6) AS mean_silhouette
FROM rowd
GROUP BY label
ORDER BY label
"""


def q272_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the q104 quality-classifier score against the
    q58 keep pseudo-labels via the Mann-Whitney identity
    AUC = (#(s⁺>s⁻) + #(s⁺=s⁻)/2) / (n⁺·n⁻) — the threshold-free
    ranking metric that complements the operating-point sweep (q143)
    and the calibration scorecard (q265).

    Exactness: concordance counts come from the q269 cumulative
    count-table idiom over the bounded integer score domain (si =
    round(score·1e4)) — never an n⁺×n⁻ pair join — and
    auc_ppm = (2·gt + ties)·1e6 div (2·n⁺·n⁻) is pure nonnegative
    integer arithmetic. Magnitude audit: gt/ties are PAIR counts
    (~n⁺·n⁻ ≈ N²/4, BIGINT-wrapping at N ≈ 4.3e9 docs) — they
    accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and are
    emitted as STRINGS on both sides (q78/q233 rule); the ppm ratio
    is div'd in the wide type (quotient ≤ 1e6, BIGINT-safe).

    Shape at 100 TB: the q104/q58 corpus joins, grouped counts over the
    score domain, one cumulative window + 2-row reduction."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    e = scores.join(labels, "doc_id").select(
        F.expr("CAST(round(score * 10000) AS BIGINT)").alias("si"),
        F.col("keep").cast("long").alias("y"),
    )
    dom = e.groupBy("si").agg(
        F.sum("y").alias("cp"),
        F.sum(F.expr("1 - y")).alias("cn"),
    )
    w = W.orderBy("si").rowsBetween(W.unboundedPreceding, -1)
    cum = dom.select(
        "si",
        "cp",
        "cn",
        F.coalesce(F.sum("cn").over(w), F.lit(0)).alias("neg_below"),
    )
    agg = cum.agg(
        F.sum("cp").alias("np"),
        F.sum("cn").alias("nn"),
        F.sum(F.expr("CAST(cp AS DECIMAL(38,0)) * neg_below")).alias("gt"),
        F.sum(F.expr("CAST(cp AS DECIMAL(38,0)) * cn")).alias("ties"),
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.expr("CAST(gt AS STRING)").alias("gt"),
        F.expr("CAST(ties AS STRING)").alias("ties"),
        F.expr(
            "((2 * gt + ties) * 1000000)"
            " div (2 * CAST(np AS DECIMAL(38,0)) * nn)"
        ).alias("auc_ppm"),
    )


def _q272_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(round(s.score * 10000) AS BIGINT) AS si,
         CAST(CASE WHEN l.keep THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM scores s JOIN labels l USING (doc_id)
), dom AS (
  SELECT si, CAST(sum(y) AS BIGINT) AS cp,
         CAST(sum(1 - y) AS BIGINT) AS cn
  FROM e GROUP BY si
), cum AS (
  SELECT si, cp, cn,
         coalesce(sum(cn) OVER (ORDER BY si
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM dom
)
SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
       CAST(sum(cn) AS BIGINT) AS n_neg,
       CAST(CAST(sum(CAST(cp AS HUGEINT) * neg_below) AS HUGEINT)
            AS VARCHAR) AS gt,
       CAST(CAST(sum(CAST(cp AS HUGEINT) * cn) AS HUGEINT)
            AS VARCHAR) AS ties,
       CAST(((2 * CAST(sum(CAST(cp AS HUGEINT) * neg_below) AS HUGEINT)
              + sum(CAST(cp AS HUGEINT) * cn)) * 1000000)
            // (2 * CAST(sum(cp) AS HUGEINT) * sum(cn)) AS BIGINT) AS auc_ppm
FROM cum
"""


def q274_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ordered trend of document LENGTH
    across the 10 ordered q104 score deciles — the continuous-outcome
    sibling of the Cochran-Armitage proportion trend (q268) and the
    ordered-alternative upgrade of Kruskal-Wallis (q234).

    Exact concordance without any pair join: on the bounded
    (decile, n_chars) count grid, C = per-group strictly-below
    cumulative (window over value), T = Σ_{g'<g} C(g', v) (window over
    group within value), so gt = Σ cnt·T and cross-group ties likewise;
    jt2 = 2·gt + ties is exact. The z score uses the standard no-ties
    normal approximation (documented) as one double chain over exact
    moments. Magnitude audit: gt/ties/jt2 are PAIR counts (~N²) and
    sn23 ~ Σn³ — both wrap BIGINT at N ≈ 4.3e9 / 2e6·10 groups, so
    they accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) with
    row-level products widened before multiplying, and the pair
    counts are emitted as STRINGS on both sides (q78/q233 rule).

    Shape at 100 TB: corpus joins to <=10·|value-domain| grid cells;
    two windows over that bounded grid."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    e = docs.select("doc_id", F.col("n_chars").cast("long").alias("v")).join(
        scores, "doc_id"
    ).select(
        F.least(
            F.greatest(F.expr("CAST(round(score * 10000) AS BIGINT) div 1000"),
                       F.lit(0)),
            F.lit(9),
        ).alias("g"),
        "v",
    )
    cnt = e.groupBy("g", "v").agg(F.count("*").alias("c"))
    grid = (
        cnt.select("v").distinct()
        .crossJoin(cnt.select("g").distinct())
        .join(cnt, ["g", "v"], "left")
        .select("g", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wv = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    wg = W.partitionBy("v").orderBy("g").rowsBetween(W.unboundedPreceding, -1)
    pref = grid.select(
        "g", "v", "c", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("cb")
    )
    both = pref.select(
        "c",
        F.coalesce(F.sum("cb").over(wg), F.lit(0)).alias("t_gt"),
        F.coalesce(F.sum("c").over(wg), F.lit(0)).alias("t_tie"),
        "g",
    )
    conc = both.agg(
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * t_gt")).alias("gt"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * t_tie")).alias("ties"),
    )
    sizes = e.groupBy("g").agg(F.count("*").alias("n"))
    mom = sizes.agg(
        F.sum("n").alias("nn"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * n")).alias("sn2"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * n * (2 * n + 3)"))
        .alias("sn23"),
    )
    return (
        conc.crossJoin(F.broadcast(mom))
        .select(
            F.expr("CAST(gt AS STRING)").alias("gt"),
            F.expr("CAST(ties AS STRING)").alias("ties"),
            F.expr("CAST(2 * gt + ties AS STRING)").alias("jt2"),
            "nn",
            F.round(
                F.expr(
                    "((CAST(2 * gt + ties AS DOUBLE) / 2.0e0)"
                    " - (CAST(nn AS DOUBLE) * nn - sn2) / 4.0e0)"
                    " / sqrt((CAST(nn AS DOUBLE) * nn * (2.0e0 * nn + 3.0e0)"
                    "         - CAST(sn23 AS DOUBLE)) / 72.0e0)"
                ),
                4,
            ).alias("z_jt"),
        )
    )


def _q274_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), e AS (
  SELECT least(greatest(CAST(round(s.score * 10000) AS BIGINT) // 1000, 0), 9)
           AS g,
         CAST(d.n_chars AS BIGINT) AS v
  FROM documents d JOIN scores s USING (doc_id)
), cnt AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2
), grid AS (
  SELECT gs.g, vs.v, coalesce(cnt.c, 0) AS c
  FROM (SELECT DISTINCT v FROM cnt) vs
  CROSS JOIN (SELECT DISTINCT g FROM cnt) gs
  LEFT JOIN cnt ON cnt.g = gs.g AND cnt.v = vs.v
), pref AS (
  SELECT g, v, c,
         coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM grid
), both_ AS (
  SELECT c,
         coalesce(sum(cb) OVER (PARTITION BY v ORDER BY g
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t_gt,
         coalesce(sum(c) OVER (PARTITION BY v ORDER BY g
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t_tie
  FROM pref
), conc AS (
  SELECT CAST(sum(CAST(c AS HUGEINT) * t_gt) AS HUGEINT) AS gt,
         CAST(sum(CAST(c AS HUGEINT) * t_tie) AS HUGEINT) AS ties
  FROM both_
), mom AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sn2,
         CAST(sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS HUGEINT) AS sn23
  FROM (SELECT g, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY g)
)
SELECT CAST(gt AS VARCHAR) AS gt,
       CAST(ties AS VARCHAR) AS ties,
       CAST(2 * gt + ties AS VARCHAR) AS jt2,
       nn,
       round(((CAST(2 * gt + ties AS DOUBLE) / 2.0e0)
              - (CAST(nn AS DOUBLE) * nn - sn2) / 4.0e0)
             / sqrt((CAST(nn AS DOUBLE) * nn * (2.0e0 * nn + 3.0e0)
                     - CAST(sn23 AS DOUBLE)) / 72.0e0), 4) AS z_jt
FROM conc CROSS JOIN mom
"""


def q275_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz (variance-ratio) index over the embedding
    label clusters — completes the cluster-validity trio (q270
    Davies-Bouldin: centroid-level; q271 silhouette: point-level;
    this: the ANOVA-style between/within variance ratio
    CH = (BCSS/(k−1)) / (WCSS/(N−k))).

    Per label, BCSS term = n_l·||cq_l − cq_glob||²/1e6 and WCSS term =
    Q_l/1 − n_l·||cq_l||²/1e6 are deterministic double chains over
    exact BIGINTs (quantized sums S, squared-norm totals Q, milli
    centroids cq — the q270 cells), FLOORED to BIGINT q-units² before
    the cross-label sums; CH is one final rounded division chain.

    Shape at 100 TB: the same single grouped corpus pass as q270; the
    ratio runs on the 10-row label relation + one global row."""
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = (
        "transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
    )
    per_dim = (
        emb.select("label", F.posexplode(F.expr(qarr)).alias("dim", "q"))
        .groupBy("label", "dim")
        .agg(F.sum("q").alias("s"))
    )
    glob_dim = per_dim.groupBy("dim").agg(F.sum("s").alias("gs"))
    nq = emb.select(
        "label",
        F.expr(
            f"aggregate({qarr}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
        ).alias("rowq"),
    ).groupBy("label").agg(F.count("*").alias("n"), F.sum("rowq").alias("qq"))
    nn = nq.agg(F.sum("n").alias("nt"))
    lab_vec = (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("_ds"))
        .select("label", F.expr("transform(_ds, e -> e.s)").alias("svec"))
        .join(nq, "label")
        .select(
            "label",
            "n",
            "qq",
            F.expr(
                "transform(svec, s -> CASE WHEN s >= 0 THEN (s * 1000) div n"
                " ELSE -(((-s) * 1000) div n) END)"
            ).alias("cq"),
        )
    )
    glob_vec = (
        glob_dim.agg(
            F.array_sort(F.collect_list(F.struct("dim", "gs"))).alias("_ds")
        )
        .crossJoin(F.broadcast(nn))
        .select(
            F.expr(
                "transform(transform(_ds, e -> e.gs),"
                " s -> CASE WHEN s >= 0 THEN (s * 1000) div nt"
                " ELSE -(((-s) * 1000) div nt) END)"
            ).alias("gq"),
            "nt",
        )
    )
    terms = lab_vec.crossJoin(F.broadcast(glob_vec)).select(
        "label",
        "n",
        F.expr(
            "CAST(floor(CAST(n AS DOUBLE)"
            " * CAST(aggregate(zip_with(cq, gq, (x, y) -> (x - y) * (x - y)),"
            "        CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE)"
            " / 1.0e6) AS BIGINT)"
        ).alias("bcss_term"),
        F.expr(
            "CAST(floor(CAST(qq AS DOUBLE)"
            " - CAST(n AS DOUBLE)"
            "   * CAST(aggregate(cq, CAST(0 AS BIGINT),"
            "          (acc, x) -> acc + x * x) AS DOUBLE) / 1.0e6)"
            " AS BIGINT)"
        ).alias("wcss_term"),
        "nt",
    )
    agg = terms.agg(
        F.count("*").alias("k"),
        F.first("nt").alias("nt"),
        F.sum("bcss_term").alias("bcss"),
        F.sum("wcss_term").alias("wcss"),
    )
    return agg.select(
        "k",
        F.col("nt").alias("n_vectors"),
        "bcss",
        "wcss",
        F.round(
            F.expr(
                "(CAST(bcss AS DOUBLE) / (k - 1))"
                " / (CAST(wcss AS DOUBLE) / (nt - k))"
            ),
            4,
        ).alias("ch_index"),
    )


_Q275_SQL = """
WITH dq AS MATERIALIZED (
  SELECT label,
         unnest(list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS q,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), per AS MATERIALIZED (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s FROM dq GROUP BY 1, 2
), gdim AS MATERIALIZED (
  SELECT dim, CAST(sum(s) AS BIGINT) AS gs FROM per GROUP BY dim
), nq AS MATERIALIZED (
  SELECT label, CAST(count(*) AS BIGINT) AS n, CAST(sum(rowq) AS BIGINT) AS qq
  FROM (
    SELECT label,
           list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                     * CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
             AS rowq
    FROM embeddings
  ) GROUP BY label
), nn AS MATERIALIZED (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM nq
), lab AS MATERIALIZED (
  SELECT sv.label, nq.n, nq.qq,
         list_transform(sv.svec,
           s -> CASE WHEN s >= 0 THEN (s * 1000) // nq.n
                ELSE -(((-s) * 1000) // nq.n) END) AS cq
  FROM (SELECT label, list(s ORDER BY dim) AS svec FROM per GROUP BY label) sv
  JOIN nq ON nq.label = sv.label
), gctr AS MATERIALIZED (
  SELECT list_transform(gv.gvec,
           s -> CASE WHEN s >= 0 THEN (s * 1000) // nn.nt
                ELSE -(((-s) * 1000) // nn.nt) END) AS gq,
         nn.nt
  FROM (SELECT list(gs ORDER BY dim) AS gvec FROM gdim) gv
  CROSS JOIN nn
), terms AS MATERIALIZED (
  SELECT lab.label, lab.n, gctr.nt,
         CAST(floor(CAST(lab.n AS DOUBLE)
           * CAST(list_sum(list_transform(range(1, len(lab.cq) + 1),
                  i -> (lab.cq[i] - gctr.gq[i]) * (lab.cq[i] - gctr.gq[i])))
              AS DOUBLE) / 1.0e6) AS BIGINT) AS bcss_term,
         CAST(floor(CAST(lab.qq AS DOUBLE)
           - CAST(lab.n AS DOUBLE)
             * CAST(list_sum(list_transform(lab.cq, x -> x * x)) AS DOUBLE)
               / 1.0e6) AS BIGINT) AS wcss_term
  FROM lab CROSS JOIN gctr
)
SELECT CAST(count(*) AS BIGINT) AS k,
       CAST(max(nt) AS BIGINT) AS n_vectors,
       CAST(sum(bcss_term) AS BIGINT) AS bcss,
       CAST(sum(wcss_term) AS BIGINT) AS wcss,
       round((CAST(sum(bcss_term) AS DOUBLE) / (count(*) - 1))
             / (CAST(sum(wcss_term) AS DOUBLE) / (max(nt) - count(*))), 4)
         AS ch_index
FROM terms
"""


def q276_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC, the step-function AP sklearn reports)
    of the q104 classifier vs the q58 keep labels — the
    class-imbalance-robust companion to the ROC-AUC (q272):
    AP = Σ_v ΔR_v·P_v over distinct score thresholds descending.

    Exactness: on the (si, cp, cn) count table one DESCENDING
    cumulative window gives tp/fp at every threshold; each term
    cp·tp/((tp+fp)·P) is floored to a NANO BIGINT before the sum —
    per-threshold rationals never meet float addition.
    Magnitude audit: the term's numerator cp·tp·1e9 (~N²·1e9) and
    denominator (tp+fp)·pt (~N²) wrap BIGINT at N ≈ 3e6 docs, so the
    division runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
    the floored quotient (≤1e9) and ap_nano (≤ #thresholds·1e9)
    stay BIGINT-safe.

    Shape at 100 TB: grouped counts over the bounded score domain, one
    window, one reduction — the q272 shape."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    e = scores.join(labels, "doc_id").select(
        F.expr("CAST(round(score * 10000) AS BIGINT)").alias("si"),
        F.col("keep").cast("long").alias("y"),
    )
    dom = e.groupBy("si").agg(
        F.sum("y").alias("cp"), F.sum(F.expr("1 - y")).alias("cn")
    )
    w = W.orderBy(F.col("si").desc()).rowsBetween(W.unboundedPreceding, 0)
    cum = dom.select(
        "cp",
        F.sum("cp").over(w).alias("tp"),
        F.sum("cn").over(w).alias("fp"),
    )
    tot = dom.agg(F.sum("cp").alias("pt"), F.sum("cn").alias("nt"))
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "pt",
        "nt",
        F.expr(
            "(CAST(cp AS DECIMAL(38,0)) * tp * 1000000000)"
            " div ((CAST(tp AS DECIMAL(38,0)) + fp) * pt)"
        ).alias("term_nano"),
    )
    return terms.groupBy("pt", "nt").agg(
        F.sum("term_nano").alias("ap_nano")
    ).select(
        F.col("pt").alias("n_pos"),
        F.col("nt").alias("n_neg"),
        "ap_nano",
        F.round(F.col("ap_nano").cast("double") / 1e9, 6).alias(
            "average_precision"
        ),
    )


def _q276_sql() -> str:
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(round(s.score * 10000) AS BIGINT) AS si,
         CAST(CASE WHEN l.keep THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM scores s JOIN labels l USING (doc_id)
), dom AS (
  SELECT si, CAST(sum(y) AS BIGINT) AS cp, CAST(sum(1 - y) AS BIGINT) AS cn
  FROM e GROUP BY si
), cum AS (
  SELECT cp,
         CAST(sum(cp) OVER (ORDER BY si DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS tp,
         CAST(sum(cn) OVER (ORDER BY si DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS fp
  FROM dom
), tot AS (
  SELECT CAST(sum(cp) AS BIGINT) AS pt, CAST(sum(cn) AS BIGINT) AS nt
  FROM dom
)
SELECT pt AS n_pos, nt AS n_neg,
       CAST(sum((CAST(cp AS HUGEINT) * tp * 1000000000)
                // ((CAST(tp AS HUGEINT) + fp) * pt)) AS BIGINT)
         AS ap_nano,
       round(CAST(CAST(sum((CAST(cp AS HUGEINT) * tp * 1000000000)
                   // ((CAST(tp AS HUGEINT) + fp) * pt)) AS BIGINT) AS DOUBLE)
             / 1e9, 6) AS average_precision
FROM cum CROSS JOIN tot
GROUP BY pt, nt
"""


def q277_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling weights (α = 0.5, the
    mT5/XLM-R-style smoothing w_l ∝ p_l^α) over per-language token
    mass — the mixing-table op that decides how hard low-resource
    languages get upsampled in a multilingual training run (the
    α-smoothed upgrade of q85's fixed epoch mixture).

    α is fixed at 0.5 because sqrt is IEEE correctly-rounded in BOTH
    engines (pow(x, 0.3) is not, and its last-bit drift would break
    the floor) — sw_nano = floor(sqrt(tokens)·1e9) is deterministic,
    and every ratio after that is nonnegative BIGINT division
    (quantize-pre-sum across the <=5 language rows).

    Shape at 100 TB: one narrow size(split) scan, one groupBy into
    language rows, a 1-row total broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), "\\s+")))
        .cast("long")
        .alias("tk"),
    )
    per = toks.groupBy("lang").agg(F.sum("tk").alias("tokens")).select(
        "lang",
        "tokens",
        F.expr(
            "CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1.0e9) AS BIGINT)"
        ).alias("sw_nano"),
    )
    tot = per.agg(
        F.sum("tokens").alias("total"), F.sum("sw_nano").alias("sw_total")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "tokens",
            F.expr("(tokens * 1000000L) div total").alias("p_ppm"),
            F.expr("(sw_nano * 1000000L) div sw_total").alias("w_ppm"),
            F.expr(
                "(((sw_nano * 1000000L) div sw_total) * total * 1000L)"
                " div (1000000L * tokens)"
            ).alias("boost_milli"),
        )
        .orderBy("lang")
    )


_Q277_SQL = r"""
WITH toks AS (
  SELECT lang,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS tk
  FROM documents
), per AS (
  SELECT lang, CAST(sum(tk) AS BIGINT) AS tokens,
         CAST(floor(sqrt(CAST(sum(tk) AS DOUBLE)) * 1.0e9) AS BIGINT)
           AS sw_nano
  FROM toks GROUP BY lang
), tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS total,
         CAST(sum(sw_nano) AS BIGINT) AS sw_total
  FROM per
)
SELECT lang, tokens,
       CAST((tokens * 1000000) // total AS BIGINT) AS p_ppm,
       CAST((sw_nano * 1000000) // sw_total AS BIGINT) AS w_ppm,
       CAST((((sw_nano * 1000000) // sw_total) * total * 1000)
            // (1000000 * tokens) AS BIGINT) AS boost_milli
FROM per CROSS JOIN tot
ORDER BY lang
"""


def q278_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (FIM) training-example construction: split
    every document's token stream at two hash-deterministic cut points
    and emit the PSM (prefix-suffix-middle) reordering — the code/infill
    pretraining transform, exactly reproducible because the cuts come
    from the engine-portable md5 slice (operators/dedup._h32), not an
    RNG. Docs under 3 tokens pass through unmasked (fim_applied=false).

    Cut rule (identical in both engines and the pytest mirror):
    c1 = 1 + h(doc:a) % (n−2) prefix tokens, middle length
    m = 1 + h(doc:b) % (n−1−c1), suffix the non-empty remainder.

    Shape at 100 TB: a pure per-row projection — no shuffle, no joins;
    the sort is only for the bounded 50-row sample this query returns
    (the operator itself is the projection)."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        "conv(substr(md5(concat(CAST(doc_id AS STRING), ':{salt}')), 1, 8),"
        " 16, 10)"
    )
    out = docs.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("arr"),
    ).select(
        "doc_id",
        F.expr("size(arr)").alias("n_tokens"),
        F.expr(
            "CASE WHEN size(arr) >= 3 THEN"
            f" CAST(1 + {h.format(salt='a')} % (size(arr) - 2) AS INT)"
            " ELSE 0 END"
        ).alias("c1"),
        "arr",
    ).select(
        "doc_id",
        "n_tokens",
        "c1",
        F.expr(
            "CASE WHEN n_tokens >= 3 THEN"
            f" CAST(1 + {h.format(salt='b')} % (n_tokens - 1 - c1) AS INT)"
            " ELSE 0 END"
        ).alias("m"),
        "arr",
    ).select(
        "doc_id",
        "n_tokens",
        "c1",
        "m",
        (F.col("n_tokens") >= 3).alias("fim_applied"),
        F.expr(
            "CASE WHEN n_tokens >= 3 THEN"
            " concat('<PRE> ', array_join(slice(arr, 1, c1), ' '),"
            "        ' <SUF> ', array_join(slice(arr, c1 + m + 1,"
            "                              n_tokens - c1 - m), ' '),"
            "        ' <MID> ', array_join(slice(arr, c1 + 1, m), ' '))"
            " ELSE array_join(arr, ' ') END"
        ).alias("fim_text"),
    )
    return out.orderBy("doc_id").limit(50)


_Q278_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
), c1s AS (
  SELECT doc_id, arr, CAST(len(arr) AS BIGINT) AS n_tokens,
         CASE WHEN len(arr) >= 3 THEN
           CAST(1 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':a'),
                     1, 8))::BIGINT % (len(arr) - 2) AS INTEGER)
         ELSE 0 END AS c1
  FROM base
), cuts AS (
  SELECT doc_id, arr, n_tokens, c1,
         CASE WHEN n_tokens >= 3 THEN
           CAST(1 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':b'),
                     1, 8))::BIGINT % (n_tokens - 1 - c1) AS INTEGER)
         ELSE 0 END AS m
  FROM c1s
)
SELECT doc_id, n_tokens, c1, m,
       n_tokens >= 3 AS fim_applied,
       CASE WHEN n_tokens >= 3 THEN
         '<PRE> '
         || array_to_string(list_transform(range(1, c1 + 1),
                                           i -> arr[i]), ' ')
         || ' <SUF> '
         || array_to_string(list_transform(range(c1 + m + 1, n_tokens + 1),
                                           i -> arr[i]), ' ')
         || ' <MID> '
         || array_to_string(list_transform(range(c1 + 1, c1 + m + 1),
                                           i -> arr[i]), ' ')
       ELSE array_to_string(arr, ' ') END AS fim_text
FROM cuts
ORDER BY doc_id
LIMIT 50
"""


def q279_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption: mask up to 3 hash-deterministic
    3-token spans per document with <extra_id_K> sentinels and emit the
    (input, target) pair — the denoising-pretraining transform, exactly
    reproducible (md5-slice cuts, no RNG) and therefore oracle-checked
    value-for-value.

    Span rule (identical in both engines and the pytest mirror): 3
    candidate starts s_k = 1 + h(doc:sk) % (n−2), sorted ascending,
    greedily accepted when they don't overlap a previously accepted
    span (s > prev + 2). Docs under 12 tokens pass through
    (applied=false). Targets append the final <extra_id_N> terminator.

    Shape at 100 TB: a pure per-row projection over array HOFs — zero
    shuffle; only the bounded 50-row sample here sorts."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        "conv(substr(md5(concat(CAST(doc_id AS STRING), ':s{k}')), 1, 8),"
        " 16, 10)"
    )
    cand = docs.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("arr"),
        F.col("text"),
    ).select(
        "doc_id",
        "arr",
        "text",
        F.expr("size(arr)").alias("n"),
        F.expr(
            "CASE WHEN size(arr) >= 12 THEN array_sort(array("
            + ", ".join(
                f"CAST(1 + {h.format(k=k)} % (size(arr) - 2) AS INT)"
                for k in range(3)
            )
            + ")) ELSE CAST(array() AS array<int>) END"
        ).alias("cand"),
    )
    acc = cand.select(
        "doc_id",
        "arr",
        "text",
        "n",
        F.expr(
            "CASE WHEN n >= 12 THEN filter(array("
            " element_at(cand, 1),"
            " IF(element_at(cand, 2) > element_at(cand, 1) + 2,"
            "    element_at(cand, 2), NULL),"
            " IF(element_at(cand, 3) > greatest(element_at(cand, 1),"
            "      IF(element_at(cand, 2) > element_at(cand, 1) + 2,"
            "         element_at(cand, 2), element_at(cand, 1))) + 2,"
            "    element_at(cand, 3), NULL)"
            "), x -> x IS NOT NULL) ELSE CAST(array() AS array<int>) END"
        ).alias("spans"),
    )
    return (
        acc.select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.expr("size(spans)").alias("n_spans"),
            (F.col("n") >= 12).alias("applied"),
            F.expr(
                "CASE WHEN n >= 12 THEN"
                " array_join(filter(transform(sequence(1, n), i ->"
                "  CASE WHEN array_contains(spans, i) THEN"
                "    concat('<extra_id_',"
                "           CAST(array_position(spans, i) - 1 AS STRING), '>')"
                "  WHEN exists(spans, s -> i > s AND i <= s + 2) THEN NULL"
                "  ELSE element_at(arr, i) END), x -> x IS NOT NULL), ' ')"
                " ELSE text END"
            ).alias("input_text"),
            F.expr(
                "CASE WHEN n >= 12 THEN"
                " concat(array_join(transform(sequence(1, size(spans)), k ->"
                "   concat('<extra_id_', CAST(k - 1 AS STRING), '> ',"
                "          array_join(slice(arr, element_at(spans, k), 3),"
                "                     ' '))), ' '),"
                "  ' <extra_id_', CAST(size(spans) AS STRING), '>')"
                " ELSE '' END"
            ).alias("target_text"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


_Q279_SQL = """
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS arr,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
), cand AS (
  SELECT doc_id, text, arr, n,
         CASE WHEN n >= 12 THEN list_sort([
           CAST(1 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s0'),
                     1, 8))::BIGINT % (n - 2) AS INTEGER),
           CAST(1 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s1'),
                     1, 8))::BIGINT % (n - 2) AS INTEGER),
           CAST(1 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s2'),
                     1, 8))::BIGINT % (n - 2) AS INTEGER)])
         ELSE CAST([] AS INTEGER[]) END AS cand
  FROM base
), acc AS (
  SELECT doc_id, text, arr, n,
         CASE WHEN n >= 12 THEN list_filter([
           cand[1],
           CASE WHEN cand[2] > cand[1] + 2 THEN cand[2] END,
           CASE WHEN cand[3] > greatest(cand[1],
                  CASE WHEN cand[2] > cand[1] + 2 THEN cand[2]
                       ELSE cand[1] END) + 2
                THEN cand[3] END
         ], x -> x IS NOT NULL) ELSE CAST([] AS INTEGER[]) END AS spans
  FROM cand
)
SELECT doc_id, n AS n_tokens,
       CAST(len(spans) AS BIGINT) AS n_spans,
       n >= 12 AS applied,
       CASE WHEN n >= 12 THEN
         array_to_string(list_filter(list_transform(range(1, n + 1), i ->
           CASE WHEN list_contains(spans, i) THEN
             '<extra_id_' || CAST(list_position(spans, i) - 1 AS VARCHAR)
             || '>'
           WHEN len(list_filter(spans, s -> i > s AND i <= s + 2)) > 0
             THEN NULL
           ELSE arr[i] END), x -> x IS NOT NULL), ' ')
       ELSE text END AS input_text,
       CASE WHEN n >= 12 THEN
         array_to_string(list_transform(range(1, len(spans) + 1), k ->
           '<extra_id_' || CAST(k - 1 AS VARCHAR) || '> '
           || array_to_string(list_transform(
                range(spans[k], spans[k] + 3), i -> arr[i]), ' ')), ' ')
         || ' <extra_id_' || CAST(len(spans) AS VARCHAR) || '>'
       ELSE '' END AS target_text
FROM acc
ORDER BY doc_id
LIMIT 50
"""


def q280_binary_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit sign binarization + Hamming search, audited for recall@5
    against the exact float scan — the 64×-compressed end of the
    quantization ladder (int8 q112/q113, SQ8, PQ q97): each 64-dim
    vector packs into TWO 32-bit BIGINT halves (sign bit per dim), a
    Hamming distance is two xor+bit_count's, and the audit reports
    per-query overlap with the exact cosine top-5.

    Exactness: the pack is an order-independent sum of bit·2^(32−i)
    (an aggregate fold would hit ANSI overflow at the top bit, and
    DuckDB's ^ is POWER — xor() spelled explicitly); Hamming ranks are
    pure integers, so the whole candidate ordering is float-free.

    Shape at 100 TB: the packed table is 16 bytes/vector; the query
    side (5 rows) broadcasts; ranks are rank<=5 WindowGroupLimit."""
    emb = load_table(spark, sf_dir, "embeddings")

    def pack(lo: int) -> str:
        return (
            "aggregate(transform(sequence(1, 32), i ->"
            f" IF(element_at(embedding, i + {lo}) >= 0,"
            f" shiftleft(CAST(1 AS BIGINT), 32 - i), CAST(0 AS BIGINT))),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    packed = emb.select(
        "vec_id",
        F.expr(pack(0)).alias("h1"),
        F.expr(pack(32)).alias("h2"),
    )
    qside = packed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    cside = packed.filter(F.col("vec_id") >= 5)
    scored = cside.join(F.broadcast(qside)).select(
        "query_id",
        "vec_id",
        F.expr("bit_count(h1 ^ q1) + bit_count(h2 ^ q2)").alias("hamming"),
    )
    w = W.partitionBy("query_id").orderBy("hamming", "vec_id")
    topb = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    from ..operators.similarity import cosine_topk

    exact = cosine_topk(
        emb.filter(F.col("vec_id") >= 5),
        emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id"),
        k=5,
    ).select("query_id", "vec_id")
    hits = topb.join(exact, ["query_id", "vec_id"], "left_semi")
    return (
        topb.groupBy("query_id")
        .agg(F.sum("hamming").alias("sum_hamming"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hits")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) * 20).alias("recall_pct"),
            "sum_hamming",
        )
        .orderBy("query_id")
    )


_Q280_SQL = """
WITH packed AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(1, 33), i ->
           CASE WHEN embedding[i] >= 0 THEN (CAST(1 AS BIGINT) << (32 - i))
                ELSE 0 END)) AS BIGINT) AS h1,
         CAST(list_sum(list_transform(range(1, 33), i ->
           CASE WHEN embedding[i + 32] >= 0
                THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE 0 END))
           AS BIGINT) AS h2
  FROM embeddings
), qside AS (
  SELECT vec_id AS query_id, h1 AS q1, h2 AS q2 FROM packed WHERE vec_id < 5
), scored AS (
  SELECT query_id, vec_id,
         bit_count(xor(h1, q1)) + bit_count(xor(h2, q2)) AS hamming
  FROM packed CROSS JOIN qside
  WHERE vec_id >= 5
), topb AS (
  SELECT query_id, vec_id, hamming FROM (
    SELECT query_id, vec_id, hamming,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, vec_id) AS rank
    FROM scored
  ) WHERE rank <= 5
), exact_ AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(CAST(q.embedding AS DOUBLE[]),
                              CAST(c.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[]))))
             DESC, c.vec_id) AS rank
    FROM embeddings q CROSS JOIN embeddings c
    WHERE q.vec_id < 5 AND c.vec_id >= 5
  ) WHERE rank <= 5
), hits AS (
  SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM topb t JOIN exact_ e
    ON e.query_id = t.query_id AND e.vec_id = t.vec_id
  GROUP BY t.query_id
)
SELECT b.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) * 20 AS BIGINT) AS recall_pct,
       CAST(b.sum_hamming AS BIGINT) AS sum_hamming
FROM (SELECT query_id, CAST(sum(hamming) AS BIGINT) AS sum_hamming
      FROM topb GROUP BY query_id) b
LEFT JOIN hits h ON h.query_id = b.query_id
ORDER BY b.query_id
"""


def q281_dispersion_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' DP (Deviation of Proportions) dispersion for the 20 most
    frequent tokens: DP = ½·Σ_s |share of the term in source s −
    source s's share of the corpus| — the corpus-linguistics measure
    that separates genuinely common vocabulary (DP→0) from terms
    concentrated in a few sources (DP→1); the single-term complement
    of the burstiness (q203/q232) and keyness (q212) views.

    Exact arithmetic: the per-source gap |t_ws·M − m_s·T_w| shares the
    common denominator T_w·M, so DP_ppm = Σgaps·1e6 div (2·T_w·M) is
    pure integer arithmetic. Magnitude audit: with M corpus tokens the
    row-level product t_ws·M ~ M² wraps BIGINT at M ≈ 3e9 tokens, so
    every product and the gap sum run in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — good to M ~ 1e16; the dp_ppm quotient (≤1e6)
    narrows back to BIGINT safely.

    Shape at 100 TB: one (token, source) grouped pass, a TakeOrdered
    top-20 probe set that broadcasts, and a 20·|sources| reduction."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tws = toks.groupBy("tok", "source").agg(F.count("*").alias("t_ws"))
    srcm = toks.groupBy("source").agg(F.count("*").alias("m_s"))
    tot = srcm.agg(F.sum("m_s").alias("mm"))
    tw = tws.groupBy("tok").agg(F.sum("t_ws").alias("t_w"))
    top = tw.orderBy(F.col("t_w").desc(), "tok").limit(20)
    # dense grid: every (top term, source) with zero fill
    grid = (
        top.crossJoin(srcm)
        .join(tws, ["tok", "source"], "left")
        .select(
            "tok",
            "t_w",
            "m_s",
            F.coalesce("t_ws", F.lit(0)).alias("t_ws"),
        )
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "t_w",
            F.expr(
                "abs(CAST(t_ws AS DECIMAL(38,0)) * mm"
                " - CAST(m_s AS DECIMAL(38,0)) * t_w)"
            ).alias("gap"),
            "mm",
        )
        .groupBy("tok", "t_w", "mm")
        .agg(F.sum("gap").alias("gaps"))
        .select(
            "tok",
            F.col("t_w").alias("term_count"),
            F.expr(
                "(gaps * 1000000) div (2 * CAST(t_w AS DECIMAL(38,0)) * mm)"
            ).alias("dp_ppm"),
        )
        .orderBy(F.col("term_count").desc(), "tok")
    )


_Q281_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), tws AS (
  SELECT tok, source, CAST(count(*) AS BIGINT) AS t_ws
  FROM toks GROUP BY 1, 2
), srcm AS (
  SELECT source, CAST(count(*) AS BIGINT) AS m_s FROM toks GROUP BY source
), tot AS (
  SELECT CAST(sum(m_s) AS BIGINT) AS mm FROM srcm
), tw AS (
  SELECT tok, CAST(sum(t_ws) AS BIGINT) AS t_w FROM tws GROUP BY tok
), top AS (
  SELECT * FROM tw ORDER BY t_w DESC, tok LIMIT 20
), grid AS (
  SELECT top.tok, top.t_w, srcm.source, srcm.m_s,
         coalesce(tws.t_ws, 0) AS t_ws
  FROM top CROSS JOIN srcm
  LEFT JOIN tws ON tws.tok = top.tok AND tws.source = srcm.source
)
SELECT tok, t_w AS term_count,
       CAST((sum(abs(CAST(t_ws AS HUGEINT) * mm
                     - CAST(m_s AS HUGEINT) * t_w)) * 1000000)
            // (2 * CAST(t_w AS HUGEINT) * mm) AS BIGINT) AS dp_ppm
FROM grid CROSS JOIN tot
GROUP BY tok, t_w, mm
ORDER BY term_count DESC, tok
"""


def q282_lang_source_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized mutual information between the lang and source
    metadata columns — the redundancy audit that says whether two
    sharding/stratification keys carry independent signal (NMI→0) or
    duplicate each other (NMI→1); the contingency-table sibling of the
    chi-square (q182) and the entropy views (q198).

    Exactness: each cell term c_ij·ln(N·c_ij/(r_i·c_j)) and each
    marginal term r·ln(N/r) is ONE deterministic double chain over
    exact BIGINT counts, floored to nanos BEFORE the cross-cell sums
    (the q258 discipline); NMI is the final rounded chain
    MI/sqrt(H_lang·H_source).

    Shape at 100 TB: one grouped corpus pass into <=|langs|·|sources|
    cells; everything after runs on that bounded grid."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("c"))
    rows_ = cells.groupBy("lang").agg(F.sum("c").alias("r"))
    cols = cells.groupBy("source").agg(F.sum("c").alias("k"))
    tot = cells.agg(F.sum("c").alias("n"))
    mi = (
        cells.join(rows_, "lang")
        .join(cols, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(floor(CAST(c AS DOUBLE)"
                " * ln(CAST(n AS DOUBLE) * c / (CAST(r AS DOUBLE) * k))"
                " * 1.0e9) AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum("t").alias("mi_sum_nano"))
    )
    hl = (
        rows_.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(floor(CAST(r AS DOUBLE)"
                " * ln(CAST(n AS DOUBLE) / r) * 1.0e9) AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum("t").alias("hl_sum_nano"))
    )
    hs = (
        cols.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(floor(CAST(k AS DOUBLE)"
                " * ln(CAST(n AS DOUBLE) / k) * 1.0e9) AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum("t").alias("hs_sum_nano"))
    )
    return (
        mi.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "mi_sum_nano",
            "hl_sum_nano",
            "hs_sum_nano",
            F.round(
                F.expr(
                    "CASE WHEN hl_sum_nano > 0 AND hs_sum_nano > 0 THEN"
                    " CAST(mi_sum_nano AS DOUBLE)"
                    " / sqrt(CAST(hl_sum_nano AS DOUBLE)"
                    "        * CAST(hs_sum_nano AS DOUBLE))"
                    " ELSE 0.0e0 END"
                ),
                6,
            ).alias("nmi"),
        )
    )


_Q282_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), rows_ AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY lang
), cols AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS k FROM cells GROUP BY source
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM cells
), mi AS (
  SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE)
           * ln(CAST(n AS DOUBLE) * c / (CAST(r AS DOUBLE) * k))
           * 1.0e9) AS BIGINT)) AS BIGINT) AS mi_sum_nano
  FROM cells
  JOIN rows_ USING (lang)
  JOIN cols USING (source)
  CROSS JOIN tot
), hl AS (
  SELECT CAST(sum(CAST(floor(CAST(r AS DOUBLE)
           * ln(CAST(n AS DOUBLE) / r) * 1.0e9) AS BIGINT)) AS BIGINT)
           AS hl_sum_nano
  FROM rows_ CROSS JOIN tot
), hs AS (
  SELECT CAST(sum(CAST(floor(CAST(k AS DOUBLE)
           * ln(CAST(n AS DOUBLE) / k) * 1.0e9) AS BIGINT)) AS BIGINT)
           AS hs_sum_nano
  FROM cols CROSS JOIN tot
)
SELECT n, mi_sum_nano, hl_sum_nano, hs_sum_nano,
       round(CASE WHEN hl_sum_nano > 0 AND hs_sum_nano > 0 THEN
               CAST(mi_sum_nano AS DOUBLE)
               / sqrt(CAST(hl_sum_nano AS DOUBLE)
                      * CAST(hs_sum_nano AS DOUBLE))
             ELSE 0.0e0 END, 6) AS nmi
FROM mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN tot
"""


def q284_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / byte-economics per language: whitespace
    tokens, characters, UTF-8 bytes, and the derived chars-per-token,
    bytes-per-token and multibyte-byte share — the table that predicts
    context-window cost per language and motivates the q277
    temperature weights (languages with high bytes/token burn budget
    faster).

    All-integer: per-doc counts sum exactly; the ratios are milli/ppm
    floor divisions of exact BIGINTs.

    Shape at 100 TB: one narrow projection (length/octet_length/
    size(split) — no token explode), one groupBy into <=5 language
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), "\\s+")))
        .cast("long")
        .alias("tk"),
        F.length("text").cast("long").alias("chars"),
        F.expr("octet_length(text)").cast("long").alias("bytes"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tk").alias("tokens"),
            F.sum("chars").alias("chars"),
            F.sum("bytes").alias("bytes"),
        )
        .select(
            "lang",
            "n_docs",
            "tokens",
            "chars",
            "bytes",
            F.expr("(chars * 1000L) div tokens").alias("chars_per_token_milli"),
            F.expr("(bytes * 1000L) div tokens").alias("bytes_per_token_milli"),
            F.expr("((bytes - chars) * 1000000L) div bytes").alias(
                "multibyte_ppm"
            ),
        )
        .orderBy("lang")
    )


_Q284_SQL = r"""
WITH per AS (
  SELECT lang,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS tk,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS bytes
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tk) AS BIGINT) AS tokens,
       CAST(sum(chars) AS BIGINT) AS chars,
       CAST(sum(bytes) AS BIGINT) AS bytes,
       CAST((sum(chars) * 1000) // sum(tk) AS BIGINT)
         AS chars_per_token_milli,
       CAST((sum(bytes) * 1000) // sum(tk) AS BIGINT)
         AS bytes_per_token_milli,
       CAST(((sum(bytes) - sum(chars)) * 1000000) // sum(bytes) AS BIGINT)
         AS multibyte_ppm
FROM per
GROUP BY lang
ORDER BY lang
"""


def q287_dedup_distribution_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit of exact dedup: the Jensen-Shannon
    divergence between the FULL corpus unigram distribution and the
    distribution over exact-dedup survivors (operators/dedup.exact_dedup
    keepers) — the check that deduplication cleaned volume without
    skewing the token mix (the pipeline-effect companion to q137's
    count-level effectiveness and q211's source-drift dial).

    Same exactness machinery as q211: per-token JS terms are one
    identical double chain over exact integer counts, quantized to
    pico-nats pre-sum; tokens absent from the survivor set contribute
    the closed-form 0.5·ln2·Σp tail computed from INTEGER sums (no
    full-vocabulary sweep).

    Shape at 100 TB: the dedup keeper set is a hash-grouped min;
    two token-count passes share the survivor semi-join; the JS join
    runs on the survivor vocabulary only."""
    from ..operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    kept = exact_dedup(docs).select(F.col("keeper").alias("doc_id"))
    toks_all = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    cg = toks_all.groupBy("tok").agg(F.count("*").alias("cg"))
    toks_kept = toks_all.join(kept, "doc_id", "left_semi")
    ck = toks_kept.groupBy("tok").agg(F.count("*").alias("ck"))
    nt = cg.agg(F.sum("cg").alias("nt"))
    nk = ck.agg(F.sum("ck").alias("nk"))
    p = "(CAST(cg AS DOUBLE) / CAST(nt AS DOUBLE))"
    q = "(CAST(ck AS DOUBLE) / CAST(nk AS DOUBLE))"
    term = (
        f"CAST(round((0.5 * {p} * ln(2 * {p} / ({p} + {q}))"
        f" + 0.5 * {q} * ln(2 * {q} / ({p} + {q}))) * 1e12) AS BIGINT)"
    )
    joined = (
        ck.join(cg, "tok")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nk))
        .agg(
            F.count("*").alias("vocab_kept"),
            F.sum(F.expr(term)).alias("present_pico"),
            F.sum("cg").alias("gnum"),
            F.max("nt").alias("nt"),
            F.max("nk").alias("nk"),
        )
    )
    counts = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        kept.agg(F.count("*").alias("n_kept"))
    )
    tail = (
        "CAST(round(0.5 * ln(2.0) * CAST(nt - gnum AS DOUBLE)"
        " / CAST(nt AS DOUBLE) * 1e12) AS BIGINT)"
    )
    return joined.crossJoin(F.broadcast(counts)).select(
        "n_docs",
        "n_kept",
        F.col("nt").alias("corpus_tokens"),
        F.col("nk").alias("kept_tokens"),
        "vocab_kept",
        F.expr(f"(present_pico + {tail}) div 1000000").alias("js_micro"),
    )


def _q287_sql() -> str:
    p = "(CAST(cg AS DOUBLE) / CAST(nt AS DOUBLE))"
    q = "(CAST(ck AS DOUBLE) / CAST(nk AS DOUBLE))"
    term = (
        f"CAST(round((0.5 * {p} * ln(2 * {p} / ({p} + {q}))"
        f" + 0.5 * {q} * ln(2 * {q} / ({p} + {q}))) * 1e12) AS BIGINT)"
    )
    return rf"""
WITH kept AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), toks_all AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), cg AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cg FROM toks_all GROUP BY tok
), ck AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS ck
  FROM toks_all WHERE doc_id IN (SELECT doc_id FROM kept)
  GROUP BY tok
), nt AS (
  SELECT CAST(sum(cg) AS BIGINT) AS nt FROM cg
), nk AS (
  SELECT CAST(sum(ck) AS BIGINT) AS nk FROM ck
), joined AS (
  SELECT CAST(count(*) AS BIGINT) AS vocab_kept,
         CAST(sum({term}) AS BIGINT) AS present_pico,
         CAST(sum(cg) AS BIGINT) AS gnum,
         CAST(max(nt) AS BIGINT) AS nt,
         CAST(max(nk) AS BIGINT) AS nk
  FROM ck JOIN cg USING (tok) CROSS JOIN nt CROSS JOIN nk
), counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept
)
SELECT n_docs, n_kept,
       nt AS corpus_tokens, nk AS kept_tokens, vocab_kept,
       CAST((present_pico
             + CAST(round(0.5 * ln(2.0) * CAST(nt - gnum AS DOUBLE)
                    / CAST(nt AS DOUBLE) * 1e12) AS BIGINT))
            // 1000000 AS BIGINT) AS js_micro
FROM joined CROSS JOIN counts
"""


def q288_murphy_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the (binned) Brier score for the q104
    classifier vs the q58 keep labels: BS = REL − RES + UNC + within-bin
    variance — reliability says how far bin forecasts sit from bin
    outcomes, resolution how much the bins separate the base rate,
    uncertainty the irreducible o̅(1−o̅); the diagnosis layer on top of
    q265's single Brier number.

    Exactness: per-bin REL/RES terms are single double chains over
    exact BIGINTs (k, n, ssum), floored to nano BIGINTs pre-sum; the
    within-bin variance term is derived exactly as the q265 Brier minus
    the decomposition (identity checked in pytest). All denominators
    nonnegative.

    Shape at 100 TB: identical to q265 — one grouped pass to <=10 bins,
    then a bin-relation reduction."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select("doc_id", "score")
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    e = scores.join(labels, "doc_id").select(
        F.expr("CAST(round(score * 10000) AS BIGINT)").alias("si"),
        F.col("keep").cast("long").alias("y"),
    )
    bins = (
        e.select(
            F.least(F.greatest(F.expr("si div 1000"), F.lit(0)), F.lit(9))
            .cast("int")
            .alias("bin"),
            "si",
            "y",
            ((F.col("si") - F.col("y") * 10000)
             * (F.col("si") - F.col("y") * 10000)).alias("sqerr"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("k"),
            F.sum("si").alias("ssum"),
            F.sum("sqerr").alias("sq"),
        )
        .localCheckpoint(eager=True)
    )
    tot = bins.agg(
        F.sum("n").alias("nn"), F.sum("k").alias("kk"), F.sum("sq").alias("sqt")
    )
    # f_b = ssum/(n·1e4), o_b = k/n, o̅ = kk/nn — all chains over ints
    rel_t = (
        "CAST(floor(CAST(n AS DOUBLE)"
        " * (CAST(ssum AS DOUBLE) / (n * 10000.0e0) - CAST(k AS DOUBLE) / n)"
        " * (CAST(ssum AS DOUBLE) / (n * 10000.0e0) - CAST(k AS DOUBLE) / n)"
        " * 1.0e9) AS BIGINT)"
    )
    res_t = (
        "CAST(floor(CAST(n AS DOUBLE)"
        " * (CAST(k AS DOUBLE) / n - CAST(kk AS DOUBLE) / nn)"
        " * (CAST(k AS DOUBLE) / n - CAST(kk AS DOUBLE) / nn)"
        " * 1.0e9) AS BIGINT)"
    )
    per = bins.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr(rel_t)).alias("rel_sum_nano"),
        F.sum(F.expr(res_t)).alias("res_sum_nano"),
        F.max("nn").alias("nn"),
        F.max("kk").alias("kk"),
        F.max("sqt").alias("sqt"),
    )
    return per.select(
        F.col("nn").alias("n_docs"),
        F.expr("rel_sum_nano div nn").alias("reliability_nano"),
        F.expr("res_sum_nano div nn").alias("resolution_nano"),
        F.round(
            F.expr(
                "CAST(kk AS DOUBLE) / nn * (1.0e0 - CAST(kk AS DOUBLE) / nn)"
            ),
            6,
        ).alias("uncertainty"),
        F.expr("(sqt * 1000000L) div (nn * 100000000L)").alias("brier_ppm"),
    )


def _q288_sql() -> str:
    rel_t = (
        "CAST(floor(CAST(n AS DOUBLE)"
        " * (CAST(ssum AS DOUBLE) / (n * 10000.0e0) - CAST(k AS DOUBLE) / n)"
        " * (CAST(ssum AS DOUBLE) / (n * 10000.0e0) - CAST(k AS DOUBLE) / n)"
        " * 1.0e9) AS BIGINT)"
    )
    res_t = (
        "CAST(floor(CAST(n AS DOUBLE)"
        " * (CAST(k AS DOUBLE) / n - CAST(kk AS DOUBLE) / nn)"
        " * (CAST(k AS DOUBLE) / n - CAST(kk AS DOUBLE) / nn)"
        " * 1.0e9) AS BIGINT)"
    )
    return f"""
WITH scores AS (
  SELECT doc_id, score FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(round(s.score * 10000) AS BIGINT) AS si,
         CAST(CASE WHEN l.keep THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM scores s JOIN labels l USING (doc_id)
), bins AS (
  SELECT CAST(least(greatest(si // 1000, 0), 9) AS INTEGER) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS k,
         CAST(sum(si) AS BIGINT) AS ssum,
         CAST(sum((si - y * 10000) * (si - y * 10000)) AS BIGINT) AS sq
  FROM e GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(k) AS BIGINT) AS kk,
         CAST(sum(sq) AS BIGINT) AS sqt
  FROM bins
), per AS (
  SELECT CAST(sum({rel_t}) AS BIGINT) AS rel_sum_nano,
         CAST(sum({res_t}) AS BIGINT) AS res_sum_nano,
         CAST(max(nn) AS BIGINT) AS nn,
         CAST(max(kk) AS BIGINT) AS kk,
         CAST(max(sqt) AS BIGINT) AS sqt
  FROM bins CROSS JOIN tot
)
SELECT nn AS n_docs,
       CAST(rel_sum_nano // nn AS BIGINT) AS reliability_nano,
       CAST(res_sum_nano // nn AS BIGINT) AS resolution_nano,
       round(CAST(kk AS DOUBLE) / nn * (1.0e0 - CAST(kk AS DOUBLE) / nn), 6)
         AS uncertainty,
       CAST((sqt * 1000000) // (nn * 100000000) AS BIGINT) AS brier_ppm
FROM per
"""


def q290_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy monitor: the mean pairwise cosine within each
    label (and a near-1 value = representation collapse, the
    Ethayarajh-style anisotropy alarm), computed WITHOUT any pair join
    via the closed form  mean_{i≠j} u_i·u_j = (‖Σu‖² − Σ‖u‖²)/(n(n−1))
    over per-row UNIT vectors.

    Exactness: each row normalizes once (a per-row double chain) and is
    floored to micro-integer units; the per-dim sums, ‖Σu‖², and
    Σ‖u_q‖² are then exact BIGINTs, so the closed form is one final
    rounded division — no cross-row float ever sums.

    Shape at 100 TB: one grouped corpus pass into |labels|·64 cells
    (map-side combined) — the q179/q270 shape; the pair space (n²)
    never exists."""
    emb = load_table(spark, sf_dir, "embeddings")
    unit = emb.select(
        "label",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            " / sqrt(aggregate(transform(embedding,"
            "   v -> CAST(v AS DOUBLE) * v), 0.0e0, (a, v) -> a + v))"
            " * 1.0e6) AS BIGINT))"
        ).alias("uq"),
    )
    per_dim = (
        unit.select("label", F.posexplode("uq").alias("dim", "u"))
        .groupBy("label", "dim")
        .agg(F.sum("u").alias("s"))
        .groupBy("label")
        .agg(
            F.sum(F.expr("s * s")).alias("sum_sq"),
        )
    )
    norms = unit.select(
        "label",
        F.expr(
            "aggregate(uq, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
        ).alias("nq"),
    ).groupBy("label").agg(
        F.count("*").alias("n"), F.sum("nq").alias("self_sq")
    )
    return (
        per_dim.join(norms, "label")
        .filter(F.col("n") >= 2)
        .select(
            "label",
            "n",
            "sum_sq",
            "self_sq",
            F.round(
                F.expr(
                    "(CAST(sum_sq AS DOUBLE) - self_sq)"
                    " / (CAST(n AS DOUBLE) * (n - 1)) / 1.0e12"
                ),
                6,
            ).alias("mean_pairwise_cosine"),
        )
        .orderBy("label")
    )


_Q290_SQL = """
WITH unit AS MATERIALIZED (
  SELECT label,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
           / sqrt(list_sum(list_transform(embedding,
                 v -> CAST(v AS DOUBLE) * v)))
           * 1.0e6) AS BIGINT)) AS uq
  FROM embeddings
), dq AS MATERIALIZED (
  SELECT label, unnest(uq) AS u, generate_subscripts(uq, 1) AS dim
  FROM unit
), per AS MATERIALIZED (
  SELECT label, CAST(sum(ss) AS BIGINT) AS sum_sq FROM (
    SELECT label, dim, CAST(sum(u) AS BIGINT) * CAST(sum(u) AS BIGINT) AS ss
    FROM dq GROUP BY label, dim
  ) GROUP BY label
), norms AS MATERIALIZED (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(nq) AS BIGINT) AS self_sq
  FROM (
    SELECT label,
           list_sum(list_transform(uq, x -> x * x)) AS nq
    FROM unit
  ) GROUP BY label
)
SELECT per.label, n, sum_sq, self_sq,
       round((CAST(sum_sq AS DOUBLE) - self_sq)
             / (CAST(n AS DOUBLE) * (n - 1)) / 1.0e12, 6)
         AS mean_pairwise_cosine
FROM per JOIN norms ON norms.label = per.label
WHERE n >= 2
ORDER BY per.label
"""


def q293_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source quality scores onto the
    GLOBAL score distribution — the batch-effect correction a curation
    pipeline applies before mixing scores from heterogeneous scorers:
    each doc's score becomes the global value at its within-source
    quantile, g = ceil(r·N_g / N_s), so every source's distribution
    maps exactly onto the corpus distribution.

    Exactness: scores are the usual 1e4 integers; within-source ranks
    are deterministic (order by si, doc_id); the global quantile
    function is the BOUNDED cumulative count table (value domain, not
    rows) broadcast into a range join — no global row_number over the
    corpus. All reported means are exact integer sums divided once.

    Shape at 100 TB: one grouped pass for the count table; one window
    partitioned by source (the op's unit of work); one broadcast range
    join against the <=|domain|-row quantile table."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs, n_buckets=4096).select(
        "doc_id", F.expr("CAST(round(score * 10000) AS BIGINT)").alias("si")
    ).join(docs.select("doc_id", "source"), "doc_id")
    ng = scored.count()
    dom = scored.groupBy("si").agg(F.count("*").alias("c"))
    wv = W.orderBy("si").rowsBetween(W.unboundedPreceding, 0)
    quant = dom.select(
        "si",
        (F.sum("c").over(wv) - F.col("c")).alias("lo"),
        F.sum("c").over(wv).alias("hi"),
    )
    ws = W.partitionBy("source").orderBy("si", "doc_id")
    ranked = scored.withColumn("r", F.row_number().over(ws))
    ns = scored.groupBy("source").agg(F.count("*").alias("n_s"))
    g = ranked.join(F.broadcast(ns), "source").select(
        "source",
        "si",
        F.expr(f"((r * CAST({ng} AS BIGINT)) + n_s - 1) div n_s").alias("g"),
    )
    quant_g = quant.select(
        F.col("si").alias("si_g"), "lo", "hi"
    )
    mapped = g.join(
        F.broadcast(quant_g),
        (F.col("g") > F.col("lo")) & (F.col("g") <= F.col("hi")),
    ).select("source", F.col("si").alias("si_before"),
             F.col("si_g").alias("si_after"))
    return (
        mapped.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("si_before").alias("sum_before"),
            F.sum("si_after").alias("sum_after"),
        )
        .select(
            "source",
            "n",
            "sum_before",
            "sum_after",
            F.round(F.expr("CAST(sum_before AS DOUBLE) / n / 10000.0e0"), 4)
            .alias("mean_before"),
            F.round(F.expr("CAST(sum_after AS DOUBLE) / n / 10000.0e0"), 4)
            .alias("mean_after"),
        )
        .orderBy("source")
    )


def _q293_sql() -> str:
    return f"""
WITH scored AS (
  SELECT s.doc_id, CAST(round(s.score * 10000) AS BIGINT) AS si, d.source
  FROM ({_Q104_SQL}) s JOIN documents d USING (doc_id)
), ngt AS (
  SELECT CAST(count(*) AS BIGINT) AS ng FROM scored
), dom AS (
  SELECT si, CAST(count(*) AS BIGINT) AS c FROM scored GROUP BY si
), quant AS (
  SELECT si,
         CAST(sum(c) OVER (ORDER BY si
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS BIGINT)
           AS lo,
         CAST(sum(c) OVER (ORDER BY si
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS hi
  FROM dom
), ns AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM scored GROUP BY source
), ranked AS (
  SELECT source, si,
         row_number() OVER (PARTITION BY source ORDER BY si, doc_id) AS r
  FROM scored
), g AS (
  SELECT ranked.source, ranked.si AS si_before,
         ((ranked.r * ng) + n_s - 1) // n_s AS g
  FROM ranked
  JOIN ns USING (source)
  CROSS JOIN ngt
), mapped AS (
  SELECT g.source, g.si_before, quant.si AS si_after
  FROM g JOIN quant ON g.g > quant.lo AND g.g <= quant.hi
)
SELECT source, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(si_before) AS BIGINT) AS sum_before,
       CAST(sum(si_after) AS BIGINT) AS sum_after,
       round(CAST(sum(si_before) AS DOUBLE) / count(*) / 10000.0e0, 4)
         AS mean_before,
       round(CAST(sum(si_after) AS DOUBLE) / count(*) / 10000.0e0, 4)
         AS mean_after
FROM mapped
GROUP BY source
ORDER BY source
"""


def q294_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation for a stratified sample of the corpus
    by language: n_h ∝ N_h·S_h (stratum size × token-count standard
    deviation), compared against proportional allocation for an
    n=10000 audit sample — the sampling-design planner that decides how
    q47's stratified sampler should spend its budget when strata have
    unequal variance.

    Exactness: per-stratum (N, Σx, Σx²) are exact integers; S_h is one
    sqrt chain floored to nano; the allocations are pure nonnegative
    integer divisions over the N_h·S_nano weights. Magnitude audit:
    tk² ~ 1e10 wraps a BIGINT Σx² at ~1e9 docs, and N_h·S_nano ~
    1e10·1e13 wraps row-level — Σx², the weight products, and their
    total run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); the
    allocation quotients (≤1e4) narrow back to BIGINT safely.

    Shape at 100 TB: one narrow size(split) scan, one groupBy into
    <=5 strata, a 1-row weight-total broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), "\\s+")))
        .cast("long")
        .alias("tk"),
    ).groupBy("lang").agg(
        F.count("*").alias("nh"),
        F.sum("tk").alias("sx"),
        F.sum(F.expr("CAST(tk AS DECIMAL(38,0)) * tk")).alias("sxx"),
    ).select(
        "lang",
        "nh",
        F.expr(
            "CAST(floor(sqrt((CAST(sxx AS DOUBLE) * nh"
            " - CAST(sx AS DOUBLE) * sx)"
            " / (CAST(nh AS DOUBLE) * nh)) * 1.0e9) AS BIGINT)"
        ).alias("s_nano"),
    )
    tot = per.agg(
        F.sum("nh").alias("nt"),
        F.sum(F.expr("CAST(nh AS DECIMAL(38,0)) * s_nano")).alias("w_total"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("nh").alias("n_docs"),
            "s_nano",
            F.expr(
                "(10000 * CAST(nh AS DECIMAL(38,0)) * s_nano) div w_total"
            ).alias("neyman_alloc"),
            F.expr("(10000 * nh) div nt").alias("proportional_alloc"),
        )
        .orderBy("lang")
    )


_Q294_SQL = r"""
WITH per AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS nh,
         CAST(sum(tk) AS BIGINT) AS sx,
         CAST(sum(CAST(tk AS HUGEINT) * tk) AS HUGEINT) AS sxx
  FROM (
    SELECT lang,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END
             AS BIGINT) AS tk
    FROM documents
  ) GROUP BY lang
), w AS (
  SELECT lang, nh,
         CAST(floor(sqrt((CAST(sxx AS DOUBLE) * nh
               - CAST(sx AS DOUBLE) * sx)
               / (CAST(nh AS DOUBLE) * nh)) * 1.0e9) AS BIGINT) AS s_nano
  FROM per
), tot AS (
  SELECT CAST(sum(nh) AS BIGINT) AS nt,
         CAST(sum(CAST(nh AS HUGEINT) * s_nano) AS HUGEINT) AS w_total
  FROM w
)
SELECT lang, nh AS n_docs, s_nano,
       CAST((10000 * CAST(nh AS HUGEINT) * s_nano) // w_total AS BIGINT)
         AS neyman_alloc,
       CAST((10000 * nh) // nt AS BIGINT) AS proportional_alloc
FROM w CROSS JOIN tot
ORDER BY lang
"""


def q302_hyperloglog_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate per source, audited against
    the exact distinct — the classic cardinality sketch alongside KMV
    (q106): 256 registers (b=8) whose per-source state is a 256-cell
    max-aggregate, additive under merge (register-wise max), so
    per-partition partials combine map-side and a streaming ingest can
    maintain it exactly like the CMS store.

    Engine-portable construction: the 32-bit md5 slice (the _h32
    idiom) splits into the top-8-bit register index and a 24-bit
    remainder w; rho = 24 − floor(log2(w)) (w=0 → 25) is exact because
    log2 is correctly rounded in BOTH engines on exact integers. The
    register sum Σ2^(−M_j) is computed as the EXACT BIGINT
    S = Σ 2^(25−M_j) (≤ 256·2^25 ≈ 8.6e9 — no float accumulation
    across registers); the raw estimate α·m²·2^25/S and the
    small-range linear-counting branch m·ln(m/V) (taken when the raw
    estimate ≤ 2.5m and zero registers exist — documented standard
    HLL) are single deterministic double chains over S and the exact
    zero-register count V.

    Magnitude audit: register state is 256 cells/source regardless of
    corpus size; S ≤ 2^33. Nothing scales with rows.

    Shape at 100 TB: one token explode → (source, register) max
    combine (map-side, ≤ |sources|·256 cells); the exact-distinct
    audit column is itself one distinct aggregate (the expensive
    truth the sketch replaces — kept here because the query IS the
    accuracy audit)."""
    from ..operators.sketches import hll_estimate, hll_registers

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    regs = hll_registers(toks, "tok", key_cols=["source"])
    state = hll_estimate(regs, key_cols=["source"])
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("n_exact")
    )
    return (
        state.join(exact, "source")
        .select(
            "source",
            "n_exact",
            "reg_sum_s",
            "v_zero",
            "hll_estimate",
            F.expr(
                "CAST(floor(abs(hll_estimate - CAST(n_exact AS DOUBLE))"
                " * 1e6 / CAST(n_exact AS DOUBLE)) AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("source")
    )


_Q302_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), hashed AS (
  SELECT source,
         h % 16777216 AS w,
         h // 16777216 AS j
  FROM (
    SELECT source,
           ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
    FROM toks
  )
), rho AS (
  SELECT source, j,
         CASE WHEN w = 0 THEN 25
              ELSE 24 - CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT)
         END AS rho
  FROM hashed
), regs AS (
  SELECT source, j, max(rho) AS m FROM rho GROUP BY source, j
), state AS (
  SELECT source,
         CAST(sum(CAST(1 AS BIGINT) << CAST(25 - m AS INT)) AS BIGINT)
           + (256 - count(*)) * 33554432 AS s,
         256 - count(*) AS v_zero
  FROM regs GROUP BY source
), exact AS (
  SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
  FROM toks GROUP BY source
)
SELECT state.source,
       exact.n_exact,
       CAST(state.s AS BIGINT) AS reg_sum_s,
       CAST(state.v_zero AS BIGINT) AS v_zero,
       round(CASE WHEN ((0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0))
                  * 65536.0e0 * 33554432.0e0 / CAST(s AS DOUBLE)) <= 640.0e0
                  AND v_zero > 0
             THEN 256.0e0 * ln(256.0e0 / CAST(v_zero AS DOUBLE))
             ELSE ((0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0))
                   * 65536.0e0 * 33554432.0e0 / CAST(s AS DOUBLE)) END, 2)
         AS hll_estimate,
       CAST(floor(abs(round(CASE
                  WHEN ((0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0))
                  * 65536.0e0 * 33554432.0e0 / CAST(s AS DOUBLE)) <= 640.0e0
                  AND v_zero > 0
             THEN 256.0e0 * ln(256.0e0 / CAST(v_zero AS DOUBLE))
             ELSE ((0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0))
                   * 65536.0e0 * 33554432.0e0 / CAST(s AS DOUBLE)) END, 2)
             - CAST(n_exact AS DOUBLE)) * 1e6 / CAST(n_exact AS DOUBLE))
         AS BIGINT) AS err_ppm
FROM state JOIN exact USING (source)
ORDER BY source
"""


def q303_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (RBO, p=0.9, depth 20) between the src0 and
    src1 top-token rankings — the top-weighted list-similarity measure
    serving stacks use to compare rankers (Webber et al., TOIS'10),
    complementing RRF fusion (q257) and NDCG (q258): RRF merges
    rankings, RBO says how far apart two rankings ARE.

    Join-free overlap curve: a token in both top-20s enters the
    overlap at every depth d ≥ max(rank_a, rank_b), so the full curve
    X_d comes from ONE cumulative count over m = max(ra, rb) on the
    ≤20-row matched relation. Each RBO term (X_d/d)·(1−p)/p·p^d is
    floored to a NANO BIGINT before summation (p^d via
    exp(d·ln(0.9)) — ln/exp are the accepted correctly-rounded seams,
    and both engines evaluate the IDENTICAL chain), so the cross-depth
    sum is an exact integer — the quantize-pre-sum discipline.

    Shape at 100 TB: two corpus token counts → two TakeOrdered top-20
    probes; everything after runs on ≤20-row relations."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))

    def top20(src):
        w = W.orderBy(F.col("c").desc(), "tok")
        return (
            cnt.filter(F.col("source") == src)
            .select("tok", "c")
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 20)
        )

    a = top20("src0").select("tok", F.col("r").alias("ra"))
    b = top20("src1").select("tok", F.col("r").alias("rb"))
    both = a.join(b, "tok").select(
        F.greatest("ra", "rb").alias("m")
    )
    depths = spark.range(1, 21).select(F.col("id").alias("d"))
    xd = depths.join(
        both, F.col("m") <= F.col("d"), "left"
    ).groupBy("d").agg(
        F.sum(F.when(F.col("m").isNotNull(), 1).otherwise(0)).alias("x")
    )
    term = (
        "CAST(floor(CAST(x AS DOUBLE) / CAST(d AS DOUBLE)"
        " * (0.1e0 / 0.9e0) * exp(CAST(d AS DOUBLE) * ln(0.9e0))"
        " * 1e9) AS BIGINT)"
    )
    agg = xd.select(
        "d", "x", F.expr(term).alias("term_nano")
    ).agg(
        F.max(F.when(F.col("d") == 20, F.col("x"))).alias("overlap_at_20"),
        F.sum("term_nano").alias("rbo_nano"),
    )
    return agg.select(
        "overlap_at_20",
        "rbo_nano",
        F.round(F.col("rbo_nano").cast("double") / 1e9, 6).alias("rbo_min"),
    )


_Q303_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents WHERE source IN ('src0', 'src1')
  ) WHERE tok <> ''
), cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), a AS (
  SELECT tok, r AS ra FROM (
    SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS r
    FROM cnt WHERE source = 'src0'
  ) WHERE r <= 20
), b AS (
  SELECT tok, r AS rb FROM (
    SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS r
    FROM cnt WHERE source = 'src1'
  ) WHERE r <= 20
), both_ AS (
  SELECT greatest(ra, rb) AS m FROM a JOIN b USING (tok)
), depths AS (
  SELECT unnest(range(1, 21)) AS d
), xd AS (
  SELECT d, CAST(count(m) AS BIGINT) AS x
  FROM depths LEFT JOIN both_ ON m <= d
  GROUP BY d
), terms AS (
  SELECT d, x,
         CAST(floor(CAST(x AS DOUBLE) / CAST(d AS DOUBLE)
              * (0.1e0 / 0.9e0) * exp(CAST(d AS DOUBLE) * ln(0.9e0))
              * 1e9) AS BIGINT) AS term_nano
  FROM xd
)
SELECT CAST(max(CASE WHEN d = 20 THEN x END) AS BIGINT) AS overlap_at_20,
       CAST(sum(term_nano) AS BIGINT) AS rbo_nano,
       round(CAST(sum(term_nano) AS DOUBLE) / 1e9, 6) AS rbo_min
FROM terms
"""


def q305_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the UNSEEN vocabulary per
    source: V̂ = V + n₁(n₁−1)/(2(n₂+1)) from the singleton/doubleton
    counts of the token frequency spectrum — the "how much vocabulary
    would more crawling surface" planner that pairs with the observed
    vocab-growth curve (q157) and the HLL estimate of what IS there
    (q302).

    Exactness: the frequency spectrum is a grouped count of grouped
    counts — all BIGINTs; the bias-corrected Chao1 term is ONE integer
    division floored to milli units (n₁(n₁−1)·1000 div (2(n₂+1)) —
    nonnegative, both engines floor identically), so the estimate is
    exact integer milli-vocab. Coverage (Good's C = 1 − n₁/N) is ppm
    by the same route.

    Magnitude audit: n₁ ≤ V ≤ N tokens; n₁²·1000 wraps BIGINT at
    n₁ ≈ 3e6 — the product runs in DECIMAL(38,0)/HUGEINT (good to
    1e16 singletons).

    Shape at 100 TB: token explode → (source, tok) counts (map-side
    combined) → per-source spectrum rollup; output is |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    spec = tf.groupBy("source").agg(
        F.count("*").alias("v_obs"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("n2"),
    )
    return spec.select(
        "source",
        "n_tokens",
        "v_obs",
        "n1",
        "n2",
        F.expr(
            "v_obs * 1000 + (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1) * 1000)"
            " div (2 * (n2 + 1))"
        ).alias("chao1_milli"),
        F.expr(
            "1000000 - (n1 * 1000000) div n_tokens"
        ).alias("coverage_ppm"),
    ).orderBy("source")


_Q305_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), tf AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), spec AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS v_obs,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM tf GROUP BY source
)
SELECT source, n_tokens, v_obs, n1, n2,
       CAST(v_obs * 1000 + (CAST(n1 AS HUGEINT) * (n1 - 1) * 1000)
            // (2 * (n2 + 1)) AS BIGINT) AS chao1_milli,
       CAST(1000000 - (n1 * 1000000) // n_tokens AS BIGINT) AS coverage_ppm
FROM spec
ORDER BY source
"""


def q308_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between the two keep/drop labelers the
    suite already runs — the q58 Gopher rule flags and the q104
    hashed-linear classifier at its si ≥ 5000 operating point — the
    chance-corrected agreement score an annotation pipeline reports
    before trusting either labeler as ground truth (the inter-rater
    companion to the threshold sweep q143 and the ROC view q272).

    Exact rational arithmetic: from the 2×2 agreement table,
    kappa = (n·(n₁₁+n₀₀) − (a₁b₁+a₀b₀)) / (n² − (a₁b₁+a₀b₀)) —
    numerator and denominator are exact integers (no pₒ/pₑ floats),
    emitted as a sign-split ppm division. Degenerate guard (ADVICE
    r6): when BOTH labelers are constant, pₑ = 1 and the denominator
    is exactly 0 — kappa is undefined and kappa_ppm is an EXPLICIT
    NULL (guarded on the exact integer denominator, the q304 idiom),
    never an incidental divide-by-zero.

    Magnitude audit: a₁b₁ ~ N² wraps BIGINT at N ≈ 3e9 docs — the
    cross products and n² run in DECIMAL(38,0)/HUGEINT.

    Shape at 100 TB: the q104/q58 corpus joins feed ONE grouped pass
    to 4 cells; everything after is a 1-row reduction."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, n_buckets=4096).select(
        "doc_id", F.expr("CAST(round(score * 10000) AS BIGINT)").alias("si")
    )
    labels = q58_gopher_quality_flags(spark, sf_dir).select("doc_id", "keep")
    e = scores.join(labels, "doc_id").select(
        (F.col("si") >= 5000).cast("long").alias("a"),
        F.col("keep").cast("long").alias("b"),
    )
    cells = e.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("a * b")).alias("n11"),
        F.sum(F.expr("a * (1 - b)")).alias("n10"),
        F.sum(F.expr("(1 - a) * b")).alias("n01"),
        F.sum(F.expr("(1 - a) * (1 - b)")).alias("n00"),
    )
    num = (
        "(CAST(n AS DECIMAL(38,0)) * (n11 + n00)"
        " - ((n11 + n10) * CAST(n11 + n01 AS DECIMAL(38,0))"
        "    + (n01 + n00) * CAST(n10 + n00 AS DECIMAL(38,0))))"
    )
    den = (
        "(CAST(n AS DECIMAL(38,0)) * n"
        " - ((n11 + n10) * CAST(n11 + n01 AS DECIMAL(38,0))"
        "    + (n01 + n00) * CAST(n10 + n00 AS DECIMAL(38,0))))"
    )
    return cells.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            f"CASE WHEN {den} = 0 THEN CAST(NULL AS BIGINT)"
            f" WHEN {num} >= 0 THEN ({num} * 1000000) div {den}"
            f" ELSE -((-({num}) * 1000000) div {den}) END"
        ).alias("kappa_ppm"),
        F.expr("((n11 + n00) * 1000000) div n").alias("po_ppm"),
    )


def _q308_sql() -> str:
    num = (
        "(CAST(n AS HUGEINT) * (n11 + n00)"
        " - ((n11 + n10) * CAST(n11 + n01 AS HUGEINT)"
        "    + (n01 + n00) * CAST(n10 + n00 AS HUGEINT)))"
    )
    den = (
        "(CAST(n AS HUGEINT) * n"
        " - ((n11 + n10) * CAST(n11 + n01 AS HUGEINT)"
        "    + (n01 + n00) * CAST(n10 + n00 AS HUGEINT)))"
    )
    return f"""
WITH scores AS (
  SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS si
  FROM ({_Q104_SQL}) s
), labels AS (
  SELECT doc_id, keep FROM ({_Q58_SQL}) l
), e AS (
  SELECT CAST(CASE WHEN s.si >= 5000 THEN 1 ELSE 0 END AS BIGINT) AS a,
         CAST(CASE WHEN l.keep THEN 1 ELSE 0 END AS BIGINT) AS b
  FROM scores s JOIN labels l USING (doc_id)
), cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * b) AS BIGINT) AS n11,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM e
)
SELECT n, n11, n10, n01, n00,
       CAST(CASE WHEN {den} = 0 THEN NULL
            WHEN {num} >= 0 THEN ({num} * 1000000) // {den}
            ELSE -((-({num}) * 1000000) // {den}) END AS BIGINT)
         AS kappa_ppm,
       CAST(((n11 + n00) * 1000000) // n AS BIGINT) AS po_ppm
FROM cells
"""


def q309_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov two-sample test on document length (src0 vs
    src1) — the distribution-level drift test completing the pairwise
    suite: Mann-Whitney (q187) ranks locations, Cliff's delta (q269)
    sizes dominance, KS detects ANY CDF difference (shape, spread,
    tails).

    Exactness: on the merged length count table, the statistic's
    numerator D_num = max_v |F₁(v)·n₁n₂ − F₂(v)·n₁n₂| =
    max |cum₁·n₂ − cum₂·n₁| is an exact integer off two cumulative
    windows (no float CDFs); D_ppm divides in the wide type and the
    asymptotic λ = D·√(n₁n₂/(n₁+n₂)) is one double chain.

    Magnitude audit: cum·n products ~ N² wrap BIGINT at N ≈ 3e9 docs —
    they run in DECIMAL(38,0)/HUGEINT and D_num is emitted as a STRING
    (q78/q233 rule).

    Shape at 100 TB: two pushed source filters → grouped counts over
    the bounded length domain, two windows there, a 1-row max."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.col("n_chars").cast("long").alias("v")
    )
    c1 = base.filter(F.col("source") == "src0").groupBy("v").agg(
        F.count("*").alias("c1")
    )
    c2 = base.filter(F.col("source") == "src1").groupBy("v").agg(
        F.count("*").alias("c2")
    )
    dom = (
        c1.select("v")
        .unionByName(c2.select("v"))
        .distinct()
        .join(c1, "v", "left")
        .join(c2, "v", "left")
        .select(
            "v",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = dom.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    tot = base.groupBy().pivot("source", ["src0", "src1"]).count().select(
        F.col("src0").alias("n1"), F.col("src1").alias("n2")
    )
    dmax = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.expr(
                "abs(CAST(f1 AS DECIMAL(38,0)) * n2"
                " - CAST(f2 AS DECIMAL(38,0)) * n1)"
            )
        ).alias("d_num"),
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    )
    lam = (
        "(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))"
        " * sqrt(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 AS DOUBLE) + n2))"
    )
    return dmax.select(
        "n1",
        "n2",
        F.expr("CAST(d_num AS STRING)").alias("d_num"),
        F.expr(
            "CAST((d_num * 1000000) div (CAST(n1 AS DECIMAL(38,0)) * n2)"
            " AS BIGINT)"
        ).alias("d_ppm"),
        F.round(F.expr(lam), 4).alias("ks_lambda"),
    )


_Q309_SQL = """
WITH base AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
  WHERE source IN ('src0', 'src1')
), c1 AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c1 FROM base
  WHERE source = 'src0' GROUP BY v
), c2 AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c2 FROM base
  WHERE source = 'src1' GROUP BY v
), dom AS (
  SELECT d.v, coalesce(c1.c1, 0) AS c1, coalesce(c2.c2, 0) AS c2
  FROM (SELECT DISTINCT v FROM (SELECT v FROM c1 UNION ALL SELECT v FROM c2)) d
  LEFT JOIN c1 ON c1.v = d.v
  LEFT JOIN c2 ON c2.v = d.v
), cum AS (
  SELECT sum(c1) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
         sum(c2) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
  FROM dom
), tot AS (
  SELECT CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS n2
  FROM base
), dmax AS (
  SELECT CAST(max(abs(CAST(f1 AS HUGEINT) * n2
                      - CAST(f2 AS HUGEINT) * n1)) AS HUGEINT) AS d_num,
         CAST(max(n1) AS BIGINT) AS n1,
         CAST(max(n2) AS BIGINT) AS n2
  FROM cum CROSS JOIN tot
)
SELECT n1, n2,
       CAST(d_num AS VARCHAR) AS d_num,
       CAST((d_num * 1000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
         AS d_ppm,
       round((CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))
             * sqrt(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 AS DOUBLE) + n2)), 4)
         AS ks_lambda
FROM dmax
"""


def q310_lexical_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-concentration suite per source off ONE token frequency
    spectrum: Yule's K (the length-invariant repeated-vocabulary
    characteristic), Simpson's repeat-probability D, the hapax share
    of the vocabulary, and the type-token ratio — the classic
    stylometric quartet that pairs with Chao1 (q305, what's missing)
    and the entropy views (q198, how it's spread).

    Exactness: all four are integer rationals off (V, N, n₁, Σc²):
    K_milli = 10⁴·10³·(Σc² − N) div N², Simpson_ppm =
    Σc(c−1)·10⁶ div N(N−1), hapax/TTR in ppm — nonnegative floors,
    identical in both engines.

    Magnitude audit: Σc² ≤ N² wraps BIGINT at N ≈ 3e9 tokens — the
    squared-count sum and every N² product run in DECIMAL(38,0)/
    HUGEINT; Σc² is emitted as a STRING (q78/q233 rule).

    Shape at 100 TB: token explode → (source, tok) counts (map-side
    combined) → one spectrum rollup per source."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    spec = tf.groupBy("source").agg(
        F.count("*").alias("v_obs"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("s2"),
    )
    return spec.select(
        "source",
        "n_tokens",
        "v_obs",
        "n1",
        F.expr("CAST(s2 AS STRING)").alias("sum_c2"),
        F.expr(
            "((s2 - n_tokens) * 10000000)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)"
        ).alias("yule_k_milli"),
        F.expr(
            "((s2 - n_tokens) * 1000000)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))"
        ).alias("simpson_ppm"),
        F.expr("(n1 * 1000000) div v_obs").alias("hapax_ppm"),
        F.expr("(v_obs * 1000000) div n_tokens").alias("ttr_ppm"),
    ).orderBy("source")


_Q310_SQL = r"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), tf AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), spec AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS v_obs,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM tf GROUP BY source
)
SELECT source, n_tokens, v_obs, n1,
       CAST(s2 AS VARCHAR) AS sum_c2,
       CAST(((s2 - n_tokens) * 10000000)
            // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
         AS yule_k_milli,
       CAST(((s2 - n_tokens) * 1000000)
            // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT)
         AS simpson_ppm,
       CAST((n1 * 1000000) // v_obs AS BIGINT) AS hapax_ppm,
       CAST((v_obs * 1000000) // n_tokens AS BIGINT) AS ttr_ppm
FROM spec
ORDER BY source
"""


def q312_categorical_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V and Pearson's contingency coefficient for the
    lang × source table — the EFFECT-SIZE companions to the q182-style
    chi-square and the q282 NMI: the test says whether association
    exists, these say how strong it is on a 0..1 scale comparable
    across table shapes.

    Exactness: the q182 milli-unit idiom in the WIDE type — per cell
    d = o·N − r·c and term_milli = d² div M ·1000 + (d² mod M)·1000
    div M with M = N·r·c, all DECIMAL(38,0)/HUGEINT, so the cross-cell
    sum is exact; V = √(χ²/(N·min(r−1,c−1))) and C = √(χ²/(χ²+N)) are
    single double chains over the exact milli sum.

    Magnitude audit: d² ≤ N⁴ fits DECIMAL(38,0) to N ≈ 1.8e9 docs —
    an order past any current fixture; beyond that the documented
    big-N path splits d² through _floor_scaled_div limbs (the q233
    machinery). Zero cells of the FULL grid contribute r·c/N like
    q182.

    Shape at 100 TB: one grouped corpus pass to ≤ |langs|·|sources|
    cells; margins and the statistic are grid-sized reductions."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rows_m = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("source").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = rows_m.crossJoin(cols_m)
    j = (
        grid.join(cells, ["lang", "source"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    term = F.expr(
        "(CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
        " * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
        " div (CAST(n AS DECIMAL(38,0)) * r * c) * 1000"
        " + ((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
        "    * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
        "    % (CAST(n AS DECIMAL(38,0)) * r * c)) * 1000"
        "   div (CAST(n AS DECIMAL(38,0)) * r * c)"
    )
    agg = j.agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").alias("nr"),
        F.countDistinct("source").alias("nc"),
        F.sum(term).alias("chi2_milli"),
    )
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        "chi2_milli",
        F.round(
            F.expr(
                "sqrt(CAST(chi2_milli AS DOUBLE) / 1000.0e0"
                " / (CAST(n AS DOUBLE)"
                "    * least(CAST(nr - 1 AS DOUBLE), CAST(nc - 1 AS DOUBLE))))"
            ),
            6,
        ).alias("cramers_v"),
        F.round(
            F.expr(
                "sqrt((CAST(chi2_milli AS DOUBLE) / 1000.0e0)"
                " / (CAST(chi2_milli AS DOUBLE) / 1000.0e0"
                "    + CAST(n AS DOUBLE)))"
            ),
            6,
        ).alias("contingency_c"),
    )


_Q312_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), rows_m AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY lang
), cols_m AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY source
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
), grid AS (
  SELECT rows_m.lang, cols_m.source, rows_m.r, cols_m.c,
         coalesce(cells.o, 0) AS o
  FROM rows_m CROSS JOIN cols_m
  LEFT JOIN cells ON cells.lang = rows_m.lang
                 AND cells.source = cols_m.source
), agg AS (
  SELECT max(n) AS n,
         CAST(count(DISTINCT lang) AS BIGINT) AS nr,
         CAST(count(DISTINCT source) AS BIGINT) AS nc,
         CAST(sum(
           (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
           * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
           // (CAST(n AS HUGEINT) * r * c) * 1000
           + ((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              % (CAST(n AS HUGEINT) * r * c)) * 1000
             // (CAST(n AS HUGEINT) * r * c)
         ) AS BIGINT) AS chi2_milli
  FROM grid CROSS JOIN tot
)
SELECT n,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       chi2_milli,
       round(sqrt(CAST(chi2_milli AS DOUBLE) / 1000.0e0
             / (CAST(n AS DOUBLE)
                * least(CAST(nr - 1 AS DOUBLE), CAST(nc - 1 AS DOUBLE)))), 6)
         AS cramers_v,
       round(sqrt((CAST(chi2_milli AS DOUBLE) / 1000.0e0)
             / (CAST(chi2_milli AS DOUBLE) / 1000.0e0
                + CAST(n AS DOUBLE))), 6) AS contingency_c
FROM agg
"""


def q313_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood-ratio) of lang × source independence —
    the information-theoretic twin of the Pearson chi-square (q312
    uses the same table): G = 2·Σ o·ln(o·N/(r·c)), which is also
    exactly 2N·I(lang; source) in nats, tying the test statistic to
    the q282 mutual information.

    Exactness: each cell term o·(ln o + ln N − ln r − ln c) is ONE
    deterministic double chain with every CAST→DOUBLE operand a plain
    count < 2^53 (the log of the ratio is split into single-count
    logs precisely so no N²-scale product ever meets a double — the
    q78 lesson; ln is a correctly-rounded seam in both engines),
    floored to MICRO units BEFORE the cross-cell sum — the
    quantize-pre-sum discipline; zero cells contribute 0 by the
    x·ln x → 0 limit, taken explicitly.

    Magnitude audit: counts stay < 2^53 to N ≈ 9e15 docs; G_micro
    ≤ 2N·ln(min(r,c))·1e6 ~ 1e18 at 1e11 docs sits inside BIGINT.

    Shape at 100 TB: identical to q312 — one grouped pass to ≤100
    cells, margins, a grid-sized reduction."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rows_m = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("source").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    j = (
        rows_m.crossJoin(cols_m)
        .join(cells, ["lang", "source"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    term = (
        "CASE WHEN o = 0 THEN 0L ELSE"
        " CAST(floor(CAST(o AS DOUBLE)"
        "  * (ln(CAST(o AS DOUBLE)) + ln(CAST(n AS DOUBLE))"
        "     - ln(CAST(r AS DOUBLE)) - ln(CAST(c AS DOUBLE)))"
        "  * 1e6) AS BIGINT) END"
    )
    agg = j.agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").alias("nr"),
        F.countDistinct("source").alias("nc"),
        F.sum(F.expr(term)).alias("half_g_micro"),
    )
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        (2 * F.col("half_g_micro")).alias("g_micro"),
        F.round(
            F.expr("CAST(2 * half_g_micro AS DOUBLE) / 1e6"), 3
        ).alias("g_stat"),
        F.round(
            F.expr(
                "CAST(half_g_micro AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)"
            ),
            6,
        ).alias("mutual_info_nats"),
    )


_Q313_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), rows_m AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY lang
), cols_m AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY source
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
), grid AS (
  SELECT rows_m.lang, cols_m.source, rows_m.r, cols_m.c,
         coalesce(cells.o, 0) AS o
  FROM rows_m CROSS JOIN cols_m
  LEFT JOIN cells ON cells.lang = rows_m.lang
                 AND cells.source = cols_m.source
), agg AS (
  SELECT max(n) AS n,
         CAST(count(DISTINCT lang) AS BIGINT) AS nr,
         CAST(count(DISTINCT source) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN o = 0 THEN 0 ELSE
           CAST(floor(CAST(o AS DOUBLE)
             * (ln(CAST(o AS DOUBLE)) + ln(CAST(n AS DOUBLE))
                - ln(CAST(r AS DOUBLE)) - ln(CAST(c AS DOUBLE)))
             * 1e6) AS BIGINT) END) AS BIGINT) AS half_g_micro
  FROM grid CROSS JOIN tot
)
SELECT n,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       CAST(2 * half_g_micro AS BIGINT) AS g_micro,
       round(CAST(2 * half_g_micro AS DOUBLE) / 1e6, 3) AS g_stat,
       round(CAST(half_g_micro AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6)
         AS mutual_info_nats
FROM agg
"""


def q314_mrl_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: search on the FIRST 32 of 64
    embedding dims and report per-query recall@5 against the exact
    full-dim scan — the measurement that decides whether a 2×-cheaper
    truncated index (the MRL serving pattern) is safe, exactly as
    q113 audits the int8 tier and q280 the 1-bit tier. Per-query rows,
    not a global average that can hide one bad query.

    Float parity: both tiers run the shared q22 cosine machinery —
    explicit left-to-right fold dot products over identically sliced
    arrays, one deterministic division per pair — so Spark and the
    DuckDB oracle order candidates identically (vec_id breaks exact
    ties).

    Shape at 100 TB: two broadcast-query scans of the corpus (the
    truncated one reading half the vector bytes — the point of MRL);
    TakeOrdered top-5 per query; the overlap join is 25 rows."""
    from ..operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    trunc = lambda df: df.withColumn(
        "embedding", F.slice("embedding", 1, 32)
    )
    top_t = cosine_topk(trunc(corpus), trunc(queries), k=5).select(
        "query_id", "vec_id"
    )
    exact = cosine_topk(corpus, queries, k=5).select("query_id", "vec_id")
    hits = top_t.join(exact, ["query_id", "vec_id"], "left_semi")
    return (
        top_t.groupBy("query_id")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("_ids"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_overlap")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.array_join(
                F.transform("_ids", lambda x: x.cast("string")), ","
            ).alias("trunc32_top5"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap_at_5"),
            (F.coalesce("n_overlap", F.lit(0)) * 20).alias("recall_pct"),
        )
        .orderBy("query_id")
    )


_Q314_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), st AS (
  SELECT query_id, vec_id,
         list_dot_product(qv[1:32], v[1:32]) /
           (sqrt(list_dot_product(qv[1:32], qv[1:32]))
            * sqrt(list_dot_product(v[1:32], v[1:32]))) AS cos
  FROM c CROSS JOIN q
), topt AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id) AS rank
    FROM st
  ) WHERE rank <= 5
), se AS (
  SELECT query_id, vec_id,
         list_dot_product(qv, v) /
           (sqrt(list_dot_product(qv, qv))
            * sqrt(list_dot_product(v, v))) AS cos
  FROM c CROSS JOIN q
), tope AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id) AS rank
    FROM se
  ) WHERE rank <= 5
), hits AS (
  SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM topt t JOIN tope e USING (query_id, vec_id)
  GROUP BY t.query_id
)
SELECT t.query_id,
       list_aggregate(list_sort(list(t.vec_id)), 'string_agg', ',')
         AS trunc32_top5,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap_at_5,
       CAST(coalesce(h.n_overlap, 0) * 20 AS BIGINT) AS recall_pct
FROM topt t LEFT JOIN hits h ON h.query_id = t.query_id
GROUP BY t.query_id, h.n_overlap
ORDER BY t.query_id
"""


def q315_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the embedding space: the k-occurrence
    distribution N_5(x) (how often each vector appears in OTHER
    vectors' cosine top-5) and its skewness — high-dimensional spaces
    grow 'hub' vectors that pollute every ANN result list, and this
    skew is the standard early-warning metric (Radovanović et al.,
    JMLR'10) a retrieval stack checks before trusting its index tiers
    (q27/q97/q113/q280/q314).

    Exactness: the top-5 graph uses the shared q22 left-to-right-fold
    cosine machinery (deterministic ordering, vec_id tiebreak);
    in-degrees are exact integers, the three skewness moments are
    exact BIGINTs, and g₁ = (n·Σd³ − 3·Σd·Σd² + 2·(Σd)³/n)/… is
    computed as one deterministic double chain over them.

    Shape note: hubness is a STATISTICAL property of the space, so the
    audit runs on a FIXED-SIZE deterministic sample — the k=256 rows
    with the smallest md5-slice hash of ('hub:' ‖ vec_id), the
    exact_k_sample draw (operators/sampling.py, oracle-paired via
    q94): ORDER BY hash LIMIT k plans as TakeOrderedAndProject
    (per-partition heaps, no global sort), and the self-join is then
    k²-bounded (≤ 65 536 pairs) NO MATTER the corpus size — a
    fixed-fraction draw would grow the pair stream quadratically with
    the data (the round-6 verdict's one scale defect, now fixed).
    Both engines draw the identical subset (same hash, same
    (h, vec_id) tiebreak); at 100 TB the same degree/skewness stages
    run off the IVF-pruned graph instead, unchanged.

    Output: one row — n sampled vectors, max/mean in-degree, the
    count of 'hubs' (N_5 ≥ 2·k), and the k-occurrence skewness."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn(
            "_h",
            F.expr(
                "CAST(conv(substr(md5(concat('hub:',"
                " CAST(vec_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            ),
        )
        .orderBy("_h", "vec_id")
        .limit(256)
    )
    a = emb.select("vec_id", F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    b = a.select(F.col("vec_id").alias("nbr_id"), F.col("v").alias("w"))
    dot = F.expr(
        "aggregate(zip_with(v, w, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    norm = lambda c: F.sqrt(
        F.expr(
            f"aggregate(transform({c}, x -> x * x), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        )
    )
    scored = (
        a.join(b, F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id",
            "nbr_id",
            (dot / (norm("v") * norm("w"))).alias("cos"),
        )
    )
    w5 = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "nbr_id")
    top5 = scored.withColumn("r", F.row_number().over(w5)).filter(
        F.col("r") <= 5
    )
    deg = (
        a.select(F.col("vec_id").alias("nbr_id"))
        .join(top5.groupBy("nbr_id").agg(F.count("*").alias("d")),
              "nbr_id", "left")
        .select(F.coalesce("d", F.lit(0)).alias("d"))
    )
    mom = deg.agg(
        F.count("*").alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("s2"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d * d")).alias("s3"),
        F.max("d").alias("max_deg"),
        F.sum(F.when(F.col("d") >= 10, 1).otherwise(0)).alias("n_hubs"),
    )
    skew = (
        "(CAST(n AS DOUBLE) * sqrt(CAST(n AS DOUBLE))"
        " * (CAST(s3 AS DOUBLE) - 3.0e0 * CAST(s1 AS DOUBLE) * s2"
        "    / CAST(n AS DOUBLE)"
        "    + 2.0e0 * CAST(s1 AS DOUBLE) * s1 * s1"
        "      / (CAST(n AS DOUBLE) * n)))"
        " / ((CAST(n AS DOUBLE) - 1.0e0)"
        "    * sqrt(CAST(n AS DOUBLE) - 1.0e0)"
        "    * pow_safe)"
    )
    return mom.select(
        "n",
        "max_deg",
        "n_hubs",
        F.round(F.expr("CAST(s1 AS DOUBLE) / n"), 4).alias("mean_deg"),
        F.round(
            F.expr(
                "CASE WHEN CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1"
                " / CAST(n AS DOUBLE) > 0 THEN "
                + skew.replace(
                    "pow_safe",
                    "((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1"
                    " / CAST(n AS DOUBLE))"
                    " * sqrt(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1"
                    "        / CAST(n AS DOUBLE)))",
                )
                + " ELSE CAST(NULL AS DOUBLE) END"
            ),
            4,
        ).alias("k_occurrence_skewness"),
    )


_Q315_SQL = """
WITH a AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  ORDER BY ('0x' || substr(md5('hub:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
           vec_id
  LIMIT 256
), scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM a JOIN a b ON a.vec_id <> b.vec_id
), top5 AS (
  SELECT nbr_id FROM (
    SELECT vec_id, nbr_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, nbr_id) AS r
    FROM scored
  ) WHERE r <= 5
), deg AS (
  SELECT coalesce(d.d, 0) AS d
  FROM a LEFT JOIN (
    SELECT nbr_id, CAST(count(*) AS BIGINT) AS d FROM top5 GROUP BY nbr_id
  ) d ON d.nbr_id = a.vec_id
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS s1,
         CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS s2,
         CAST(sum(CAST(d AS HUGEINT) * d * d) AS HUGEINT) AS s3,
         CAST(max(d) AS BIGINT) AS max_deg,
         CAST(sum(CASE WHEN d >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_hubs
  FROM deg
)
SELECT n, max_deg, n_hubs,
       round(CAST(s1 AS DOUBLE) / n, 4) AS mean_deg,
       round(CASE WHEN CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                       / CAST(n AS DOUBLE) > 0 THEN
         (CAST(n AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
          * (CAST(s3 AS DOUBLE) - 3.0e0 * CAST(s1 AS DOUBLE) * s2
             / CAST(n AS DOUBLE)
             + 2.0e0 * CAST(s1 AS DOUBLE) * s1 * s1
               / (CAST(n AS DOUBLE) * n)))
         / ((CAST(n AS DOUBLE) - 1.0e0)
            * sqrt(CAST(n AS DOUBLE) - 1.0e0)
            * ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                / CAST(n AS DOUBLE))
               * sqrt(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                      / CAST(n AS DOUBLE))))
       ELSE CAST(NULL AS DOUBLE) END, 4) AS k_occurrence_skewness
FROM mom
"""


def q317_ann_tier_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget recall@5 scoreboard across the quantization/
    truncation ladder — ONE row per ANN tier (int8/SQ8 q113, IVF
    nprobe-4/16 q146, 1-bit Hamming q280, MRL-32 truncation q314), so
    tier drift is a single driver-visible relation instead of four
    per-query audits a human has to eyeball (round-6 verdict task 7).
    Each arm composes the EXISTING audited tier query unchanged and
    reduces it to (tier, n_queries, hits_at_5, recall_ppm); recall_ppm
    is the exact integer (hits·10⁶) div (5·n_queries) — no float
    division, so the row is hash-stable.

    Shape at 100 TB: each arm is its own already-audited bounded plan
    (broadcast query sides, WindowGroupLimit top-5); the scoreboard
    adds four 1-row aggregates and a 4-row union."""

    def arm(df: DataFrame, tier: str, hits_col: str) -> DataFrame:
        return df.agg(
            F.lit(tier).alias("tier"),
            F.count("*").alias("n_queries"),
            F.sum(hits_col).cast("long").alias("hits_at_5"),
            F.expr(
                f"(CAST(sum({hits_col}) AS BIGINT) * 1000000)"
                " div (5 * count(*))"
            ).alias("recall_ppm"),
        ).select("tier", "n_queries", "hits_at_5", "recall_ppm")

    sq8 = arm(q113_sq8_search_recall(spark, sf_dir), "int8_sq8", "n_overlap_at_5")
    ivf = arm(q146_ivf_recall_audit(spark, sf_dir), "ivf_nprobe4", "n_overlap_at_5")
    ham = arm(q280_binary_hamming_recall(spark, sf_dir), "hamming_1bit", "n_hits")
    mrl = arm(q314_mrl_truncation_recall(spark, sf_dir), "mrl_trunc32", "n_overlap_at_5")
    return sq8.unionByName(ivf).unionByName(ham).unionByName(mrl).orderBy("tier")


def _q317_sql() -> str:
    def arm(sql: str, tier: str, hits_col: str) -> str:
        return f"""
SELECT '{tier}' AS tier,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum({hits_col}) AS BIGINT) AS hits_at_5,
       CAST((CAST(sum({hits_col}) AS BIGINT) * 1000000)
            // (5 * count(*)) AS BIGINT) AS recall_ppm
FROM ({sql}) {tier}_arm"""

    return (
        arm(_Q113_SQL, "int8_sq8", "n_overlap_at_5")
        + "\nUNION ALL\n"
        + arm(_q146_sql(), "ivf_nprobe4", "n_overlap_at_5")
        + "\nUNION ALL\n"
        + arm(_Q280_SQL, "hamming_1bit", "n_hits")
        + "\nUNION ALL\n"
        + arm(_Q314_SQL, "mrl_trunc32", "n_overlap_at_5")
        + "\nORDER BY tier"
    )


def q318_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 as a function of nprobe (1, 2, 4, 8, 16) for the
    hash-seeded IVF tier — the probe-budget curve an ANN operator
    publishes so capacity planning can pick the cheapest nprobe that
    clears the recall SLO (extends the single-point audits q146/q317
    to the whole sweep).

    ONE shared scoring pass, not five searches: the corpus is scored
    probe-all once (every query × every cell), reduced to the per-
    (query, cell) top-5 (≤ nq·nlist·5 rows — row_number windows), and
    every sweep point is then a filter cell_rank ≤ nprobe + top-5 over
    that bounded relation; ground truth (probe-all = brute force) falls
    out of the same relation. recall_ppm is the exact integer
    (hits·10⁶) div (5·n_queries).

    Shape at 100 TB: the one probe-all scoring pass dominates and is
    shared across all five sweep points (a naive sweep re-scans the
    corpus per nprobe); everything after runs on nq·nlist·5 rows.
    Engine-portable ordering: the identical left-to-right double dot
    chains as q22/q56, vec_id/cell tiebreaks everywhere."""
    from ..operators.similarity import (
        _as_double,
        _assign_cells,
        _dot,
        _norm,
        _unit_mat,
        hash_seed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = hash_seed_centroids(corpus, nlist=16)
    assigned = _assign_cells(corpus, cents, "embedding", "vec_id").select(
        "vec_id",
        "cell",
        _as_double("embedding").alias("_vd"),
    ).withColumn("_vn", _norm(F.col("_vd")))

    # every cell ranked per query: sim DESC, cell DESC (the ivf_search
    # reverse(array_sort) tiebreak), rank = position in the sorted array
    qscored = F.transform(
        _unit_mat(cents),
        lambda cv, i: F.struct(
            _dot(F.col("_qv"), cv).alias("sim"), i.alias("cell")
        ),
    )
    ranked = F.transform(
        F.reverse(F.array_sort(qscored)),
        lambda s, i: F.struct(
            s["cell"].alias("cell"), (i + 1).alias("cell_rank")
        ),
    )
    qcells = (
        queries.select("query_id", _as_double("embedding").alias("_qv"))
        .withColumn("_qn", _norm(F.col("_qv")))
        .withColumn("_rc", F.explode(ranked))
        .select(
            "query_id", "_qv", "_qn",
            F.col("_rc.cell").alias("cell"),
            F.col("_rc.cell_rank").alias("cell_rank"),
        )
    )
    scored = assigned.join(F.broadcast(qcells), "cell").select(
        "query_id",
        "cell_rank",
        "vec_id",
        (_dot(F.col("_qv"), F.col("_vd")) / (F.col("_qn") * F.col("_vn"))).alias(
            "cos"
        ),
    )
    wc = W.partitionBy("query_id", "cell_rank").orderBy(
        F.col("cos").desc(), "vec_id"
    )
    cell_top = (
        scored.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "cell_rank", "vec_id", "cos")
        .localCheckpoint(eager=True)  # ≤ nq·nlist·5 rows, fanned into
        # the brute branch and all five sweep points (pinning convention)
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    brute = (
        cell_top.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= 5)
        .select("query_id", F.col("vec_id").alias("bvec"))
    )
    sweep = cell_top.crossJoin(
        F.broadcast(
            spark.createDataFrame([(1,), (2,), (4,), (8,), (16,)], "nprobe int")
        )
    ).filter(F.col("cell_rank") <= F.col("nprobe"))
    wn = W.partitionBy("nprobe", "query_id").orderBy(
        F.col("cos").desc(), "vec_id"
    )
    topk = (
        sweep.withColumn("_r", F.row_number().over(wn))
        .filter(F.col("_r") <= 5)
        .select("nprobe", "query_id", "vec_id")
    )
    hits = topk.join(
        brute,
        (topk.query_id == brute.query_id) & (topk.vec_id == brute.bvec),
        "left_semi",
    )
    nq = queries.agg(F.count("*").alias("n_queries"))
    return (
        hits.groupBy("nprobe")
        .agg(F.count("*").alias("hits_at_5"))
        .crossJoin(F.broadcast(nq))
        .select(
            "nprobe",
            "n_queries",
            "hits_at_5",
            F.expr("(hits_at_5 * 1000000) div (5 * n_queries)").alias(
                "recall_ppm"
            ),
        )
        .orderBy("nprobe")
    )


_Q318_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS cell,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), cents AS (
  SELECT cell,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS u
  FROM seeds
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT c.vec_id, c.v, cents.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, cents.u) DESC, cents.cell ASC
           ) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), qcells AS (
  SELECT q.query_id, q.qv, cents.cell,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.qv, cents.u) DESC, cents.cell DESC
         ) AS cell_rank
  FROM q CROSS JOIN cents
), scored AS (
  SELECT p.query_id, p.cell_rank, a.vec_id,
         list_dot_product(p.qv, a.v) /
           (sqrt(list_dot_product(p.qv, p.qv))
            * sqrt(list_dot_product(a.v, a.v))) AS cos
  FROM qcells p JOIN assigned a USING (cell)
), cell_top AS (
  SELECT query_id, cell_rank, vec_id, cos FROM (
    SELECT query_id, cell_rank, vec_id, cos,
           row_number() OVER (
             PARTITION BY query_id, cell_rank
             ORDER BY cos DESC, vec_id
           ) AS rn
    FROM scored
  ) WHERE rn <= 5
), brute AS (
  SELECT query_id, vec_id AS bvec FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, vec_id
           ) AS r
    FROM cell_top
  ) WHERE r <= 5
), topk AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT np.nprobe, t.query_id, t.vec_id,
           row_number() OVER (
             PARTITION BY np.nprobe, t.query_id
             ORDER BY t.cos DESC, t.vec_id
           ) AS r
    FROM cell_top t
    CROSS JOIN (VALUES (1), (2), (4), (8), (16)) np(nprobe)
    WHERE t.cell_rank <= np.nprobe
  ) WHERE r <= 5
), hits AS (
  SELECT k.nprobe, count(*) AS hits_at_5
  FROM topk k
  WHERE EXISTS (
    SELECT 1 FROM brute b
    WHERE b.query_id = k.query_id AND b.bvec = k.vec_id
  )
  GROUP BY k.nprobe
), nq AS (
  SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q
)
SELECT CAST(h.nprobe AS INT) AS nprobe, nq.n_queries,
       CAST(h.hits_at_5 AS BIGINT) AS hits_at_5,
       CAST((h.hits_at_5 * 1000000) // (5 * nq.n_queries) AS BIGINT)
         AS recall_ppm
FROM hits h CROSS JOIN nq
ORDER BY nprobe
"""


def q319_source_tvd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT total variation distance between every source pair's
    doc-length distributions — the drift metric that bounds how much
    ANY event's probability can differ between two sources, completing
    the divergence suite (JS q211, PSI q192, Wasserstein q250, KS
    q309) with the only member that is exact in pure integers:
    TVD = ½·Σ_v |p₁(v) − p₂(v)|.

    Inner-join-plus-totals algebra (no full-outer join, no dense value
    grid): with counts c₁,c₂ and totals N₁,N₂,
    Σ_v |c₁N₂ − c₂N₁| = 2·N₁N₂ + Σ_{v∈common}(|c₁N₂−c₂N₁| − c₁N₂ − c₂N₁)
    because one-sided values contribute their full cN mass — so ONE
    inner join on the value domain suffices and tvd_ppm =
    (num·10⁶) div (2·N₁N₂) is exact end to end.

    Magnitude audit: c·N ~ N² wraps BIGINT at N ≈ 3e9 docs — the cross
    products accumulate in DECIMAL(38,0)/HUGEINT (the q233 rule).

    Shape at 100 TB: one grouped corpus pass to the (source, length)
    count table (|sources|·|lengths| rows, corpus-independent); the
    pair join runs entirely on that bounded relation. Emits pairs with
    ≥1 common length (a fully disjoint pair — TVD exactly 1 — has no
    join row; n_common_lengths makes the support explicit)."""
    from ..operators.incremental import tvd_matrix

    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy(
        F.col("source"), F.length("text").alias("v")
    ).agg(F.count("*").alias("c"))
    return tvd_matrix(cnt).select(
        F.col("grp_a").alias("src_a"),
        F.col("grp_b").alias("src_b"),
        "n_a",
        "n_b",
        F.col("n_common_values").alias("n_common_lengths"),
        "tvd_ppm",
    )


_Q319_SQL = """
WITH cnt AS (
  SELECT source, length(text) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
), sides AS (
  SELECT cnt.source, cnt.v, cnt.c, tot.n
  FROM cnt JOIN tot USING (source)
), common AS (
  SELECT a.source AS src_a, b.source AS src_b,
         max(a.n) AS n_a, max(b.n) AS n_b,
         sum(abs(CAST(a.c AS HUGEINT) * b.n - CAST(b.c AS HUGEINT) * a.n)
             - CAST(a.c AS HUGEINT) * b.n
             - CAST(b.c AS HUGEINT) * a.n) AS adj,
         CAST(count(*) AS BIGINT) AS n_common_lengths
  FROM sides a JOIN sides b ON a.v = b.v AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_a, n_b, n_common_lengths,
       CAST((2 * CAST(n_a AS HUGEINT) * n_b + adj) * 1000000
            // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS tvd_ppm
FROM common
ORDER BY src_a, src_b
"""


def q320_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED false-positive rate of the q96 Bloom filter against
    exact ground truth — the audit that turns the filter's theoretical
    FPR into a monitored number (the sketch-audit pattern of q302/q106
    applied to the novelty gate): build the same m=2¹⁶, j=4 salted
    md5-slice filter over the even-doc corpus, probe it with the odd
    docs, and score every probe against the exact hash anti-join.

    All-integer output: delta size, bloom positives, true duplicates,
    false positives, set-bit occupancy, and fpr_ppm = (fp·10⁶) div
    (truly-novel count) — no float in any value. The filter's
    no-false-negative invariant is asserted structurally: a true dup
    that bloom calls absent would make n_missed > 0 (pytest pins 0).

    Shape at 100 TB: the filter build is the q96 shape (bit_or partials
    bounded at m/64 longs per map task); the audit probes by JOINING
    delta positions to the broadcast bloom-sized word table — per-doc
    j rows, map-side — and the truth join touches only content hashes."""
    from ..operators.dedup import _h32

    m_bits, j_hashes = 1 << 16, 4
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    ch = F.md5(F.col("text"))

    def pos(i: int):
        return F.pmod(
            _h32(F.concat(F.lit(f"bloom{i}:"), ch)), F.lit(m_bits)
        )

    def wb(p):
        # 32-bit words (word = p>>5, bit = 1 << p%32): the max shift is
        # 31, so the bit mask never reaches a BIGINT sign bit — DuckDB
        # raises on 1::BIGINT << 63, Spark wraps silently; 32-bit words
        # keep the replay portable with identical semantics.
        return F.struct(
            F.shiftright(p, 5).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                F.pmod(p, F.lit(32)).cast("int"),
            ).alias("bit"),
        )

    words = (
        corpus.select(
            F.explode(F.array(*[wb(pos(i)) for i in range(j_hashes)])).alias("p")
        )
        .select(F.col("p.word").alias("word"), F.col("p.bit").alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    probes = delta.select(
        "doc_id",
        ch.alias("_ch"),
        F.explode(F.array(*[wb(pos(i)) for i in range(j_hashes)])).alias("p"),
    ).select("doc_id", "_ch", F.col("p.word").alias("word"), F.col("p.bit").alias("bit"))
    checked = (
        probes.join(F.broadcast(words), "word", "left")
        .groupBy("doc_id", "_ch")
        .agg(
            F.min(
                (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0)
                .cast("int")
            ).alias("positive")
        )
    )
    corpus_hashes = corpus.select(ch.alias("_ch")).distinct()
    scored = checked.join(
        corpus_hashes.withColumn("_dup", F.lit(1)), "_ch", "left"
    ).select(
        "positive", F.coalesce("_dup", F.lit(0)).alias("dup")
    )
    occupancy = words.agg(
        F.sum(F.bit_count("bits")).alias("bits_set")
    )
    return (
        scored.agg(
            F.count("*").alias("n_delta"),
            F.sum("positive").alias("n_bloom_positive"),
            F.sum("dup").alias("n_true_dup"),
            F.sum(F.expr("positive * (1 - dup)")).alias("n_false_positive"),
            F.sum(F.expr("(1 - positive) * dup")).alias("n_missed"),
        )
        .crossJoin(F.broadcast(occupancy))
        .select(
            "n_delta",
            "n_bloom_positive",
            "n_true_dup",
            "n_false_positive",
            "n_missed",
            "bits_set",
            F.expr(f"(bits_set * 1000000) div {m_bits}").alias("occupancy_ppm"),
            F.expr(
                "CASE WHEN n_delta - n_true_dup > 0 THEN"
                " (n_false_positive * 1000000) div (n_delta - n_true_dup)"
                " ELSE CAST(NULL AS BIGINT) END"
            ).alias("fpr_ppm"),
        )
    )


_Q320_SQL = """
WITH corpus AS (
  SELECT md5(text) AS ch FROM documents WHERE doc_id % 2 = 0
), delta AS (
  SELECT doc_id, md5(text) AS ch FROM documents WHERE doc_id % 2 = 1
), cpos AS (
  SELECT ('0x' || substr(md5('bloom' || i || ':' || ch), 1, 8))::BIGINT
           % 65536 AS p
  FROM corpus CROSS JOIN (VALUES (0), (1), (2), (3)) h(i)
), words AS (
  SELECT CAST(p // 32 AS INT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM cpos GROUP BY 1
), dpos AS (
  SELECT doc_id, ch,
         ('0x' || substr(md5('bloom' || i || ':' || ch), 1, 8))::BIGINT
           % 65536 AS p
  FROM delta CROSS JOIN (VALUES (0), (1), (2), (3)) h(i)
), checked AS (
  SELECT d.doc_id, d.ch,
         min(CASE WHEN coalesce(w.bits, 0)
                       & (CAST(1 AS BIGINT) << CAST(d.p % 32 AS INT)) <> 0
             THEN 1 ELSE 0 END) AS positive
  FROM dpos d
  LEFT JOIN words w ON w.word = CAST(d.p // 32 AS INT)
  GROUP BY 1, 2
), scored AS (
  SELECT c.positive,
         CASE WHEN EXISTS (SELECT 1 FROM corpus k WHERE k.ch = c.ch)
              THEN 1 ELSE 0 END AS dup
  FROM checked c
), occ AS (
  SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set FROM words
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_delta,
         CAST(sum(positive) AS BIGINT) AS n_bloom_positive,
         CAST(sum(dup) AS BIGINT) AS n_true_dup,
         CAST(sum(positive * (1 - dup)) AS BIGINT) AS n_false_positive,
         CAST(sum((1 - positive) * dup) AS BIGINT) AS n_missed
  FROM scored
)
SELECT n_delta, n_bloom_positive, n_true_dup, n_false_positive, n_missed,
       occ.bits_set,
       CAST((occ.bits_set * 1000000) // 65536 AS BIGINT) AS occupancy_ppm,
       CAST(CASE WHEN n_delta - n_true_dup > 0 THEN
              (n_false_positive * 1000000) // (n_delta - n_true_dup)
            ELSE NULL END AS BIGINT) AS fpr_ppm
FROM agg CROSS JOIN occ
"""


def q326_vocab_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-occurrence coverage of a top-K vocabulary for K in (10,
    100, 1000, 65536) — the tokenizer-budget planning curve (how big
    must the vocab be to cover X% of the stream?), completing the
    fixed-vocab coverage check (q206) and the fertility economics
    (q284) with the whole budget sweep.

    Count-table-of-counts idiom (the q41/q311 order-statistic
    discipline — NO global sort/window over the vocabulary, which at
    100 TB is ~10⁸ tokens): for each K the top-K token set is a COUNT
    THRESHOLD c* on the (count, n_tokens) spectrum plus a tie slice —
    covered = Σ_{c>c*} c·n_c + (K − n_above)·c*, all exact BIGINTs off
    the |distinct counts|-bounded spectrum; coverage_ppm is an exact
    integer division.

    Shape at 100 TB: one token-count pass (map-side combine), one
    spectrum rollup (|distinct counts| rows — thousands, not 10⁸),
    windows and the 4-point sweep on that bounded relation."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split(F.lower("text"), "\\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    spec = cnt.groupBy("c").agg(F.count("*").alias("nc"))
    w = W.orderBy(F.col("c").desc()).rowsBetween(W.unboundedPreceding, -1)
    cum = spec.select(
        "c",
        "nc",
        F.coalesce(F.sum("nc").over(w), F.lit(0)).alias("keys_above"),
        F.coalesce(
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * nc")).over(w),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("tokens_above"),
    )
    tot = spec.agg(
        F.sum("nc").alias("v_total"),
        F.expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * nc) AS DECIMAL(38,0))")
        .alias("n_total"),
    )
    ks = spark.createDataFrame(
        [(10,), (100,), (1000,), (65536,)], "k int"
    )
    # per K: the threshold row is the spectrum value whose cumulative
    # key count first reaches K (keys_above < K ≤ keys_above + nc)
    hit = (
        cum.crossJoin(F.broadcast(ks))
        .filter(
            (F.col("keys_above") < F.col("k"))
            & (F.col("k") <= F.col("keys_above") + F.col("nc"))
        )
        .select(
            "k",
            (
                F.col("tokens_above")
                + (F.col("k") - F.col("keys_above"))
                * F.expr("CAST(c AS DECIMAL(38,0))")
            ).alias("covered"),
        )
    )
    # K beyond the whole vocabulary covers everything
    full = (
        ks.crossJoin(F.broadcast(tot))
        .filter(F.col("k") > F.col("v_total"))
        .select("k", F.col("n_total").alias("covered"))
    )
    return (
        hit.unionByName(full)
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.expr("CAST(least(CAST(k AS BIGINT), v_total) AS BIGINT)").alias(
                "vocab_used"
            ),
            F.col("covered").cast("long").alias("covered_tokens"),
            F.col("n_total").cast("long").alias("n_tokens"),
            F.expr("CAST((covered * 1000000) div n_total AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("k")
    )


_Q326_SQL = """
WITH cnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY tok
), spec AS (
  SELECT c, CAST(count(*) AS BIGINT) AS nc FROM cnt GROUP BY c
), cum AS (
  SELECT c, nc,
         coalesce(sum(nc) OVER (ORDER BY c DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS keys_above,
         coalesce(sum(CAST(c AS HUGEINT) * nc) OVER (ORDER BY c DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(0 AS HUGEINT)) AS tokens_above
  FROM spec
), tot AS (
  SELECT CAST(sum(nc) AS BIGINT) AS v_total,
         CAST(sum(CAST(c AS HUGEINT) * nc) AS HUGEINT) AS n_total
  FROM spec
), ks AS (
  SELECT CAST(k AS INT) AS k FROM (VALUES (10), (100), (1000), (65536)) v(k)
), hit AS (
  SELECT ks.k,
         cum.tokens_above + (ks.k - cum.keys_above) * CAST(cum.c AS HUGEINT)
           AS covered
  FROM cum CROSS JOIN ks
  WHERE cum.keys_above < ks.k AND ks.k <= cum.keys_above + cum.nc
), funion AS (
  SELECT k, covered FROM hit
  UNION ALL
  SELECT ks.k, tot.n_total AS covered
  FROM ks CROSS JOIN tot WHERE ks.k > tot.v_total
)
SELECT f.k,
       CAST(least(CAST(f.k AS BIGINT), tot.v_total) AS BIGINT) AS vocab_used,
       CAST(f.covered AS BIGINT) AS covered_tokens,
       CAST(tot.n_total AS BIGINT) AS n_tokens,
       CAST((f.covered * 1000000) // tot.n_total AS BIGINT) AS coverage_ppm
FROM funion f CROSS JOIN tot
ORDER BY f.k
"""


def q327_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace quantization distortion (SSE/MSE) of the q97 PQ
    tier — the compression-quality audit that pairs with the recall
    audits (q317/q318 measure retrieval loss; this measures GEOMETRY
    loss, the number a codebook-size decision is actually made on):
    for each of the 4 subspaces, the squared reconstruction error
    ‖v_j − codeword(code_j)‖² summed over the corpus.

    Float parity: each row×subspace SED is ONE deterministic chain
    (per-element exact double differences → the shared left-to-right
    dot fold, the q22/q97 seam) NANO-FLOORED per row BEFORE the
    cross-row sum (q122 rule: cross-row float sums are
    order-dependent; quantize first). sse_nano accumulates in
    DECIMAL(38,0)/HUGEINT and ships as a STRING (q78 rule); mse_nano
    is an exact integer division.

    Shape at 100 TB: encode is the q97 narrow projection (zero joins,
    zero shuffle — codebooks are driver literals); the audit adds one
    4-row grouped aggregate with map-side combine."""
    from ..operators.similarity import _as_double, _dot, pq_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    books = pq_codebooks(corpus, n_sub=4, n_codes=16)
    d = len(books[0][0])
    enc = pq_encode(corpus, books).withColumn("_vd", _as_double("embedding"))
    # all 4 subspace errors in ONE projection (a per-j union would
    # re-run the encode scan 4x), exploded to (j, sed_nano) rows
    cells = []
    for j, book in enumerate(books):
        sub = F.slice("_vd", j * d + 1, d)
        cw = F.element_at(F.lit(book), F.col(f"code_{j}") + 1)
        diff = F.zip_with(sub, cw, lambda x, y: x - y)
        cells.append(
            F.struct(
                F.lit(j).alias("j"),
                F.floor(_dot(diff, diff) * F.lit(1e9))
                .cast("long")
                .alias("sed_nano"),
            )
        )
    per = enc.select(F.explode(F.array(*cells)).alias("s")).select(
        F.col("s.j").alias("j"), F.col("s.sed_nano").alias("sed_nano")
    )
    return (
        per.groupBy("j")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.expr("CAST(sed_nano AS DECIMAL(38,0))")).alias("_sse"),
        )
        .select(
            "j",
            "n_vecs",
            F.expr("CAST(_sse AS STRING)").alias("sse_nano"),
            F.expr("CAST(_sse div n_vecs AS BIGINT)").alias("mse_nano"),
        )
        .orderBy("j")
    )


_Q327_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS code,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), books AS (
  SELECT s.code, t.j, list_slice(s.cv, t.j*16 + 1, t.j*16 + 16) AS cw
  FROM seeds s CROSS JOIN range(4) t(j)
), enc AS (
  SELECT vec_id, j, code, sub FROM (
    SELECT c.vec_id, b.j, b.code,
           list_slice(c.v, b.j*16 + 1, b.j*16 + 16) AS sub,
           row_number() OVER (
             PARTITION BY c.vec_id, b.j
             ORDER BY list_dot_product(list_slice(c.v, b.j*16 + 1, b.j*16 + 16), b.cw)
                      - 0.5 * list_dot_product(b.cw, b.cw) DESC,
                      b.code ASC
           ) AS rn
    FROM c CROSS JOIN books b
  ) WHERE rn = 1
), sed AS (
  SELECT e.j,
         CAST(floor(list_dot_product(
           list_transform(range(1, 17), i -> e.sub[i] - b.cw[i]),
           list_transform(range(1, 17), i -> e.sub[i] - b.cw[i])
         ) * 1e9) AS BIGINT) AS sed_nano
  FROM enc e JOIN books b ON b.j = e.j AND b.code = e.code
)
SELECT j, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(sed_nano AS HUGEINT)) AS VARCHAR) AS sse_nano,
       CAST(sum(CAST(sed_nano AS HUGEINT)) // count(*) AS BIGINT) AS mse_nano
FROM sed
GROUP BY j
ORDER BY j
"""


def q328_minhash_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator accuracy audit — the sketch-audit pattern
    (q259 CMS, q302 HLL, q320 Bloom) applied to the q25 dedup tier:
    over every LSH candidate pair, compare the SIGNATURE-estimated
    Jaccard (matching slots / k) against the exact shingle Jaccard the
    verify stage computes anyway, and report the error distribution
    plus the threshold confusion (would a signature-only decision at
    0.5 disagree with exact verification?). This is the measurement
    that justifies — or vetoes — skipping the exact-verify join at
    100 TB.

    Exactness: every number is integer — per pair, the error
    |m·U − I·k| ·10⁶ div (k·U) is an exact cross-multiplied rational
    floor (est − true = (mU − Ik)/(kU)), and the 0.5-threshold calls
    are the cross-multiplied compares 2m ≥ k and 2I ≥ U (never float
    division, the q118 rule).

    Shape at 100 TB: the candidate relation and signatures are the
    audited q25 shapes (capped band buckets, one exchange); the audit
    adds two doc-keyed signature joins on the candidate-bounded
    relation and a 1-row reduction."""
    from ..operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.0).select(
        "doc_a", "doc_b", "inter", "na", "nb"
    )
    sig = minhash_signatures(docs)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb"))
    scored = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "inter",
            "na",
            "nb",
            F.size(
                F.filter(
                    F.zip_with("_sa", "_sb", lambda x, y: x == y),
                    lambda b: b,
                )
            ).cast("long").alias("m"),
            (F.col("na") + F.col("nb") - F.col("inter")).alias("u"),
        )
        .select(
            "m",
            "inter",
            "u",
            F.expr(
                "(abs(m * u - inter * 64) * 1000000) div (64 * u)"
            ).alias("err_ppm"),
            (F.lit(2) * F.col("m") >= F.lit(64)).cast("long").alias("est_pos"),
            (F.lit(2) * F.col("inter") >= F.col("u")).cast("long").alias(
                "true_pos"
            ),
        )
    )
    return scored.agg(
        F.count("*").alias("n_pairs"),
        F.expr("sum(err_ppm) div count(*)").alias("mean_err_ppm"),
        F.max("err_ppm").alias("max_err_ppm"),
        F.sum("est_pos").alias("n_est_pos"),
        F.sum("true_pos").alias("n_true_pos"),
        F.sum(F.expr("est_pos * (1 - true_pos)")).alias("n_false_pos"),
        F.sum(F.expr("(1 - est_pos) * true_pos")).alias("n_false_neg"),
    )


def _q328_sql() -> str:
    from ..operators.dedup import _MERSENNE, _hash_params

    params = ",\n    ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_hash_params(64))
    )
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh_raw AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM w
), hs AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh_raw
), params(i, a, b) AS (VALUES
    {params}
), sig AS (
  SELECT doc_id, p.i, min((p.a * h + p.b) % {_MERSENNE}) AS s
  FROM hs CROSS JOIN params p GROUP BY doc_id, p.i
), banded AS (
  SELECT doc_id, i // 4 AS band, string_agg(s::VARCHAR, ',' ORDER BY i) AS bh
  FROM sig GROUP BY doc_id, i // 4
), ok AS (
  SELECT band, bh FROM banded GROUP BY band, bh
  HAVING count(*) BETWEEN 2 AND 1000
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
), sh AS (
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle NOT IN (
    SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) > 1000
  )
), sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh_raw GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
), matches AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
  GROUP BY 1, 2
), scored AS (
  SELECT mt.m, i.inter,
         sa.n_shingles + sb.n_shingles - i.inter AS u
  FROM inter i
  JOIN matches mt ON mt.doc_a = i.doc_a AND mt.doc_b = i.doc_b
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
), errs AS (
  SELECT m, inter, u,
         (abs(m * u - inter * 64) * 1000000) // (64 * u) AS err_ppm,
         CASE WHEN 2 * m >= 64 THEN 1 ELSE 0 END AS est_pos,
         CASE WHEN 2 * inter >= u THEN 1 ELSE 0 END AS true_pos
  FROM scored
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(err_ppm) // count(*) AS BIGINT) AS mean_err_ppm,
       CAST(max(err_ppm) AS BIGINT) AS max_err_ppm,
       CAST(sum(est_pos) AS BIGINT) AS n_est_pos,
       CAST(sum(true_pos) AS BIGINT) AS n_true_pos,
       CAST(sum(est_pos * (1 - true_pos)) AS BIGINT) AS n_false_pos,
       CAST(sum((1 - est_pos) * true_pos) AS BIGINT) AS n_false_neg
FROM errs
"""


def q329_source_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source doc-length percentiles (p25/p50/p90/p99) — the
    datasheet companion (q119 records volumes and language mix; this
    records the length SHAPE per source, the first thing a context-
    window/packing decision reads). True order statistics: the p-th
    lower percentile is the smallest length whose cumulative count
    reaches ceil(p·n/100) — never an interpolated approximation.

    Shape at 100 TB: the grouped-count-table idiom (q41/q311) — one
    corpus pass to the (source, length) count table, per-source
    cumulative windows on that bounded relation (|sources|·|lengths|
    rows, corpus-independent), each percentile one conditional min.
    No per-group sort of raw rows anywhere; ceil via the exact
    (p·n + 99) div 100 integer identity."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy(
        "source", F.length("text").alias("v")
    ).agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n_docs"))
    w = W.partitionBy("source").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = cnt.select("source", "v", F.sum("c").over(w).alias("cum")).join(
        tot, "source"
    )

    def pct(p: int):
        return F.min(
            F.when(
                F.col("cum") >= F.expr(f"({p} * n_docs + 99) div 100"),
                F.col("v"),
            )
        ).alias(f"p{p}")

    return (
        cum.groupBy("source")
        .agg(F.max("n_docs").alias("n_docs"), pct(25), pct(50), pct(90), pct(99))
        .orderBy("source")
    )


_Q329_SQL = """
WITH cnt AS (
  SELECT source, length(text) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs FROM cnt GROUP BY source
), cum AS (
  SELECT cnt.source, cnt.v,
         sum(cnt.c) OVER (PARTITION BY cnt.source ORDER BY cnt.v
             ROWS UNBOUNDED PRECEDING) AS cum,
         tot.n_docs
  FROM cnt JOIN tot USING (source)
)
SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN cum >= (25 * n_docs + 99) // 100 THEN v END)
            AS BIGINT) AS p25,
       CAST(min(CASE WHEN cum >= (50 * n_docs + 99) // 100 THEN v END)
            AS BIGINT) AS p50,
       CAST(min(CASE WHEN cum >= (90 * n_docs + 99) // 100 THEN v END)
            AS BIGINT) AS p90,
       CAST(min(CASE WHEN cum >= (99 * n_docs + 99) // 100 THEN v END)
            AS BIGINT) AS p99
FROM cum
GROUP BY source
ORDER BY source
"""


def q330_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy balance audit — the ANN-serving counterpart
    of the join-skew audit (q325): per-cell row counts for the q56
    hash-seeded 16-cell index, the imbalance factor (max cell over
    mean), and the share of the corpus in the largest cell. A skewed
    cell is a skewed probe: nprobe budgeting (q318) assumes cells are
    comparable, and this is the number that says whether they are.

    Exactness: all integers off one assignment pass — imbalance_milli
    = (max·nlist·1000) div n, top shares in ppm; the empty-cell count
    comes from the nlist constant minus cells hit (cells with zero
    rows never appear in the grouped relation).

    Shape at 100 TB: _assign_cells is a narrow argmax projection (zero
    joins/shuffle); the audit adds one 16-row grouped aggregate with
    map-side combine and a 1-row reduction."""
    from ..operators.similarity import _assign_cells, hash_seed_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = hash_seed_centroids(corpus, nlist=16)
    cells = (
        _assign_cells(corpus, cents, "embedding", "vec_id")
        .groupBy("cell")
        .agg(F.count("*").alias("m"))
    )
    return cells.agg(
        F.sum("m").alias("n_vecs"),
        F.count("*").alias("n_cells_hit"),
        (F.lit(16) - F.count("*")).alias("n_cells_empty"),
        F.max("m").alias("max_cell_rows"),
        F.min("m").alias("min_cell_rows"),
        F.expr("(max(m) * 16 * 1000) div sum(m)").alias("imbalance_milli"),
        F.expr("(max(m) * 1000000) div sum(m)").alias("top_cell_ppm"),
    )


_Q330_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS cell,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), cents AS (
  SELECT cell,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS u
  FROM seeds
), assigned AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, cents.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, cents.u) DESC, cents.cell ASC
           ) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
), cells AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS m FROM assigned GROUP BY cell
)
SELECT CAST(sum(m) AS BIGINT) AS n_vecs,
       CAST(count(*) AS BIGINT) AS n_cells_hit,
       CAST(16 - count(*) AS BIGINT) AS n_cells_empty,
       CAST(max(m) AS BIGINT) AS max_cell_rows,
       CAST(min(m) AS BIGINT) AS min_cell_rows,
       CAST((max(m) * 16 * 1000) // sum(m) AS BIGINT) AS imbalance_milli,
       CAST((max(m) * 1000000) // sum(m) AS BIGINT) AS top_cell_ppm
FROM cells
"""


def q331_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent fit V = K·N^β over the global 4-prefix
    vocabulary-growth curve (q157's nested hash prefixes, unkeyed) —
    the scaling-law number itself: β ≈ 0.5 is healthy natural text,
    β → 0 means the tail is template/duplicate mass, and the fit is
    what extrapolates tokenizer-vocabulary needs to the full corpus
    (the q326 budget curve's forward projection).

    Exactness: the four (N_p, V_p) points are exact integers; each log
    is the correctly-rounded ln (the only accepted float seam class)
    NANO-FLOORED per point BEFORE any cross-point sum, so the OLS
    moments are exact integers and beta_micro =
    ((nΣxy − ΣxΣy)·10⁶) div (nΣxx − (Σx)²) is a sign-split exact
    division (DECIMAL/HUGEINT — Σxy ~ (25e9)² · 4).

    Shape at 100 TB: the q157 shape — one word-stream shuffle into the
    (word, first-bucket) aggregate, everything after bounded by 4."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10)"
    ).cast("long")
    base = docs.select(
        (h % 4).alias("bucket"),
        F.filter(
            F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
        ).alias("_w"),
    )
    toks = (
        base.groupBy("bucket")
        .agg(F.sum(F.size("_w")).alias("t"))
        .select(F.explode(F.sequence(F.col("bucket") + 1, F.lit(4))).alias("p"), "t")
        .groupBy("p")
        .agg(F.sum("t").alias("n_tokens"))
    )
    vocab = (
        base.select("bucket", F.explode("_w").alias("word"))
        .groupBy("word")
        .agg(F.min("bucket").alias("b0"))
        .select(F.explode(F.sequence(F.col("b0") + 1, F.lit(4))).alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("vocab"))
    )
    pts = (
        toks.join(vocab, "p")
        .filter((F.col("n_tokens") > 0) & (F.col("vocab") > 0))
        .select(
            F.expr("CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT)")
            .alias("x"),
            F.expr("CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1e9) AS BIGINT)")
            .alias("y"),
            "n_tokens",
            "vocab",
            "p",
        )
    )
    mom = pts.agg(
        F.count("*").alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.max(F.when(F.col("p") == 4, F.col("n_tokens"))).alias("n_tokens_full"),
        F.max(F.when(F.col("p") == 4, F.col("vocab"))).alias("vocab_full"),
    )
    num = (
        "(CAST(n_points AS DECIMAL(38,0)) * sxy"
        " - CAST(sx AS DECIMAL(38,0)) * sy)"
    )
    den = (
        "(CAST(n_points AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx)"
    )
    return mom.select(
        "n_points",
        "n_tokens_full",
        "vocab_full",
        F.expr(
            f"CASE WHEN {den} = 0 THEN CAST(NULL AS BIGINT)"
            f" WHEN {num} >= 0 THEN CAST(({num} * 1000000) div {den} AS BIGINT)"
            f" ELSE CAST(-((-({num}) * 1000000) div {den}) AS BIGINT) END"
        ).alias("beta_micro"),
    )


_Q331_SQL = """
WITH base AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
           AS bucket,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
), toks AS (
  SELECT p, CAST(sum(t) AS BIGINT) AS n_tokens FROM (
    SELECT unnest(range(bucket + 1, 5)) AS p, t FROM (
      SELECT bucket, CAST(sum(len(w)) AS BIGINT) AS t FROM base GROUP BY bucket
    )
  ) GROUP BY p
), vocab AS (
  SELECT p, CAST(count(*) AS BIGINT) AS vocab FROM (
    SELECT unnest(range(b0 + 1, 5)) AS p FROM (
      SELECT word, min(bucket) AS b0 FROM (
        SELECT bucket, unnest(w) AS word FROM base
      ) GROUP BY word
    )
  ) GROUP BY p
), pts AS (
  SELECT CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT) AS x,
         CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1e9) AS BIGINT) AS y,
         n_tokens, vocab, p
  FROM toks JOIN vocab USING (p)
  WHERE n_tokens > 0 AND vocab > 0
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_points,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(max(CASE WHEN p = 4 THEN n_tokens END) AS BIGINT)
           AS n_tokens_full,
         CAST(max(CASE WHEN p = 4 THEN vocab END) AS BIGINT) AS vocab_full
  FROM pts
)
SELECT n_points, n_tokens_full, vocab_full,
       CAST(CASE WHEN CAST(n_points AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
            WHEN CAST(n_points AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                 >= 0 THEN
              ((CAST(n_points AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
               * 1000000)
              // (CAST(n_points AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
            ELSE
              -(((CAST(sx AS HUGEINT) * sy - CAST(n_points AS HUGEINT) * sxy)
                 * 1000000)
                // (CAST(n_points AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx))
            END AS BIGINT) AS beta_micro
FROM mom
"""


def q332_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test — do the sources share a common median doc
    length? The coarsest, most robust k-sample location test,
    completing the suite (Kruskal-Wallis q234 uses full ranks,
    Friedman q322 blocks by day; Mood reduces each doc to one bit:
    above the POOLED median or not, then a 2×k chi-square).

    Exactness: the pooled lower median is a true order statistic off
    the length count table (q300 idiom: smallest v with cum ≥
    (N+1) div 2); the 2×k chi-square uses the q182 exact-integer
    cell terms — d = o·N − r·c, term_milli = (d² div M)·1000 +
    (d² mod M)·1000 div M with M = N·r·c — so the statistic is an
    exact BIGINT milli sum (floor understates by < 1 milli/cell, a
    DEFINED statistic). d² runs in DECIMAL(38,0)/HUGEINT (operand
    cast before multiply, the q233 rule).

    Shape at 100 TB: one grouped corpus pass to the (source, length)
    count table; the median, the 2×k table (2·|sources| cells) and
    the reduction all run on corpus-independent relations."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy(
        "source", F.length("text").alias("v")
    ).agg(F.count("*").alias("c"))
    vc = cnt.groupBy("v").agg(F.sum("c").alias("cv"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = vc.select("v", F.sum("cv").over(w).alias("cum"))
    tot = vc.agg(F.sum("cv").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .agg(F.min("v").alias("m_star"))
    )
    cells = (
        cnt.crossJoin(F.broadcast(med))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("v") > F.col("m_star"), F.col("c")).otherwise(0))
            .alias("above"),
            F.sum(F.when(F.col("v") <= F.col("m_star"), F.col("c")).otherwise(0))
            .alias("below"),
        )
        .select(
            "source",
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("is_above"), F.col("above").alias("o")),
                    F.struct(F.lit(0).alias("is_above"), F.col("below").alias("o")),
                )
            ).alias("s"),
        )
        .select("source", F.col("s.is_above").alias("is_above"), F.col("s.o").alias("o"))
    )
    rows_m = cells.groupBy("source").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("is_above").agg(F.sum("o").alias("cc"))
    terms = (
        cells.join(rows_m, "source")
        .join(F.broadcast(cols_m), "is_above")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * cc"
            ).alias("d"),
            F.expr("CAST(n AS DECIMAL(38,0)) * r * cc").alias("m"),
        )
        .filter(F.col("m") > 0)
        .select(
            F.expr(
                "CAST((d * d) div m AS BIGINT) * 1000"
                " + CAST(((d * d) % m) * 1000 div m AS BIGINT)"
            ).alias("term_milli")
        )
    )
    stat = terms.agg(F.sum("term_milli").alias("chi2_milli"), F.count("*").alias("nc"))
    return (
        stat.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_docs"),
            F.col("m_star").alias("median_len"),
            (F.col("nc") / 2).cast("long").alias("n_sources"),
            (F.col("nc") / 2 - 1).cast("long").alias("df"),
            "chi2_milli",
        )
    )


_Q332_SQL = """
WITH cnt AS (
  SELECT source, length(text) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), vc AS (
  SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM cnt GROUP BY v
), cum AS (
  SELECT v, sum(cv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM vc
), tot AS (SELECT CAST(sum(cv) AS BIGINT) AS n FROM vc),
med AS (
  SELECT CAST(min(v) AS BIGINT) AS m_star
  FROM cum CROSS JOIN tot WHERE cum >= (n + 1) // 2
), cells AS (
  SELECT source, is_above,
         CAST(CASE WHEN is_above = 1 THEN above ELSE below END AS BIGINT) AS o
  FROM (
    SELECT cnt.source,
           sum(CASE WHEN cnt.v > med.m_star THEN cnt.c ELSE 0 END) AS above,
           sum(CASE WHEN cnt.v <= med.m_star THEN cnt.c ELSE 0 END) AS below
    FROM cnt CROSS JOIN med GROUP BY 1
  ) CROSS JOIN (VALUES (1), (0)) f(is_above)
), rows_m AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY source
), cols_m AS (
  SELECT is_above, CAST(sum(o) AS BIGINT) AS cc FROM cells GROUP BY is_above
), terms AS (
  SELECT CAST((d * d) // m AS BIGINT) * 1000
           + CAST(((d * d) % m) * 1000 // m AS BIGINT) AS term_milli
  FROM (
    SELECT CAST(cl.o AS HUGEINT) * tot.n - CAST(rm.r AS HUGEINT) * cm.cc AS d,
           CAST(tot.n AS HUGEINT) * rm.r * cm.cc AS m
    FROM cells cl
    JOIN rows_m rm USING (source)
    JOIN cols_m cm USING (is_above)
    CROSS JOIN tot
  ) WHERE m > 0
), stat AS (
  SELECT CAST(sum(term_milli) AS BIGINT) AS chi2_milli,
         CAST(count(*) AS BIGINT) AS nc
  FROM terms
)
SELECT tot.n AS n_docs, med.m_star AS median_len,
       CAST(stat.nc / 2 AS BIGINT) AS n_sources,
       CAST(stat.nc / 2 - 1 AS BIGINT) AS df,
       stat.chi2_milli
FROM stat CROSS JOIN med CROSS JOIN tot
"""


def q335_token_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-token RANK MOVERS between the two deterministic corpus
    halves (doc_id parity) — the leaderboard-drift view that
    complements magnitude drift (TVD q319, JS q211, keyness q212):
    which tokens ENTERED, EXITED, or moved inside the top-20, in rank
    units an operator reads at a glance (RBO q303 summarizes the same
    comparison to one number; this shows the movers).

    Exactness: per-half ranks are row_number over (count DESC, token)
    — fully deterministic ties; the full-outer join of the two 20-row
    lists yields ≤ 40 rows with exact integer ranks and deltas (NULL
    delta = entered/exited, the explicit sentinel).

    Shape at 100 TB: two map-side-combined token counts (one scan —
    the half key rides the same pass), each reduced by
    TakeOrdered-style limit(20) BEFORE any window; the join and
    ordering run on ≤ 40 rows."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(F.split(F.lower("text"), "\\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("half", "tok")
        .agg(F.count("*").alias("c"))
    )

    def top(half: int, rname: str):
        w = W.orderBy(F.col("c").desc(), "tok")
        return (
            cnt.filter(F.col("half") == half)
            .orderBy(F.col("c").desc(), "tok")
            .limit(20)
            .withColumn(rname, F.row_number().over(w))
            .select("tok", rname)
        )

    a = top(0, "rank_a")
    b = top(1, "rank_b")
    return (
        a.join(b, "tok", "full_outer")
        .select(
            "tok",
            "rank_a",
            "rank_b",
            (F.col("rank_a") - F.col("rank_b")).alias("rank_delta"),
        )
        .orderBy("tok")
    )


_Q335_SQL = """
WITH cnt AS (
  SELECT half, tok, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT doc_id % 2 AS half,
           unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY 1, 2
), a AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS rank_a
  FROM cnt WHERE half = 0 ORDER BY c DESC, tok LIMIT 20
), b AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS rank_b
  FROM cnt WHERE half = 1 ORDER BY c DESC, tok LIMIT 20
)
SELECT coalesce(a.tok, b.tok) AS tok, a.rank_a, b.rank_b,
       CAST(a.rank_a - b.rank_b AS INT) AS rank_delta
FROM a FULL OUTER JOIN b ON a.tok = b.tok
ORDER BY tok
"""


def q336_ann_cost_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF COST-RECALL frontier: q318 gives recall@5 per probe
    budget; this adds what each budget PAYS — candidates scored per
    query (the sum of probed-cell sizes, the actual per-query work at
    serving time) — and the efficiency ratio hits per kilo-candidate.
    Together they are the capacity-planning curve: pick the leftmost
    nprobe on the frontier that clears the recall SLO.

    Exactness: candidate counts are exact integers (cell sizes joined
    to each query's ranked probe list and summed over cell_rank ≤
    nprobe); hits reuse the q318 shared-scoring construction; the
    ratios are exact integer divisions (avg candidates/query in
    milli, hits per 1e6 candidates).

    Shape at 100 TB: cell sizes are a 16-row aggregate off the
    zero-shuffle assignment; the probe lists are nq·nlist rows; the
    one corpus-sized pass is the shared probe-all scoring (q318),
    amortized over every sweep point."""
    from ..operators.similarity import (
        _as_double,
        _assign_cells,
        _dot,
        _norm,
        _unit_mat,
        hash_seed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = hash_seed_centroids(corpus, nlist=16)
    assigned = _assign_cells(corpus, cents, "embedding", "vec_id").select(
        "vec_id", "cell", _as_double("embedding").alias("_vd")
    ).withColumn("_vn", _norm(F.col("_vd")))
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("cell_m"))

    qscored = F.transform(
        _unit_mat(cents),
        lambda cv, i: F.struct(
            _dot(F.col("_qv"), cv).alias("sim"), i.alias("cell")
        ),
    )
    ranked = F.transform(
        F.reverse(F.array_sort(qscored)),
        lambda s, i: F.struct(
            s["cell"].alias("cell"), (i + 1).alias("cell_rank")
        ),
    )
    qcells = (
        queries.select("query_id", _as_double("embedding").alias("_qv"))
        .withColumn("_qn", _norm(F.col("_qv")))
        .withColumn("_rc", F.explode(ranked))
        .select(
            "query_id", "_qv", "_qn",
            F.col("_rc.cell").alias("cell"),
            F.col("_rc.cell_rank").alias("cell_rank"),
        )
    )
    nprobes = F.broadcast(
        spark.createDataFrame([(1,), (2,), (4,), (8,), (16,)], "nprobe int")
    )
    # exact work: candidates scored per (nprobe, query) = Σ probed cell sizes
    work = (
        qcells.select("query_id", "cell", "cell_rank")
        .join(F.broadcast(sizes), "cell", "left")
        .crossJoin(nprobes)
        .filter(F.col("cell_rank") <= F.col("nprobe"))
        .groupBy("nprobe")
        .agg(F.sum(F.coalesce("cell_m", F.lit(0))).alias("candidates"))
    )
    # recall machinery shared with q318
    scored = assigned.join(F.broadcast(qcells), "cell").select(
        "query_id", "cell_rank", "vec_id",
        (_dot(F.col("_qv"), F.col("_vd")) / (F.col("_qn") * F.col("_vn"))).alias("cos"),
    )
    wc = W.partitionBy("query_id", "cell_rank").orderBy(F.col("cos").desc(), "vec_id")
    cell_top = (
        scored.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "cell_rank", "vec_id", "cos")
        .localCheckpoint(eager=True)
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    brute = (
        cell_top.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= 5)
        .select("query_id", F.col("vec_id").alias("bvec"))
    )
    sweep = cell_top.crossJoin(nprobes).filter(
        F.col("cell_rank") <= F.col("nprobe")
    )
    wn = W.partitionBy("nprobe", "query_id").orderBy(F.col("cos").desc(), "vec_id")
    topk = (
        sweep.withColumn("_r", F.row_number().over(wn))
        .filter(F.col("_r") <= 5)
        .select("nprobe", "query_id", "vec_id")
    )
    hits = topk.join(
        brute,
        (topk.query_id == brute.query_id) & (topk.vec_id == brute.bvec),
        "left_semi",
    ).groupBy("nprobe").agg(F.count("*").alias("hits_at_5"))
    nq = queries.agg(F.count("*").alias("n_queries"))
    return (
        work.join(hits, "nprobe")
        .crossJoin(F.broadcast(nq))
        .select(
            "nprobe",
            "n_queries",
            "candidates",
            "hits_at_5",
            F.expr("(candidates * 1000) div n_queries").alias(
                "candidates_per_query_milli"
            ),
            F.expr("(hits_at_5 * 1000000) div (5 * n_queries)").alias(
                "recall_ppm"
            ),
            F.expr(
                "CASE WHEN candidates > 0 THEN"
                " (hits_at_5 * 1000000) div candidates"
                " ELSE CAST(NULL AS BIGINT) END"
            ).alias("hits_per_mega_candidate"),
        )
        .orderBy("nprobe")
    )


_Q336_SQL = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 5
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id
         ) - 1 AS cell,
         v AS cv
  FROM c
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id
  LIMIT 16
), cents AS (
  SELECT cell,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS u
  FROM seeds
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT c.vec_id, c.v, cents.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, cents.u) DESC, cents.cell ASC
           ) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
), sizes AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS cell_m FROM assigned GROUP BY cell
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), qcells AS (
  SELECT q.query_id, q.qv, cents.cell,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.qv, cents.u) DESC, cents.cell DESC
         ) AS cell_rank
  FROM q CROSS JOIN cents
), np AS (SELECT CAST(nprobe AS INT) AS nprobe
          FROM (VALUES (1), (2), (4), (8), (16)) v(nprobe)),
work AS (
  SELECT np.nprobe, CAST(sum(coalesce(s.cell_m, 0)) AS BIGINT) AS candidates
  FROM qcells p
  LEFT JOIN sizes s ON s.cell = p.cell
  CROSS JOIN np
  WHERE p.cell_rank <= np.nprobe
  GROUP BY np.nprobe
), scored AS (
  SELECT p.query_id, p.cell_rank, a.vec_id,
         list_dot_product(p.qv, a.v) /
           (sqrt(list_dot_product(p.qv, p.qv))
            * sqrt(list_dot_product(a.v, a.v))) AS cos
  FROM qcells p JOIN assigned a USING (cell)
), cell_top AS (
  SELECT query_id, cell_rank, vec_id, cos FROM (
    SELECT query_id, cell_rank, vec_id, cos,
           row_number() OVER (
             PARTITION BY query_id, cell_rank
             ORDER BY cos DESC, vec_id
           ) AS rn
    FROM scored
  ) WHERE rn <= 5
), brute AS (
  SELECT query_id, vec_id AS bvec FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, vec_id
           ) AS r
    FROM cell_top
  ) WHERE r <= 5
), topk AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT np.nprobe, t.query_id, t.vec_id,
           row_number() OVER (
             PARTITION BY np.nprobe, t.query_id
             ORDER BY t.cos DESC, t.vec_id
           ) AS r
    FROM cell_top t CROSS JOIN np
    WHERE t.cell_rank <= np.nprobe
  ) WHERE r <= 5
), hits AS (
  SELECT k.nprobe, CAST(count(*) AS BIGINT) AS hits_at_5
  FROM topk k
  WHERE EXISTS (
    SELECT 1 FROM brute b
    WHERE b.query_id = k.query_id AND b.bvec = k.vec_id
  )
  GROUP BY k.nprobe
), nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
SELECT w.nprobe, nq.n_queries, w.candidates, h.hits_at_5,
       CAST((w.candidates * 1000) // nq.n_queries AS BIGINT)
         AS candidates_per_query_milli,
       CAST((h.hits_at_5 * 1000000) // (5 * nq.n_queries) AS BIGINT)
         AS recall_ppm,
       CAST(CASE WHEN w.candidates > 0 THEN
              (h.hits_at_5 * 1000000) // w.candidates
            ELSE NULL END AS BIGINT) AS hits_per_mega_candidate
FROM work w JOIN hits h USING (nprobe) CROSS JOIN nq
ORDER BY w.nprobe
"""


def q338_kmv_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV estimator accuracy audit — the last member of the
    sketch-audit family (CMS q259, HLL q302, Bloom q320, MinHash
    q328): per language pair, the EXACT vocabulary Jaccard (distinct-
    token inner join + inclusion-exclusion union) beside q106's
    KMV-estimated Jaccard, with the error in ppm. The measurement
    that justifies replacing the exact pairwise vocab join with the
    sub-linear sketch at scale.

    Exactness: everything integer — exact_j_ppm = inter·10⁶ div union,
    est_j_ppm = n_both·10⁶ div k_used (the estimate is itself an exact
    rational of the deterministic md5 sketch), err_ppm their absolute
    difference.

    Shape at 100 TB: exact side is one distinct (lang, token) pass +
    a token-keyed pair join on the vocabulary relation (bounded by
    vocab, not corpus); sketch side is the audited q106 bottom-256
    shape."""
    from ..operators.sketches import kmv_group_sketch, kmv_pair_overlap

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
            )
        ).alias("tok"),
    )
    vocab = toks.distinct()
    sizes = vocab.groupBy("lang").agg(F.count("*").alias("v"))
    a = vocab.select(F.col("lang").alias("g1"), "tok")
    b = vocab.select(F.col("lang").alias("g2"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.count("*").alias("inter"))
    )
    exact = (
        inter.join(sizes.withColumnRenamed("lang", "g1").withColumnRenamed("v", "v1"), "g1")
        .join(sizes.withColumnRenamed("lang", "g2").withColumnRenamed("v", "v2"), "g2")
        .select(
            "g1", "g2", "inter",
            (F.col("v1") + F.col("v2") - F.col("inter")).alias("uni"),
        )
    )
    mins = kmv_group_sketch(toks, "lang", "tok", k=256)
    est = kmv_pair_overlap(mins, "lang", k=256).select(
        "g1", "g2", "k_used", "n_both"
    )
    return (
        exact.join(est, ["g1", "g2"])
        .select(
            "g1",
            "g2",
            "inter",
            F.col("uni").alias("union_exact"),
            F.expr("(inter * 1000000) div uni").alias("exact_j_ppm"),
            F.expr("(n_both * 1000000) div k_used").alias("est_j_ppm"),
            F.expr(
                "abs((inter * 1000000) div uni"
                " - (n_both * 1000000) div k_used)"
            ).alias("err_ppm"),
        )
        .orderBy("g1", "g2")
    )


_Q338_SQL = r"""
WITH toks AS (
  SELECT lang, tok FROM (
    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), vocab AS (
  SELECT DISTINCT lang, tok FROM toks
), sizes AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS v FROM vocab GROUP BY lang
), inter AS (
  SELECT a.lang AS g1, b.lang AS g2, CAST(count(*) AS BIGINT) AS inter
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY 1, 2
), exact AS (
  SELECT i.g1, i.g2, i.inter, s1.v + s2.v - i.inter AS uni
  FROM inter i
  JOIN sizes s1 ON s1.lang = i.g1
  JOIN sizes s2 ON s2.lang = i.g2
), hashed AS (
  SELECT DISTINCT lang, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM toks
), mins AS (
  SELECT lang, h FROM (
    SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= 256
), pairs AS (
  SELECT a.lang AS g1, b.lang AS g2
  FROM (SELECT DISTINCT lang FROM mins) a
  JOIN (SELECT DISTINCT lang FROM mins) b ON a.lang < b.lang
), per_hash AS (
  SELECT p.g1, p.g2, m.h,
         max(CASE WHEN m.lang = p.g1 THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN m.lang = p.g2 THEN 1 ELSE 0 END) AS in2
  FROM pairs p JOIN mins m ON m.lang IN (p.g1, p.g2)
  GROUP BY p.g1, p.g2, m.h
), cut AS (
  SELECT * FROM (
    SELECT g1, g2, h, in1, in2,
           row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
    FROM per_hash
  ) WHERE rn <= 256
), est AS (
  SELECT g1, g2, CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(in1 * in2) AS BIGINT) AS n_both
  FROM cut GROUP BY g1, g2
)
SELECT e.g1, e.g2, x.inter, x.uni AS union_exact,
       CAST((x.inter * 1000000) // x.uni AS BIGINT) AS exact_j_ppm,
       CAST((e.n_both * 1000000) // e.k_used AS BIGINT) AS est_j_ppm,
       CAST(abs((x.inter * 1000000) // x.uni
                - (e.n_both * 1000000) // e.k_used) AS BIGINT) AS err_ppm
FROM exact x JOIN est e ON e.g1 = x.g1 AND e.g2 = x.g2
ORDER BY e.g1, e.g2
"""


def q339_dedup_tier_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-ladder health scoreboard — ONE row per dedup tier (exact md5
    q21, canonical q93, bag-of-words q216, MinHash-LSH q25, containment
    q207, edit-distance q213) plus the two sketch-accuracy audits that
    back the scalable tiers (MinHash q328, KMV q338), so drift across
    the whole ladder is a single driver-visible relation instead of
    eight per-query audits a human has to eyeball — the round-7 verdict
    asked for exactly the q317 ANN-scoreboard treatment applied to the
    dedup family.

    Each arm composes the EXISTING audited tier plan unchanged and
    reduces it to (tier, n_rows, n_dup_hits, est_err_ppm):
    n_dup_hits is the tier's own hit semantic (docs beyond the keeper
    for the grouping tiers, candidate pairs for the pair tiers, true
    positives for the MinHash audit); est_err_ppm is the estimator's
    worst observed error (NULL for the exact tiers). All-integer
    columns — hash-stable with no float seam.

    Shape at 100 TB: every arm is its own already-audited bounded plan
    (hash-shuffle grouping tiers, capped-bucket LSH pair streams,
    vocab-bounded KMV); the scoreboard adds eight 1-row aggregates and
    an 8-row union — negligible over the arms themselves."""

    def arm(df: DataFrame, tier: str, hits: str,
            err: str = "CAST(NULL AS BIGINT)") -> DataFrame:
        return df.agg(
            F.lit(tier).alias("tier"),
            F.count("*").cast("long").alias("n_rows"),
            F.expr(hits).cast("long").alias("n_dup_hits"),
            F.expr(err).cast("long").alias("est_err_ppm"),
        ).select("tier", "n_rows", "n_dup_hits", "est_err_ppm")

    arms = [
        arm(q21_exact_dedup(spark, sf_dir), "1_exact_md5",
            "coalesce(sum(n_copies - 1), 0)"),
        arm(q93_canonical_dedup(spark, sf_dir), "2_canonical",
            "coalesce(sum(n_docs) - sum(n_kept), 0)"),
        arm(q216_bag_of_words_dedup(spark, sf_dir), "3_bag_of_words",
            "coalesce(sum(reorder_only_dups), 0)"),
        arm(q25_minhash_lsh_pairs(spark, sf_dir), "4_minhash_lsh",
            "count(*)"),
        arm(q207_containment_pairs(spark, sf_dir), "5_containment",
            "count(*)"),
        arm(q213_edit_distance_pairs(spark, sf_dir), "6_edit_distance",
            "count(*)"),
        arm(q328_minhash_accuracy_audit(spark, sf_dir), "7_minhash_audit",
            "coalesce(sum(n_true_pos), 0)", "max(max_err_ppm)"),
        arm(q338_kmv_accuracy_audit(spark, sf_dir), "8_kmv_vocab_audit",
            "count(*)", "max(err_ppm)"),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("tier")


def _q339_sql() -> str:
    def arm(sql: str, tier: str, hits: str,
            err: str = "CAST(NULL AS BIGINT)") -> str:
        return f"""
SELECT '{tier}' AS tier,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({hits} AS BIGINT) AS n_dup_hits,
       CAST({err} AS BIGINT) AS est_err_ppm
FROM ({sql}) arm_{tier}"""

    return (
        arm(_Q21_SQL, "1_exact_md5", "coalesce(sum(n_copies - 1), 0)")
        + "\nUNION ALL\n"
        + arm(_Q93_SQL, "2_canonical", "coalesce(sum(n_docs) - sum(n_kept), 0)")
        + "\nUNION ALL\n"
        + arm(_Q216_SQL, "3_bag_of_words", "coalesce(sum(reorder_only_dups), 0)")
        + "\nUNION ALL\n"
        + arm(_Q25_SQL, "4_minhash_lsh", "count(*)")
        + "\nUNION ALL\n"
        + arm(_Q207_SQL, "5_containment", "count(*)")
        + "\nUNION ALL\n"
        + arm(_Q213_SQL, "6_edit_distance", "count(*)")
        + "\nUNION ALL\n"
        + arm(_q328_sql(), "7_minhash_audit",
              "coalesce(sum(n_true_pos), 0)", "max(max_err_ppm)")
        + "\nUNION ALL\n"
        + arm(_Q338_SQL, "8_kmv_vocab_audit", "count(*)", "max(err_ppm)")
        + "\nORDER BY tier"
    )

def q340_hellinger_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-support pairwise Hellinger distance between every source
    pair's doc-length distributions — the bounded, metric (triangle-
    inequality) member of the divergence suite (TVD q319, JS q211, PSI
    q192, Wasserstein q250, KS q309): H² = 1 − BC with the Bhattacharyya
    coefficient BC = Σ_v √(p₁(v)·p₂(v)).

    Only COMMON values contribute to BC (√(p·0) = 0), so the same
    inner-join-on-the-value-domain shape as q319 suffices — no full
    outer join, no dense grid. Per-common-value terms are ONE identical
    float chain over exact integer counts — √((c₁/N₁)·(c₂/N₂)) — rounded
    to pico BEFORE the cross-value sum (the q211 quantize-pre-sum rule),
    so bc_pico is an exact order-independent BIGINT; hellinger_micro =
    round(√(max(0, 1 − bc_pico/10¹²))·10⁶) is one final sqrt seam over
    that exact integer (the greatest() guards pico round-up past 1).

    Shape at 100 TB: one grouped corpus pass to the (source, length)
    count table (corpus-independent size); the pair join runs on that
    bounded relation only."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy(
        F.col("source"), F.length("text").alias("v")
    ).agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    a = cnt.join(tot, "source").select(
        F.col("source").alias("src_a"), F.col("v").alias("_v"),
        F.col("c").alias("ca"), F.col("n").alias("na"),
    )
    b = cnt.join(tot, "source").select(
        F.col("source").alias("src_b"), F.col("v").alias("_v"),
        F.col("c").alias("cb"), F.col("n").alias("nb"),
    )
    term = (
        "CAST(round(sqrt((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
        " * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) * 1e12) AS BIGINT)"
    )
    common = (
        a.join(b, "_v")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.count("*").alias("n_common_lengths"),
            F.sum(F.expr(term)).alias("bc_pico"),
        )
    )
    return common.select(
        "src_a", "src_b", "n_a", "n_b", "n_common_lengths", "bc_pico",
        F.expr(
            "CAST(round(sqrt(greatest(0.0e0,"
            " 1.0e0 - CAST(bc_pico AS DOUBLE) / 1e12)) * 1e6) AS BIGINT)"
        ).alias("hellinger_micro"),
    ).orderBy("src_a", "src_b")


_Q340_SQL = """
WITH cnt AS (
  SELECT source, length(text) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
), sides AS (
  SELECT cnt.source, cnt.v, cnt.c, tot.n
  FROM cnt JOIN tot USING (source)
), common AS (
  SELECT a.source AS src_a, b.source AS src_b,
         max(a.n) AS n_a, max(b.n) AS n_b,
         CAST(count(*) AS BIGINT) AS n_common_lengths,
         CAST(sum(CAST(round(sqrt((CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE))
              * (CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE))) * 1e12)
              AS BIGINT)) AS BIGINT) AS bc_pico
  FROM sides a JOIN sides b ON a.v = b.v AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_a, n_b, n_common_lengths, bc_pico,
       CAST(round(sqrt(greatest(0.0e0,
            1.0e0 - CAST(bc_pico AS DOUBLE) / 1e12)) * 1e6) AS BIGINT)
         AS hellinger_micro
FROM common
ORDER BY src_a, src_b
"""

def q348_drift_tier_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift-divergence scoreboard — ONE row per drift metric in the
    divergence suite (TVD q319, Hellinger q340, JS q211, PSI q192,
    KS q309, Wasserstein q250, Cramér-von Mises q343), each arm
    composing the EXISTING audited plan unchanged and reducing it to
    (metric, n_rows, max_stat_micro): the q317/q339 scoreboard
    treatment applied to the drift family, so distribution drift
    across seven lenses is one driver-visible relation instead of
    seven audits to eyeball. max_stat_micro is each metric's own
    micro-scaled statistic (ppm for the ppm metrics) — the DRIFT
    dial, not a cross-metric comparison.

    Shape at 100 TB: every arm is its own already-audited count-table-
    bounded plan; the scoreboard adds seven 1-row aggregates and a
    7-row union."""
    from .relational import q250_wasserstein_drift, q343_cramer_von_mises

    def arm(df: DataFrame, metric: str, stat: str) -> DataFrame:
        return df.agg(
            F.lit(metric).alias("metric"),
            F.count("*").cast("long").alias("n_rows"),
            F.expr(stat).cast("long").alias("max_stat_micro"),
        ).select("metric", "n_rows", "max_stat_micro")

    arms = [
        arm(q319_source_tvd_matrix(spark, sf_dir), "1_tvd_pairs",
            "max(tvd_ppm)"),
        arm(q340_hellinger_matrix(spark, sf_dir), "2_hellinger_pairs",
            "max(hellinger_micro)"),
        arm(q211_js_source_drift(spark, sf_dir), "3_js_vs_corpus",
            "max(js_micro)"),
        arm(q192_psi_drift(spark, sf_dir), "4_psi_vs_corpus",
            "max(psi_micro)"),
        arm(q309_ks_two_sample(spark, sf_dir), "5_ks_two_sample",
            "max(d_ppm)"),
        arm(q250_wasserstein_drift(spark, sf_dir), "6_wasserstein",
            "max(w1_norm_micro)"),
        arm(q343_cramer_von_mises(spark, sf_dir), "7_cvm_two_sample",
            "max(t_micro)"),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("metric")


def _q348_sql() -> str:
    from .relational import _Q250_SQL, _Q343_SQL

    def arm(sql: str, metric: str, stat: str) -> str:
        return f"""
SELECT '{metric}' AS metric,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({stat} AS BIGINT) AS max_stat_micro
FROM ({sql}) arm_{metric}"""

    return (
        arm(_Q319_SQL, "1_tvd_pairs", "max(tvd_ppm)")
        + "\nUNION ALL\n"
        + arm(_Q340_SQL, "2_hellinger_pairs", "max(hellinger_micro)")
        + "\nUNION ALL\n"
        + arm(_Q211_SQL, "3_js_vs_corpus", "max(js_micro)")
        + "\nUNION ALL\n"
        + arm(_Q192_SQL, "4_psi_vs_corpus", "max(psi_micro)")
        + "\nUNION ALL\n"
        + arm(_Q309_SQL, "5_ks_two_sample", "max(d_ppm)")
        + "\nUNION ALL\n"
        + arm(_Q250_SQL, "6_wasserstein", "max(w1_norm_micro)")
        + "\nUNION ALL\n"
        + arm(_Q343_SQL, "7_cvm_two_sample", "max(t_micro)")
        + "\nORDER BY metric"
    )

def q350_sketch_audit_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-estimator health scoreboard — ONE row per probabilistic
    data structure the engine serves (CMS q259, HLL q302, Bloom q320,
    MinHash q328, KMV q338), each arm composing the EXISTING audited
    accuracy query unchanged and reducing it to
    (sketch, n_rows, worst_err_ppm): the fourth member of the
    scoreboard family (ANN q317, dedup q339, drift q348), so sketch
    drift is one driver-visible relation. worst_err_ppm is each
    audit's own worst observed relative error (CMS overcount/exact,
    HLL |est−exact|/exact, Bloom FPR, MinHash signature-vs-exact
    Jaccard gap, KMV estimated-vs-exact Jaccard gap) — all exact
    integer ppm columns straight from the audited plans.

    Shape at 100 TB: every arm is its own audited bounded plan; the
    scoreboard adds five 1-row aggregates and a 5-row union."""

    def arm(df: DataFrame, sketch: str, err: str) -> DataFrame:
        return df.agg(
            F.lit(sketch).alias("sketch"),
            F.count("*").cast("long").alias("n_rows"),
            F.expr(err).cast("long").alias("worst_err_ppm"),
        ).select("sketch", "n_rows", "worst_err_ppm")

    arms = [
        arm(q259_count_min_tokens(spark, sf_dir), "1_cms_topk",
            "max(CASE WHEN exact_cnt > 0"
            " THEN (overcount * 1000000) div exact_cnt END)"),
        arm(q302_hyperloglog_vocab(spark, sf_dir), "2_hll_vocab",
            "max(err_ppm)"),
        arm(q320_bloom_fpr_audit(spark, sf_dir), "3_bloom_novelty",
            "max(fpr_ppm)"),
        arm(q328_minhash_accuracy_audit(spark, sf_dir), "4_minhash_jaccard",
            "max(max_err_ppm)"),
        arm(q338_kmv_accuracy_audit(spark, sf_dir), "5_kmv_jaccard",
            "max(err_ppm)"),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("sketch")


def _q350_sql() -> str:
    def arm(sql: str, sketch: str, err: str) -> str:
        return f"""
SELECT '{sketch}' AS sketch,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({err} AS BIGINT) AS worst_err_ppm
FROM ({sql}) arm_{sketch}"""

    return (
        arm(_Q259_SQL, "1_cms_topk",
            "max(CASE WHEN exact_cnt > 0"
            " THEN (overcount * 1000000) // exact_cnt END)")
        + "\nUNION ALL\n"
        + arm(_Q302_SQL, "2_hll_vocab", "max(err_ppm)")
        + "\nUNION ALL\n"
        + arm(_Q320_SQL, "3_bloom_novelty", "max(fpr_ppm)")
        + "\nUNION ALL\n"
        + arm(_q328_sql(), "4_minhash_jaccard", "max(max_err_ppm)")
        + "\nUNION ALL\n"
        + arm(_Q338_SQL, "5_kmv_jaccard", "max(err_ppm)")
        + "\nORDER BY sketch"
    )

def q355_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label agreement over the embedding space —
    the standard label-noise / cluster-coherence audit a training-data
    pipeline runs before trusting its labels (the 1-NN error bounds the
    Bayes error, Cover & Hart 1967; disagreement flags mislabeled or
    boundary examples): for each probe vector find its cosine nearest
    neighbour among the OTHER probes and check whether the labels
    match, reported per label so one incoherent class is visible
    instead of averaged away.

    Exactness: the cosine chain is the shared q22/q315 left-to-right
    fold (identical double ordering in both engines); the 1-NN pick is
    row_number over (cos DESC, nbr_id) — fully deterministic; counts
    are exact integers and agree_ppm is the exact integer
    (n_agree·10⁶) div n_probes, so every column is hash-stable.

    Shape note: label coherence is a STATISTICAL property of the
    space, so the audit runs on the fixed-k=256 deterministic md5 draw
    (exact_k_sample idiom, oracle-paired via q94; same TakeOrdered
    per-partition-heap plan as q315) — the self-join is k²-bounded
    (≤ 65 536 scored pairs) NO MATTER the corpus size; at 100 TB the
    same agreement stages run unchanged off the IVF-pruned kNN graph
    (q27/q56) instead of the brute pair set."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn(
            "_h",
            F.expr(
                "CAST(conv(substr(md5(concat('knn:',"
                " CAST(vec_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            ),
        )
        .orderBy("_h", "vec_id")
        .limit(256)
    )
    a = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    b = a.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("v").alias("w"),
    )
    dot = F.expr(
        "aggregate(zip_with(v, w, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(
            f"aggregate(transform({c}, x -> x * x), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        )
    )
    scored = a.join(b, F.col("vec_id") != F.col("nbr_id")).select(
        "vec_id",
        "label",
        "nbr_id",
        "nbr_label",
        (dot / (norm("v") * norm("w"))).alias("cos"),
    )
    w1 = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "nbr_id")
    nn = scored.withColumn("r", F.row_number().over(w1)).filter(
        F.col("r") == 1
    )
    return (
        nn.groupBy("label")
        .agg(
            F.count("*").alias("n_probes"),
            F.sum(
                F.when(F.col("label") == F.col("nbr_label"), 1).otherwise(0)
            ).cast("long").alias("n_agree"),
        )
        .select(
            "label",
            "n_probes",
            "n_agree",
            F.expr("(n_agree * 1000000) div n_probes").alias("agree_ppm"),
        )
        .orderBy("label")
    )


_Q355_SQL = """
WITH a AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  ORDER BY ('0x' || substr(md5('knn:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
           vec_id
  LIMIT 256
), scored AS (
  SELECT a.vec_id, a.label, b.vec_id AS nbr_id, b.label AS nbr_label,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM a JOIN a b ON a.vec_id <> b.vec_id
), nn AS (
  SELECT label, nbr_label FROM (
    SELECT label, nbr_label,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, nbr_id) AS r
    FROM scored
  ) WHERE r = 1
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN label = nbr_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       CAST((sum(CASE WHEN label = nbr_label THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS agree_ppm
FROM nn
GROUP BY label
ORDER BY label
"""


def q356_distinct_n_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / distinct-2 lexical diversity per source (Li et al.
    2016's distinct-n, the standard repetitiveness gate a corpus or a
    generation run publishes): unique-unigram and unique-bigram counts
    over their token totals. Complements the WITHIN-document
    repetition audit (q45) and the windowed MATTR (q240) with the
    corpus-level ratio — a source can look clean per doc and still be
    one template stamped a million times, which only this cross-doc
    distinct ratio catches.

    Exactness: tokenization is the shared q338 discipline
    (lower → split \\s+ → drop empties); bigrams are the q139 guarded
    in-doc adjacency (no cross-doc phantom bigrams; <2-word docs emit
    none). All four counts are exact BIGINTs and each ratio is the
    exact integer (distinct·10⁶) div total, so every column is
    hash-stable. Sources with zero bigrams report NULL distinct2_ppm.

    Shape at 100 TB: two explode passes (unigram, bigram) each
    followed by a partial-aggregating distinct on (source, gram) —
    hash-only shuffles bounded by the vocabulary / bigram-vocabulary
    per source, never a pair join; the final join of the two per-
    source rollups is broadcast (|sources| rows)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.filter(
            F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
        ).alias("w"),
    )
    uni = (
        words.select("source", F.explode("w").alias("g"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_unigrams"),
            F.countDistinct("g").alias("n_distinct1"),
        )
    )
    bi = (
        words.select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN"
                    " transform(sequence(1, size(w) - 1),"
                    " i -> concat(element_at(w, i), ' ',"
                    " element_at(w, i + 1)))"
                    " ELSE CAST(array() AS array<string>) END"
                )
            ).alias("g"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.countDistinct("g").alias("n_distinct2"),
        )
    )
    return (
        uni.join(bi, "source", "left")
        .select(
            "source",
            "n_unigrams",
            "n_distinct1",
            F.expr("(n_distinct1 * 1000000) div n_unigrams").alias(
                "distinct1_ppm"
            ),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_distinct2", F.lit(0)).alias("n_distinct2"),
            F.expr(
                "CASE WHEN coalesce(n_bigrams, 0) > 0 THEN"
                " (n_distinct2 * 1000000) div n_bigrams END"
            ).alias("distinct2_ppm"),
        )
        .orderBy("source")
    )


_Q356_SQL = r"""
WITH w AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
           AS w
  FROM documents
), uni AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_unigrams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct1
  FROM (SELECT source, unnest(w) AS g FROM w)
  GROUP BY source
), bi AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct2
  FROM (
    SELECT source,
           unnest([w[i] || ' ' || w[i + 1] for i in range(1, len(w))]) AS g
    FROM w
  )
  GROUP BY source
)
SELECT uni.source, n_unigrams, n_distinct1,
       CAST((n_distinct1 * 1000000) // n_unigrams AS BIGINT)
         AS distinct1_ppm,
       coalesce(n_bigrams, 0) AS n_bigrams,
       coalesce(n_distinct2, 0) AS n_distinct2,
       CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN CAST((n_distinct2 * 1000000) // n_bigrams AS BIGINT) END
         AS distinct2_ppm
FROM uni LEFT JOIN bi ON bi.source = uni.source
ORDER BY uni.source
"""


def q363_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains table: does event VALUE rank
    purchases to the top? The campaign-targeting standard that
    complements the threshold-free AUC (q272) and the operating-point
    sweep (q143): population deciles by score (value DESC), each
    reporting its positive rate, lift over the base rate, and the
    cumulative share of all positives captured — the 'read the top-k
    deciles' planning relation.

    Exactness: everything integer — values quantize to milli; the
    EXACT global rank uses the q214/q224 two-phase idiom (exclusive
    cumulative count over the bounded distinct-score relation + a
    score-partitioned row_number on event_id for the deterministic
    tie order), decile = ((rank−1)·10) div N, and every ratio is a
    cleared-denominator DECIMAL div. Zero positives → NULL lift/gain.

    Shape at 100 TB: one (score) count-table collapse, one window over
    the bounded distinct-score relation, one score-partitioned
    within-group window, a broadcast 1-row totals join, a 10-row
    rollup. No global sort ever touches raw rows (the oracle runs the
    naive ORDER BY rank — same result)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("si"),
        F.expr(
            "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("y"),
    )
    cnt = e.groupBy("si").agg(F.count("*").alias("c"))
    w_above = W.orderBy(F.col("si").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = cnt.select(
        "si", F.coalesce(F.sum("c").over(w_above), F.lit(0)).alias("above")
    )
    tot = e.agg(
        F.count("*").alias("n_tot"),
        F.sum("y").cast("long").alias("pos_tot"),
    )
    w_in = W.partitionBy("si").orderBy("event_id")
    ranked = (
        e.join(cum, "si")
        .withColumn("r", F.col("above") + F.row_number().over(w_in))
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr("((r - 1) * 10) div n_tot").alias("decile"),
            "y",
            "n_tot",
            "pos_tot",
        )
    )
    per = ranked.groupBy("decile", "n_tot", "pos_tot").agg(
        F.count("*").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        per.withColumn("cum_pos", F.sum("n_pos").over(w_cum))
        .select(
            "decile",
            "n",
            "n_pos",
            F.expr("(n_pos * 1000000) div n").alias("pos_rate_ppm"),
            F.expr(
                "CASE WHEN pos_tot > 0 THEN"
                " CAST((CAST(n_pos AS DECIMAL(38,0)) * n_tot * 1000000)"
                " div (CAST(n AS DECIMAL(38,0)) * pos_tot) AS BIGINT) END"
            ).alias("lift_ppm"),
            F.expr(
                "CASE WHEN pos_tot > 0 THEN"
                " (cum_pos * 1000000) div pos_tot END"
            ).alias("cum_gain_ppm"),
        )
        .orderBy("decile")
    )


_Q363_SQL = """
WITH e AS (
  SELECT event_id,
         CAST(round(value * 1000) AS BIGINT) AS si,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS y
  FROM events
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tot,
         CAST(sum(y) AS BIGINT) AS pos_tot
  FROM e
), ranked AS (
  SELECT ((row_number() OVER (ORDER BY si DESC, event_id) - 1) * 10)
           // n_tot AS decile,
         y, n_tot, pos_tot
  FROM e CROSS JOIN tot
), per AS (
  SELECT decile, n_tot, pos_tot,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM ranked
  GROUP BY decile, n_tot, pos_tot
)
SELECT decile, n, n_pos,
       CAST((n_pos * 1000000) // n AS BIGINT) AS pos_rate_ppm,
       CASE WHEN pos_tot > 0 THEN
         CAST((CAST(n_pos AS HUGEINT) * n_tot * 1000000)
              // (CAST(n AS HUGEINT) * pos_tot) AS BIGINT) END AS lift_ppm,
       CASE WHEN pos_tot > 0 THEN
         CAST((sum(n_pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1000000) // pos_tot AS BIGINT) END AS cum_gain_ppm
FROM per
ORDER BY decile
"""


def q364_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the privacy
    gate k-anonymity (q123) misses: an equivalence class can be large
    yet reveal its members' SENSITIVE attribute when every row shares
    one value (the homogeneity attack). Quasi-identifiers are
    (lang, source); the sensitive attribute is the 100-char length
    bucket; each class reports its size, distinct-l, and entropy
    l-diversity (entropy of the sensitive distribution, the stricter
    criterion), flagged below l = 3.

    Exactness: counts exact; the entropy is a per-sensitive-value
    double term −(c/n)·ln(c/n) over exact integers, quantized to nano
    BEFORE the per-class sum (integer addition — order-independent,
    the q360 discipline); entropy_l_milli = round(exp(H)·1000) makes
    the entropy-l comparable to the distinct-l on one scale.

    Shape at 100 TB: two map-side-combined grouped counts on bounded
    composite keys; the flagged classes a human reviews are bounded by
    the QI space, not the data."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.select(
            "lang",
            "source",
            (F.floor(F.col("n_chars") / 100) * 100).alias("sens"),
        )
        .groupBy("lang", "source", "sens")
        .agg(F.count("*").alias("c"))
    )
    w_cls = W.partitionBy("lang", "source")
    per = cells.withColumn("n", F.sum("c").over(w_cls)).select(
        "lang",
        "source",
        "c",
        "n",
        F.expr(
            "CAST(round(-(CAST(c AS DOUBLE) / n)"
            " * ln(CAST(c AS DOUBLE) / n) * 1e9) AS BIGINT)"
        ).alias("h_nano"),
    )
    cls = per.groupBy("lang", "source").agg(
        F.max("n").cast("long").alias("class_size"),
        F.count("*").alias("l_distinct"),
        F.sum("h_nano").cast("long").alias("h_nano"),
    )
    return cls.select(
        "lang",
        "source",
        "class_size",
        "l_distinct",
        F.expr(
            "CAST(round(exp(CAST(h_nano AS DOUBLE) / 1e9) * 1000)"
            " AS BIGINT)"
        ).alias("entropy_l_milli"),
        (F.col("l_distinct") < 3).alias("below_l3"),
    ).orderBy("lang", "source")


_Q364_SQL = """
WITH cells AS (
  SELECT lang, source,
         CAST(floor(n_chars / 100) * 100 AS BIGINT) AS sens,
         CAST(count(*) AS BIGINT) AS c
  FROM documents
  GROUP BY lang, source, 3
), per AS (
  SELECT lang, source, c,
         sum(c) OVER (PARTITION BY lang, source) AS n
  FROM cells
), terms AS (
  SELECT lang, source, c, n,
         CAST(round(-(CAST(c AS DOUBLE) / n)
                    * ln(CAST(c AS DOUBLE) / n) * 1e9) AS BIGINT)
           AS h_nano
  FROM per
), cls AS (
  SELECT lang, source,
         CAST(max(n) AS BIGINT) AS class_size,
         CAST(count(*) AS BIGINT) AS l_distinct,
         CAST(sum(h_nano) AS BIGINT) AS h_nano
  FROM terms
  GROUP BY lang, source
)
SELECT lang, source, class_size, l_distinct,
       CAST(round(exp(CAST(h_nano AS DOUBLE) / 1e9) * 1000) AS BIGINT)
         AS entropy_l_milli,
       l_distinct < 3 AS below_l3
FROM cls
ORDER BY lang, source
"""


def q365_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third privacy gate after k-anonymity (q123) and l-diversity
    (q364): a class can be large AND diverse yet still leak when its
    sensitive distribution DIFFERS from the table's (skewness attack);
    t-closeness bounds the total-variation distance between each
    class's sensitive distribution and the global one. QI = (lang,
    source); sensitive = the 100-char length bucket; flagged above
    t = 0.2.

    Exactness: FULLY integer — TVD = ½Σ_v|c_v/n − C_v/N| clears
    denominators to Σ_v|c_v·N − C_v·n| (exact DECIMAL), and the
    absent-bucket tail Σ_{v∉class}C_v·n folds in algebraically as
    n·N − Σ_{v∈class}C_v·n (no dense class×bucket grid is ever
    built); t_ppm = (sum·10⁶) div (2·n·N).

    Shape at 100 TB: one (class, bucket) count pass, a broadcast join
    against the bounded global bucket relation, one class rollup."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.select(
            "lang",
            "source",
            (F.floor(F.col("n_chars") / 100) * 100).alias("sens"),
        )
        .groupBy("lang", "source", "sens")
        .agg(F.count("*").alias("c"))
    )
    glob = cells.groupBy("sens").agg(F.sum("c").cast("long").alias("cg"))
    tot = glob.agg(F.sum("cg").cast("long").alias("n_tot"))
    w_cls = W.partitionBy("lang", "source")
    per = (
        cells.join(F.broadcast(glob), "sens")
        .withColumn("n", F.sum("c").over(w_cls))
        .crossJoin(F.broadcast(tot))
    )
    cls = per.groupBy("lang", "source").agg(
        F.max("n").cast("long").alias("class_size"),
        F.max("n_tot").cast("long").alias("n_tot"),
        F.sum(
            F.expr(
                "abs(CAST(c AS DECIMAL(38,0)) * n_tot"
                " - CAST(cg AS DECIMAL(38,0)) * n)"
                " - CAST(cg AS DECIMAL(38,0)) * n"
            )
        ).alias("present_sum"),
    )
    return cls.select(
        "lang",
        "source",
        "class_size",
        F.expr(
            "CAST(((CAST(class_size AS DECIMAL(38,0)) * n_tot"
            " + present_sum) * 1000000)"
            " div (2 * CAST(class_size AS DECIMAL(38,0)) * n_tot)"
            " AS BIGINT)"
        ).alias("t_ppm"),
    ).withColumn("above_t_02", F.col("t_ppm") > 200000).orderBy(
        "lang", "source"
    )


_Q365_SQL = """
WITH cells AS (
  SELECT lang, source,
         CAST(floor(n_chars / 100) * 100 AS BIGINT) AS sens,
         CAST(count(*) AS BIGINT) AS c
  FROM documents
  GROUP BY lang, source, 3
), gdist AS (
  SELECT sens, CAST(sum(c) AS BIGINT) AS cg FROM cells GROUP BY sens
), tot AS (
  SELECT CAST(sum(cg) AS BIGINT) AS n_tot FROM gdist
), per AS (
  SELECT cells.lang, cells.source, cells.c, gdist.cg, tot.n_tot,
         sum(cells.c) OVER (PARTITION BY cells.lang, cells.source) AS n
  FROM cells JOIN gdist USING (sens) CROSS JOIN tot
), cls AS (
  SELECT lang, source,
         CAST(max(n) AS BIGINT) AS class_size,
         CAST(max(n_tot) AS BIGINT) AS n_tot,
         CAST(sum(abs(CAST(c AS HUGEINT) * n_tot
                      - CAST(cg AS HUGEINT) * n)
                  - CAST(cg AS HUGEINT) * n) AS HUGEINT) AS present_sum
  FROM per
  GROUP BY lang, source
)
SELECT lang, source, class_size,
       CAST(((CAST(class_size AS HUGEINT) * n_tot + present_sum)
             * 1000000)
            // (2 * CAST(class_size AS HUGEINT) * n_tot) AS BIGINT)
         AS t_ppm,
       CAST(((CAST(class_size AS HUGEINT) * n_tot + present_sum)
             * 1000000)
            // (2 * CAST(class_size AS HUGEINT) * n_tot) AS BIGINT)
         > 200000 AS above_t_02
FROM cls
ORDER BY lang, source
"""


def q367_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the corpus's TRUE distinct-
    text population from two overlapping source 'captures' — the
    ecology estimator (Chapman 1951) a crawl operator uses to answer
    'how much of the deduplicated universe have we actually collected'
    from two independent feeds, complementing the frequency-based
    richness estimators (Chao1 q305, Good-Turing q261) with the
    two-sample incidence view.

    Captures are the two lexicographically-first sources' distinct
    md5(text) sets: n̂ = floor((n1+1)(n2+1)/(m+1)) − 1 (the
    bias-corrected Chapman form, exact integer floor), reported beside
    the OBSERVED union distinct count and coverage_ppm =
    observed·10⁶ div n̂.

    Shape at 100 TB: one distinct on (source, md5) (hash-only), a
    2-row broadcast of the chosen sources, one md5-keyed overlap join
    bounded by the smaller capture, three 1-row aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    sm = docs.select("source", F.md5("text").alias("h")).distinct()
    pick = sm.select("source").distinct().orderBy("source").limit(2)
    two = [r.source for r in pick.collect()]
    if len(two) < 2:
        return spark.createDataFrame(
            [],
            "source_a string, source_b string, n1 long, n2 long,"
            " m_overlap long, n_hat_chapman long, n_union_observed long,"
            " coverage_ppm long",
        )
    a, b = two[0], two[1]
    sa = sm.filter(F.col("source") == a).select("h")
    sb = sm.filter(F.col("source") == b).select("h")
    n1 = sa.agg(F.count("*").alias("n1"))
    n2 = sb.agg(F.count("*").alias("n2"))
    m = sa.join(sb, "h").agg(F.count("*").alias("m_overlap"))
    u = sa.unionByName(sb).distinct().agg(
        F.count("*").alias("n_union_observed")
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(u))
        .select(
            F.lit(a).alias("source_a"),
            F.lit(b).alias("source_b"),
            "n1",
            "n2",
            "m_overlap",
            F.expr(
                "CAST((n1 + 1) AS DECIMAL(38,0)) * (n2 + 1)"
                " div (m_overlap + 1) - 1"
            ).cast("long").alias("n_hat_chapman"),
            "n_union_observed",
            F.expr(
                "(n_union_observed * 1000000)"
                " div (CAST((n1 + 1) AS DECIMAL(38,0)) * (n2 + 1)"
                " div (m_overlap + 1) - 1)"
            ).cast("long").alias("coverage_ppm"),
        )
    )


_Q367_SQL = """
WITH sm AS (
  SELECT DISTINCT source, md5(text) AS h FROM documents
), pick AS (
  SELECT source FROM (SELECT DISTINCT source FROM sm)
  ORDER BY source LIMIT 2
), ab AS (
  SELECT min(source) AS sa, max(source) AS sb FROM pick
), n1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n1
  FROM sm, ab WHERE sm.source = ab.sa
), n2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n2
  FROM sm, ab WHERE sm.source = ab.sb
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS m_overlap
  FROM (SELECT h FROM sm, ab WHERE sm.source = ab.sa) x
  JOIN (SELECT h FROM sm, ab WHERE sm.source = ab.sb) y USING (h)
), u AS (
  SELECT CAST(count(DISTINCT h) AS BIGINT) AS n_union_observed
  FROM sm, ab WHERE sm.source IN (ab.sa, ab.sb)
)
SELECT ab.sa AS source_a, ab.sb AS source_b, n1, n2, m_overlap,
       CAST(CAST((n1 + 1) AS HUGEINT) * (n2 + 1) // (m_overlap + 1) - 1
            AS BIGINT) AS n_hat_chapman,
       n_union_observed,
       CAST((n_union_observed * 1000000)
            // (CAST((n1 + 1) AS HUGEINT) * (n2 + 1) // (m_overlap + 1)
                - 1) AS BIGINT) AS coverage_ppm
FROM ab, n1, n2, m, u
WHERE (SELECT count(*) FROM pick) = 2
"""


def q368_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-set SEMANTIC decontamination — the embedding-space
    complement of the lexical n-gram scans (q50/q84/q148): paraphrased
    benchmark leakage carries no shared 4-grams, so the release gate
    also flags corpus vectors whose cosine to ANY eval probe clears
    the threshold. Eval probes are the fixed vec_id < 32 slice (the
    q317/q318 held-out idiom); corpus is everything else; threshold
    0.45 (the q28 operating point for this embedding space).

    Output: one row per probe — how many corpus vectors it
    contaminates (n_flagged), its strongest match and cosine — plus
    the DISTINCT corpus removal count over all probes riding on every
    row (n_corpus_contaminated: the number the release actually
    deletes; a vector counts once however many probes it hits).

    Exactness: the shared q22 left-to-right cosine fold, round-4
    cosine, exact integer counts, (cos DESC, vec_id) top pick.

    Shape at 100 TB: the 32-probe side broadcasts; the corpus side is
    ONE linear scan scored against all probes (no self-join, no
    shuffle on the corpus); the rollups are probe-bounded. The scale
    path swaps the scan for the stored IVF index (q27/q56) probes."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("q"),
    )
    corpus = emb.filter(F.col("vec_id") >= 32).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    dot = F.expr(
        "aggregate(zip_with(q, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(
            f"aggregate(transform({c}, x -> x * x), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        )
    )
    hits = (
        corpus.crossJoin(F.broadcast(probes))
        .select(
            "query_id",
            "vec_id",
            F.round(dot / (norm("q") * norm("v")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= 0.45)
    )
    w1 = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    per = (
        hits.withColumn("r", F.row_number().over(w1))
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_flagged"),
            F.max(F.when(F.col("r") == 1, F.col("vec_id"))).alias(
                "top_match_id"
            ),
            F.max(F.when(F.col("r") == 1, F.col("cos"))).alias("top_cos"),
        )
    )
    removal = hits.select("vec_id").distinct().agg(
        F.count("*").alias("n_corpus_contaminated")
    )
    return (
        per.crossJoin(F.broadcast(removal))
        .select(
            "query_id",
            "n_flagged",
            "top_match_id",
            "top_cos",
            "n_corpus_contaminated",
        )
        .orderBy("query_id")
    )


_Q368_SQL = """
WITH probes AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q
  FROM embeddings WHERE vec_id < 32
), corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 32
), hits AS (
  SELECT query_id, vec_id,
         round(list_dot_product(q, v)
               / (sqrt(list_dot_product(q, q))
                  * sqrt(list_dot_product(v, v))), 4) AS cos
  FROM corpus CROSS JOIN probes
  WHERE round(list_dot_product(q, v)
              / (sqrt(list_dot_product(q, q))
                 * sqrt(list_dot_product(v, v))), 4) >= 0.45
), per AS (
  SELECT query_id,
         CAST(count(*) AS BIGINT) AS n_flagged,
         CAST(max(CASE WHEN r = 1 THEN vec_id END) AS BIGINT)
           AS top_match_id,
         max(CASE WHEN r = 1 THEN cos END) AS top_cos
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id) AS r
    FROM hits
  )
  GROUP BY query_id
), removal AS (
  SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_corpus_contaminated
  FROM hits
)
SELECT query_id, n_flagged, top_match_id, top_cos, n_corpus_contaminated
FROM per CROSS JOIN removal
ORDER BY query_id
"""


def q369_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong confidence interval for the ROC-AUC of the q363
    targeting score (event value → purchase): the standard
    nonparametric AUC variance (DeLong, DeLong & Clarke-Pearson 1988)
    via the placement-value decomposition — S10 over positives' V10,
    S01 over negatives' V01, SE = √(S10/n⁺ + S01/n⁻) — giving the CI
    that q272's point AUC (and this table's own auc_ppm) lacks.

    Exactness: the q272 count-table discipline — placement values
    come from cumulative positive/negative counts over the bounded
    distinct-score relation (never an n⁺×n⁻ pair join); auc_ppm is the
    exact integer (2·gt + ties)·10⁶ div (2·n⁺·n⁻); the only rationals
    (per-score-group squared deviations) quantize to pico BEFORE the
    sum (the q360 order-independence discipline); SE and the 1.96σ
    bounds (unclamped, documented) are one final double chain.
    Single-class data or n⁺ < 2 / n⁻ < 2 → NULL SE/CI.

    Shape at 100 TB: one (score) count-table collapse, two exclusive
    windows on the bounded score domain, a broadcast 1-row totals
    join, a 1-row reduction."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("si"),
        F.expr(
            "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("y"),
    )
    dom = e.groupBy("si").agg(
        F.sum("y").alias("cp"),
        F.sum(1 - F.col("y")).alias("cn"),
    )
    w_b = W.orderBy("si").rowsBetween(W.unboundedPreceding, -1)
    cum = dom.select(
        "si", "cp", "cn",
        F.coalesce(F.sum("cn").over(w_b), F.lit(0)).alias("nb"),
        F.coalesce(F.sum("cp").over(w_b), F.lit(0)).alias("pb"),
    )
    tot = dom.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cn").cast("long").alias("nn"),
        F.sum(F.expr("CAST(cp AS DECIMAL(38,0)) * cn")).alias("ties"),
    )
    gt = cum.agg(
        F.sum(F.expr("CAST(cp AS DECIMAL(38,0)) * nb")).alias("gt")
    )
    # nullif denominators: Spark's subexpression elimination hoists
    # shared divisions OUT of CASE guards, so an ANSI divide-by-zero
    # fires on single-class data even inside a gated branch — NULL
    # propagation is the safe idiom (the gates then never see it).
    auc = (
        "((2.0e0 * CAST(gt AS DOUBLE) + CAST(ties AS DOUBLE))"
        " / nullif(2.0e0 * CAST(np AS DOUBLE) * nn, 0.0e0))"
    )
    v = (
        "((CAST(nb AS DOUBLE) + CAST(cn AS DOUBLE) / 2)"
        " / nullif(CAST(nn AS DOUBLE), 0.0e0))"
    )
    wexpr = (
        "((CAST(np AS DOUBLE) - pb - cp + CAST(cp AS DOUBLE) / 2)"
        " / nullif(CAST(np AS DOUBLE), 0.0e0))"
    )
    terms = cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(gt))
    quad = terms.agg(
        F.sum(
            F.expr(
                f"CAST(round(cp * ({v} - {auc}) * ({v} - {auc}) * 1e12)"
                " AS DECIMAL(38,0))"
            )
        ).alias("s10_pico"),
        F.sum(
            F.expr(
                f"CAST(round(cn * ({wexpr} - {auc}) * ({wexpr} - {auc})"
                " * 1e12) AS DECIMAL(38,0))"
            )
        ).alias("s01_pico"),
    )
    se = (
        "sqrt(CAST(s10_pico AS DOUBLE) / 1e12"
        " / nullif(CAST(np - 1 AS DOUBLE), 0.0e0) / np"
        " + CAST(s01_pico AS DOUBLE) / 1e12"
        " / nullif(CAST(nn - 1 AS DOUBLE), 0.0e0) / nn)"
    )
    return (
        tot.crossJoin(F.broadcast(gt))
        .crossJoin(F.broadcast(quad))
        .select(
            F.col("np").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            F.expr(
                "CASE WHEN np > 0 AND nn > 0 THEN"
                " CAST((2 * gt + ties) * 1000000"
                " div (2 * CAST(np AS DECIMAL(38,0)) * nn) AS BIGINT) END"
            ).alias("auc_ppm"),
            F.expr(
                "CASE WHEN np >= 2 AND nn >= 2 THEN"
                f" CAST(round({se} * 1e6) AS BIGINT) END"
            ).alias("se_micro"),
            F.expr(
                "CASE WHEN np >= 2 AND nn >= 2 THEN"
                f" CAST(round(({auc} - 1.96e0 * {se}) * 1e6) AS BIGINT)"
                " END"
            ).alias("ci_lo_micro"),
            F.expr(
                "CASE WHEN np >= 2 AND nn >= 2 THEN"
                f" CAST(round(({auc} + 1.96e0 * {se}) * 1e6) AS BIGINT)"
                " END"
            ).alias("ci_hi_micro"),
        )
    )


def _q369_sql() -> str:
    auc = (
        "((2.0 * CAST(gt AS DOUBLE) + CAST(ties AS DOUBLE))"
        " / nullif(2.0 * CAST(np AS DOUBLE) * nn, 0.0))"
    )
    v = (
        "((CAST(nb AS DOUBLE) + CAST(cn AS DOUBLE) / 2)"
        " / nullif(CAST(nn AS DOUBLE), 0.0))"
    )
    wexpr = (
        "((CAST(np AS DOUBLE) - pb - cp + CAST(cp AS DOUBLE) / 2)"
        " / nullif(CAST(np AS DOUBLE), 0.0))"
    )
    se = (
        "sqrt(CAST(s10_pico AS DOUBLE) / 1e12"
        " / nullif(CAST(np - 1 AS DOUBLE), 0.0) / np"
        " + CAST(s01_pico AS DOUBLE) / 1e12"
        " / nullif(CAST(nn - 1 AS DOUBLE), 0.0) / nn)"
    )
    return f"""
WITH e AS (
  SELECT CAST(round(value * 1000) AS BIGINT) AS si,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS y
  FROM events
), dom AS (
  SELECT si, CAST(sum(y) AS BIGINT) AS cp,
         CAST(sum(1 - y) AS BIGINT) AS cn
  FROM e GROUP BY si
), cum AS (
  SELECT si, cp, cn,
         coalesce(sum(cn) OVER (ORDER BY si
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb,
         coalesce(sum(cp) OVER (ORDER BY si
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pb
  FROM dom
), tot AS (
  SELECT CAST(sum(cp) AS BIGINT) AS np,
         CAST(sum(cn) AS BIGINT) AS nn,
         CAST(sum(CAST(cp AS HUGEINT) * cn) AS HUGEINT) AS ties
  FROM dom
), gtx AS (
  SELECT CAST(sum(CAST(cp AS HUGEINT) * nb) AS HUGEINT) AS gt FROM cum
), quad AS (
  SELECT CAST(sum(CASE WHEN np >= 2 AND nn >= 2 THEN
                    CAST(round(cp * ({v} - {auc}) * ({v} - {auc}) * 1e12)
                         AS HUGEINT) ELSE 0 END) AS HUGEINT) AS s10_pico,
         CAST(sum(CASE WHEN np >= 2 AND nn >= 2 THEN
                    CAST(round(cn * ({wexpr} - {auc}) * ({wexpr} - {auc})
                               * 1e12) AS HUGEINT) ELSE 0 END) AS HUGEINT)
           AS s01_pico
  FROM cum CROSS JOIN tot CROSS JOIN gtx
)
SELECT np AS n_pos, nn AS n_neg,
       CASE WHEN np > 0 AND nn > 0 THEN
         CAST((2 * gt + ties) * 1000000
              // (2 * CAST(np AS HUGEINT) * nn) AS BIGINT) END AS auc_ppm,
       CASE WHEN np >= 2 AND nn >= 2 THEN
         CAST(round({se} * 1e6) AS BIGINT) END AS se_micro,
       CASE WHEN np >= 2 AND nn >= 2 THEN
         CAST(round(({auc} - 1.96 * {se}) * 1e6) AS BIGINT) END
         AS ci_lo_micro,
       CASE WHEN np >= 2 AND nn >= 2 THEN
         CAST(round(({auc} + 1.96 * {se}) * 1e6) AS BIGINT) END
         AS ci_hi_micro
FROM tot CROSS JOIN gtx CROSS JOIN quad
"""


def q371_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling test on document length (src0 vs
    src1), tie-adjusted (the k=2 case of Scholz & Stephens 1987's
    A²ₐₖₙ with midrank B_j/M_ij) — completes the EDF-distance family:
    KS (q309) weights the largest CDF gap, Cramér-von Mises (q343)
    integrates it uniformly, Anderson-Darling up-weights the TAILS
    (1/(H(1−H))), the region where corpus drift usually starts.

    Exactness: everything derives from the pooled length count table —
    B_j = cumᵢ − l_j/2 and M_ij are exact half-integers over exact
    counts; each group's NORMALIZED contribution
    (N−1)/N²·Σᵢ l_j(N·M_ij − nᵢ·B_j)²/(nᵢ·D_j), D_j = B_j(N−B_j) −
    N·l_j/4, is one deterministic double over those integers,
    quantized to pico BEFORE the sum (the q360 order-independence
    discipline). Groups with D_j ≤ 0 (possible only in degenerate
    pooled distributions) are excluded and counted; no valid group or
    an empty side → NULL statistic. Under H₀, E[A²] = k−1 = 1.

    Shape at 100 TB: two pushed source filters → grouped counts over
    the bounded length domain, two cumulative windows there, a 1-row
    reduction. Never a raw-row sort."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .select(
            F.col("n_chars").alias("v"),
            F.expr(
                "CAST(CASE WHEN source = 'src0' THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("is1"),
        )
        .groupBy("v")
        .agg(
            F.sum("is1").alias("f1"),
            F.sum(1 - F.col("is1")).alias("f2"),
        )
        .withColumn("l", F.col("f1") + F.col("f2"))
    )
    w_c = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = cnt.select(
        "v", "f1", "f2", "l",
        F.sum("l").over(w_c).alias("cl"),
        F.sum("f1").over(w_c).alias("c1"),
        F.sum("f2").over(w_c).alias("c2"),
    )
    tot = cnt.agg(
        F.sum("f1").cast("long").alias("n1"),
        F.sum("f2").cast("long").alias("n2"),
        F.sum("l").cast("long").alias("nn"),
    )
    b = "(CAST(cl AS DOUBLE) - CAST(l AS DOUBLE) / 2)"
    m1 = "(CAST(c1 AS DOUBLE) - CAST(f1 AS DOUBLE) / 2)"
    m2 = "(CAST(c2 AS DOUBLE) - CAST(f2 AS DOUBLE) / 2)"
    d = f"({b} * (nn - {b}) - CAST(nn AS DOUBLE) * l / 4)"
    term = (
        f"((CAST(nn AS DOUBLE) - 1) / (CAST(nn AS DOUBLE) * nn)"
        f" * l * (pow(nn * {m1} - n1 * {b}, 2) / nullif(CAST(n1 AS"
        f" DOUBLE), 0.0e0) + pow(nn * {m2} - n2 * {b}, 2)"
        f" / nullif(CAST(n2 AS DOUBLE), 0.0e0)) / nullif({d}, 0.0e0))"
    )
    terms = cum.crossJoin(F.broadcast(tot))
    agg = terms.agg(
        F.sum(
            F.expr(
                f"CASE WHEN {d} > 0 THEN"
                f" CAST(round({term} * 1e12) AS DECIMAL(38,0))"
                " ELSE CAST(0 AS DECIMAL(38,0)) END"
            )
        ).alias("a2_pico"),
        F.sum(F.expr(f"CASE WHEN {d} > 0 THEN 1 ELSE 0 END")).cast(
            "long"
        ).alias("n_values_used"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    return agg.select(
        "n1",
        "n2",
        "n_values_used",
        F.expr(
            "CASE WHEN n1 > 0 AND n2 > 0 AND n_values_used > 0 THEN"
            " CAST(round(CAST(a2_pico AS DOUBLE) / 1e6) AS BIGINT) END"
        ).alias("a2_micro"),
    )


def _q371_sql() -> str:
    b = "(CAST(cl AS DOUBLE) - CAST(l AS DOUBLE) / 2)"
    m1 = "(CAST(c1 AS DOUBLE) - CAST(f1 AS DOUBLE) / 2)"
    m2 = "(CAST(c2 AS DOUBLE) - CAST(f2 AS DOUBLE) / 2)"
    d = f"({b} * (nn - {b}) - CAST(nn AS DOUBLE) * l / 4)"
    term = (
        f"((CAST(nn AS DOUBLE) - 1) / (CAST(nn AS DOUBLE) * nn)"
        f" * l * (pow(nn * {m1} - n1 * {b}, 2) / nullif(CAST(n1 AS"
        f" DOUBLE), 0.0) + pow(nn * {m2} - n2 * {b}, 2)"
        f" / nullif(CAST(n2 AS DOUBLE), 0.0)) / nullif({d}, 0.0))"
    )
    return f"""
WITH cnt AS (
  SELECT n_chars AS v,
         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
              AS BIGINT) AS f1,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
              AS BIGINT) AS f2
  FROM documents
  WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
), cum AS (
  SELECT v, f1, f2, f1 + f2 AS l,
         sum(f1 + f2) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
         sum(f1) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         sum(f2) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
  FROM cnt
), tot AS (
  SELECT CAST(sum(f1) AS BIGINT) AS n1,
         CAST(sum(f2) AS BIGINT) AS n2,
         CAST(sum(f1 + f2) AS BIGINT) AS nn
  FROM cnt
), agg AS (
  SELECT CAST(sum(CASE WHEN {d} > 0 THEN
                    CAST(round({term} * 1e12) AS HUGEINT)
                  ELSE 0 END) AS HUGEINT) AS a2_pico,
         CAST(sum(CASE WHEN {d} > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_values_used,
         CAST(max(n1) AS BIGINT) AS n1,
         CAST(max(n2) AS BIGINT) AS n2
  FROM cum CROSS JOIN tot
)
SELECT n1, n2, n_values_used,
       CASE WHEN n1 > 0 AND n2 > 0 AND n_values_used > 0 THEN
         CAST(round(CAST(a2_pico AS DOUBLE) / 1e6) AS BIGINT) END
         AS a2_micro
FROM agg
"""


QUERIES = {
    "q18_text_stats": q18_text_stats,
    "q19_token_counts": q19_token_counts,
    "q20_lang_profile": q20_lang_profile,
    "q21_exact_dedup": q21_exact_dedup,
    "q22_cosine_topk": q22_cosine_topk,
    "q23_fingerprint": q23_fingerprint,
    "q24_ngram_jaccard_pairs": q24_ngram_jaccard_pairs,
    "q25_minhash_lsh_pairs": q25_minhash_lsh_pairs,
    "q26_simhash_pairs": q26_simhash_pairs,
    "q27_ivf_topk": q27_ivf_topk,
    "q28_embedding_near_dups": q28_embedding_near_dups,
    "q29_lang_id": q29_lang_id,
    "q42_dedup_clusters": q42_dedup_clusters,
    "q43_vocabulary": q43_vocabulary,
    "q45_repetition_metrics": q45_repetition_metrics,
    "q46_token_entropy": q46_token_entropy,
    "q47_stratified_sample": q47_stratified_sample,
    "q48_pack_sequences": q48_pack_sequences,
    "q49_unigram_logprob": q49_unigram_logprob,
    "q50_decontamination": q50_decontamination,
    "q51_bm25_keyword_search": q51_bm25_keyword_search,
    "q52_pii_redaction": q52_pii_redaction,
    "q53_chunk_dedup": q53_chunk_dedup,
    "q54_top_bigrams": q54_top_bigrams,
    "q55_semantic_dedup": q55_semantic_dedup,
    "q56_ivf_search_seeded": q56_ivf_search_seeded,
    "q58_gopher_quality_flags": q58_gopher_quality_flags,
    "q59_cooccurrence_pmi": q59_cooccurrence_pmi,
    "q64_tfidf_top_terms": q64_tfidf_top_terms,
    "q69_weighted_sample": q69_weighted_sample,
    "q71_per_source_quota": q71_per_source_quota,
    "q77_dedup_clusters_pointer": q77_dedup_clusters_pointer,
    "q79_rag_chunks": q79_rag_chunks,
    "q81_minhash_delta": q81_minhash_delta,
    "q83_leakage_safe_split": q83_leakage_safe_split,
    "q84_split_leakage_audit": q84_split_leakage_audit,
    "q85_epoch_mixture": q85_epoch_mixture,
    "q86_token_budget_selection": q86_token_budget_selection,
    "q90_source_overlap": q90_source_overlap,
    "q92_ensemble_near_dups": q92_ensemble_near_dups,
    "q93_canonical_dedup": q93_canonical_dedup,
    "q94_exact_k_sample": q94_exact_k_sample,
    "q95_diversity_cap_sample": q95_diversity_cap_sample,
    "q96_bloom_novelty": q96_bloom_novelty,
    "q97_pq_adc_topk": q97_pq_adc_topk,
    "q99_weighted_exact_k": q99_weighted_exact_k,
    "q100_ivf_pq_search": q100_ivf_pq_search,
    "q102_dsir_weights": q102_dsir_weights,
    "q103_span_dup_profile": q103_span_dup_profile,
    "q104_quality_classifier": q104_quality_classifier,
    "q105_winnowed_dup_profile": q105_winnowed_dup_profile,
    "q106_kmv_vocab_overlap": q106_kmv_vocab_overlap,
    "q107_perplexity_buckets": q107_perplexity_buckets,
    "q108_quality_aware_keepers": q108_quality_aware_keepers,
    "q109_span_excision": q109_span_excision,
    "q112_int8_quantization": q112_int8_quantization,
    "q113_sq8_search_recall": q113_sq8_search_recall,
    "q115_sparse_cosine_pairs": q115_sparse_cosine_pairs,
    "q117_bpe_merge_candidates": q117_bpe_merge_candidates,
    "q119_corpus_datasheet": q119_corpus_datasheet,
    "q120_contrastive_negatives": q120_contrastive_negatives,
    "q122_embedding_drift": q122_embedding_drift,
    "q123_k_anonymity": q123_k_anonymity,
    "q130_lsh_recall_audit": q130_lsh_recall_audit,
    "q134_scaling_subsets": q134_scaling_subsets,
    "q136_stratified_split": q136_stratified_split,
    "q137_dedup_effectiveness": q137_dedup_effectiveness,
    "q139_exact_heavy_bigrams": q139_exact_heavy_bigrams,
    "q141_cluster_size_histogram": q141_cluster_size_histogram,
    "q142_langid_confusion": q142_langid_confusion,
    "q143_classifier_threshold_sweep": q143_classifier_threshold_sweep,
    "q145_interleaved_batches": q145_interleaved_batches,
    "q146_ivf_recall_audit": q146_ivf_recall_audit,
    "q147_pipeline_funnel": q147_pipeline_funnel,
    "q148_contamination_by_source": q148_contamination_by_source,
    "q149_signature_tier_agreement": q149_signature_tier_agreement,
    "q156_boilerplate_excision": q156_boilerplate_excision,
    "q157_vocab_growth": q157_vocab_growth,
    "q158_ngram_novelty": q158_ngram_novelty,
    "q159_context_fit": q159_context_fit,
    "q164_partition_layout_audit": q164_partition_layout_audit,
    "q167_embedding_health": q167_embedding_health,
    "q170_lsh_band_sweep": q170_lsh_band_sweep,
    "q172_reliability_bins": q172_reliability_bins,
    "q179_label_centroid_affinity": q179_label_centroid_affinity,
    "q183_source_copy_rings": q183_source_copy_rings,
    "q192_psi_drift": q192_psi_drift,
    "q198_source_entropy": q198_source_entropy,
    "q202_zipf_slope": q202_zipf_slope,
    "q206_vocab_coverage": q206_vocab_coverage,
    "q207_containment_pairs": q207_containment_pairs,
    "q211_js_source_drift": q211_js_source_drift,
    "q212_keyness_loglik": q212_keyness_loglik,
    "q213_edit_distance_pairs": q213_edit_distance_pairs,
    "q216_bag_of_words_dedup": q216_bag_of_words_dedup,
    "q220_phrase_search": q220_phrase_search,
    "q232_token_burstiness": q232_token_burstiness,
    "q236_flesch_readability": q236_flesch_readability,
    "q237_kneser_ney_bigrams": q237_kneser_ney_bigrams,
    "q240_mattr_lexical_diversity": q240_mattr_lexical_diversity,
    "q249_kn_perplexity": q249_kn_perplexity,
    "q252_jackknife_by_source": q252_jackknife_by_source,
    "q254_burrows_delta": q254_burrows_delta,
    "q256_mmr_selection": q256_mmr_selection,
    "q257_rrf_hybrid_search": q257_rrf_hybrid_search,
    "q258_ndcg_eval": q258_ndcg_eval,
    "q259_count_min_tokens": q259_count_min_tokens,
    "q260_isotonic_calibration": q260_isotonic_calibration,
    "q261_good_turing": q261_good_turing,
    "q262_length_bucket_padding": q262_length_bucket_padding,
    "q263_pca_power_iteration": q263_pca_power_iteration,
    "q265_calibration_scorecard": q265_calibration_scorecard,
    "q268_cochran_armitage_trend": q268_cochran_armitage_trend,
    "q269_effect_sizes": q269_effect_sizes,
    "q270_davies_bouldin": q270_davies_bouldin,
    "q271_silhouette_simplified": q271_silhouette_simplified,
    "q272_roc_auc": q272_roc_auc,
    "q274_jonckheere_terpstra": q274_jonckheere_terpstra,
    "q275_calinski_harabasz": q275_calinski_harabasz,
    "q276_average_precision": q276_average_precision,
    "q277_temperature_mixing": q277_temperature_mixing,
    "q278_fim_transform": q278_fim_transform,
    "q279_span_corruption": q279_span_corruption,
    "q280_binary_hamming_recall": q280_binary_hamming_recall,
    "q281_dispersion_dp": q281_dispersion_dp,
    "q282_lang_source_nmi": q282_lang_source_nmi,
    "q284_tokenizer_fertility": q284_tokenizer_fertility,
    "q287_dedup_distribution_shift": q287_dedup_distribution_shift,
    "q288_murphy_decomposition": q288_murphy_decomposition,
    "q290_embedding_isotropy": q290_embedding_isotropy,
    "q293_quantile_normalization": q293_quantile_normalization,
    "q294_neyman_allocation": q294_neyman_allocation,
    "q302_hyperloglog_vocab": q302_hyperloglog_vocab,
    "q303_rank_biased_overlap": q303_rank_biased_overlap,
    "q305_chao1_vocab_richness": q305_chao1_vocab_richness,
    "q308_cohens_kappa": q308_cohens_kappa,
    "q309_ks_two_sample": q309_ks_two_sample,
    "q310_lexical_concentration": q310_lexical_concentration,
    "q312_categorical_effect_size": q312_categorical_effect_size,
    "q313_g_test": q313_g_test,
    "q314_mrl_truncation_recall": q314_mrl_truncation_recall,
    "q315_hubness_audit": q315_hubness_audit,
    "q317_ann_tier_scoreboard": q317_ann_tier_scoreboard,
    "q318_ivf_nprobe_sweep": q318_ivf_nprobe_sweep,
    "q319_source_tvd_matrix": q319_source_tvd_matrix,
    "q320_bloom_fpr_audit": q320_bloom_fpr_audit,
    "q326_vocab_budget_curve": q326_vocab_budget_curve,
    "q327_pq_distortion": q327_pq_distortion,
    "q328_minhash_accuracy_audit": q328_minhash_accuracy_audit,
    "q329_source_length_percentiles": q329_source_length_percentiles,
    "q330_ivf_cell_balance": q330_ivf_cell_balance,
    "q331_heaps_law_fit": q331_heaps_law_fit,
    "q332_mood_median_test": q332_mood_median_test,
    "q335_token_rank_movers": q335_token_rank_movers,
    "q336_ann_cost_frontier": q336_ann_cost_frontier,
    "q338_kmv_accuracy_audit": q338_kmv_accuracy_audit,
    "q339_dedup_tier_scoreboard": q339_dedup_tier_scoreboard,
    "q340_hellinger_matrix": q340_hellinger_matrix,
    "q348_drift_tier_scoreboard": q348_drift_tier_scoreboard,
    "q350_sketch_audit_scoreboard": q350_sketch_audit_scoreboard,
    "q355_knn_label_agreement": q355_knn_label_agreement,
    "q356_distinct_n_diversity": q356_distinct_n_diversity,
    "q363_lift_gains": q363_lift_gains,
    "q364_l_diversity": q364_l_diversity,
    "q365_t_closeness": q365_t_closeness,
    "q367_capture_recapture": q367_capture_recapture,
    "q368_semantic_decontamination": q368_semantic_decontamination,
    "q369_auc_delong": q369_auc_delong,
    "q371_anderson_darling": q371_anderson_darling,
}

ORACLES = {
    "q18_text_stats": _Q18_SQL,
    "q19_token_counts": _Q19_SQL,
    "q20_lang_profile": _Q20_SQL,
    "q21_exact_dedup": _Q21_SQL,
    "q22_cosine_topk": _Q22_SQL,
    "q23_fingerprint": _Q23_SQL,
    "q24_ngram_jaccard_pairs": _Q24_SQL,
    "q25_minhash_lsh_pairs": _Q25_SQL,
    "q26_simhash_pairs": _Q26_SQL,
    "q27_ivf_topk": _Q27_SQL,
    "q28_embedding_near_dups": _q28_sql(),
    "q29_lang_id": _Q29_SQL,
    "q42_dedup_clusters": _Q42_SQL,
    "q43_vocabulary": _Q43_SQL,
    "q45_repetition_metrics": _Q45_SQL,
    "q46_token_entropy": _Q46_SQL,
    "q47_stratified_sample": _q47_sql(),
    "q48_pack_sequences": _Q48_SQL,
    "q49_unigram_logprob": _Q49_SQL,
    "q50_decontamination": _Q50_SQL,
    "q51_bm25_keyword_search": _q51_sql(),
    "q52_pii_redaction": _q52_sql(),
    "q53_chunk_dedup": _Q53_SQL,
    "q54_top_bigrams": _Q54_SQL,
    "q55_semantic_dedup": _q55_sql(),
    "q56_ivf_search_seeded": _Q56_SQL,
    "q58_gopher_quality_flags": _Q58_SQL,
    "q59_cooccurrence_pmi": _Q59_SQL,
    "q64_tfidf_top_terms": _Q64_SQL,
    "q69_weighted_sample": _Q69_SQL,
    "q71_per_source_quota": _Q71_SQL,
    "q77_dedup_clusters_pointer": _Q42_SQL,
    "q79_rag_chunks": _Q79_SQL,
    "q81_minhash_delta": _q81_sql(),
    "q83_leakage_safe_split": _Q83_SQL,
    "q84_split_leakage_audit": _Q84_SQL,
    "q85_epoch_mixture": _Q85_SQL,
    "q86_token_budget_selection": _Q86_SQL,
    "q90_source_overlap": _Q90_SQL,
    "q92_ensemble_near_dups": _q92_sql(),
    "q93_canonical_dedup": _Q93_SQL,
    "q94_exact_k_sample": _Q94_SQL,
    "q95_diversity_cap_sample": _Q95_SQL,
    "q96_bloom_novelty": _Q96_SQL,
    "q97_pq_adc_topk": _Q97_SQL,
    "q99_weighted_exact_k": _Q99_SQL,
    "q100_ivf_pq_search": _Q100_SQL,
    "q102_dsir_weights": _Q102_SQL,
    "q103_span_dup_profile": _Q103_SQL,
    "q104_quality_classifier": _Q104_SQL,
    "q105_winnowed_dup_profile": _Q105_SQL,
    "q106_kmv_vocab_overlap": _Q106_SQL,
    "q107_perplexity_buckets": _Q107_SQL,
    "q108_quality_aware_keepers": _Q108_SQL,
    "q109_span_excision": _Q109_SQL,
    "q112_int8_quantization": _Q112_SQL,
    "q113_sq8_search_recall": _Q113_SQL,
    "q115_sparse_cosine_pairs": _Q115_SQL,
    "q117_bpe_merge_candidates": _Q117_SQL,
    "q119_corpus_datasheet": _Q119_SQL,
    "q120_contrastive_negatives": _Q120_SQL,
    "q122_embedding_drift": _Q122_SQL,
    "q123_k_anonymity": _Q123_SQL,
    "q130_lsh_recall_audit": _q130_sql(),
    "q134_scaling_subsets": _Q134_SQL,
    "q136_stratified_split": _Q136_SQL,
    "q137_dedup_effectiveness": _Q137_SQL,
    "q139_exact_heavy_bigrams": _Q139_SQL,
    "q141_cluster_size_histogram": _q141_sql(),
    "q142_langid_confusion": _q142_sql(),
    "q143_classifier_threshold_sweep": _q143_sql(),
    "q145_interleaved_batches": _Q145_SQL,
    "q146_ivf_recall_audit": _q146_sql(),
    "q147_pipeline_funnel": _q147_sql(),
    "q148_contamination_by_source": _Q148_SQL,
    "q149_signature_tier_agreement": _q149_sql(),
    "q156_boilerplate_excision": _Q156_SQL,
    "q157_vocab_growth": _Q157_SQL,
    "q158_ngram_novelty": _Q158_SQL,
    "q159_context_fit": _Q159_SQL,
    "q164_partition_layout_audit": _Q164_SQL,
    "q167_embedding_health": _Q167_SQL,
    "q170_lsh_band_sweep": _q170_sql(),
    "q172_reliability_bins": _q172_sql(),
    "q179_label_centroid_affinity": _Q179_SQL,
    "q183_source_copy_rings": _q183_sql(),
    "q192_psi_drift": _Q192_SQL,
    "q198_source_entropy": _Q198_SQL,
    "q202_zipf_slope": _Q202_SQL,
    "q206_vocab_coverage": _Q206_SQL,
    "q207_containment_pairs": _Q207_SQL,
    "q211_js_source_drift": _Q211_SQL,
    "q212_keyness_loglik": _Q212_SQL,
    "q213_edit_distance_pairs": _Q213_SQL,
    "q216_bag_of_words_dedup": _Q216_SQL,
    "q220_phrase_search": _Q220_SQL,
    "q232_token_burstiness": _Q232_SQL,
    "q236_flesch_readability": _Q236_SQL,
    "q237_kneser_ney_bigrams": _Q237_SQL,
    "q240_mattr_lexical_diversity": _Q240_SQL,
    "q249_kn_perplexity": _Q249_SQL,
    "q252_jackknife_by_source": _Q252_SQL,
    "q254_burrows_delta": _Q254_SQL,
    "q256_mmr_selection": _Q256_SQL,
    "q257_rrf_hybrid_search": _q257_sql(),
    "q258_ndcg_eval": _Q258_SQL,
    "q259_count_min_tokens": _Q259_SQL,
    "q260_isotonic_calibration": _q260_sql(),
    "q261_good_turing": _Q261_SQL,
    "q262_length_bucket_padding": _Q262_SQL,
    "q263_pca_power_iteration": _q263_sql(),
    "q265_calibration_scorecard": _q265_sql(),
    "q268_cochran_armitage_trend": _q268_sql(),
    "q269_effect_sizes": _Q269_SQL,
    "q270_davies_bouldin": _Q270_SQL,
    "q271_silhouette_simplified": _Q271_SQL,
    "q272_roc_auc": _q272_sql(),
    "q274_jonckheere_terpstra": _q274_sql(),
    "q275_calinski_harabasz": _Q275_SQL,
    "q276_average_precision": _q276_sql(),
    "q277_temperature_mixing": _Q277_SQL,
    "q278_fim_transform": _Q278_SQL,
    "q279_span_corruption": _Q279_SQL,
    "q280_binary_hamming_recall": _Q280_SQL,
    "q281_dispersion_dp": _Q281_SQL,
    "q282_lang_source_nmi": _Q282_SQL,
    "q284_tokenizer_fertility": _Q284_SQL,
    "q287_dedup_distribution_shift": _q287_sql(),
    "q288_murphy_decomposition": _q288_sql(),
    "q290_embedding_isotropy": _Q290_SQL,
    "q293_quantile_normalization": _q293_sql(),
    "q294_neyman_allocation": _Q294_SQL,
    "q302_hyperloglog_vocab": _Q302_SQL,
    "q303_rank_biased_overlap": _Q303_SQL,
    "q305_chao1_vocab_richness": _Q305_SQL,
    "q308_cohens_kappa": _q308_sql(),
    "q309_ks_two_sample": _Q309_SQL,
    "q310_lexical_concentration": _Q310_SQL,
    "q312_categorical_effect_size": _Q312_SQL,
    "q313_g_test": _Q313_SQL,
    "q314_mrl_truncation_recall": _Q314_SQL,
    "q315_hubness_audit": _Q315_SQL,
    "q317_ann_tier_scoreboard": _q317_sql(),
    "q318_ivf_nprobe_sweep": _Q318_SQL,
    "q319_source_tvd_matrix": _Q319_SQL,
    "q320_bloom_fpr_audit": _Q320_SQL,
    "q326_vocab_budget_curve": _Q326_SQL,
    "q327_pq_distortion": _Q327_SQL,
    "q328_minhash_accuracy_audit": _q328_sql(),
    "q329_source_length_percentiles": _Q329_SQL,
    "q330_ivf_cell_balance": _Q330_SQL,
    "q331_heaps_law_fit": _Q331_SQL,
    "q332_mood_median_test": _Q332_SQL,
    "q335_token_rank_movers": _Q335_SQL,
    "q336_ann_cost_frontier": _Q336_SQL,
    "q338_kmv_accuracy_audit": _Q338_SQL,
    "q339_dedup_tier_scoreboard": _q339_sql(),
    "q340_hellinger_matrix": _Q340_SQL,
    "q348_drift_tier_scoreboard": _q348_sql(),
    "q350_sketch_audit_scoreboard": _q350_sql(),
    "q355_knn_label_agreement": _Q355_SQL,
    "q356_distinct_n_diversity": _Q356_SQL,
    "q363_lift_gains": _Q363_SQL,
    "q364_l_diversity": _Q364_SQL,
    "q365_t_closeness": _Q365_SQL,
    "q367_capture_recapture": _Q367_SQL,
    "q368_semantic_decontamination": _Q368_SQL,
    "q369_auc_delong": _q369_sql(),
    "q371_anderson_darling": _q371_sql(),
}
