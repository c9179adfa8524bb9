"""Mechanically split from plans/llm.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...sources.files import load_table
from .dedup import (
    _Q320_SQL,
    _Q338_SQL,
    _q328_sql,
    q320_bloom_fpr_audit,
    q328_minhash_accuracy_audit,
    q338_kmv_accuracy_audit,
)
from .text import (
    _Q259_SQL,
    _Q302_SQL,
    q259_count_min_tokens,
    q302_hyperloglog_vocab,
)


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
    from ...operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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
    from ...operators.similarity import hash_seed_centroids, ivf_search

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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


def q97_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (north star: the COMPRESSED ANN
    scale path — at 100 TB the scored relation is (id, 4 codes), 64×
    smaller than raw vectors). Codebooks are subspace slices of the
    hash-seeded sample (operators/similarity.pq_codebooks), so encoding
    (per-subspace argmin), asymmetric scoring, and top-k all replay in
    the SQL oracle — the q56 argument applied to compression. Explicit
    left-to-right summation chain on both sides for float parity."""
    from ...operators.similarity import pq_adc_topk, pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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


def q100_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search (the FAISS IVF16,PQ4 production composition):
    IVF cell pruning bounds WHICH rows score (nprobe=4 of 16 cells —
    partition pruning at scale), PQ/ADC bounds WHAT each row costs (4 int
    codes, 64× narrower than raw vectors). Centroids AND codebooks are
    hash-seeded from the same portable sample, so seeding, assignment,
    probe selection, encoding, ADC, and top-k ALL replay in the SQL
    oracle — the capstone of the q56/q97 oracle-checkable-ANN argument."""
    from ...operators.similarity import (
        hash_seed_centroids,
        ivf_pq_topk,
        pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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


def q112_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization audit (operators/similarity.
    quantize_int8): per-vector scale, an md5 digest of the full int8 code
    sequence (array columns stringify differently across engines — the
    digest certifies every code byte-exactly), and the reconstruction
    error stats a pipeline gates on before switching its scoring tier to
    the 4×-smaller table.

    Presentation sort below the quantization projection (r10, same
    reasoning as q45): range-exchange sampling runs its child twice, so
    sorting the raw embeddings first runs the quantize+digest pass once
    (0.77 s -> 0.56 s at sf0.1), byte-identical output."""
    from ...operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    q = quantize_int8(emb)
    return q.select(
        "vec_id",
        "scale",
        F.md5(F.array_join("qvec", ",")).alias("codes_md5"),
        "max_abs_err",
        "cos_recon",
    )


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
    from ...operators.similarity import quantize_int8

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
    from ...operators.similarity import cosine_topk

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
    from ...operators.dedup import sparse_cosine_pairs

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
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


def q122_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-centroid drift between two snapshot halves of
    the embeddings table (operators/similarity.embedding_drift):
    components quantize to integers so the per-dim sums are exact
    bigints under ANY aggregation order — the float-sum-across-rows
    hazard is designed out — and the only floats are the final
    per-label folds over 64 aggregated sums, bit-identical in SQL."""
    from ...operators.similarity import embedding_drift

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


def q146_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query IVF recall, driver-visible (the q113 audit pattern
    applied to the IVF tier): the q56 hash-seeded IVF search (nprobe
    4/16) against the q22 brute-force top-5 — per query, the pruned
    tier's hit list and its overlap with ground truth. Both pipelines
    already replay in SQL, so the composed oracle certifies the search
    AND the audit; the pytest recall gate becomes an official
    correctness row."""
    from ...operators.similarity import cosine_topk, hash_seed_centroids, ivf_search

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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
    from ...operators.similarity import cosine_topk

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
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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
    from ...operators.similarity import cosine_topk

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
        load_table(spark, sf_dir, "embeddings", parallelize=True)
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
    from ...operators.similarity import (
        _as_double,
        _assign_cells,
        _dot,
        _norm,
        _unit_mat,
        hash_seed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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
    from ...operators.similarity import _as_double, _dot, pq_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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
    from ...operators.similarity import _assign_cells, hash_seed_centroids

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
    from ...operators.similarity import (
        _as_double,
        _assign_cells,
        _dot,
        _norm,
        _unit_mat,
        hash_seed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
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

    # fanout=False: per-arm scan fan-out is a measured net loss under a
    # scoreboard (VERDICT r11 item 1); standalone q259/q328/q338 keep it.
    # Threaded arm construction (guide §2.6) overlaps the eager checkpoint
    # jobs inside q320/q328/q338; same DataFrames in the same union order.
    from ._shared import _build_concurrently

    built = _build_concurrently([
        lambda: q259_count_min_tokens(spark, sf_dir, fanout=False),
        lambda: q302_hyperloglog_vocab(spark, sf_dir),
        lambda: q320_bloom_fpr_audit(spark, sf_dir),
        lambda: q328_minhash_accuracy_audit(spark, sf_dir, fanout=False),
        lambda: q338_kmv_accuracy_audit(spark, sf_dir, fanout=False),
    ])
    arms = [
        arm(built[0], "1_cms_topk",
            "max(CASE WHEN exact_cnt > 0"
            " THEN (overcount * 1000000) div exact_cnt END)"),
        arm(built[1], "2_hll_vocab", "max(err_ppm)"),
        arm(built[2], "3_bloom_novelty", "max(fpr_ppm)"),
        arm(built[3], "4_minhash_jaccard", "max(max_err_ppm)"),
        arm(built[4], "5_kmv_jaccard", "max(err_ppm)"),
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
