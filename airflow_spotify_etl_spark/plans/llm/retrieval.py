"""Mechanically split from plans/llm.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...sources.files import load_table
from ._shared import (
    _BM25_TERMS,
    _bm25_top20,
)
from .text import (
    _Q104_SQL,
    _Q58_SQL,
    q58_gopher_quality_flags,
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
    # Each pick is localCheckpointed (r12): the greedy steps are
    # inherently sequential, and pick_k's plan references every earlier
    # pick through the sel_ids unions — without truncation pick_1's
    # subtree is re-planned and re-executed once per appearance, and the
    # combined plan grows EXPONENTIALLY in the step count (the r11
    # capture of this query's single plan was 212 KB; each limit-1
    # subtree executed up to 2^4 times). Checkpointing each 1-row pick
    # makes every later plan reference a materialized RDD instead: five
    # tiny sequential jobs, linear total work, identical rows.
    pick = (
        top.orderBy(F.desc("rel"), "vec_id").limit(1)
        .select("vec_id", "label", "rel",
                F.expr("7e-1 * rel").alias("score"))
        .localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
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
    from ...operators.text import hashed_linear_score

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


def q377_retrieval_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-vs-dense retrieval agreement audit: overlap@k, Jaccard,
    and the Spearman-footrule rank displacement between the BM25
    keyword top-20 (q51's scorer) and the dense cosine top-20 (q22's
    scorer, query vec_id 0 ↔ doc_id identity, the q257 convention) at
    k ∈ {5, 10, 20} — the trust metric for the q257 RRF fusion: RRF
    silently papers over arm DISAGREEMENT, and this measures it (low
    overlap at small k = the arms retrieve different worlds and fusion
    weights deserve a look).

    Exactness: all integers — ranks are exact, overlap/Jaccard are
    counts (jaccard_ppm = n·10⁶ div (2k − n)), and the footrule is
    Σ|rb − rd| over the overlap set. No float enters the result.

    Shape at 100 TB: both arms end in bounded top-20 relations (BM25
    filters to query-term tokens before its aggregate; the dense arm
    broadcasts the 1-row query); the agreement explode and aggregate
    run on the ≤40-row joined relation."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    bm_rank = _bm25_top20(docs).withColumn(
        "rb",
        F.row_number().over(W.orderBy(F.col("bm25").desc(), "doc_id")),
    ).select("doc_id", "rb")

    to_dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731

    def dot(a, b_):
        return F.aggregate(
            F.zip_with(a, b_, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    qv = emb.filter(F.col("vec_id") == 0).select(
        to_dbl("embedding").alias("qv")
    )
    de_rank = (
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
        .withColumn(
            "rd",
            F.row_number().over(W.orderBy(F.col("cos").desc(), "vec_id")),
        )
        .select(F.col("vec_id").alias("doc_id"), "rd")
    )
    joined = bm_rank.join(de_rank, "doc_id", "full_outer")
    return (
        joined.select(
            "rb",
            "rd",
            F.explode(F.array(F.lit(5), F.lit(10), F.lit(20))).alias("k"),
        )
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    (F.col("rb") <= F.col("k"))
                    & (F.col("rd") <= F.col("k")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_overlap"),
            F.sum(
                F.when(
                    (F.col("rb") <= F.col("k"))
                    & (F.col("rd") <= F.col("k")),
                    F.abs(F.col("rb") - F.col("rd")),
                ).otherwise(0)
            ).cast("long").alias("footrule"),
        )
        .select(
            "k",
            "n_overlap",
            F.expr(
                "(n_overlap * 1000000) div (2 * k - n_overlap)"
            ).alias("jaccard_ppm"),
            "footrule",
        )
        .orderBy("k")
    )


def _q377_sql() -> str:
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
), joined AS (
  SELECT doc_id, rb, rd
  FROM bm_rank FULL OUTER JOIN de_rank USING (doc_id)
), agg AS (
  SELECT k.k,
         CAST(sum(CASE WHEN j.rb <= k.k AND j.rd <= k.k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_overlap,
         CAST(sum(CASE WHEN j.rb <= k.k AND j.rd <= k.k
                       THEN abs(j.rb - j.rd) ELSE 0 END) AS BIGINT)
           AS footrule
  FROM joined j
  CROSS JOIN (SELECT unnest([5, 10, 20]) AS k) k
  GROUP BY k.k
)
SELECT CAST(k AS BIGINT) AS k, n_overlap,
       (n_overlap * 1000000) // (2 * k - n_overlap) AS jaccard_ppm,
       footrule
FROM agg
ORDER BY k
"""
