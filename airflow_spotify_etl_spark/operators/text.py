"""Text-analysis operators (north star: language ID, quality scoring,
token counting, fingerprinting).

The SQL-portable metrics (length/word/punct/stopword ratios, whitespace +
regex tokenization, canonical-text fingerprints) are oracle-checked in
plans/llm/text.py q18/q19/q23. This module holds the operators whose internals
aren't expressible as one SQL query:

- ``fit_lang_profiles`` / ``predict_lang`` — multinomial naive-Bayes
  language identifier over token n-grams: learn per-language token
  log-probabilities from a labeled corpus (one groupBy), then score each doc
  as Σ log P(token|lang) with a floor penalty for out-of-profile tokens and
  take the argmax. Both phases are pure DataFrame ops; the model is a small
  DataFrame (langs × top_m tokens) broadcast at predict time — at 100 TB the
  predict scan is explode → broadcast-join → one grouped sum, no big-table
  shuffle beyond the per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "char_ngrams",
    "word_tokens",
    "fit_lang_profiles",
    "predict_lang",
    "normalize_text",
    "redact_pii",
    "top_ngrams",
    "hashed_linear_score",
]

# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, and \b only — no
# capture groups, backreferences, or lookaround (RE2 has none of the
# latter two).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
_PII_TOKENS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}

# log-probability assigned to tokens absent from a language's profile
# (Laplace-ish floor; must be below any real profile weight).
_FLOOR = -18.0


def normalize_text(col):
    """Canonical text form: lowercase, every non-[a-z0-9 ] byte → space,
    collapse space runs, trim. Pure codegen projection (lower + two
    regexp_replace + trim) — no shuffle, rides the scan at any scale. The
    patterns use only literal character classes (no \\s, \\b, or
    lookaround), the subset on which Java regex (Spark) and RE2 (DuckDB)
    agree byte-for-byte, so md5(normalize_text(...)) is an
    oracle-checkable canonical fingerprint (plans/llm/dedup.py q93)."""
    c = F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(c, " +", " "))


def char_ngrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, gram) pairs: all character n-grams of the lowercased text."""
    # Positional substring inside a higher-order function needs SQL expr form.
    grams = F.expr(
        f"CASE WHEN length(lower({text_col})) >= {n} THEN "
        f"transform(sequence(1, length(lower({text_col})) - {n} + 1), "
        f"i -> substring(lower({text_col}), i, {n})) ELSE array() END"
    )
    return df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))


def word_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token) pairs: lowercased whitespace tokens, every occurrence."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("gram"),
    ).filter(F.col("gram") != "")


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails / NANP phone numbers / IPv4 addresses from text before
    LLM training (the C4/Dolma-style PII pass). Returns per doc the
    redacted text plus a match count per pattern.

    Counts are measured on the RAW text independently per pattern;
    redaction then applies email → phone → ipv4 (email first so its
    digit-bearing local parts can't be half-eaten by the narrower
    patterns). Pure regexp projection — whole-stage codegen, no shuffle,
    no UDF; at 100 TB this runs at scan speed."""
    raw = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(raw, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    clean = raw
    for name, pat in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, pat, _PII_TOKENS[name])
    return df.select(
        F.col(id_col).alias("doc_id"), clean.alias("text_clean"), *counts
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level top-k word n-grams with occurrence + document
    frequencies — the corpus-inspection stat a curation run prints before
    and after filtering (boilerplate shows up as an over-represented
    head). Shuffle-free n-gram expansion (the sequence-explode idiom,
    see operators/dedup.shingle) into one grouped aggregate whose
    count/count-distinct partials combine map-side; the output is top-k
    bounded."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda x: x != F.lit("")
    )
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    last = F.size("_w") - n + 1
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    grams = base.select("doc_id", "_w", F.explode(idx).alias("_i")).select(
        "doc_id",
        F.expr(f"array_join(slice(_w, _i, {int(n)}), ' ')").alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram"))
        .limit(k)
    )


def fit_lang_profiles(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_m: int = 500,
) -> DataFrame:
    """Per-language profile: top_m most frequent tokens with
    log P(token|lang) weights. Returns a small DF (lang, gram, weight)."""
    grams = word_tokens(labeled, text_col, id_col=lang_col).withColumnRenamed(
        "doc_id", "lang"
    )
    counts = grams.groupBy("lang", "gram").count()
    totals = counts.groupBy("lang").agg(F.sum("count").alias("total"))
    w = W.partitionBy("lang").orderBy(F.col("count").desc(), F.col("gram"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_m)
        .join(F.broadcast(totals), "lang")
        .select(
            "lang", "gram", F.log(F.col("count") / F.col("total")).alias("weight")
        )
    )


def predict_lang(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial NB scoring: score(doc, lang) = Σ_matched log P(tok|lang)
    + floor · n_unmatched; argmax lang per doc. The floor term is what makes
    coverage count — without it, a language matching FEWER tokens would sum
    fewer negative terms and spuriously win.

    Every input doc appears in the output: a doc whose tokens match NO
    profile (or that has no tokens at all) gets ``pred_lang = null`` with a
    floor-only score, instead of silently vanishing through the inner join."""
    grams = word_tokens(docs, text_col, id_col)
    all_docs = docs.select(F.col(id_col).alias("doc_id")).distinct()
    doc_sizes = all_docs.join(
        grams.groupBy("doc_id").agg(F.count("*").alias("n_tokens")),
        "doc_id",
        "left",
    ).fillna({"n_tokens": 0})
    scored = (
        grams.join(F.broadcast(profiles), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum("weight").alias("matched_weight"), F.count("*").alias("n_matched"))
        .join(doc_sizes, "doc_id")
        .withColumn(
            "score",
            F.col("matched_weight")
            + (F.col("n_tokens") - F.col("n_matched")) * F.lit(_FLOOR),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score", "n_matched")
    )
    return doc_sizes.join(best, "doc_id", "left").select(
        "doc_id",
        "pred_lang",
        F.coalesce("score", F.col("n_tokens") * F.lit(_FLOOR)).alias("score"),
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1 use
    these to drop template/spam pages before LLM training): type-token
    ratio, most-frequent-token fraction, most-frequent-bigram fraction.

    Shape at 100 TB: these are PER-DOCUMENT statistics, so the whole
    operator is ONE narrow projection — zero shuffles, zero joins, fully
    whole-stage-codegen (r7 redesign; the previous explode→groupBy→join
    form shuffled the token stream twice and re-scanned the corpus three
    times for row-local math). The top-frequency counts come from the
    max run length of the SORTED token/bigram array, computed with a
    higher-order aggregate over a (prev, run, best) struct — all
    JVM-side array expressions, no Python. Docs with no tokens survive
    with n_tokens=0 and null ratios; single-token docs have no bigrams
    → null top_bigram_frac (unchanged semantics, value-identical to the
    grouped form and the DuckDB oracle).

    ORDER-PRESERVATION DEPENDENCY: callers (q45) sort the slim input
    BELOW this projection and rely on the projection staying narrow
    (no shuffle/join/agg between rows) so the output keeps the input
    order. If a future change adds a wide step here, the presentation
    order breaks silently — tests/test_order_preservation.py gates
    this."""

    def _max_run(arr):
        # max run length of a sorted array: fold (prev, run, best)
        return F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(acc.prev.isNotNull() & (x == acc.prev), acc.run + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc.best,
                    F.when(acc.prev.isNotNull() & (x == acc.prev), acc.run + 1)
                    .otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc.best,
        )

    # coalesce: NULL text must yield n_tokens=0 (the pre-r7
    # explode+left-join path coalesced missing docs to 0; size(NULL)
    # would propagate NULL, or -1 under legacy sizeOfNull).
    words = F.coalesce(
        F.filter(
            F.split(F.lower(F.col(text_col)), "\\s+"),
            lambda x: x != F.lit(""),
        ),
        F.array().cast("array<string>"),
    )
    n_idx = F.size("_w") - 1
    idx = F.when(n_idx >= 1, F.sequence(F.lit(1), n_idx)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at("_w", i), F.element_at("_w", i + F.lit(1))
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
        .select(
            "doc_id",
            F.size("_w").alias("n_tokens"),
            F.size(F.array_distinct("_w")).alias("n_distinct"),
            _max_run(F.col("_w")).alias("top_cnt"),
            bigrams.alias("_b"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_distinct") / F.col("n_tokens"), 4),
            ).alias("type_token_ratio"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("top_cnt") / F.col("n_tokens"), 4),
            ).alias("top_token_frac"),
            F.when(
                F.size("_b") > 0,
                F.round(_max_run(F.col("_b")) / F.size("_b"), 4),
            ).alias("top_bigram_frac"),
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy of the per-doc token distribution (nats) — low
    entropy = repetitive/templated text, a standard corpus-quality signal.

    Algebraic form H = ln(n) - Σ c·ln(c) / n needs ONE grouped aggregate
    over (doc, token) counts — no second pass joining totals back, no
    window. ``entropy_norm`` divides by ln(n_distinct) (the max possible H
    for that vocabulary), giving a 0-1 uniformity score."""
    counts = word_tokens(df, text_col, id_col).groupBy("doc_id", "gram").agg(
        F.count("*").alias("c")
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * F.log("c")).alias("clnc"),
    )
    entropy = F.log("n") - F.col("clnc") / F.col("n")
    return agg.select(
        "doc_id",
        F.round(entropy, 4).alias("entropy"),
        F.round(
            F.when(F.col("n_distinct") > 1, entropy / F.log("n_distinct")).otherwise(
                F.lit(0.0)
            ),
            4,
        ).alias("entropy_norm"),
    )


def hashed_linear_score(
    df: DataFrame,
    n_buckets: int = 4096,
    weight_salt: str = "qw",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style linear quality-classifier INFERENCE over hashed
    bag-of-words features (Joulin et al. 2017; the DCLM/CCNet quality-
    filter shape): score = sigmoid(mean_tokens weight[bucket(tok)]).

    The weight table is derived per bucket from the engine-portable md5
    slice — ``w(b) = h32(salt‖b)/2³¹ − 1 ∈ [−1, 1)`` — standing in for
    trained parameters. That choice is what makes the whole inference pass
    value-checkable by the DuckDB oracle (plans/llm/text.py q104): a real model
    would load the SAME shape from a weights table and broadcast it; here
    the "lookup" folds into the projection, so scoring is a pure narrow
    codegen pass (split → hash → arithmetic) with the per-doc mean as the
    only exchange. No Python seam, no model file, no join: at 100 TB the
    classifier costs exactly one aggregate over the token stream —
    the reason hashed linear models (not transformers) are the standard
    first-tier quality gate in web-scale curation.

    Returns (doc_id, n_tokens, score ∈ (0,1)); token-less docs score
    sigmoid(0) = 0.5 by convention."""
    nb = int(n_buckets)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "\\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    from .dedup import _h32

    b = F.pmod(_h32(F.col("tok")), F.lit(nb))
    w = _h32(F.concat(F.lit(weight_salt), b.cast("string"))) / F.lit(
        float(2**31)
    ) - F.lit(1.0)
    per_doc = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.avg("w").alias("m")
    )
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(4.0) * F.coalesce("m", F.lit(0.0))))
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(sig, 4).alias("score"),
        )
        .orderBy("doc_id")
    )
