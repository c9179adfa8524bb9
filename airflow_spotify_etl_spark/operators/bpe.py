"""BPE tokenizer training at corpus scale (Sennrich et al. 2016).

The trick that makes BPE trainable on 100 TB is that NOTHING after the
first aggregate touches the corpus: one word-count pass collapses the
corpus to its VOCABULARY relation (word, freq) — bounded by distinct
words, not corpus bytes — and every merge iteration is a grouped sum
over that vocab's adjacent symbol pairs weighted by word frequency.
This is exactly how the reference BPE trainers (subword-nmt,
HuggingFace tokenizers) structure the computation; here each iteration
is one Spark aggregate plus a codegen array fold, no Python loop over
words anywhere.

- ``bpe_merge_candidates`` — the single-pass first-iteration scoring
  (all adjacent char pairs ranked by weighted count): oracle-checked as
  q117, exact integer counts throughout.
- ``bpe_train`` — the iterative trainer: argmax pair → apply merge to
  every word's symbol array (a left fold with carry, pure codegen HOF)
  → recount. The per-iteration driver collect is ONE row (the argmax),
  the PageRank discipline.

Overlap convention: pair counting is position-based ("aaa" counts
(a,a) twice), and a merge applies left-to-right non-overlapping
("aaa" → ["aa", "a"]) — the standard BPE semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["bpe_merge_candidates", "bpe_train", "word_vocab"]


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased space-split words — the ONE corpus
    pass; everything downstream runs on this vocabulary-sized relation."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """First-iteration BPE merge scoring: every adjacent CHARACTER pair
    across the vocabulary, weighted by word frequency, ranked. The pair
    extraction is the shuffle-free sequence-explode over the vocab
    relation (substr — codegen, no HOF); counts are exact integers so
    the ranking is engine-portable bit-for-bit."""
    vocab = word_vocab(df, text_col)
    idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = vocab.select("w", "freq", F.explode(idx).alias("i")).select(
        "w",
        "freq",
        F.expr("substr(w, i, 1)").alias("left_sym"),
        F.expr("substr(w, i + 1, 1)").alias("right_sym"),
    )
    agg = pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("freq").alias("n_occurrences"),
        F.countDistinct("w").alias("n_words"),
    )
    ranked = agg.orderBy(
        F.col("n_occurrences").desc(), "left_sym", "right_sym"
    ).limit(int(top_k))
    # rank assignment runs AFTER the top-k cut — the unpartitioned
    # window sees top_k rows, never the pair space.
    w = W.orderBy(F.col("n_occurrences").desc(), "left_sym", "right_sym")
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "rank", "left_sym", "right_sym", "n_occurrences", "n_words"
    )


def _chars(name: str):
    """Character array of the named column (codegen substr map)."""
    return F.expr(
        f"transform(sequence(1, length({name})), i -> substr({name}, i, 1))"
    )


def _apply_merge(syms_col, a: str, b: str):
    """Replace left-to-right non-overlapping adjacent (a, b) with a||b:
    a left fold with one-symbol carry. All codegen-side (aggregate HOF);
    per-word arrays are token-length, so the fold is O(len)."""
    merged = F.array(F.lit(a + b))
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, s):
        hit = (
            acc["carry"].isNotNull()
            & (acc["carry"] == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], merged).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["carry"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["carry"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("carry"),
            )
        )

    def fin(acc):
        return F.when(
            acc["carry"].isNotNull(),
            F.concat(acc["out"], F.array(acc["carry"])),
        ).otherwise(acc["out"])

    return F.aggregate(syms_col, init, step, fin)


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, vocab) where
    merges is [(left, right, weighted_count), ...] in learned order and
    vocab is the (w, freq, syms) relation tokenized by them.

    Each iteration: one grouped sum over the vocab's adjacent pairs, a
    1-row argmax collect, and one codegen fold applying the merge.
    The vocab is localCheckpoint'ed per iteration (the
    connected-components lineage discipline) so iteration N's plan does
    not replay iterations 1..N-1. Stops early when no pair reaches
    ``min_count`` (merging singletons is noise)."""
    vocab = (
        word_vocab(df, text_col)
        .withColumn("syms", _chars("w"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(0), F.size("syms") - 2)
        ).otherwise(F.array().cast("array<int>"))
        pairs = vocab.select("freq", "syms", F.explode(idx).alias("i")).select(
            "freq",
            F.element_at("syms", F.col("i") + 1).alias("a"),
            F.element_at("syms", F.col("i") + 2).alias("b"),
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < int(min_count):
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges, vocab
