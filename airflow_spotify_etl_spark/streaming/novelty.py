"""Streaming novelty ingest: admit only never-seen-before documents from
a micro-batched stream, maintaining an APPEND-ONLY content-hash store.

The batch twin is oracle-checked (plans/llm.py q96: bloom-gated exact
novelty ≡ plain anti-join); this module runs that operator per
micro-batch the way a 100 TB ingest actually does:

- the stored side is a HASH TABLE (one md5 per ever-admitted doc), not
  the corpus — the store the bloom builds from and the exact join probes
  is ~32 bytes/doc regardless of document size;
- the store is append-only: each batch appends only its novel hashes —
  no rewrite, no overwrite-while-reading hazard (contrast the SCD-2
  store, which must restate runs and therefore rewrites atomically);
- within-batch duplicates collapse first (first occurrence by id — one
  window on the uniform hash key), so a doc arriving twice in one batch
  is admitted once;
- the checkpointed source guarantees each batch is processed once —
  re-draining with no new input appends nothing (pytest-pinned).

At scale, bucket the hash store by a hash prefix so the per-batch exact
probe joins co-located buckets (the q81 stored-bands argument), and
rebuild the bloom from the store on a cadence rather than per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .scd2 import _store_exists

__all__ = ["run_novelty_ingest"]


def run_novelty_ingest(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    novel_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Drain ``stream`` (availableNow): per micro-batch, collapse
    within-batch duplicates, screen against the stored hash table via
    the bloom-gated exact filter, append novel docs to ``novel_path``
    and their hashes to ``store_path``."""
    from ..operators.dedup import bloom_novelty_filter

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        if bdf.isEmpty():
            return
        w = W.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        firsts = (
            bdf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if _store_exists(store_path):
            hashes = spark.read.parquet(store_path)
            novel = bloom_novelty_filter(
                hashes, firsts, text_col=text_col, id_col=id_col,
                corpus_hash_col="ch",
            )
        else:
            novel = firsts
        # Materialize once: both writes below consume the same computed
        # batch, and the store append must not re-trigger the probe plan
        # while the store is being written.
        novel = novel.localCheckpoint(eager=True)
        novel.write.mode("append").parquet(novel_path)
        novel.select(F.md5(F.col(text_col)).alias("ch")).write.mode(
            "append"
        ).parquet(store_path)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
