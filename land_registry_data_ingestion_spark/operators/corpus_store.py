"""Incremental corpus store: batch ingestion with a persistent
fingerprint index — the batch counterpart of
``streaming/corpus_stream.py``'s checkpointed state.

A training corpus grows by crawl batches; each batch must drop (a) its
own internal exact duplicates and (b) documents whose content already
entered the corpus in ANY earlier batch. The store keeps

- ``corpus/batch=<id>/``   — accepted documents, one dir per batch;
- ``index/batch=<id>/``    — the accepted ``(doc_fingerprint, doc_id)``
  pairs of that batch.

Both writes are batch-id-addressed with ``mode=overwrite``, so replaying
a failed batch overwrites itself instead of double-appending — the same
exactly-once discipline as the streaming sink, without a checkpoint.

Scale shape: the index holds (32-byte hash, id) per accepted document —
thousands of times smaller than the corpus — and the duplicate probe is
one shuffle hash anti-join keyed on the fingerprint (both sides pruned to
two columns; the batch's text never moves). At extreme index sizes the
levers are the standard ones: bucket the index by fingerprint so the
anti-join co-locates without a shuffle (tests/test_skew_bucketing.py
shows the pattern), or front it with a bloom filter and verify only the
maybe-hits.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.functions.text import fingerprint
from land_registry_data_ingestion_spark.operators.dedup import exact_dedup

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_fingerprint", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)


@dataclass
class CorpusStore:
    spark: SparkSession
    root: str

    @property
    def _corpus_dir(self) -> str:
        return os.path.join(self.root, "corpus")

    @property
    def _index_dir(self) -> str:
        return os.path.join(self.root, "index")

    def index(self, exclude_batch: int | str | None = None) -> DataFrame:
        """Accepted (doc_fingerprint, doc_id) pairs so far.

        ``exclude_batch`` drops that batch's own index partition from the
        view — the duplicate probe for a batch REPLAY must not see the
        failed attempt's rows, or the replay would classify every document
        as already-known and land an empty batch over the old one."""
        if not os.path.isdir(self._index_dir):
            return self.spark.createDataFrame([], INDEX_SCHEMA)
        dirs = [
            os.path.join(self._index_dir, d)
            for d in sorted(os.listdir(self._index_dir))
            if d.startswith("batch=") and d != f"batch={exclude_batch}"
        ]
        if not dirs:
            return self.spark.createDataFrame([], INDEX_SCHEMA)
        return self.spark.read.schema(INDEX_SCHEMA).parquet(*dirs)

    def corpus(self) -> DataFrame:
        """All accepted documents so far."""
        return self.spark.read.parquet(os.path.join(self._corpus_dir, "batch=*"))

    def ingest_batch(
        self,
        docs: DataFrame,
        batch_id: int | str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> dict:
        """Accept a crawl batch: intra-batch exact dedup (keep min id per
        content), then drop documents whose fingerprint the corpus already
        holds, then land the survivors + their index rows under this
        batch id. Returns counters for the run ledger."""
        n_received = docs.count()
        batch_unique = exact_dedup(docs, id_col, text_col)
        keyed = batch_unique.withColumn(
            "doc_fingerprint", fingerprint(F.col(text_col))
        )
        fresh = keyed.join(
            self.index(exclude_batch=batch_id).select("doc_fingerprint"),
            "doc_fingerprint",
            "left_anti",
        )
        accepted_dir = os.path.join(self._corpus_dir, f"batch={batch_id}")
        fresh.drop("doc_fingerprint").write.mode("overwrite").parquet(accepted_dir)
        # Index rows derive from the WRITTEN corpus partition (one cheap
        # re-fingerprint of the accepted rows): the corpus dir stays the
        # single source of truth and the lazy `fresh` plan is never
        # evaluated twice against a moving index glob.
        accepted = self.spark.read.parquet(accepted_dir)
        accepted.select(
            fingerprint(F.col(text_col)).alias("doc_fingerprint"),
            F.col(id_col).cast("long").alias("doc_id"),
        ).write.mode("overwrite").parquet(
            os.path.join(self._index_dir, f"batch={batch_id}")
        )
        n_accepted = accepted.count()
        n_batch_unique = batch_unique.count()
        return {
            "batch_id": str(batch_id),
            "n_received": n_received,
            "n_intra_batch_dups": n_received - n_batch_unique,
            "n_known_dups": n_batch_unique - n_accepted,
            "n_accepted": n_accepted,
        }
