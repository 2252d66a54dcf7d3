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

from land_registry_data_ingestion_spark.functions.text import (
    fingerprint,
    word_shingles,
)
from land_registry_data_ingestion_spark.operators.dedup import (
    exact_dedup,
    lsh_bands,
    minhash_near_duplicates,
    minhash_signatures,
)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_fingerprint", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)

BANDS_SCHEMA = T.StructType(
    [
        T.StructField("band_idx", T.IntegerType(), False),
        T.StructField("band_hash", T.StringType(), False),
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
        from land_registry_data_ingestion_spark.operators.compaction import (
            live_partitions,
        )

        names = live_partitions(self._index_dir, exclude_batch)
        if not names:
            return self.spark.createDataFrame([], INDEX_SCHEMA)
        dirs = [os.path.join(self._index_dir, d) for d in names]
        return self.spark.read.schema(INDEX_SCHEMA).parquet(*dirs)

    def index_with_retry(
        self,
        action,
        exclude_batch: int | str | None = None,
        attempts: int = 2,
    ):
        """Execute ``action(self.index(...))`` with the documented
        recovery for the fold+gc race built in (round-10, r9 verdict:
        the recovery used to be opt-in — only callers who knew
        ``compaction.run_with_listing_retry`` existed got it): if a
        concurrent :meth:`compact`'s gc reclaims folded dirs while the
        plan executes, the read is rebuilt from a fresh listing (exact —
        a fresh listing is always post-fold consistent) and re-run; when
        every rebuilt plan keeps dying it fails with a
        ``StaleListingError`` naming ``gc_grace_seconds``. Use this for
        any index read that materializes (count/collect/write) while
        compaction may run; the plain :meth:`index` remains correct when
        no compaction is concurrent."""
        from land_registry_data_ingestion_spark.operators.compaction import (
            run_with_listing_retry,
        )

        return run_with_listing_retry(
            lambda: self.index(exclude_batch=exclude_batch),
            action,
            attempts=attempts,
            what=f"CorpusStore.index({self._index_dir})",
            root=self.root,
        )

    def bands_with_retry(
        self,
        action,
        exclude_batch: int | str | None = None,
        attempts: int = 2,
    ):
        """:meth:`index_with_retry`'s counterpart for the LSH band
        partitions (near-dup mode), which :meth:`compact` also folds."""
        from land_registry_data_ingestion_spark.operators.compaction import (
            run_with_listing_retry,
        )

        return run_with_listing_retry(
            lambda: self.bands(exclude_batch=exclude_batch),
            action,
            attempts=attempts,
            what=f"CorpusStore.bands({self._bands_dir})",
            root=self.root,
        )

    def corpus(self, schema_like: DataFrame | None = None) -> DataFrame:
        """All accepted documents so far; empty (with ``schema_like``'s
        schema) before the first accepted batch."""
        if not os.path.isdir(self._corpus_dir):
            if schema_like is None:
                raise FileNotFoundError("no accepted batches yet")
            return self.spark.createDataFrame([], schema_like.schema)
        return self.spark.read.parquet(os.path.join(self._corpus_dir, "batch=*"))

    @property
    def _bands_dir(self) -> str:
        return os.path.join(self.root, "bands")

    def bands(self, exclude_batch: int | str | None = None) -> DataFrame:
        """Persisted LSH bands of accepted documents (near-dup mode)."""
        from land_registry_data_ingestion_spark.operators.compaction import (
            live_partitions,
        )

        names = live_partitions(self._bands_dir, exclude_batch)
        if not names:
            return self.spark.createDataFrame([], BANDS_SCHEMA)
        dirs = [os.path.join(self._bands_dir, d) for d in names]
        return self.spark.read.schema(BANDS_SCHEMA).parquet(*dirs)

    def compact(
        self,
        exclude_batch: int | str | None = None,
        min_partitions: int = 32,
        gc_grace_seconds: float = 300.0,
    ) -> dict[str, str | None]:
        """Fold committed per-batch index (and, in near-dup mode, band)
        partitions into one partition each (`operators/compaction.py`):
        the duplicate probe's anti-join side stops paying O(batches)
        listing/planning. The CORPUS partitions are deliberately NOT
        compacted — they hold the documents themselves, so folding them
        is an O(corpus) rewrite for a read that is already one
        recursive-glob scan. ``exclude_batch`` MUST name any batch that
        could still be replayed."""
        from land_registry_data_ingestion_spark.operators.compaction import (
            compact,
        )

        out: dict[str, str | None] = {}
        for key, (d, schema) in {
            "index": (self._index_dir, INDEX_SCHEMA),
            "bands": (self._bands_dir, BANDS_SCHEMA),
        }.items():
            out[key] = compact(
                self.spark,
                d,
                lambda paths, s=schema: self.spark.read.schema(s).parquet(
                    *paths
                ),
                exclude_batch=exclude_batch,
                min_partitions=min_partitions,
                gc_grace_seconds=gc_grace_seconds,
            )
        return out

    def ingest_batch(
        self,
        docs: DataFrame,
        batch_id: int | str,
        id_col: str = "doc_id",
        text_col: str = "text",
        near_dup: bool = False,
        threshold: float = 0.5,
        num_hashes: int = 16,
        band_size: int = 4,
    ) -> dict:
        """Accept a crawl batch: intra-batch exact dedup (keep min id per
        content), then drop documents whose fingerprint the corpus already
        holds, then land the survivors + their index rows under this
        batch id. Returns counters for the run ledger.

        ``batch_id`` is the effect address: a replay of the same id
        overwrites its own partitions (exactly-once), so ids must be
        unique per LOGICAL batch for the store's lifetime — a Structured
        Streaming caller must scope raw batch ids with a checkpoint-
        lifetime tag (``streaming/identity.py``), since those restart at
        0 when a checkpoint is recreated. Near-dup mode barriers
        intermediates via ``util.barrier``; a long-lived driver loop
        should call ``util.release_caches()`` between batches (the
        streaming sinks in this package do).

        ``near_dup=True`` additionally drops NEAR-duplicates, both
        intra-batch (full MinHash+LSH pipeline over the batch) and against
        the accumulated corpus: the store persists the LSH bands of every
        accepted document, a new batch's bands probe them with one
        (band_idx, band_hash) join, and only the candidate (new, old)
        pairs pay an exact-Jaccard verify — old texts are fetched by id
        from the corpus for just those candidates. The corpus is never
        re-signed and never re-shuffled wholesale; incremental cost is
        O(batch × bands) + O(candidates)."""
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
        n_near_intra = n_near_known = 0
        if near_dup:
            fresh, n_near_intra, n_near_known = self._drop_near_dups(
                fresh, batch_id, id_col, text_col, threshold, num_hashes, band_size
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
        if near_dup:
            accepted_sigs = minhash_signatures(
                accepted.withColumnRenamed(id_col, "doc"),
                "doc",
                text_col,
                num_hashes=num_hashes,
            )
            lsh_bands(accepted_sigs, num_hashes, band_size).select(
                "band_idx",
                "band_hash",
                F.col("doc").cast("long").alias("doc_id"),
            ).write.mode("overwrite").parquet(
                os.path.join(self._bands_dir, f"batch={batch_id}")
            )
        n_accepted = accepted.count()
        n_batch_unique = batch_unique.count()
        out = {
            "batch_id": str(batch_id),
            "n_received": n_received,
            "n_intra_batch_dups": n_received - n_batch_unique,
            "n_known_dups": n_batch_unique - n_near_intra - n_near_known - n_accepted,
            "n_accepted": n_accepted,
        }
        if near_dup:
            out["n_near_dups_intra"] = n_near_intra
            out["n_near_dups_known"] = n_near_known
        return out

    def _drop_near_dups(
        self,
        fresh: DataFrame,
        batch_id: int | str,
        id_col: str,
        text_col: str,
        threshold: float,
        num_hashes: int,
        band_size: int,
    ) -> tuple[DataFrame, int, int]:
        """Near-dup removal for a batch: (1) keep-one per intra-batch
        near-dup family; (2) drop survivors whose bands collide with a
        stored document AND verify at exact Jaccard ≥ threshold."""
        from land_registry_data_ingestion_spark.util import barrier

        fresh = barrier(fresh)
        # (1) intra-batch: pairs → drop the larger id of each pair
        pairs = minhash_near_duplicates(
            fresh, id_col, text_col, threshold=threshold,
            num_hashes=num_hashes, band_size=band_size,
        )
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        survivors = barrier(fresh.join(losers, id_col, "left_anti"))
        n_intra = fresh.count() - survivors.count()

        # (2) cross-batch: band collisions against the stored index
        stored = self.bands(exclude_batch=batch_id)
        new_sigs = minhash_signatures(
            survivors.withColumnRenamed(id_col, "doc"), "doc", text_col,
            num_hashes=num_hashes,
        )
        cands = (
            lsh_bands(new_sigs, num_hashes, band_size)
            .join(
                stored.withColumnRenamed("doc_id", "old_doc"),
                ["band_idx", "band_hash"],
            )
            .select(F.col("doc").alias("new_doc"), "old_doc")
            .distinct()
        )
        # exact verify on candidates only: old texts fetched by id
        new_sh = survivors.select(
            F.col(id_col).alias("new_doc"),
            word_shingles(F.col(text_col)).alias("sh_new"),
        )
        old_sh = (
            self.corpus(schema_like=survivors.drop("doc_fingerprint"))
            .join(
                F.broadcast(cands.select("old_doc").distinct()),
                F.col(id_col) == F.col("old_doc"),
            )
            .select(
                "old_doc",
                word_shingles(F.col(text_col)).alias("sh_old"),
            )
        )
        inter = F.size(F.array_intersect("sh_new", "sh_old"))
        union = F.size("sh_new") + F.size("sh_old") - inter
        near_known = (
            cands.join(new_sh, "new_doc")
            .join(old_sh, "old_doc")
            .filter(F.round(inter / union, 6) >= threshold)
            .select(F.col("new_doc").alias(id_col))
            .distinct()
        )
        out = barrier(survivors.join(near_known, id_col, "left_anti"))
        n_known = survivors.count() - out.count()
        return out, n_intra, n_known
