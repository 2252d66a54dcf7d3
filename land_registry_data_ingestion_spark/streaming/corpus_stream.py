"""Streaming corpus curation: the batch pipeline's front gate, expressed
as one Structured Streaming DAG over a document stream.

A continuously-crawled corpus arrives as micro-batches; before anything
expensive (embedding, near-dup mining) runs, each batch must be

1. **deduplicated across batches** — a re-crawled page must not re-enter
   the corpus even if its first copy arrived hours ago. Cross-batch
   state = first-seen doc id per content fingerprint, kept per key in
   the checkpoint via ``applyInPandasWithState`` (the same explicit-state
   shape as ``stateful.sha_decision_stream``; at scale the state store
   shuffles once on the fingerprint and holds O(distinct contents) ×
   (hash, id));
2. **quality-gated** — the Gopher rule battery, a pure map fused into the
   same stream;
3. **decontaminated** — the benchmark-shingle probe is a join + count
   aggregate, which cannot follow a stateful operator inside the stream
   (multiple-stateful-operator restriction); it runs INSIDE the
   ``foreachBatch`` sink on each micro-batch as the ordinary batch
   operator (``operators/corpus.py::decontaminate``) — the canonical
   place for per-batch relational work. The benchmark side stays a
   static broadcast.

The sink writes each micro-batch to its own ``batch=<id>`` directory
with mode=overwrite, so a crash replay overwrites itself instead of
double-appending (exactly-once effects, same discipline as
``conflate.exactly_once_counts``).

Oracle status: non-SQL-expressible as a stream (stateful + restart
semantics); correctness is pinned by ``tests/test_corpus_stream.py``
(cross-batch dedup including restart-from-checkpoint, flag parity with
the BATCH operators on the same rows — the batch operators carry full
DuckDB oracles, so parity transitively grounds the stream).
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from land_registry_data_ingestion_spark.functions.text import fingerprint

DEDUP_OUT_SCHEMA = "doc_id long, text string, doc_fingerprint string, is_first boolean"
DEDUP_STATE_SCHEMA = "first_doc_id long"


def _first_seen(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    first = state.get[0] if state.exists else None
    for pdf in pdfs:
        pdf = pdf.sort_values("doc_id")
        flags = []
        for doc_id in pdf["doc_id"]:
            if first is None:
                first = int(doc_id)
                flags.append(True)
            else:
                flags.append(False)
        yield pdf.assign(is_first=flags)[
            ["doc_id", "text", "doc_fingerprint", "is_first"]
        ]
    if first is not None:
        state.update((first,))


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Cross-batch exact dedup: only the FIRST occurrence (smallest id in
    its arrival batch, then first-arrived across batches) of each content
    fingerprint is flagged ``is_first``; duplicates are still emitted with
    ``is_first = false`` so downstream can count/audit them."""
    keyed = docs.withColumn("doc_fingerprint", fingerprint(F.col("text")))
    return keyed.groupBy("doc_fingerprint").applyInPandasWithState(
        _first_seen,
        outputStructType=StructType.fromDDL(DEDUP_OUT_SCHEMA),
        stateStructType=StructType.fromDDL(DEDUP_STATE_SCHEMA),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def curate_stream(docs: DataFrame) -> DataFrame:
    """dedup (stateful) → Gopher rule battery (pure map), one stream.

    Emits every document with its gate columns — policy (drop vs
    quarantine) belongs to the sink, and keeping flags makes the stream
    auditable."""
    from land_registry_data_ingestion_spark.operators.textops import (
        gopher_quality_flags,
    )

    return gopher_quality_flags(dedup_stream(docs)).select(
        "doc_id",
        "text",
        "doc_fingerprint",
        "is_first",
        "passes_gopher",
    )


def run_curation_sink(
    curated: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 3,
):
    """Checkpointed exactly-once sink: decontaminate each micro-batch
    against the static benchmark (the batch operator — join + count agg,
    legal here), then land the batch in its own ``batch=<id>`` directory
    with mode=overwrite so a replay cannot double-append."""
    from land_registry_data_ingestion_spark.operators.corpus import decontaminate
    from land_registry_data_ingestion_spark.streaming.identity import (
        stream_identity,
    )
    from land_registry_data_ingestion_spark.util import release_caches

    # Output dirs are addressed by STREAM-scoped batch keys: with a bare
    # batch id, a recreated checkpoint (ids restart at 0) would OVERWRITE
    # the original stream's batch=0 output — silent loss of landed data.
    # Same-stream replays still overwrite their own dir (exactly-once).
    # See streaming/identity.py for the tag's lifetime contract.
    stream_tag = stream_identity(checkpoint_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        contamination = decontaminate(batch_df, benchmark, k=k)
        out = batch_df.join(contamination, "doc_id").drop("text")
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={stream_tag}-{batch_id:08d}")
        )
        # decontaminate() barriers its shingle frames — drop them once the
        # batch landed or a long-running stream accumulates cached blocks
        release_caches()

    return (
        curated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")  # the stateful dedup operator emits append
        .trigger(availableNow=True)
        .start()
    )
