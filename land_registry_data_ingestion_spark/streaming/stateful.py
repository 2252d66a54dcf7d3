"""Custom stateful streaming operator: cross-batch content-hash dedup.

The reference keeps the last archived file hash per dataset and decides
``archive`` (hash changed) vs ``garbage_collect`` (unchanged) for every new
download (``LRD/land_registry_pp_complete_data_decision.py:135-174``; the
state lives in the archive-log table). Here the same decision is a
Structured Streaming operator with explicit per-key state via
``applyInPandasWithState``: state = the last archived sha per key, durable
in the checkpoint, so restarts resume with the correct decision context.

Scale shape: state is O(distinct keys) × one 64-char hash — tiny; the
stream shuffles once on the key to co-locate each key's updates with its
state partition. Arrow batches keep the per-group Python work vectorized.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

OUT_SCHEMA = (
    "source_key string, sha256 string, ts long, decision string"
)
STATE_SCHEMA = "last_sha string"


def _decide(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        decisions = []
        for sha in pdf["sha256"]:
            if last is not None and sha == last:
                decisions.append("garbage_collect")
            else:
                decisions.append("archive")
                last = sha
        yield pdf.assign(decision=decisions)[
            ["source_key", "sha256", "ts", "decision"]
        ]
    state.update((last,))


def sha_decision_stream(stream: DataFrame) -> DataFrame:
    """archive/garbage_collect decision per (source_key, sha256, ts) event,
    stateful on the last archived hash per source_key.

    Input stream schema: ``source_key string, sha256 string, ts long``.
    """
    return stream.groupBy("source_key").applyInPandasWithState(
        _decide,
        outputStructType=StructType.fromDDL(OUT_SCHEMA),
        stateStructType=StructType.fromDDL(STATE_SCHEMA),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
