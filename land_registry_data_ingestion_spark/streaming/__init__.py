"""Structured Streaming front-end (SURVEY §2.9).

The reference's Kafka control plane (idempotent producer, manual offset
commit after effects, trigger conflation) maps onto Structured Streaming:
checkpointed sources + idempotent ``foreachBatch`` effects give the same
at-least-once-delivery / exactly-once-effect semantics without threads or
pause loops.
"""

from land_registry_data_ingestion_spark.streaming.conflate import (
    conflate_latest,
    run_conflated_stream,
)

__all__ = ["conflate_latest", "run_conflated_stream"]
