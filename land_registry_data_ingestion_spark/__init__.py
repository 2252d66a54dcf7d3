"""Land-Registry-Data-Ingestion, re-imagined as a PySpark-native engine.

A library of composable PySpark DataFrame operators with the same query
and data-processing capabilities as the reference pipeline
(``edward-b-1/Land-Registry-Data-Ingestion``), re-expressed Spark-first:

- ``sources``   — scans/sinks (CSV snapshot readers, parquet tables, binary)
- ``functions`` — scalar column functions (calendar, hashing, text, vectors)
- ``operators`` — composed DataFrame operators (CDC merge, reconcile, rewind,
                  interval binning, dedup, similarity search, text analysis)
- ``plans``     — the declared query set (the engine's "benchmark suite")
- ``streaming`` — Structured Streaming front-end (conflation, foreachBatch)

Design stance (SURVEY.md §7): state lives in partitioned Parquet, every
operator is a declarative DataFrame transform so Catalyst/Tungsten pick the
physical strategy, Python UDFs only where built-ins genuinely cannot express
the semantics (and then Arrow-batched, never per-row).
"""

__version__ = "0.1.0"
