"""A/B probe: current JVM 60-fold simhash vs an Arrow mapInPandas kernel.

Run:  python scripts/probe_simhash_arrow.py [sf_dir] [reps]
Compares wall time AND asserts bit-identical fingerprints.
"""

from __future__ import annotations

import hashlib
import re
import sys
import time
from collections.abc import Iterator
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.session import get_spark
from land_registry_data_ingestion_spark.operators.dedup import simhash
from land_registry_data_ingestion_spark.sources.parquet import load_tables

BITS = 60
_WS = re.compile(r"\s+")


def simhash_arrow(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = BITS
) -> DataFrame:
    """Arrow-kernel variant: same md5-derived token hashes, popcounts via
    one numpy bit-matrix per document batch."""
    shifts = np.arange(bits, dtype=np.int64)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(f"simhash{bits}", T.LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            fps = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                toks = dict.fromkeys(
                    t for t in _WS.split(text.lower().strip())
                )
                hs = np.fromiter(
                    (
                        int(
                            hashlib.md5(("0|" + t).encode()).hexdigest()[:15],
                            16,
                        )
                        for t in toks
                    ),
                    dtype=np.int64,
                    count=len(toks),
                )
                ones = ((hs[:, None] >> shifts) & 1).sum(axis=0)
                bits_set = (ones * 2 > len(hs)).astype(np.int64)
                fps[i] = int((bits_set << shifts).sum())
            yield pd.DataFrame({id_col: ids, f"simhash{bits}": fps})

    from land_registry_data_ingestion_spark.util import spread

    return spread(df.select(id_col, text_col)).mapInPandas(kernel, out_schema)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="probe-simhash", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir).documents
    # warm workers + JIT
    spark.range(64).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name, fn in (
        ("jvm-folds", lambda: simhash(docs, "doc_id")),
        ("arrow-kernel", lambda: simhash_arrow(docs, "doc_id")),
    ):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min {min(times):.2f}s  runs {[f'{t:.2f}' for t in times]}")

    a = simhash(docs, "doc_id").orderBy("doc_id").collect()
    b = simhash_arrow(docs, "doc_id").orderBy("doc_id").collect()
    assert [r[1] for r in a] == [r[1] for r in b], "fingerprint mismatch"
    print(f"parity: {len(a)} fingerprints bit-identical")


if __name__ == "__main__":
    main()
