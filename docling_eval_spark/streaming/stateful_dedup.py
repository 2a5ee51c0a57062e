"""Custom stateful streaming operator: cross-batch near-dup detection.

The batch near-dup pipeline (operators/dedup.py) self-joins LSH band
buckets — impossible on an unbounded stream. This operator keeps the
band-bucket inverted index as EXPLICIT STREAMING STATE via
`applyInPandasWithState` (the extension point the north-rule architecture
reserves for custom stateful operators):

  stream of docs
    -> minhash signatures (the same mapInPandas stage as batch)
    -> explode to (band, bucket) keys
    -> groupBy(band, bucket).applyInPandasWithState:
         state = the doc ids + signatures previously seen in this bucket;
         each arriving doc is compared against state (estimated Jaccard =
         fraction of agreeing minhashes) and emitted as a pair when above
         threshold, then appended to state.

State is bounded per bucket (`max_state_docs` ring) — at 10^12 docs the
state store shards by the same band/bucket key the shuffle uses, so each
micro-batch touches only the buckets it has data for. Duplicates arriving
in DIFFERENT micro-batches are still caught — the property the batch
self-join cannot give you and the test pins down.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("a", LongType()),
    StructField("b", LongType()),
    StructField("est_jaccard", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("sigs", ArrayType(LongType())),  # flattened [n_docs * K]
])


def _bucket_matcher(threshold: float, num_hashes: int, max_state_docs: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, flat = state.get
            ids = list(ids)
            flat = list(flat)
        else:
            ids, flat = [], []
        out_a, out_b, out_j = [], [], []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                # state must hold pure-Python values: numpy scalars break
                # the JVM-side state row pickler
                sig = [int(x) for x in sig]
                for i, prev_id in enumerate(ids):
                    if prev_id == doc_id:
                        continue
                    prev = flat[i * num_hashes:(i + 1) * num_hashes]
                    agree = sum(1 for x, y in zip(prev, sig) if x == y)
                    est = agree / num_hashes
                    if est >= threshold:
                        a, b = sorted((int(prev_id), int(doc_id)))
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(est)
                ids.append(int(doc_id))
                flat.extend(sig)
                if len(ids) > max_state_docs:  # bounded ring
                    ids = ids[-max_state_docs:]
                    flat = flat[-max_state_docs * num_hashes:]
        state.update((ids, flat))
        yield pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    return fn


def streaming_near_dup_pairs(docs: DataFrame, threshold: float = 0.8,
                             num_hashes: int = 128, bands: int = 32,
                             rows_per_band: int = 4,
                             max_state_docs: int = 64) -> DataFrame:
    """doc stream (doc_id, text) -> near-dup pair stream (a, b, est_jaccard).

    Works on batch DataFrames too (Spark runs applyInPandasWithState's
    batch equivalent), which the tests exploit for the single-batch case.
    Emitted pairs may repeat across bands; readers dedupe downstream
    (sink-side `dropDuplicates(["a","b"])` or idempotent upsert).
    """
    from ..operators.dedup import banded_signatures, minhash_signatures

    sigs = minhash_signatures(docs, num_hashes=num_hashes)
    banded = banded_signatures(sigs, ["doc_id", "sig"], bands, rows_per_band)
    return (
        banded.groupBy("band", "bucket")
        .applyInPandasWithState(
            _bucket_matcher(threshold, num_hashes, max_state_docs),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
