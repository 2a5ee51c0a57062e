"""Deterministic range slicing without a global sort.

Reference analog: the dataset builders' begin/end slice over a
deterministically ordered dataset (dataset_builder.py's chunked range
walk). The textbook Spark plan — `row_number() OVER (ORDER BY key)` —
is an unpartitioned window: Spark warns "No Partition Defined for
Window operation! Moving all data to a single partition" and one task
sorts the whole corpus. This module ranks with the same distributed
prefix-sum pattern as epoch_shuffle / pack_sequences: arithmetic range
buckets on the numeric key (monotone, no sampling), per-bucket counts
to the driver (non-empty buckets only, so the driver table stays
small), exclusive offsets broadcast back, and a per-bucket window for
the local rank — byte-identical to the global window at any bucket
count, with the largest window partition bounded by ~corpus/n_buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def range_slice(df: DataFrame, start: int, end: int,
                key: str = "doc_id", n_buckets: int = 1024) -> DataFrame:
    """Rows whose 1-based rank under ORDER BY `key` lies in
    (start, end] — i.e. rows start+1 .. end of the key-ordered corpus.

    Scale shape: one count aggregate (map-side partial, bigint-only
    shuffle), a broadcast of the overlapping buckets' offsets, and a
    window PARTITIONED BY bucket — no single-partition exchange
    anywhere (pinned by pytest against the plan string). Buckets that
    cannot intersect the slice are dropped by the offsets inner join
    before the sort, so the window only ever sorts the few buckets the
    slice touches.

    Requires a numeric key (crawl-assigned page ids); ties are
    impossible because the key is the total order itself.
    """
    if dict(df.dtypes)[key] not in _INTEGRAL:
        raise TypeError(
            f"range_slice needs an integral key column; got {key!r} of "
            f"type {dict(df.dtypes)[key]}")
    lo, hi = df.agg(F.min(key), F.max(key)).first()
    if lo is None or end <= start:
        return df.limit(0).withColumn("rn", F.lit(0).cast("long"))
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    bucket = ((F.col(key) - F.lit(int(lo))) / F.lit(width)).cast("long")
    b = df.withColumn("_b", bucket)
    per_bucket = sorted(
        (int(r[0]), int(r[1]))
        for r in b.groupBy("_b").agg(F.count("*").alias("n")).collect())
    offset, offsets = 0, []
    for bk, n in per_bucket:
        # keep only buckets whose rank interval [offset+1, offset+n]
        # intersects (start, end]
        if offset < end and offset + n > start:
            offsets.append((bk, offset))
        offset += n
    off_df = df.sparkSession.createDataFrame(offsets, "_b long, _off long")
    w = Window.partitionBy("_b").orderBy(key)
    rn = (F.col("_off") + F.row_number().over(w)).cast("long")
    return (
        b.join(F.broadcast(off_df), "_b")
        .withColumn("rn", rn)
        .where((F.col("rn") > start) & (F.col("rn") <= end))
        .drop("_b", "_off")
    )
