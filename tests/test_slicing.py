"""range_slice: byte-identical to the global row_number window, with no
single-partition exchange in the physical plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _global_slice(df, start, end, key="doc_id"):
    w = Window.orderBy(key)
    return (df.withColumn("rn", F.row_number().over(w).cast("long"))
            .where((F.col("rn") > start) & (F.col("rn") <= end)))


@pytest.mark.parametrize("start,end", [(0, 5), (7, 23), (95, 120), (0, 0)])
def test_matches_global_window(spark, start, end):
    from docling_eval_spark.operators.slicing import range_slice

    # sparse, non-contiguous, shuffled keys across several buckets
    rows = [((i * 37) % 1000 + (i % 3) * 10_000, f"v{i}")
            for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "val"]).repartition(8)
    got = sorted((r.doc_id, r.val, r.rn) for r in
                 range_slice(df, start, end, n_buckets=16).collect())
    want = sorted((r.doc_id, r.val, r.rn) for r in
                  _global_slice(df, start, end).collect())
    assert got == want


def test_no_single_partition_window(spark):
    from docling_eval_spark.operators.slicing import range_slice

    df = spark.range(500).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 7).alias("val"))
    out = range_slice(df, 100, 120, n_buckets=16)
    assert len(out.collect()) == 20
    # executedPlan is only final after the SAME DataFrame executed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the oracle-shaped plan DOES funnel the corpus globally — either a
    # single-partition window exchange, or (when `end` is small enough
    # for LimitPushDownThroughWindow) a global top-`end` — prove the
    # probe distinguishes the shapes
    bad = _global_slice(df, 100, 120)
    bad.collect()
    bad_plan = bad._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in bad_plan or \
        "TakeOrderedAndProject" in bad_plan
    assert "TakeOrderedAndProject" not in plan


def test_only_overlapping_buckets_join(spark):
    """Non-overlapping buckets drop at the offsets inner join: the
    slice of a 10k-row frame should never rank more than ~2 buckets'
    worth of rows."""
    from docling_eval_spark.operators.slicing import range_slice

    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    out = range_slice(df, 5_000, 5_010, n_buckets=100)
    rows = out.collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rn)] == \
        list(range(5_000, 5_010))


def test_string_key_rejected(spark):
    from docling_eval_spark.operators.slicing import range_slice

    df = spark.createDataFrame([("a",)], ["doc_id"])
    with pytest.raises(TypeError, match="integral key"):
        range_slice(df, 0, 1)
