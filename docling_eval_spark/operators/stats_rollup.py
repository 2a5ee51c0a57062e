"""DatasetStatistics as a declarative Spark aggregation.

Rebuild of the reference's universal rollup (docling_eval/evaluators/
stats.py:77-97, used ~25x across evaluators — SURVEY.md §2.4 A1) as
JVM-side aggregates: count/avg/median/stddev_samp in ONE pass, plus the
20-bin histogram as a width-bucket groupBy (map-side partial aggregation,
so the shuffle carries at most n_bins rows per partition — scale-safe).

`median` uses the exact percentile (Spark `median`) to match the
reference's statistics.median; at 10^12 rows swap in percentile_approx
via approx=True (documented accuracy/scale trade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stats_agg(df: DataFrame, col: str, approx: bool = False) -> dict:
    """One DatasetStatistics dict for df[col] (two small jobs: moments + hist)."""
    median_expr = (
        F.expr(f"percentile_approx({col}, 0.5)") if approx else F.median(F.col(col))
    )
    row = df.agg(
        F.count(F.col(col)).alias("total"),
        F.avg(F.col(col)).alias("mean"),
        median_expr.alias("median"),
        F.stddev_samp(F.col(col)).alias("std"),
    ).first()
    total = row["total"]
    hist_rows = histogram_df(df, col).collect()
    hist = [0.0] * 20
    for r in hist_rows:
        hist[int(r["bucket"])] = float(r["n"])
    bins = [i / 20.0 for i in range(21)]
    return {
        "total": int(total),
        "mean": float(row["mean"]) if total > 0 else -1.0,
        "median": float(row["median"]) if total > 0 else -1.0,
        "std": float(row["std"]) if total > 1 else 0.0,
        "bins": bins,
        "hist": hist,
    }


def histogram_bucket(col: Column, nr_bins: int = 20, max_value: float = 1.0) -> Column:
    """numpy.histogram bucket semantics over [0, max]: last bin right-closed,
    values outside [0, max] excluded (numpy drops them)."""
    scaled = col / F.lit(max_value) * nr_bins
    bucket = F.floor(scaled).cast("int")
    return (
        F.when((col < 0) | (col > max_value), F.lit(None))
        .when(bucket >= nr_bins, F.lit(nr_bins - 1))  # x == max -> last bin
        .otherwise(bucket)
    )


def histogram_df(df: DataFrame, col: str, nr_bins: int = 20,
                 max_value: float = 1.0) -> DataFrame:
    """20-bin histogram as (bucket, n) rows — partial-agg friendly."""
    return (
        df.select(histogram_bucket(F.col(col), nr_bins, max_value).alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )
