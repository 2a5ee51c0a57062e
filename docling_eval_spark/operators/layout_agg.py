"""Distributed corpus-level mAP: partial (per page) + final (per class).

The reference computes corpus mAP by feeding EVERY page into one
torchmetrics MeanAveragePrecision instance and calling .compute() on the
driver (docling_eval/evaluators/layout_evaluator.py:246-266) — a holistic
aggregate that cannot scale past one node. The COCO AP final step needs
detections sorted by score per class; a naive distributed version would
global-sort billions of detection rows.

This implementation makes the final step shuffle-bounded instead:

  partial (embarrassingly parallel, inside the per-page UDF):
      detection rows (label, score, tp[T]) via COCO greedy matching
      (functions/layout_metrics.match_detections) + per-page gt counts.

  final (bounded shuffle):
      scores are quantized to `n_bins` buckets; groupBy
      (label, thr_idx, bin) reduces the detection stream to at most
      C x T x n_bins partial rows (class count x 10 x 10001 — a few
      hundred thousand rows REGARDLESS of corpus size); a grouped-map
      pandas stage then walks each class's binned PR curve and computes
      101-point interpolated AP.

  Exactness: binned AP equals exact AP whenever equal-score detections
  are interchangeable (they are: COCO ties are implementation-defined;
  binning makes tie handling deterministic and order-independent, which
  exact per-score sorting under distribution is NOT).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_THRESHOLDS = 10  # IoU .5:.05:.95 (functions/layout_metrics.IOU_THRESHOLDS)


def _ap_from_bins(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (label, thr_idx) group: binned PR curve -> 101-point AP."""
    label = pdf["label"].iloc[0]
    thr_idx = int(pdf["thr_idx"].iloc[0])
    n_gt = float(pdf["n_gt"].iloc[0])
    if n_gt <= 0:
        return pd.DataFrame({"label": [label], "thr_idx": [thr_idx], "ap": [np.nan]})
    o = pdf.sort_values("bin", ascending=False)
    cum_tp = o["n_tp"].cumsum().to_numpy(dtype=np.float64)
    cum_det = o["n_det"].cumsum().to_numpy(dtype=np.float64)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_det, 1e-12)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    recall_points = np.arange(101) / 100.0  # exact i/100 (see layout_metrics)
    idx = np.searchsorted(recall, recall_points, side="left")
    interp = np.where(idx < len(precision),
                      precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return pd.DataFrame({"label": [label], "thr_idx": [thr_idx],
                         "ap": [float(interp.mean())]})


def class_threshold_aps(detections: DataFrame, gt_counts: DataFrame,
                        n_bins: int = 10001) -> DataFrame:
    """The shared binned partial+final stage: detections(label, score,
    tp array<boolean>[T]) + gt_counts(label, n_gt) -> one AP row per
    (label, thr_idx). Classes with zero gt are excluded (NaN-skip,
    torchmetrics parity)."""
    binned = (
        detections
        .select(
            "label",
            F.floor(F.col("score") * (n_bins - 1)).cast("int").alias("bin"),
            F.posexplode("tp").alias("thr_idx", "is_tp"),
        )
        .groupBy("label", "thr_idx", "bin")
        .agg(
            F.sum(F.col("is_tp").cast("long")).alias("n_tp"),
            F.count("*").alias("n_det"),
        )
    )
    totals = gt_counts.groupBy("label").agg(F.sum("n_gt").alias("n_gt"))
    # classes that have gt but zero detections still need an AP row (= 0.0)
    all_pairs = totals.select("label").crossJoin(
        totals.sparkSession.range(N_THRESHOLDS).select(
            F.col("id").cast("int").alias("thr_idx"))
    )
    joined = (
        all_pairs
        .join(binned, ["label", "thr_idx"], "left")
        .join(F.broadcast(totals), "label")
        .select("label", "thr_idx",
                F.coalesce("bin", F.lit(0)).alias("bin"),
                F.coalesce("n_tp", F.lit(0)).alias("n_tp"),
                F.coalesce("n_det", F.lit(0)).alias("n_det"),
                "n_gt")
    )
    return joined.groupBy("label", "thr_idx").applyInPandas(
        _ap_from_bins, schema="label string, thr_idx int, ap double"
    ).where(~F.isnan("ap"))


def corpus_map_from_partials(detections: DataFrame, gt_counts: DataFrame,
                             n_bins: int = 10001) -> DataFrame:
    """One row (map, map_50, map_75) over all classes."""
    aps = class_threshold_aps(detections, gt_counts, n_bins)
    return aps.agg(
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg(F.when(F.col("thr_idx") == 0, F.col("ap"))), 6).alias("map_50"),
        F.round(F.avg(F.when(F.col("thr_idx") == 5, F.col("ap"))), 6).alias("map_75"),
    )


def corpus_ap_per_class(detections: DataFrame, gt_counts: DataFrame,
                        n_bins: int = 10001) -> DataFrame:
    """Per-class AP rows (label, ap, ap_50) — the reference consolidator's
    `class_<label>` columns (consolidator.py:214-217 from
    layout_evaluator's evaluations_per_class)."""
    aps = class_threshold_aps(detections, gt_counts, n_bins)
    return aps.groupBy("label").agg(
        F.round(F.avg("ap"), 6).alias("ap"),
        F.round(F.avg(F.when(F.col("thr_idx") == 0, F.col("ap"))), 6).alias("ap_50"),
    )
