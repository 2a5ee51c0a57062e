"""Layout pipeline: synthetic layout pages -> per-image metrics + corpus mAP.

Rebuild of the reference LayoutEvaluator (docling_eval/evaluators/
layout_evaluator.py):
  - per-image mAP / map_50 / map_75 (:268-349, per-image metric
    re-instantiation replaced by the numpy COCO kernel run inside ONE
    Arrow-batched stage);
  - area-mask precision/recall/F1 on a rasterized page (:690-779) — here
    500x500 so integer page coords rasterize exactly (closed-form oracles);
  - label-matched greedy weighted IoU at threshold 0.5 (:425-494);
  - corpus-level mAP (:246-266) as a distributed partial+final aggregate
    (operators/layout_agg.py) instead of a driver-side holistic metric.

All per-page work is fused into one mapInPandas stage (page data is tiny;
the only shuffle in the corpus-mAP path is the bounded
(label, thr_idx, score-bin) reduction).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_METRICS_SCHEMA = (
    "doc_id bigint, n_boxes int, mode int, map double, map_50 double, "
    "map_75 double, mask_precision double, mask_recall double, "
    "mask_f1 double, avg_iou_50 double"
)

PARTIALS_SCHEMA = (
    "doc_id bigint, kind string, label string, score double, "
    "tp array<boolean>, n_gt int"
)


def _docs(spark: SparkSession, sf_dir: str, n_partitions: int = 16) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .repartition(n_partitions, F.xxhash64(F.col("doc_id"), F.lit(0x5EED)))
    )


def _image_metric_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..corpus.layout_synth import MASK_SIZE, gt_page, mode, n_boxes, pred_page
    from ..functions.layout_metrics import (
        greedy_label_matched_iou,
        image_map,
        mask_precision_recall_f1,
    )

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            gt_boxes, gt_labels = gt_page(d)
            pr_boxes, pr_labels, pr_scores = pred_page(d)
            m = image_map(pr_boxes, pr_labels, pr_scores, gt_boxes, gt_labels)
            mp, mr, mf1 = mask_precision_recall_f1(
                gt_boxes, pr_boxes, mask_width=MASK_SIZE, mask_height=MASK_SIZE)
            g = greedy_label_matched_iou(pr_boxes, pr_labels, gt_boxes,
                                         gt_labels, iou_thresh=0.5)
            rows.append((d, n_boxes(d), mode(d), m["map"], m["map_50"],
                         m["map_75"], mp, mr, mf1, g["average_iou"]))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "n_boxes", "mode", "map", "map_50", "map_75",
            "mask_precision", "mask_recall", "mask_f1", "avg_iou_50"])


def per_image_metrics(spark: SparkSession, sf_dir: str,
                      n_partitions: int = 16,
                      modes: tuple[int, ...] | None = None) -> DataFrame:
    """(doc_id, map, map_50, map_75, mask P/R/F1, weighted IoU@.5).

    `modes` filters docs by perturbation mode BEFORE the UDF stage, so the
    predicate prunes work, not just rows.
    """
    docs = _docs(spark, sf_dir, n_partitions)
    if modes is not None:
        docs = docs.where((F.col("doc_id") % 4).isin(list(modes)))
    return docs.mapInPandas(_image_metric_batches, schema=IMAGE_METRICS_SCHEMA)


def _partial_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..corpus.layout_synth import gt_page, pred_page
    from ..functions.layout_metrics import match_detections

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            gt_boxes, gt_labels = gt_page(d)
            pr_boxes, pr_labels, pr_scores = pred_page(d)
            for c in np.unique(gt_labels):
                rows.append((d, "gt", str(c), None, None,
                             int((gt_labels == c).sum())))
            for c in np.unique(pr_labels):
                pmask = pr_labels == c
                gmask = gt_labels == c
                tp = match_detections(pr_boxes[pmask], pr_scores[pmask],
                                      gt_boxes[gmask])
                for di in range(int(pmask.sum())):
                    rows.append((d, "det", str(c), float(pr_scores[pmask][di]),
                                 [bool(x) for x in tp[:, di]], None))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "kind", "label", "score", "tp", "n_gt"])


def corpus_class_ap(spark: SparkSession, sf_dir: str, n_partitions: int = 16,
                    modes: tuple[int, ...] = (0, 1)) -> DataFrame:
    """Per-class corpus AP (the consolidator's class_<label> columns) —
    the same single-pass persisted-partials PATTERN as corpus_map, with
    the per-class final. Needing BOTH rollups? Use layout_rollups, which
    computes them from ONE matching pass."""
    return layout_rollups(spark, sf_dir, n_partitions, modes)["class_ap"]


def layout_rollups(spark: SparkSession, sf_dir: str, n_partitions: int = 16,
                   modes: tuple[int, ...] = (0, 1)) -> dict[str, DataFrame]:
    """{'map': (map, map_50, map_75) row, 'class_ap': per-class rows} —
    BOTH finals derived from one persisted execution of the expensive
    per-doc COCO-matching stage (the partials subtree runs once; both
    tiny results are materialized before the cache is released)."""
    from ..operators.layout_agg import corpus_ap_per_class, corpus_map_from_partials

    docs = _docs(spark, sf_dir, n_partitions).where(
        (F.col("doc_id") % 4).isin(list(modes)))
    partials = docs.mapInPandas(_partial_batches, schema=PARTIALS_SCHEMA).persist()
    partials.count()  # materialize once before the multi-consumer finals
    dets = partials.where(F.col("kind") == "det").select("label", "score", "tp")
    gts = partials.where(F.col("kind") == "gt").select("label", "n_gt")
    out = {
        "map": corpus_map_from_partials(dets, gts).persist(),
        "class_ap": corpus_ap_per_class(dets, gts).persist(),
    }
    for df in out.values():
        df.count()
    partials.unpersist()
    return out


def corpus_map(spark: SparkSession, sf_dir: str, n_partitions: int = 16,
               modes: tuple[int, ...] = (0, 1),
               materialize: bool = True) -> DataFrame:
    """Corpus-level mAP over the docs whose perturbation mode is in `modes`
    (the default {identity, dropped-box} set has an exact SQL oracle:
    precision is 1 everywhere, so AP = (floor(100*TP/GT)+1)/101)."""
    from ..operators.layout_agg import corpus_map_from_partials

    docs = _docs(spark, sf_dir, n_partitions).where(
        (F.col("doc_id") % 4).isin(list(modes)))
    partials = docs.mapInPandas(_partial_batches, schema=PARTIALS_SCHEMA)
    if not materialize:
        # fully lazy plan for inspection/composition — the partials
        # subtree will execute once per consumer
        dets = partials.where(F.col("kind") == "det").select("label", "score", "tp")
        gts = partials.where(F.col("kind") == "gt").select("label", "n_gt")
        return corpus_map_from_partials(dets, gts)
    # The partials subtree is consumed twice (det rows and gt rows); without
    # a persist the expensive mapInPandas matching stage executes twice.
    # The rollup is materialized eagerly and the partials cache released;
    # the RETURNED one-row-per-summary frame stays cached (caller-owned —
    # its footprint is a handful of rows).
    partials = partials.persist()
    partials.count()  # own job first: downstream consumers of a merely
    # persist-marked frame race to compute the matching stage concurrently
    dets = partials.where(F.col("kind") == "det").select("label", "score", "tp")
    gts = partials.where(F.col("kind") == "gt").select("label", "n_gt")
    out = corpus_map_from_partials(dets, gts).persist()
    out.count()
    partials.unpersist()
    return out
