"""The flagship job: extract main content from every page and score it
against the reference text (SURVEY.md §7 minimum end-to-end slice).

Stages (scan -> UDF -> column ops -> agg -> two sinks):
  1. pages (input_hint schema) — from the deterministic corpus generator
     or any parquet/Iceberg table with that schema.
  2. size-balanced salted repartition (operators/skew.py).
  3. extraction mapInPandas (extraction/extract.py) — GT text rides along,
     so scoring never joins (the reference's co-located J1 pairing).
  4. scoring:
       - byte_identical: native column equality — the 100% gate is pure
         JVM, no Python;
       - the markdown metric suite (BLEU/F1/edit/METEOR/CER) as ONE
         Arrow-batched pandas UDF with an identity fast path (identical
         pair -> closed-form scores, no DP run) — on a corpus that's
         mostly byte-identical the slow path touches only the tail.
  5. rollups: DatasetStatistics per metric (operators/stats_rollup.py)
     + per-partition lineage rows (operators/lineage.py).

Scoring parity: reference evaluators/markdown_text_evaluator.py:164-185
(per-doc metric dict), evaluators/stats.py:77-97 (dataset rollup).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus.generator import pages_from_documents
from ..extraction.extract import extract_pages
from ..functions.text_metrics import cer, score_text_pair
from ..operators.skew import size_balanced_repartition

SCORE_FIELDS = ["bleu", "f1_score", "precision", "recall", "edit_distance", "meteor", "char_accuracy"]
_SCORE_SCHEMA = ", ".join(f"{f} double" for f in SCORE_FIELDS)

_IDENTITY_SCORES = {
    "bleu": 1.0, "f1_score": 1.0, "precision": 1.0, "recall": 1.0,
    "edit_distance": 0.0, "char_accuracy": 1.0,
}


def _score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Passthrough scorer: appends metric columns to each extraction batch.

    One UDF stage, no join — GT and prediction are columns of the same row
    (the reference's co-located J1 pairing), so scoring never shuffles.
    """
    for pdf in it:
        rows = []
        for pred, true in zip(pdf["extracted_text"], pdf["text"]):
            if pred == true:
                m = dict(_IDENTITY_SCORES)
                # METEOR of identical token streams is 1 - gamma*(1/m)^beta,
                # not exactly 1 (see functions/text_metrics.meteor_score)
                n_tok = len(true.split())
                m["meteor"] = 1.0 - 0.5 * (1.0 / n_tok) ** 3 if n_tok else 0.0
            else:
                m = score_text_pair(pred, true)
                m["char_accuracy"] = 1.0 - min(1.0, cer(pred, true))
            rows.append([m[f] for f in SCORE_FIELDS])
        out = pdf.copy()
        for i, f in enumerate(SCORE_FIELDS):
            out[f] = [r[i] for r in rows]
        yield out


def score_extractions(extracted: DataFrame, full_metrics: bool = True) -> DataFrame:
    """Per-doc scored rows: byte_identical natively (JVM) + metric suite
    appended by a passthrough mapInPandas (no join, no UDF recompute)."""
    if full_metrics:
        from ..extraction.extract import EXTRACT_SCHEMA

        extracted = extracted.mapInPandas(
            _score_batches, schema=f"{EXTRACT_SCHEMA}, {_SCORE_SCHEMA}"
        )
    return extracted.withColumn(
        "byte_identical", F.col("extracted_text") == F.col("text")
    )


def extract_and_score(pages: DataFrame, n_partitions: int = 32,
                      full_metrics: bool = True) -> DataFrame:
    balanced = size_balanced_repartition(pages, n_partitions)
    return score_extractions(extract_pages(balanced), full_metrics=full_metrics)


def flagship(spark: SparkSession, sf_dir: str, n_partitions: int = 32,
             full_metrics: bool = True) -> DataFrame:
    """documents parquet -> pages -> extract -> score. The entry() query."""
    pages = pages_from_documents(spark, sf_dir)
    return extract_and_score(pages, n_partitions=n_partitions,
                             full_metrics=full_metrics)


def flagship_rollup(scored: DataFrame) -> DataFrame:
    """Dataset-level summary row (counts + means); the driver-facing sink."""
    return scored.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("byte_identical").cast("long")).alias("n_byte_identical"),
        F.round(F.avg("edit_distance"), 6).alias("mean_edit_distance"),
        F.round(F.avg("bleu"), 6).alias("mean_bleu"),
        F.round(F.avg("f1_score"), 6).alias("mean_f1"),
        F.round(F.avg("char_accuracy"), 6).alias("mean_char_accuracy"),
    )
