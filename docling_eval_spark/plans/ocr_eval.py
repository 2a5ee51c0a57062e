"""OCR pipeline: character error rate over deterministically degraded text.

Rebuild of the reference OCREvaluator (docling_eval/evaluators/
ocr_evaluator.py): per-record CER via jiwer (:60,145-148) with
char_accuracy = 1 - min(1, cer) (:109-113) and a plain-mean rollup
(:134-136). Our CER is the from-scratch Levenshtein kernel
(functions/text_metrics.cer) run in one Arrow-batched stage.

The synthetic degradation is doc_id-determined so the oracle is exact SQL:
    mode = doc_id % 3:  0 -> identity          (cer 0)
                        1 -> drop first char   (one deletion,  cer 1/len)
                        2 -> append 'X'        (one insertion, cer 1/len)
CER denominator is the TRUE text length (jiwer semantics).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OCR_SCHEMA = "doc_id bigint, mode int, cer double, char_accuracy double"


def degrade(text: str, mode: int) -> str:
    if not text:
        return text  # empty truth stays empty: cer 0 (oracle contract)
    if mode == 1:
        return text[1:]
    if mode == 2:
        return text + "X"
    return text


def _cer_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.text_metrics import cer

    for pdf in it:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            d = int(doc_id)
            m = d % 3
            pred = degrade(text, m)
            c = cer(pred, text)
            rows.append((d, m, c, 1.0 - min(1.0, c)))
        yield pd.DataFrame(rows, columns=["doc_id", "mode", "cer", "char_accuracy"])


def ocr_scores(spark: SparkSession, sf_dir: str,
               n_partitions: int = 16) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(n_partitions, F.xxhash64(F.col("doc_id"), F.lit(0x5EED)))
    )
    return docs.mapInPandas(_cer_batches, schema=OCR_SCHEMA)


def ocr_rollup(scores: DataFrame) -> DataFrame:
    """Mean char accuracy (reference ocr_evaluator.py:134-136)."""
    return scores.agg(
        F.count("*").alias("total"),
        F.round(F.avg("char_accuracy"), 6).alias("mean_char_accuracy"),
        F.round(F.avg("cer"), 6).alias("mean_cer"),
    )
