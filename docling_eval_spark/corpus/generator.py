"""Spark stage: documents table -> Common-Crawl-style `pages` table.

Arrow-batched mapInPandas (one Python call per batch; pure-function HTML
synthesis inside). The resulting DataFrame has exactly the BASELINE.json
input_hint schema:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus doc_id for test joins.

At 100 TB scale this stage is write-once: pages land in an Iceberg/parquet
table partitioned by bucket(url) and the extraction job reads that; here the
generator feeds the pipeline directly so tests and bench are hermetic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .html_synth import synth_html, url_for, warc_ts_for

PAGES_SCHEMA = (
    "doc_id bigint, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)


def _synth_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids = pdf["doc_id"].to_numpy()
        texts = pdf["text"].to_numpy()
        langs = pdf["lang"].to_numpy()
        yield pd.DataFrame({
            "doc_id": ids,
            "url": [url_for(int(i)) for i in ids],
            "warc_ts": [warc_ts_for(int(i)) for i in ids],
            "html": [synth_html(int(i), t, l) for i, t, l in zip(ids, texts, langs)],
            "text": texts,
            "lang": langs,
        })


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         n_partitions: int | None = None) -> DataFrame:
    """Deterministic pages table from the driver's documents parquet.

    Column pruning matters: only (doc_id, text, lang) are read from parquet
    (ReadSchema shows 3 columns, not 5).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    if n_partitions:
        docs = docs.repartition(n_partitions, F.col("doc_id"))
    return docs.mapInPandas(_synth_batches, schema=PAGES_SCHEMA)
