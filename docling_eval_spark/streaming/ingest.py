"""Structured-Streaming ingest: incremental extraction over arriving pages.

The reference is batch-only (SURVEY.md §2.9) and the 10^12-doc extraction
job is a resumable BATCH pipeline (Iceberg snapshot + anti-join resume,
operators/resume.py). Streaming still earns its place at the edges:
a crawl drops WARC-derived parquet files continuously, and this module
turns the same fused extraction stage into an incremental job —

  - file-source `readStream` over the landing directory (input_hint
    schema), `maxFilesPerTrigger` bounding per-micro-batch bytes;
  - the IDENTICAL extraction `mapInPandas` (extraction/extract.py) runs
    unchanged on the streaming DataFrame — one code path for batch and
    streaming (Structured Streaming's core promise);
  - `writeStream` to parquet with a checkpoint directory: exactly-once
    file-sink semantics; a killed job restarts at the last committed
    micro-batch (the streaming twin of the batch anti-join resume);
  - `Trigger.AvailableNow` drains the backlog then stops — the cron-style
    incremental deployment mode;
  - a watermarked event-time window aggregate over `warc_ts` for
    late-data-tolerant throughput/lineage rollups
    (`applyInPandasWithState` is not needed: the rollup is a plain
    windowed count, which Spark handles with built-in state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string, doc_id bigint")


def stream_pages(spark: SparkSession, input_path: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of pages (input_hint schema)."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def streaming_extract(pages: DataFrame) -> DataFrame:
    """The batch extraction stage, unchanged, on a streaming DataFrame."""
    from ..extraction.extract import extract_pages

    return extract_pages(pages).withColumn(
        "byte_identical", F.col("extracted_text") == F.col("text")
    )


def start_ingest(spark: SparkSession, input_path: str, output_path: str,
                 checkpoint_path: str,
                 available_now: bool = True) -> StreamingQuery:
    """Incremental extract job: landing dir -> scored parquet, exactly-once.

    Restart with the same checkpoint_path to resume: committed micro-batches
    are never reprocessed (file-source + file-sink checkpoint contract).
    """
    scored = streaming_extract(stream_pages(spark, input_path))
    writer = (
        scored.writeStream
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dedup_ingest(spark: SparkSession, input_path: str,
                       output_path: str, checkpoint_path: str,
                       key: str = "doc_id", text_col: str = "text",
                       near: bool = False, threshold: float = 0.8,
                       available_now: bool = True) -> StreamingQuery:
    """Steady-state web ingestion: every micro-batch exact-dedups
    against EVERYTHING already committed to the output (plus itself)
    before appending — the streaming form of operators/dedup.py's
    dedup_against, so a recrawl arriving hours later still collapses
    onto the copy already kept.

    foreachBatch is the right sink because the dedup needs a batch
    read of the output between triggers; its usual at-least-once
    caveat is neutralized HERE by the dedup itself: a replayed batch
    re-dedups against its own previously-committed rows and appends
    nothing, so the sink is idempotent without transactional writes.
    Only md5 hashes of the history move (see dedup_against); at scale
    the history read is a column-pruned scan of one 32-char column.

    With `near=True` the batch additionally minhash-probes the
    committed corpus and drops near-duplicate recrawls at >= threshold
    (near_dedup_against). That stage needs history KEYS and TEXT —
    a real deployment stores the minhash signature column at ingest so
    each batch probes signatures, not text; here the history re-read
    keeps the sandbox self-contained. Idempotency holds for the exact
    stage (replayed rows hash-match their committed copies); replayed
    NEAR batches also drop against their committed selves because a
    document is a 1.0-Jaccard near-dup of itself.
    """
    from pyspark.errors import AnalysisException

    from ..operators.dedup import dedup_against, near_dedup_against

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        cols = [key, text_col] if near else [text_col]
        try:
            history = batch_df.sparkSession.read.parquet(
                output_path).select(*cols)
        except AnalysisException:  # first batch: no output yet
            history = batch_df.select(*cols).limit(0)
        if near:
            kept = near_dedup_against(batch_df, history,
                                      text_col=text_col, key=key,
                                      threshold=threshold)
        else:
            kept = dedup_against(batch_df, history, text_col=text_col,
                                 key=key)
        kept.write.mode("append").parquet(output_path)

    writer = (
        stream_pages(spark, input_path)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_throughput(pages: DataFrame, window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Event-time ingest rollup: docs and bytes per `warc_ts` window,
    tolerant of `watermark` lateness. Works on batch AND streaming frames
    (watermark is a no-op in batch)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("html")).alias("total_bytes"),
        )
        .select(F.col("w.start").alias("window_start"), "lang",
                "n_docs", "total_bytes")
    )
