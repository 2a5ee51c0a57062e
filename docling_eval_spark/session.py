"""SparkSession factory tuned for the extraction workload.

Design notes (100 TB scale):
  - Arrow batches must stay small: `html` blobs are MBs, so
    `maxRecordsPerBatch` is tuned down (64) to keep a batch well under
    executor memory even for heavy-tailed pages.
  - AQE on: runtime coalescing + skew-join splitting are free wins.
  - shuffle.partitions sized for local[32] tests; a real cluster job
    overrides via spark-submit conf (rule of thumb: 2-3x total cores,
    or target 128-512 MB per shuffle partition).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # html blobs are KB-to-MB scale: cap Arrow batches well below the
    # default 10k rows so a batch of heavy-tailed pages stays bounded
    # (256 rows x ~1 MB worst-case page ≈ 256 MB ceiling per batch).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "docling-eval-spark",
    master: str | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    bench harness can run the identical job at two parallelism levels to
    evidence the N -> 4N scaling-efficiency rule.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
