"""Binary-file source: a directory of raw documents -> DataFrame.

Rebuild of the reference's local-file dataset builder (docling_eval/
dataset_builders/file_dataset_builder.py:76-161: glob by extension,
sorted for determinism, mime guessed per file :106) and of the S3/COS
download loop (dataset_builders/dataset_builder.py:35-109) — which at
scale becomes a DIRECT distributed read: `spark.read.format("binaryFile")`
over local, s3a://, gs://, or abfs:// paths; no driver-side download, no
local copy, predicate pushdown on path/length/modificationTime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> mime (reference file_dataset_builder.py:106 uses
# mimetypes.guess_type; the fixed table keeps it deterministic cross-OS)
_EXT_MIME = {
    "pdf": "application/pdf",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "html": "text/html",
    "htm": "text/html",
    "json": "application/json",
    "txt": "text/plain",
}


def mime_for_path(path: Column) -> Column:
    """P8 file-extension predicate as a native when/otherwise chain."""
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    out = F.lit("application/octet-stream")
    for e, m in reversed(list(_EXT_MIME.items())):
        out = F.when(ext == e, F.lit(m)).otherwise(out)
    return out


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None,
                      extensions: tuple[str, ...] | None = None) -> DataFrame:
    """(path, modificationTime, length, content, mime) for every file.

    `extensions` filters like the reference's extension list; the filter
    lands on the file index (path pushdown), not on read bytes.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if extensions:
        pat = "|".join(extensions)
        df = df.where(F.col("path").rlike(rf"\.({pat})$"))
    return df.withColumn("mime", mime_for_path(F.col("path"))) \
        .orderBy("path")  # deterministic iteration order (W4)
