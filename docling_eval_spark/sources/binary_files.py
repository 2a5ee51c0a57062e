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


def read_manifest_files(manifest: DataFrame, key_prefix: str = "",
                        base_dir: str = "",
                        existing: DataFrame | None = None,
                        fetch=None) -> DataFrame:
    """S3-style list+read source: an object-store LISTING MANIFEST
    (key, size — the list_objects_v2 page fields) -> (path, length,
    content, mime), with the reference download loop's exact skip
    semantics (dataset_builders/dataset_builder.py:35-109):

      * keys that ARE the prefix (empty relative path — directory
        markers) are skipped;
      * zero-size objects are skipped;
      * keys already present in `existing` (a DataFrame of relative
        `path`s — the resume probe's output) are skipped, mirroring the
        skip-if-exists branch.

    Unlike the reference there is no driver-side download loop: the
    manifest rows are filtered natively (the skips are predicates that
    run at manifest-scan speed) and the payloads are fetched INSIDE the
    executors, one Arrow stage, via the pluggable `fetch(key) -> bytes`
    (default: read `base_dir/key` from the local/shared filesystem; a
    real deployment passes a boto3-client closure). For plain prefix
    reads without a manifest, prefer read_binary_files over an s3a://
    path — direct distributed reads beat any list+fetch loop."""
    import os

    import pandas as pd

    strip = len(key_prefix) + 1 if key_prefix else 0
    rel = F.substring(F.col("key"), strip + 1, 2_000_000)
    rows = (
        manifest
        .where(F.col("size") > 0)
        .withColumn("path", rel)
        .where(F.length("path") > 0)
    )
    if existing is not None:
        rows = rows.join(existing.select("path").distinct(),
                         on="path", how="left_anti")

    if fetch is None:
        def fetch(key: str) -> bytes:  # noqa: F811 - documented default
            with open(os.path.join(base_dir, key), "rb") as f:
                return f.read()

    def gen(it):
        for pdf in it:
            payloads = [fetch(k) for k in pdf["key"]]
            yield pd.DataFrame({
                "path": pdf["path"],
                "length": pd.Series([len(p) for p in payloads],
                                    dtype="int64"),
                "content": payloads,
            })

    out = rows.select("key", "path").mapInPandas(
        gen, schema="path string, length bigint, content binary")
    return out.withColumn("mime", mime_for_path(F.col("path"))) \
        .orderBy("path")  # deterministic iteration order (W4)


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
