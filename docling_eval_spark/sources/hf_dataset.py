"""HF-hub dataset source (S2).

Rebuild of the reference's hub retrieval (docling_eval/dataset_builders/
dataset_builder.py:160-176 `retrieve_input_dataset`: snapshot_download of
the dataset repo, then load_dataset over the local copy). Spark-first
re-expression: hub datasets ARE parquet shards (`data/<split>-00000-of-
NNNNN.parquet` in the standard export layout), so the scale path is a
DIRECT distributed `spark.read.parquet` over the shard glob — no
driver-side download loop, no Arrow-dataset materialization; predicate
pushdown and column pruning reach the shards.

The network download step (`huggingface_hub.snapshot_download`) is
import-gated: absent in this sandbox, available unchanged on a real
cluster edge node. Everything after the snapshot lands is pure Spark.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def _split_shard_globs(root: str, split: str) -> list[str]:
    """Candidate shard locations for a split, covering the hub parquet
    export layout (`data/<split>-*.parquet`), datasets `save_to_disk`
    style (`<split>/*.parquet`), and flat single-file exports."""
    # anchored patterns only: '{split}*.parquet' would let split='val'
    # silently swallow 'validation.parquet' shards
    return [
        os.path.join(root, "data", f"{split}-*.parquet"),
        os.path.join(root, split, "*.parquet"),
        os.path.join(root, f"{split}.parquet"),
        os.path.join(root, f"{split}-*.parquet"),
    ]


def read_hf_dataset(spark: SparkSession, path_or_repo: str,
                    split: str = "train",
                    revision: str | None = None) -> DataFrame:
    """Load a HF-style dataset split as a DataFrame.

    `path_or_repo` is a local snapshot directory (the post-download state
    of the reference flow) or a hub repo id — the latter triggers the
    import-gated `snapshot_download` and then reads the local snapshot
    the same way. Shards are read distributed; file listing stays on the
    driver (it is metadata, one entry per shard)."""
    root = path_or_repo
    if not os.path.isdir(root):
        try:  # pragma: no cover - network/hub lib absent in this sandbox
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise ImportError(
                f"'{path_or_repo}' is not a local directory and "
                "huggingface_hub is not installed; pass a local snapshot "
                "path (hub parquet-export layout) instead"
            ) from e
        root = snapshot_download(repo_id=path_or_repo, repo_type="dataset",
                                 revision=revision)
    for pattern in _split_shard_globs(root, split):
        shards = sorted(glob.glob(pattern))
        if shards:
            return spark.read.parquet(*shards)
    raise FileNotFoundError(
        f"no parquet shards for split '{split}' under {root} "
        f"(tried {_split_shard_globs(root, split)})")
