"""HF-hub dataset source (S2): distributed parquet-shard reads over the
standard hub export layouts (reference dataset_builder.py:160-176)."""

import os

import pytest


def _write_shards(spark, root, layout, split="train", n_shards=2):
    df = spark.range(100).selectExpr("id AS doc_id", "cast(id AS string) AS text")
    if layout == "hub":
        d = os.path.join(root, "data")
        os.makedirs(d, exist_ok=True)
        for i in range(n_shards):
            df.where(df.doc_id % n_shards == i).coalesce(1).write.mode(
                "overwrite").parquet(os.path.join(root, "_tmp"))
            part = [f for f in os.listdir(os.path.join(root, "_tmp"))
                    if f.endswith(".parquet")][0]
            os.replace(os.path.join(root, "_tmp", part),
                       os.path.join(d, f"{split}-{i:05d}-of-{n_shards:05d}.parquet"))
    elif layout == "split_dir":
        df.write.mode("overwrite").parquet(os.path.join(root, split))
    return 100


def test_hub_parquet_export_layout(spark, tmp_path):
    from docling_eval_spark.sources.hf_dataset import read_hf_dataset

    root = str(tmp_path / "ds")
    n = _write_shards(spark, root, "hub")
    out = read_hf_dataset(spark, root, split="train")
    assert out.count() == n
    assert set(out.columns) == {"doc_id", "text"}
    # other split absent
    with pytest.raises(FileNotFoundError):
        read_hf_dataset(spark, root, split="test")


def test_save_to_disk_layout(spark, tmp_path):
    from docling_eval_spark.sources.hf_dataset import read_hf_dataset

    root = str(tmp_path / "ds2")
    n = _write_shards(spark, root, "split_dir", split="validation")
    assert read_hf_dataset(spark, root, split="validation").count() == n


def test_repo_id_without_hub_lib_errors_clearly(spark):
    from docling_eval_spark.sources.hf_dataset import read_hf_dataset

    try:
        import huggingface_hub  # noqa: F401
        pytest.skip("hub lib present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="local snapshot"):
        read_hf_dataset(spark, "org/some-dataset")
