"""Multimodal plumbing tests: binary payloads, typed metadata, decode stub,
UDTF-style frame fan-out. The decode is a documented deterministic fake
(no codec libs here); what these tests pin down is the Spark-side contract:
schemas, determinism, fan-out row counts, and native metadata columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _payloads(spark, sf_dir):
    # deterministic fake payloads: PNG magic + text bytes
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return docs.withColumn(
        "payload",
        F.concat(F.unhex(F.lit("89504E47")), F.encode("text", "utf-8")),
    ).drop("text")


class TestMultimodal:
    def test_payload_metadata_native(self, spark, sf_dir):
        from docling_eval_spark.operators.multimodal import with_payload_metadata

        df = with_payload_metadata(_payloads(spark, sf_dir))
        rows = df.select("payload_meta.*").collect()
        assert all(r["mime"] == "image/png" for r in rows)
        assert all(r["n_bytes"] > 4 for r in rows)
        assert len({r["sha256"] for r in rows}) == len(rows)
        # metadata must be pure JVM expressions: no Python stages in the plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_decode_features_deterministic(self, spark, sf_dir):
        from docling_eval_spark.operators.multimodal import decode_image_features

        feats1 = decode_image_features(_payloads(spark, sf_dir), dim=16)
        r1 = {r["doc_id"]: r for r in feats1.collect()}
        r2 = {r["doc_id"]: r for r in decode_image_features(
            _payloads(spark, sf_dir), dim=16).collect()}
        assert len(r1) == len(r2) > 0
        some = next(iter(r1))
        assert r1[some]["embedding"] == r2[some]["embedding"]
        assert all(len(r["embedding"]) == 16 for r in r1.values())
        assert all(64 <= r["width"] <= 256 for r in r1.values())

    def test_frame_fanout_counts(self, spark, sf_dir):
        from docling_eval_spark.operators.multimodal import sample_frames

        pay = _payloads(spark, sf_dir).limit(20)
        frames = sample_frames(pay, chunk=100, every_n=4)
        got = frames.groupBy("doc_id").count().collect()
        sizes = {r["doc_id"]: r["n"] for r in pay.select(
            "doc_id", F.length("payload").alias("n")).collect()}
        for row in got:
            n_chunks = max(1, (sizes[row["doc_id"]] + 99) // 100)
            expected = (n_chunks + 3) // 4
            assert row["count"] == expected
