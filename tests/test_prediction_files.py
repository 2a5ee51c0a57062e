"""Prediction-file adapters (reference evaluators/adapters.py:12-66 +
prediction_providers/file_provider.py:107-145): directory of
<doc_id>.<ext> files -> distributed rows paired with GT."""

import os

from pyspark.sql import functions as F


def _write(d, name, content):
    with open(os.path.join(d, name), "w") as f:
        f.write(content)


def test_read_prediction_files_stems_and_content(spark, tmp_path):
    from docling_eval_spark.sources.prediction_files import read_prediction_files

    d = str(tmp_path)
    _write(d, "12.md", "# twelve\nbody")
    _write(d, "doc-x.md", "other")
    _write(d, "9.txt", "ignored extension")
    rows = {r["doc_id"]: r["pred_text"]
            for r in read_prediction_files(spark, d, "md").collect()}
    assert rows == {"12": "# twelve\nbody", "doc-x": "other"}


def test_doctags_files_adapter_parses_spans(spark, tmp_path):
    from docling_eval_spark.functions.doctags import DocTagSpan, to_doctags
    from docling_eval_spark.sources.prediction_files import (
        read_doctags_prediction_spans,
    )

    d = str(tmp_path)
    spans = [DocTagSpan("title", 1, 2, 3, 4, "Hello"),
             DocTagSpan("text", 5, 6, 7, 8, "World")]
    _write(d, "7.dt", to_doctags(spans))
    _write(d, "8.dt", "<doctag>garbage without elements</doctag>")
    out = read_doctags_prediction_spans(spark, d).orderBy("doc_id", "idx").collect()
    assert [(r["doc_id"], r["idx"], r["label"], r["text"]) for r in out] == [
        ("7", 0, "title", "Hello"), ("7", 1, "text", "World")]


def test_score_prediction_files_missing_and_exact(spark, tmp_path):
    from docling_eval_spark.sources.prediction_files import score_prediction_files

    d = str(tmp_path)
    gt = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id bigint, text string")
    _write(d, "1.md", "alpha beta gamma delta epsilon zeta")  # byte-exact
    scored = {r["doc_id"]: r for r in
              score_prediction_files(spark, gt, d).collect()}
    assert scored["1"]["has_prediction"] and scored["1"]["bleu"] == 1.0
    assert scored["1"]["edit_distance"] == 0.0
    assert not scored["2"]["has_prediction"]
    assert scored["2"]["edit_distance"] == 1.0 and scored["2"]["f1_score"] == 0.0


def test_score_prediction_files_asymmetric_pair(spark, tmp_path):
    """Arg-order pin: edit_distance divides by max(len) but precision is
    pred-side and recall is true-side — a pred that is a strict subset of
    GT must have precision 1 and recall < 1."""
    from docling_eval_spark.sources.prediction_files import score_prediction_files

    d = str(tmp_path)
    gt = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string")
    _write(d, "3.md", "alpha beta gamma delta")
    r = score_prediction_files(spark, gt, d).collect()[0]
    assert r["precision"] == 1.0
    assert r["recall"] == 0.5


def test_cli_score_files(spark, tmp_path, sf_dir, capsys):
    import duckdb  # noqa: F401  (env sanity)

    from docling_eval_spark import cli

    pred = tmp_path / "preds"
    pred.mkdir()
    con_rows = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").where(F.col("doc_id") < 20).collect()
    for r in con_rows:
        if r["doc_id"] % 2 == 0:
            _write(str(pred), f"{r['doc_id']}.md", r["text"])
    outdir = tmp_path / "out"
    cli.main(["score-files", "--pred-dir", str(pred),
              "--from-documents", sf_dir,
              "--output-dir", str(outdir), "--benchmark", "t"])
    import json
    with open(outdir / "evaluation_t_files.json") as f:
        doc = json.load(f)
    ev = doc["evaluation"]
    # GT side is the full documents table; only doc_id<20 evens have files
    assert ev["missing_prediction"] == ev["total"] - 10
    captured = capsys.readouterr().out
    assert "score-files:" in captured
