"""End-to-end CLI test: the reference's five-command lifecycle
(create-gt -> create-eval -> evaluate -> visualize -> consolidate) chained
over a temp workspace (reference model: tests/test_dataset_builder.py
e2e chain with pytest-dependency; here one test function, same flow)."""

from __future__ import annotations

import json
import os


def test_cli_lifecycle(spark, sf_dir, tmp_path):
    # reuse the session fixture's JVM: cli._spark resolves getOrCreate
    from docling_eval_spark import cli

    pages = str(tmp_path / "pages")
    scored = str(tmp_path / "scored")
    lineage = str(tmp_path / "lineage")
    evals = str(tmp_path / "evals")
    viz = str(tmp_path / "viz")
    csv = str(tmp_path / "matrix.csv")

    cli.main(["create-gt", "--from-documents", sf_dir, "--output", pages])
    assert spark.read.parquet(pages).count() == 500

    cli.main(["create-eval", "--input", pages, "--output", scored,
              "--lineage", lineage, "--run-id", "t", "--resume"])
    sdf = spark.read.parquet(scored)
    assert sdf.count() == 500
    assert sdf.where("NOT byte_identical").count() == 0
    assert spark.read.parquet(lineage).count() > 0

    # resume: re-running commits nothing new
    cli.main(["create-eval", "--input", pages, "--output", scored, "--resume"])
    assert spark.read.parquet(scored).count() == 500

    for modality, src in [("markdown", None), ("table", sf_dir),
                          ("reading_order", sf_dir)]:
        argv = ["evaluate", "--modality", modality, "--output-dir", evals]
        argv += ["--input", scored] if src is None else ["--from-documents", src]
        cli.main(argv)
        p = os.path.join(evals, f"evaluation_synthetic_{modality}.json")
        doc = json.loads(open(p).read())
        assert doc["modality"] == modality

    md_eval = os.path.join(evals, "evaluation_synthetic_markdown.json")
    cli.main(["visualize", "--evaluation", md_eval, "--output-dir", viz])
    txt = open(os.path.join(viz, "evaluation_synthetic_markdown.txt")).read()
    assert "mean_bleu" in txt

    cli.main(["consolidate", "--from-documents", sf_dir, "--output", csv])
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "source,de,en,es,fr,zh"
    assert len(lines) == 21
