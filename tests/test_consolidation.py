"""3-D consolidation matrix (reference aggregations/consolidator.py
:54-141, :149-206): benchmark x experiment x modality subtables."""

import json
import os


def _eval_json(d, experiment, benchmark, modality, metrics):
    exp = os.path.join(d, experiment)
    os.makedirs(exp, exist_ok=True)
    with open(os.path.join(exp, f"evaluation_{benchmark}_{modality}.json"), "w") as f:
        json.dump({"benchmark": benchmark, "modality": modality,
                   "evaluation": metrics}, f)


def _fixture(root):
    _eval_json(root, "exp1", "dpbench", "table",
               {"teds_mean": 0.912345, "total": 1250})
    _eval_json(root, "exp2", "dpbench", "table",
               {"teds_mean": 0.85, "total": 1250})
    _eval_json(root, "exp1", "omni", "table",
               {"teds_mean": 0.7, "total": 900})
    _eval_json(root, "exp1", "dpbench", "markdown",
               {"mean_bleu": 0.5, "mean_f1": 0.625})


def test_consolidation_matrices_golden(spark, tmp_path):
    from docling_eval_spark.plans.consolidation import (
        consolidation_matrices,
        load_evaluation_dir,
        write_consolidation,
    )

    root = str(tmp_path / "evals")
    _fixture(root)
    rows = load_evaluation_dir(spark, root)
    matrices = consolidation_matrices(rows)
    assert sorted(matrices) == ["markdown", "table"]

    t = matrices["table"]
    assert list(t.columns) == ["Benchmark", "Provider", "Experiment",
                               "teds_mean", "total"]
    # sorted by (Benchmark, Provider); both dpbench experiments present
    assert list(t["Benchmark"]) == ["dpbench", "dpbench", "omni"]
    assert set(t["Experiment"]) == {"exp1", "exp2"}
    # reference export_value formatting: %.2f, no thousands grouping
    assert list(t["teds_mean"]) == ["0.91", "0.85", "0.70"]
    assert list(t["total"]) == ["1250.00", "1250.00", "900.00"]

    out = write_consolidation(matrices, str(tmp_path / "out"))
    with open(out) as f:
        text = f.read()
    golden = (
        "markdown\n"
        "Benchmark,Provider,Experiment,mean_bleu,mean_f1\n"
        "dpbench,spark,exp1,0.50,0.62\n"
        "\n"
        "table\n"
        "Benchmark,Provider,Experiment,teds_mean,total\n"
        "dpbench,spark,exp1,0.91,1250.00\n"
        "dpbench,spark,exp2,0.85,1250.00\n"
        "omni,spark,exp1,0.70,900.00\n"
    )
    assert text == golden


def test_consolidate_cli_evaluations_mode(spark, tmp_path, capsys):
    from docling_eval_spark import cli

    root = str(tmp_path / "evals")
    _fixture(root)
    outdir = str(tmp_path / "matrix")
    cli.main(["consolidate", "--evaluations", root, "--output", outdir])
    assert "2 modality subtables" in capsys.readouterr().out
    files = os.listdir(outdir)
    assert any(f.startswith("consolidation_matrix") for f in files)


def test_export_value_formats():
    from docling_eval_spark.plans.consolidation import export_value

    assert export_value(0.916) == "0.92"
    assert export_value(0.5, 0.25) == "0.50±0.25"


class TestMultiEvaluate:
    def test_grid_with_cache_reuse(self, spark, sf_dir, tmp_path):
        """Two benchmarks x one experiment x two modalities: first run
        builds everything; second run must hit the cached sidecars and
        skip the dataset builds (reference multi_evalutor.py:201-213,
        268-273 semantics)."""
        from docling_eval_spark.plans.consolidation import (
            consolidation_matrices,
            load_evaluation_dir,
        )
        from docling_eval_spark.plans.multi_eval import multi_evaluate

        root = str(tmp_path / "multi")
        benchmarks = {"bench_a": sf_dir, "bench_b": sf_dir}
        mods = ["reading_order", "timings"]
        r1 = multi_evaluate(spark, root, benchmarks, ["spark"], mods,
                            partitions=4)
        assert r1["stats"] == {"gt_built": 2, "preds_built": 2,
                               "computed": 4, "cached": 0}
        r2 = multi_evaluate(spark, root, benchmarks, ["spark"], mods,
                            partitions=4)
        assert r2["stats"] == {"gt_built": 0, "preds_built": 0,
                               "computed": 0, "cached": 4}
        # cached rolls identical to the computed ones
        assert r2["evaluations"] == r1["evaluations"]
        # sidecar layout feeds the consolidator (two-level glob)
        rows = load_evaluation_dir(spark, root)
        matrices = consolidation_matrices(rows)
        assert set(matrices) == {"reading_order", "timings"}
        ro = matrices["reading_order"]
        assert sorted(ro["Benchmark"]) == ["bench_a", "bench_b"]

    def test_std_metrics_pair_as_mean_std(self, spark, tmp_path):
        """ADVICE: <metric>_std sidecar fields must pair with their mean
        into the reference's 'mean±std' format instead of surfacing as
        separate columns."""
        import json
        import os

        from docling_eval_spark.plans.consolidation import (
            consolidation_matrices,
            load_evaluation_dir,
        )

        exp_dir = tmp_path / "exp1"
        os.makedirs(exp_dir)
        with open(exp_dir / "evaluation_b_markdown.json", "w") as f:
            json.dump({"benchmark": "b", "modality": "markdown",
                       "evaluation": {"bleu": 0.5, "bleu_std": 0.25,
                                      "lonely_std": 0.125}}, f)
        rows = load_evaluation_dir(spark, str(tmp_path))
        m = consolidation_matrices(rows)["markdown"]
        assert m["bleu"][0] == "0.50±0.25"
        assert "bleu_std" not in m.columns
        assert m["lonely_std"][0] == "0.12"  # no mean to pair with
