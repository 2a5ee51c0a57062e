"""Page-granular OCR over the map<int, array<struct>> segmented-page
model (reference ocr_evaluator.py:150-162)."""

from pyspark.sql import functions as F


def test_segmented_docs_model_and_reconstruction(spark, sf_dir):
    from docling_eval_spark.plans.ocr_eval import TOKENS_PER_PAGE, segmented_docs

    seg = segmented_docs(spark, sf_dir).where(F.col("doc_id") < 5)
    # schema: map<int, array<struct<cell_id int, text string>>>
    t = dict(seg.dtypes)
    assert t["gt_pages"] == t["pred_pages"]
    assert t["gt_pages"].startswith("map<int,array<struct<cell_id:int,text:string>")

    rows = seg.collect()
    docs = {r["doc_id"]: r for r in rows}
    texts = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select("doc_id", "text").where(F.col("doc_id") < 5).collect()}
    for d, r in docs.items():
        toks = texts[d].split()
        # page partitioning: 25-token windows, cells 8-token lines
        all_toks = []
        for page_no in sorted(r["gt_pages"]):
            cells = r["gt_pages"][page_no]
            assert [c["cell_id"] for c in cells] == list(range(len(cells)))
            for c in cells:
                all_toks.extend(c["text"].split(" "))
        assert all_toks == toks
        assert len(r["gt_pages"]) == (len(toks) + TOKENS_PER_PAGE - 1) // TOKENS_PER_PAGE


def test_page_cer_closed_form(spark, sf_dir):
    from docling_eval_spark.plans.ocr_eval import page_ocr_scores

    s = page_ocr_scores(spark, sf_dir).where(F.col("doc_id") < 30).collect()
    assert len(s) > 30  # multi-page by construction
    for r in s:
        if r["mode"] == 0:
            assert r["cer"] == 0.0 and r["char_accuracy"] == 1.0
        else:
            assert 0.0 < r["cer"] <= 1.0
            assert abs(r["char_accuracy"] - (1.0 - r["cer"])) < 1e-12


def test_delta_histogram_full_bins(spark, sf_dir):
    from docling_eval_spark.plans.table_eval import delta_histogram, teds_scores

    h = delta_histogram(teds_scores(spark, sf_dir, perturb=True)).collect()
    assert [r["delta"] for r in h] == list(range(-10, 11))
    by = {r["delta"]: r for r in h}
    total = sum(r["n_rows"] for r in h)
    # perturbation modes: rows delta -1 for modes 1,3; 0 for modes 0,2
    assert by[-1]["n_rows"] > 0 and by[0]["n_rows"] > 0
    assert all(by[d]["n_rows"] == 0 for d in range(-10, 11) if d not in (-1, 0))
    assert abs(by[-1]["frac_rows"] + by[0]["frac_rows"] - 1.0) < 1e-6
    assert total == by[-1]["n_rows"] + by[0]["n_rows"]


def test_delta_histogram_skips_out_of_range(spark):
    """Reference semantics: |delta| > 10 is skipped, not clamped, but the
    fraction denominator still counts the skipped evaluation."""
    from docling_eval_spark.plans.table_eval import delta_histogram

    scores = spark.createDataFrame(
        [(1, 5, 3, 30, 3), (2, 4, 3, 4, 3)],
        "doc_id bigint, gt_nrows int, gt_ncols int, pred_nrows int, pred_ncols int")
    h = {r["delta"]: r for r in delta_histogram(scores).collect()}
    assert h[0]["n_rows"] == 1            # doc 2 delta 0
    assert h[-10]["n_rows"] == 0          # doc 1 delta -25 skipped, not clamped
    assert h[0]["n_cols"] == 2
    assert h[0]["frac_rows"] == 0.5       # denominator includes skipped row
