"""GT dataset builders (reference dpbench_builder.py:140-361,
otsl_table_dataset_builder.py:157-252)."""

import json

from pyspark.sql import functions as F


def test_reference_json_file_roundtrip(spark, tmp_path):
    """The real-benchmark path: a reference.json file keyed by filename
    (dpbench shape) -> span rows with mapped labels and scaled bboxes."""
    from docling_eval_spark.sources.gt_builder import (
        dpbench_spans,
        read_reference_json,
    )

    gt = {
        "doc_b.pdf": {
            "page_width": 100.0, "page_height": 200.0,
            "elements": [
                {"label": "Heading1",
                 "coordinates": [{"x": 0.1, "y": 0.1}, {"x": 0.5, "y": 0.1},
                                 {"x": 0.5, "y": 0.2}, {"x": 0.1, "y": 0.2}],
                 "content": {"text": "Title\nline", "html": ""}},
                {"label": "Table",
                 "coordinates": [{"x": 0.0, "y": 0.3}, {"x": 1.0, "y": 0.3},
                                 {"x": 1.0, "y": 0.9}, {"x": 0.0, "y": 0.9}],
                 "content": {"text": "",
                             "html": "<table><tr><td>a</td></tr>"
                                     "<tr><td>b</td></tr></table>"}},
            ],
        },
        "doc_a.pdf": {
            "page_width": 10.0, "page_height": 10.0,
            "elements": [
                {"label": "Index",
                 "coordinates": [{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 1.0}],
                 "content": {"text": "alpha 1\nbeta 2\ngamma 3", "html": ""}},
            ],
        },
    }
    p = tmp_path / "reference.json"
    p.write_text(json.dumps(gt))
    anno = read_reference_json(spark, str(p))
    # deterministic sorted-filename ordering (dpbench_builder.py:293)
    assert [r["doc_id"] for r in anno.select("doc_id").orderBy("doc_id").collect()] == \
        ["doc_a.pdf", "doc_b.pdf"]
    spans = dpbench_spans(anno, key="doc_id").orderBy("doc_id", "elem_idx").collect()
    by = {(r["doc_id"], r["elem_idx"]): r for r in spans}

    h = by[("doc_b.pdf", 0)]
    assert h["label"] == "section_header"
    assert (h["l"], h["t"], h["r"], h["b"]) == (10.0, 20.0, 50.0, 40.0)
    assert h["text"] == "Title line"            # newline -> space
    assert h["charspan_end"] == len("Title line")
    assert h["n_rows"] is None and h["n_cols"] is None

    t = by[("doc_b.pdf", 1)]
    assert t["label"] == "table"
    assert (t["n_rows"], t["n_cols"]) == (2, 1)  # real HTML grid parse

    ix = by[("doc_a.pdf", 0)]
    assert ix["label"] == "document_index"
    assert ix["text"] == "alpha 1\nbeta 2\ngamma 3"  # Index keeps RAW text
    assert (ix["n_rows"], ix["n_cols"]) == (3, 2)    # one row per line, 2 cols
    assert ix["charspan_end"] == len(ix["text"])


def test_fixture_annotation_label_cycle(spark, sf_dir):
    from docling_eval_spark.sources.gt_builder import (
        SRC_LABELS,
        dpbench_spans,
        fixture_annotations,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id").where(F.col("doc_id") < 24)
    spans = dpbench_spans(fixture_annotations(docs)).collect()
    assert len(SRC_LABELS) == 12
    for r in spans:
        # picture comes from BOTH Figure and Chart; every label mapped
        assert r["label"] in {"text", "page_header", "page_footer", "caption",
                              "footnote", "section_header", "list_item",
                              "formula", "picture", "table", "document_index"}
        assert r["r"] > r["l"] and r["b"] > r["t"]


def test_table_records_spans_and_roundtrip(spark):
    from docling_eval_spark.sources.gt_builder import table_records

    html = ('<table><tr><td colspan="2">ab</td><td>c</td></tr>'
            '<tr><td rowspan="2">d</td><td>e</td><td>f</td></tr>'
            '<tr><td>g</td><td>h</td></tr></table>')
    df = spark.createDataFrame([(1, html)], "doc_id bigint, table_html string")
    r = table_records(df).collect()[0]
    assert (r["n_rows"], r["n_cols"]) == (3, 3)
    assert r["is_complex"]
    assert r["roundtrip_exact"] and r["grid_full"]
    cells = [(c["row"], c["col"], c["rowspan"], c["colspan"], c["text"])
             for c in r["cells"]]
    assert (0, 0, 1, 2, "ab") in cells
    assert (1, 0, 2, 1, "d") in cells
    assert (2, 1, 1, 1, "g") in cells  # grid-fill skips the rowspan column


def test_grid_cells_to_html_inverse_on_corpus(spark):
    from docling_eval_spark.corpus.html_synth import gt_table_html
    from docling_eval_spark.functions.teds import (
        grid_cells_to_html,
        html_table_to_grid_cells,
    )

    for d in range(0, 300, 5):
        cells = html_table_to_grid_cells(gt_table_html(d))
        assert html_table_to_grid_cells(grid_cells_to_html(cells)) == cells
