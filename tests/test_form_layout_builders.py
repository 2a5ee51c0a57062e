"""DocLayNet/COCO-style and FUNSD-style GT builders
(reference doclaynet_v1_builder.py:180-360, funsd_builder.py:205-320)."""

import json


def test_doclaynet_spans_ltwh_and_default_label(spark):
    from docling_eval_spark.sources.gt_builder import doclaynet_spans

    anno = json.dumps({
        "page_width": 100.0, "page_height": 200.0,
        "labels": ["title", "Weird-Label", "table"],
        "bboxes": [[10, 20, 30, 40], [0, 0, 5, 5], [1, 2, 3, 4]],
        "contents": ["A Title", "mystery", "cells"],
    })
    df = spark.createDataFrame([(1, anno)], "doc_id bigint, anno string")
    rows = {r["idx"]: r for r in doclaynet_spans(df).collect()}
    assert rows[0]["label"] == "title"
    assert (rows[0]["l"], rows[0]["t"], rows[0]["r"], rows[0]["b"]) == \
        (10.0, 20.0, 40.0, 60.0)  # ltwh -> ltrb
    assert rows[1]["label"] == "text"  # unknown label defaults (ref :214)
    assert rows[2]["charspan_end"] == len("cells")


def test_funsd_kv_cells_real_shape(spark):
    """Fixture shaped like an actual FUNSD form entry: a question->answer
    pair, an unlinked header (dropped), an unlinked 'question' (kept,
    classifies as VALUE: no out-links)."""
    from docling_eval_spark.sources.gt_builder import funsd_kv_cells

    anno = json.dumps({"form": [
        {"id": 0, "text": "NAME:", "label": "question",
         "box": [10, 10, 60, 20], "linking": [[0, 1]],
         "words": [{"text": "NAME:", "box": [10, 10, 60, 20]}]},
        {"id": 1, "text": "John Smith", "label": "answer",
         "box": [70, 10, 140, 20], "linking": [[0, 1]],
         "words": [{"text": "John", "box": [70, 10, 100, 20]},
                   {"text": "Smith", "box": [105, 10, 140, 20]}]},
        {"id": 2, "text": "FORM 1040", "label": "header",
         "box": [0, 0, 50, 8], "linking": [],
         "words": [{"text": "FORM", "box": [0, 0, 25, 8]}]},
        {"id": 3, "text": "lonely question", "label": "question",
         "box": [10, 30, 90, 40], "linking": [],
         "words": []},
    ]})
    df = spark.createDataFrame([(9, anno)], "doc_id bigint, anno string")
    rows = {r["cell_id"]: r for r in funsd_kv_cells(df).collect()}
    assert set(rows) == {0, 1, 3}  # header dropped (ref :216-222)
    assert rows[0]["label"] == "KEY" and rows[1]["label"] == "VALUE"
    assert rows[3]["label"] == "VALUE"  # out-degree 0 leaf rule
    assert rows[1]["n_words"] == 2
    assert (rows[1]["l"], rows[1]["r"]) == (70.0, 140.0)


def test_funsd_dangling_link_dropped(spark):
    """Links referencing an omitted cell are discarded (ref :293-298)."""
    from docling_eval_spark.sources.gt_builder import funsd_kv_cells

    anno = json.dumps({"form": [
        {"id": 0, "text": "q", "label": "question",
         "box": [0, 0, 1, 1], "linking": [[0, 7]], "words": []},
    ]})
    df = spark.createDataFrame([(1, anno)], "doc_id bigint, anno string")
    rows = funsd_kv_cells(df).collect()
    # only cell 0 exists; its dangling link vanished -> out-degree 0 -> VALUE
    assert [(r["cell_id"], r["label"]) for r in rows] == [(0, "VALUE")]


def test_omnidocbench_real_shape(spark):
    """Real OmniDocBench annotation shape: layout_dets envelope, text
    field override, header/page_number branches, unknowns DROPPED."""
    from docling_eval_spark.sources.gt_builder import omnidocbench_spans

    anno = json.dumps({
        "page_info": {"width": 612.0, "height": 792.0},
        "layout_dets": [
            {"category_type": "equation_isolated",
             "poly": [50, 10, 80, 12, 45, 30, 60, 8], "html": ""},
            {"category_type": "something_new", "poly": [0, 0, 2, 2]},
            {"category_type": "text_block", "poly": [1, 2, 9, 8],
             "text": "real body text"},
            {"category_type": "header", "poly": [0, 0, 100, 10]},
            {"category_type": "page_number", "poly": [0, 780, 20, 790]},
        ],
    })
    df = spark.createDataFrame([(3, anno)], "doc_id bigint, anno string")
    rows = {r["idx"]: r for r in omnidocbench_spans(df).collect()}
    assert sorted(rows) == [0, 2, 3, 4]  # unknown at idx 1 dropped, gap kept
    e = rows[0]
    assert e["label"] == "formula"
    # bbox = min/max over ALL poly points, not the first pair
    assert (e["l"], e["t"], e["r"], e["b"]) == (45.0, 8.0, 80.0, 30.0)
    assert e["text"] == "&lt;omitted text for equation_isolated&gt;"
    assert e["charspan_end"] == len(e["text"])
    assert rows[2]["text"] == "real body text"  # :184-185 override
    assert rows[2]["charspan_end"] == len("real body text")
    assert rows[3]["label"] == "page_header"
    assert rows[4]["label"] == "page_footer"


def test_pixparse_ragged_lists_truncate(spark):
    """Reference zip() truncates to the shortest list — no phantom
    null-bbox cells from arrays_zip padding."""
    from docling_eval_spark.sources.gt_builder import pixparse_segmented_pages

    anno = json.dumps({"pages": [
        {"text": ["a", "b", "c"], "bbox": [[0, 0, 1, 1], [2, 0, 1, 1]],
         "score": [0.9, 0.8]},
    ]})
    df = spark.createDataFrame([(1, anno)], "doc_id bigint, anno string")
    cells = pixparse_segmented_pages(df).collect()[0]["gt_pages"][1]
    assert [c["text"] for c in cells] == ["a", "b"]
    assert all(c["l"] is not None for c in cells)


def test_docvqa_missing_answers_keep_index_consistent(spark):
    from docling_eval_spark.sources.gt_builder import docvqa_kv_cells

    anno = json.dumps({"qa": [
        {"question": "no answers recorded"},
        {"question": "second", "answers": ["x"]},
    ]})
    df = spark.createDataFrame([(1, anno)], "doc_id bigint, anno string")
    rows = {r["cell_id"]: r for r in docvqa_kv_cells(df).collect()}
    assert rows[0]["label"] == "KEY" and rows[0]["n_out"] == 0
    assert rows[1]["label"] == "KEY" and rows[1]["text"] == "second"
    assert rows[2]["label"] == "VALUE" and rows[2]["text"] == "x"


def test_pixparse_segmented_pages_model(spark):
    from docling_eval_spark.sources.gt_builder import pixparse_segmented_pages

    anno = json.dumps({"pages": [
        {"text": ["hello", "world"],
         "bbox": [[10, 20, 30, 5], [10, 28, 25, 5]],
         "score": [0.99, 0.5]},
        {"text": ["p2"], "bbox": [[0, 0, 4, 4]], "score": [1.0]},
    ]})
    df = spark.createDataFrame([(5, anno)], "doc_id bigint, anno string")
    row = pixparse_segmented_pages(df).collect()[0]
    pages = row["gt_pages"]
    assert sorted(pages) == [1, 2]  # pages number from 1 (ref :82)
    c0 = pages[1][0]
    assert (c0["cell_id"], c0["text"], c0["score"]) == (0, "hello", 0.99)
    assert (c0["l"], c0["t"], c0["r"], c0["b"]) == (10.0, 20.0, 40.0, 25.0)
    assert pages[2][0]["text"] == "p2"


class TestDocLayNetV2KV:
    def test_chain_and_dangling_links(self, spark):
        """Chain a0->a1->a2 exercises the middle-node degree rule
        (all out-neighbors leaves -> KEY); a dangling link and an
        unlinked segment must drop out (reference create_kv_pairs
        guard `links[i] in seg_with_id`)."""
        from docling_eval_spark.sources.gt_builder import doclaynet_v2_kv

        rows = [(1,
                 ["a0", "a1", "a2", "a3"],
                 [[0.0, 0.0, 1.0, 1.0], [2.0, 0.0, 3.0, 1.0],
                  [4.0, 0.0, 5.0, 1.0], [6.0, 0.0, 7.0, 1.0]],
                 ["k", "mid", "v", "lonely"],
                 [None, "a0", "a1", "nope"])]
        df = spark.createDataFrame(
            rows, "doc_id bigint, annotation_ids array<string>, "
                  "boxes array<array<double>>, segments array<string>, "
                  "links array<string>")
        out = {r["cell_id"]: r for r in doclaynet_v2_kv(df).collect()}
        assert set(out) == {0, 1, 2}  # a3's dangling link resolves nothing
        assert out[0]["label"] == "KEY"
        assert out[1]["label"] == "KEY"  # middle, only out-neighbor is leaf
        assert out[2]["label"] == "VALUE"
        assert out[1]["text"] == "mid"
        # enclosing bbox spans the linked cells only (not a3)
        assert (out[0]["kv_l"], out[0]["kv_r"]) == (0.0, 5.0)
