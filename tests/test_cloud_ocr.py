"""Cloud-OCR response parser tests (Textract / Azure / Google), mirroring
the reference providers' conversion semantics (aws_prediction_provider.py
:87-310, azure_prediction_provider.py:93-313, google_prediction_provider
.py:89-255)."""

from __future__ import annotations

import json


def _textract_resp():
    return {"Blocks": [
        {"Id": "p1", "BlockType": "PAGE", "Page": 1},
        {"Id": "t1", "BlockType": "LAYOUT_TITLE", "Text": "The Title",
         "Geometry": {"BoundingBox": {"Left": 0.25, "Top": 0.125,
                                      "Width": 0.5, "Height": 0.25}}},
        {"Id": "w1", "BlockType": "WORD", "Page": 1, "Text": "hello",
         "Geometry": {"BoundingBox": {"Left": 0.5, "Top": 0.5,
                                      "Width": 0.0625, "Height": 0.0625}}},
        {"Id": "w_other_page", "BlockType": "WORD", "Page": 2, "Text": "skip",
         "Geometry": {"BoundingBox": {"Left": 0, "Top": 0,
                                      "Width": 0.1, "Height": 0.1}}},
        {"Id": "tb", "BlockType": "TABLE", "Page": 1,
         "Geometry": {"BoundingBox": {"Left": 0.25, "Top": 0.5,
                                      "Width": 0.5, "Height": 0.375}},
         "Relationships": [{"Type": "CHILD", "Ids": ["c11", "c12"]}]},
        {"Id": "c11", "BlockType": "CELL", "RowIndex": 1, "ColumnIndex": 1,
         "Geometry": {"BoundingBox": {"Left": 0.25, "Top": 0.5,
                                      "Width": 0.25, "Height": 0.125}},
         "Relationships": [{"Type": "CHILD", "Ids": ["cw1", "cw2"]}]},
        {"Id": "c12", "BlockType": "CELL", "RowIndex": 1, "ColumnIndex": 2,
         "RowSpan": 1, "ColumnSpan": 2,
         "Geometry": {"BoundingBox": {"Left": 0.5, "Top": 0.5,
                                      "Width": 0.25, "Height": 0.125}}},
        {"Id": "cw1", "BlockType": "WORD", "Page": 1, "Text": "cell",
         "Geometry": {"BoundingBox": {"Left": 0.25, "Top": 0.5,
                                      "Width": 0.125, "Height": 0.125}}},
        {"Id": "cw2", "BlockType": "WORD", "Page": 1, "Text": "text",
         "Geometry": {"BoundingBox": {"Left": 0.375, "Top": 0.5,
                                      "Width": 0.125, "Height": 0.125}}},
    ]}


class TestTextract:
    def test_layout_scaling_and_table_raw(self):
        from docling_eval_spark.sources.cloud_ocr import parse_textract

        rows = parse_textract(_textract_resp(), page_w=100.0, page_h=200.0)
        by_kind = {}
        for r in rows:
            by_kind.setdefault(r[1], []).append(r)
        # page row carries page dims
        assert by_kind["page"][0][5:9] == (0.0, 0.0, 100.0, 200.0)
        # layout span scaled by page dims; title label mapped
        span = by_kind["span"][0]
        assert span[3] == "title" and span[4] == "The Title"
        assert span[5:9] == (25.0, 25.0, 75.0, 75.0)
        # page-2 word skipped (reference WORD branch page guard)
        words = [r[4] for r in by_kind["word"]]
        assert "skip" not in words and "hello" in words
        # table prov bbox stays RAW normalized (aws process_table :117)
        table = by_kind["table"][0]
        assert table[5:9] == (0.25, 0.5, 0.75, 0.875)
        assert table[15:17] == (1, 2)  # num_rows, num_cols from max idx
        # cell text joins CHILD WORDs; header heuristics first-row/col
        cells = by_kind["table_cell"]
        assert cells[0][4] == "cell text"
        assert cells[0][13:15] == (True, True)   # r0c0: col+row header
        assert cells[1][13:15] == (True, False)  # r0c1
        assert cells[1][11:13] == (1, 2)         # row_span, col_span

    def test_item_order_is_block_order(self):
        from docling_eval_spark.sources.cloud_ocr import parse_textract

        rows = parse_textract(_textract_resp(), 10, 10)
        assert [r[0] for r in rows] == list(range(len(rows)))
        kinds = [r[1] for r in rows]
        # table emitted at its block position, cells right after,
        # cell words afterwards as plain words (they are WORD blocks)
        assert kinds == ["page", "span", "word", "table", "table_cell",
                         "table_cell", "word", "word"]


def _azure_resp(camel: bool) -> dict:
    pn = "pageNumber" if camel else "page_number"
    br = "boundingRegions" if camel else "bounding_regions"
    return {
        "pages": [{pn: 1, "width": 8.5, "height": 11.0, "words": [
            {"content": "w0", "polygon": [1, 2, 3, 2, 3, 4, 1, 4]},
            {"content": "w1", "polygon": [{"x": 5, "y": 6}, {"x": 7, "y": 6},
                                          {"x": 7, "y": 8}, {"x": 5, "y": 8}]},
        ]}],
        "tables": [{
            ("pageRange" if camel else "page_range"):
                {("firstPageNumber" if camel else "first_page_number"): 1},
            ("rowCount" if camel else "row_count"): 2,
            ("columnCount" if camel else "column_count"): 2,
            br: [{"polygon": [0, 0, 4, 0, 4, 4, 0, 4]}],
            "cells": [
                {("rowIndex" if camel else "row_index"): 0,
                 ("columnIndex" if camel else "column_index"): 1,
                 "content": " c01 ",
                 br: [{"polygon": [2, 0, 4, 0, 4, 2, 2, 2]}]},
            ],
        }],
        "paragraphs": [
            {"role": "sectionHeading", "content": "Heading",
             br: [{pn: 1, "polygon": [0, 0, 2, 0, 2, 1, 0, 1]}]},
            {"content": "Plain para",
             br: [{pn: 1, "polygon": [0, 1, 2, 1, 2, 2, 0, 2]}]},
        ],
        "figures": [{br: [{pn: 1, "polygon": [1, 1, 2, 1, 2, 2, 1, 2]}]}],
    }


class TestAzure:
    def test_both_key_styles_parse_identically(self):
        from docling_eval_spark.sources.cloud_ocr import parse_azure

        snake = parse_azure(_azure_resp(camel=False))
        camel = parse_azure(_azure_resp(camel=True))
        assert snake == camel

    def test_semantics(self):
        from docling_eval_spark.sources.cloud_ocr import parse_azure

        rows = parse_azure(_azure_resp(camel=False))
        kinds = [r[1] for r in rows]
        assert kinds == ["page", "word", "word", "table", "table_cell",
                         "span", "span", "span"]
        # flat polygon: l,t from p0, r,b from p2; dict polygon likewise
        assert rows[1][5:9] == (1.0, 2.0, 3.0, 4.0)
        assert rows[2][5:9] == (5.0, 6.0, 7.0, 8.0)
        cell = rows[4]
        assert cell[4] == "c01"  # content stripped
        assert cell[10] == 1 and cell[13:15] == (False, False)  # no headers
        # role mapping + default
        assert rows[5][3] == "section_header" and rows[6][3] == "text"
        assert rows[7][3] == "picture"  # figure


def _google_resp() -> dict:
    text = "Hello paragraph body"
    return {"text": text, "pages": [{
        "pageNumber": 1, "dimension": {"width": 612.0, "height": 792.0},
        "paragraphs": [{"layout": {
            "textAnchor": {"textSegments": [
                {"startIndex": "0", "endIndex": "5"},
                {"startIndex": "5", "endIndex": "15"}]},
            "boundingPoly": {"vertices": [
                {"x": 10, "y": 20}, {"x": 100, "y": 20},
                {"x": 100, "y": 40}, {"x": 10, "y": 40}]}}}],
        "tables": [{
            "layout": {"boundingPoly": {"vertices": [
                {"x": 0, "y": 50}, {"x": 200, "y": 50},
                {"x": 200, "y": 150}, {"x": 0, "y": 150}]}},
            "headerRows": [{"cells": [
                {"layout": {"textAnchor": {"textSegments": [
                    {"startIndex": 0, "endIndex": 5}]}},
                 "rowSpan": 1, "colSpan": 2},
                {"layout": {}},
            ]}],
            "bodyRows": [{"cells": [
                {"layout": {"textAnchor": {"textSegments": [
                    {"startIndex": 6, "endIndex": 15}]}}},
            ]}],
        }],
    }]}


class TestGoogle:
    def test_semantics(self):
        from docling_eval_spark.sources.cloud_ocr import parse_google

        rows = parse_google(_google_resp())
        kinds = [r[1] for r in rows]
        assert kinds == ["page", "span", "table", "table_cell", "table_cell",
                         "table_cell"]
        para = rows[1]
        assert para[4] == "Hello paragraph"  # string-index segments joined
        assert para[5:9] == (10.0, 20.0, 100.0, 40.0)
        table = rows[2]
        assert table[15:17] == (2, 2)  # header+body rows, max cells per row
        hdr0, hdr1, body0 = rows[3], rows[4], rows[5]
        assert hdr0[4] == "Hello" and hdr0[12] == 2  # col_span
        assert hdr0[13] is True and hdr0[14] is False  # column_header
        assert body0[9] == 1 and body0[10] == 0  # row 1 col 0
        assert body0[13] is False and body0[14] is True  # row_header
        assert body0[4] == "paragraph"


class TestSparkStage:
    def test_mixed_provider_sniffing(self, spark):
        from docling_eval_spark.sources.cloud_ocr import parse_responses

        rows = [
            (1, json.dumps(_textract_resp()), 100.0, 200.0),
            (2, json.dumps(_azure_resp(camel=False)), 0.0, 0.0),
            (3, json.dumps(_google_resp()), 0.0, 0.0),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, response_json string, pw double, ph double")
        out = parse_responses(df, page_w_col="pw", page_h_col="ph") \
            .orderBy("doc_id", "item_idx").collect()
        per_doc = {}
        for r in out:
            per_doc.setdefault(r["doc_id"], []).append(r)
        assert len(per_doc[1]) == 8 and len(per_doc[2]) == 8
        assert len(per_doc[3]) == 6
        # textract scaling applied via the page-dim columns
        title = [r for r in per_doc[1] if r["kind"] == "span"][0]
        assert (title["l"], title["r"]) == (25.0, 75.0)
