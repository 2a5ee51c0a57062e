"""PDF-path tests: scrambled positioned spans -> geometric reading order ->
byte-identical text (extraction/pdf_spans.py)."""

from __future__ import annotations

import pytest

from docling_eval_spark.extraction.pdf_spans import (
    build_pdf_blob,
    extract_pdf_pages,
    parse_pdf_blob,
    spans_to_text,
)

CASES = [
    "",
    "one",
    "a short single paragraph of seven words total",
    "first paragraph with quite a few words in it to span lines\n\n"
    "second paragraph equally verbose so the chunker emits several spans\n\n"
    "third one",
    "unicode Ωμέγα façade naïve 中文 paragraph here\n\nanother Ωne",
    "double  space and trailing space \n\nweird\n\n\nnewlines",
]


class TestRoundTrip:
    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 17, 42])
    @pytest.mark.parametrize("text", CASES)
    def test_byte_identical(self, doc_id, text):
        blob = build_pdf_blob(doc_id, text)
        spans = parse_pdf_blob(blob)
        assert spans_to_text(spans) == text

    def test_scrambling_is_real(self):
        # stream order must differ from reading order for a multi-span doc
        blob = build_pdf_blob(3, CASES[3])
        spans = parse_pdf_blob(blob)
        ys = [s[1] for s in spans]
        assert ys != sorted(ys)

    def test_two_column_layout(self):
        blob = build_pdf_blob(1, CASES[3])  # odd doc_id -> 2 columns
        spans = parse_pdf_blob(blob)
        xs = {s[0] // 400 for s in spans}
        assert len(xs) == 2


class TestSparkPdfPath:
    def test_extract_pdf_pages(self, spark, sf_dir):
        from typing import Iterator

        import pandas as pd
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text").limit(50)

        def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "text": pdf["text"],
                    "pdf": [build_pdf_blob(int(i), t)
                            for i, t in zip(pdf["doc_id"], pdf["text"])],
                })

        pdfs = docs.mapInPandas(
            gen, schema="doc_id bigint, text string, pdf binary")
        out = extract_pdf_pages(pdfs).join(docs, "doc_id")
        bad = out.where(F.col("extracted_text") != F.col("text")).count()
        assert bad == 0
        assert out.count() == 50
