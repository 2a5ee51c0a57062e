"""Extraction unit tests: tokenizer, classifier, byte-identity round trip."""

import pytest

from docling_eval_spark.corpus.html_synth import (
    gt_table_html,
    has_table,
    host_for,
    synth_html,
    url_for,
)
from docling_eval_spark.extraction.boilerplate import classify_blocks, extract_main_text
from docling_eval_spark.extraction.html_tokenizer import parse_blocks
from docling_eval_spark.functions.teds import teds_score

BOILER_PAGE = """<html><head><title>t</title><script>junk()</script></head><body>
<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About</a></li></ul></nav>
<p>This is the main content paragraph with more than sixteen words in it so the
density rule accepts it directly without needing neighbours at all.</p>
<footer><p>© corp — <a href="/i">Imprint</a></p></footer>
</body></html>"""


class TestTokenizer:
    def test_blocks_and_features(self):
        blocks = parse_blocks(BOILER_PAGE)
        texts = [b.text for b in blocks]
        assert any("main content paragraph" in t for t in texts)
        nav_blocks = [b for b in blocks if b.boiler_ancestor]
        assert nav_blocks, "nav/footer blocks must carry boiler_ancestor"
        main = next(b for b in blocks if "main content" in b.text)
        assert not main.boiler_ancestor
        assert main.link_density == 0.0
        assert main.tag == "p"

    def test_script_and_style_dropped(self):
        blocks = parse_blocks("<body><script>x=1;</script><style>.a{}</style><p>keep this text here ok</p></body>")
        assert all("x=1" not in b.text and ".a{}" not in b.text for b in blocks)

    def test_anchor_chars(self):
        blocks = parse_blocks('<body><p>abc <a href="/x">link</a> def</p></body>')
        b = blocks[0]
        assert b.anchor_chars == 4
        assert b.text == "abc link def"

    def test_entities_decoded(self):
        blocks = parse_blocks("<body><p>a &amp; b &lt; c</p></body>")
        assert blocks[0].text == "a & b < c"

    def test_table_captured_not_in_text(self):
        html = "<body><p>before table words here now yes more words to pass rules ok fine great stuff here</p><table><tr><td>cell</td></tr></table></body>"
        r = extract_main_text(html)
        assert "cell" not in r["text"]
        assert len(r["tables"]) == 1
        assert "<td>cell</td>" in r["tables"][0]

    def test_inline_tags_transparent(self):
        blocks = parse_blocks("<body><p>one <b>two</b> three</p></body>")
        assert blocks[0].text == "one two three"


class TestClassifier:
    def test_boiler_page(self):
        r = extract_main_text(BOILER_PAGE)
        assert r["text"].startswith("This is the main content paragraph")
        assert "Imprint" not in r["text"]
        assert "Home" not in r["text"]
        assert r["n_boiler"] >= 2

    def test_link_density_rule(self):
        blocks = parse_blocks(
            '<body><div><a href="/x">all of this text is one big link and nothing else at all</a></div>'
            "<p>real content paragraph with definitely more than sixteen whole words "
            "written out in plain language for the classifier</p></body>"
        )
        labels = classify_blocks(blocks)
        assert labels == [False, True]

    def test_semantic_article_override_short_text(self):
        html = "<body><nav><a href='/'>x</a></nav><article><p>Tiny text.</p></article></body>"
        r = extract_main_text(html)
        assert r["text"] == "Tiny text."

    def test_heading_promotion(self):
        html = ("<body><h2>Short headline</h2>"
                "<p>body paragraph long enough to be content on its own having way "
                "more than the required sixteen words to trigger the direct rule</p></body>")
        r = extract_main_text(html)
        assert r["text"].startswith("Short headline\n\n")

    def test_spans_emitted(self):
        r = extract_main_text(BOILER_PAGE)
        assert r["n_blocks"] == len(r["spans"])
        assert any(s["is_content"] for s in r["spans"])
        assert all(0.0 <= s["link_density"] <= 1.0 for s in r["spans"])


class TestRoundTrip:
    """Byte-identity oracle gate (north rule) on deterministic synth pages."""

    @pytest.mark.parametrize("doc_id,text,lang", [
        (0, "the fast key order sort table scan merge part window small", "en"),
        (7, "short text", "de"),  # <= 40 words -> forced <article>
        (5, "word " * 80, "fr"),  # has_table(5) -> embedded table page
        (42, "Multi paragraph one with quite some words inside it truly.\n\n"
             "And a second paragraph also fairly long with many words here.", "en"),
        (99, "unicode Ümlauts & späße — ελληνικά 中文 works", "el"),
    ])
    def test_byte_identity(self, doc_id, text, lang):
        text = text.strip()
        html = synth_html(doc_id, text, lang).decode("utf-8")
        r = extract_main_text(html)
        assert r["text"] == text

    def test_table_roundtrip_teds(self):
        doc_id = 10
        assert has_table(doc_id)
        html = synth_html(doc_id, "word " * 50, "en").decode()
        r = extract_main_text(html)
        assert len(r["tables"]) == 1
        assert teds_score(gt_table_html(doc_id), r["tables"][0]) == pytest.approx(1.0)

    def test_determinism(self):
        a = synth_html(123, "some stable text here", "en")
        b = synth_html(123, "some stable text here", "en")
        assert a == b
        assert url_for(123) == url_for(123)

    def test_host_skew(self):
        hosts = [host_for(i) for i in range(2000)]
        # Zipf-ish: the most common host must dominate the median host count
        from collections import Counter
        top = Counter(hosts).most_common(1)[0][1]
        assert top > 50  # heavy head out of 2000 docs across 1000 hosts


class TestHostileHtml:
    """Crash-safety + determinism on malformed/adversarial HTML. Byte
    identity is only promised for generator pages; for arbitrary bytes the
    extractor must never raise and must be a pure function."""

    CASES = [
        b"",
        b"not html at all \xff\xfe garbage",
        b"<html><p>unclosed paragraph<div>and <b>unclosed bold",
        b"<!-- comment only -->",
        b"<script>var s = '<p>fake</p>';</script><p>real body text here now</p>",
        b"<style>p { color: red }</style><p>styled body text content here</p>",
        b"<p>" + b"deep " * 5000 + b"</p>",
        b"<div><div><div><div><div><div><div><div>nested</div></div></div>",
        b"<p>&amp; &lt; &gt; &#65; &unknown; &#x41;</p>",
        b"<table><tr><td>orphan table cell",
        b"<P CLASS='X'>UPPERCASE TAGS AND <A HREF=x>attr soup</A></P>",
        b"<![CDATA[ raw ]]><p>after cdata</p>",
        "<p>unicode ☃ \U0001f600 mixed</p>".encode(),
        b"<p>text</p>" * 3000,
    ]

    @pytest.mark.parametrize("raw", CASES)
    def test_never_raises_and_deterministic(self, raw):
        from docling_eval_spark.extraction.boilerplate import extract_main_text

        html = raw.decode("utf-8", errors="replace")
        r1 = extract_main_text(html)
        r2 = extract_main_text(html)
        assert r1["text"] == r2["text"]
        assert r1["n_blocks"] == r2["n_blocks"]
        assert isinstance(r1["text"], str)

    def test_script_string_not_leaked(self):
        from docling_eval_spark.extraction.boilerplate import extract_main_text

        r = extract_main_text(
            "<script>var s='<p>fake</p>';</script>"
            "<article><p>real body text content here</p></article>")
        assert "fake" not in r["text"]
        assert "real body text" in r["text"]


class TestFastTokenizerParity:
    """The fast regex tokenizer must produce byte-identical Block output
    to the stdlib-HTMLParser reference path on all well-formed input."""

    def _key(self, blocks):
        return [(b.text, b.tag, b.anchor_chars, b.is_heading,
                 b.boiler_ancestor, b.content_ancestor, b.kind, b.table_html)
                for b in blocks]

    def test_parity_over_generator_corpus(self):
        import duckdb

        from docling_eval_spark.corpus.html_synth import synth_html
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        rows = duckdb.connect().execute(
            "SELECT doc_id, text, lang FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet')").fetchall()
        for d, t, l in rows:
            h = synth_html(d, t, l).decode()
            assert self._key(parse_blocks(h, "fast")) == \
                self._key(parse_blocks(h, "stdlib")), d

    def test_parity_handcrafted(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        cases = [
            '<p>a &amp; b</p><script>var x="<p>no</p>";</script><p>c</p>',
            '<div><a href="x>y">link text</a> tail</div>',
            "<P CLASS='u'>UPPER</P><ul><li>one<li>two</ul>",
            '<table id="t"><tr><td colspan="2">c &lt;3</td></tr></table>',
            '<!-- c --><!DOCTYPE html><?pi ?><p>after</p>',
            '<article><p>body &#65;&#x42;</p></article>',
            '<p>br<br/>line<br>next</p>',
            '<style>p:before{content:"<q>"}</style><p>visible words</p>',
        ]
        for h in cases:
            assert self._key(parse_blocks(h, "fast")) == \
                self._key(parse_blocks(h, "stdlib")), h

    def test_fast_hostile_no_crash(self):
        from docling_eval_spark.extraction.boilerplate import extract_main_text

        for raw in TestHostileHtml.CASES:
            html = raw.decode("utf-8", errors="replace")
            r = extract_main_text(html)
            assert r == extract_main_text(html)


class TestReviewRegressions:
    """Regression pins for the round-1 code-review findings."""

    def test_self_closing_tags_fast_engine(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        # <table/> must not swallow the document; <nav/> must not poison
        # boiler_ancestor; parity with stdlib on every variant
        cases = [
            "<body><table/><p>hello world text</p></body>",
            "<nav/><article><p>real content body text here</p></article>",
            "<p>a<br/>b</p>",
            '<p><img src="x"/>after image</p>',
            "<td />",
            "<a href=x/>unquoted-slash stays in value</a>",
        ]
        for h in cases:
            fast = parse_blocks(h, "fast")
            std = parse_blocks(h, "stdlib")
            assert [(b.text, b.tag, b.boiler_ancestor, b.kind) for b in fast] \
                == [(b.text, b.tag, b.boiler_ancestor, b.kind) for b in std], h
        blocks = parse_blocks(cases[0], "fast")
        assert any("hello world" in b.text for b in blocks)

    def test_teds_malformed_span_attrs(self):
        from docling_eval_spark.functions.teds import teds_score

        gt = '<table><tr><td>a</td></tr></table>'
        bad = '<table><tr><td colspan="zzz" rowspan="">a</td></tr></table>'
        assert teds_score(gt, bad) == 1.0  # degrades to span=1, no crash

    def test_table_attr_escaping_roundtrip(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        h = '<table><tr><td title="a&quot;b&amp;c">x</td></tr></table>'
        t = [b for b in parse_blocks(h) if b.kind == "table"][0]
        assert 'title="a&quot;b&amp;c"' in t.table_html
        # captured html must reparse to the same cell
        again = [b for b in parse_blocks(t.table_html) if b.kind == "table"][0]
        assert again.table_html == t.table_html

    def test_extract_pages_missing_column_fails_fast(self, spark, sf_dir):
        import pytest
        from docling_eval_spark.corpus.generator import pages_from_documents
        from docling_eval_spark.extraction.extract import extract_pages

        pages = pages_from_documents(spark, sf_dir).limit(5)
        with pytest.raises(ValueError, match="missing columns"):
            extract_pages(pages.drop("html"))
        # doc_id optional: synthesized as -1
        out = extract_pages(pages.drop("doc_id")).select("doc_id").collect()
        assert all(r["doc_id"] == -1 for r in out)

    def test_token_count_blank_is_zero(self, spark):
        from pyspark.sql import functions as F
        from docling_eval_spark.operators.text_analysis import token_count

        df = spark.createDataFrame(
            [("",), ("   ",), ("one two",)], "text string")
        got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
        assert got == [0, 0, 2]

    def test_chain_graph_single_cell(self, spark):
        from pyspark.sql import functions as F
        from docling_eval_spark.functions.kv_graph import chain_graph, classify_kv_cells

        df = spark.range(1, 3).select(F.col("id").cast("int").alias("n"))
        cells, links = chain_graph(F.col("n"))
        out = {r["n"]: [c["label"] for c in r["lab"]]
               for r in df.select("n", classify_kv_cells(cells, links)
                                  .alias("lab")).collect()}
        assert out[1] == ["VALUE"]          # no links: leaf
        assert out[2] == ["KEY", "VALUE"]


class TestUnicodeDeterminism:
    """North-rule hard part: byte-identical extraction must not normalize,
    transcode, or otherwise perturb unicode (SURVEY.md §7 hard part 2).
    NFC and NFD spellings of the same text are DIFFERENT byte sequences
    and must both round-trip untouched."""

    CASES = [
        "café precomposed",          # NFC e-acute
        "café decomposed",          # NFD e + combining acute
        "中文段落 with CJK",
        "Ελληνικά greek",
        "emoji \U0001f600\U0001f9e0 mixed",
        "rtl مرحبا text",
        "zero​width and nbsp joined",
    ]

    @pytest.mark.parametrize("text", CASES)
    def test_exact_bytes_both_engines(self, text):
        from docling_eval_spark.extraction.boilerplate import extract_main_text
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        html = f"<article><p>{text}</p></article>"
        r = extract_main_text(html)
        assert r["text"] == text
        assert r["text"].encode("utf-8") == text.encode("utf-8")
        fast = [b.text for b in parse_blocks(html, "fast")]
        std = [b.text for b in parse_blocks(html, "stdlib")]
        assert fast == std == [text]

    def test_nfc_nfd_distinct(self):
        import unicodedata

        from docling_eval_spark.extraction.boilerplate import extract_main_text

        nfc = unicodedata.normalize("NFC", "café")
        nfd = unicodedata.normalize("NFD", "café")
        assert nfc != nfd
        a = extract_main_text(f"<article><p>{nfc}</p></article>")["text"]
        b = extract_main_text(f"<article><p>{nfd}</p></article>")["text"]
        assert a == nfc and b == nfd and a != b


class TestReviewRegressions3:
    """Pins for the third (extraction/corpus-focused) review round."""

    @pytest.mark.parametrize("text", [
        "a\n\n\n\nb",            # consecutive blank lines -> empty paragraph
        "p1\n\n \n\np2",         # whitespace-only paragraph
        "\n\nleading blank",
        "trailing blank\n\n",
    ])
    def test_blank_paragraph_byte_identity(self, text):
        from docling_eval_spark.corpus.html_synth import synth_html
        from docling_eval_spark.extraction.boilerplate import extract_main_text

        for doc_id in (1, 2, 7):
            html = synth_html(doc_id, text, "en").decode()
            assert extract_main_text(html)["text"] == text, (doc_id, text)

    def test_pdf_blank_paragraph_byte_identity(self):
        from docling_eval_spark.extraction.pdf_spans import (
            build_pdf_blob,
            parse_pdf_blob,
            spans_to_text,
        )

        for text in ("a\n\n\n\nb", "p1\n\n \n\np2"):
            for d in (0, 1):
                assert spans_to_text(parse_pdf_blob(build_pdf_blob(d, text))) == text

    def test_pdf_large_document_wraps_columns(self):
        from docling_eval_spark.extraction.pdf_spans import (
            build_pdf_blob,
            parse_pdf_blob,
            spans_to_text,
        )

        big = "\n\n".join("para with quite a few words here number %d ok fine" % i
                          for i in range(4000))
        blob = build_pdf_blob(0, big)  # > 5415 lines: must wrap, not crash
        assert spans_to_text(parse_pdf_blob(blob)) == big

    def test_table_in_skip_region_not_captured(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        for wrap in ("noscript", "svg", "head"):
            h = f"<{wrap}><table><tr><td>hidden</td></tr></table></{wrap}><p>visible text</p>"
            blocks = parse_blocks(h)
            assert all(b.kind != "table" for b in blocks), wrap
            assert any("visible" in b.text for b in blocks)

    def test_script_inside_table_dropped(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        h = "<table><tr><td>x</td></tr><script>var a=1&&2;</script></table>"
        t = [b for b in parse_blocks(h) if b.kind == "table"][0]
        assert "script" not in t.table_html and "a=1" not in t.table_html

    def test_nested_block_restores_enclosing_tag(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        blocks = parse_blocks("<li>item<p>inner</p>tail</li>")
        assert [(b.tag, b.text) for b in blocks] == [
            ("li", "item"), ("p", "inner"), ("li", "tail")]
        heads = parse_blocks("<h2>head start<div>x</div>head end</h2>")
        assert heads[-1].is_heading and heads[-1].tag == "h2"

    def test_td_selfclose_and_bool_attrs(self):
        from docling_eval_spark.extraction.html_tokenizer import parse_blocks

        t = [b for b in parse_blocks("<table><tr><td/><td>x</td></tr></table>")
             if b.kind == "table"][0]
        assert "<td></td><td>x</td>" in t.table_html
        t2 = [b for b in parse_blocks('<table><tr><td nowrap>x</td></tr></table>')
              if b.kind == "table"][0]
        assert "<td nowrap>" in t2.table_html

    def test_null_html_degrades(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from docling_eval_spark.corpus.generator import pages_from_documents
        from docling_eval_spark.extraction.extract import extract_pages

        pages = pages_from_documents(spark, sf_dir).limit(4) \
            .withColumn("html", F.when(F.col("doc_id") % 2 == 0, F.col("html")))
        out = extract_pages(pages).collect()
        assert len(out) == 4  # null rows degrade to empty, no task death
        assert any(r["extracted_text"] == "" for r in out)

    def test_replicate_exclude_guard(self, spark, sf_dir):
        from docling_eval_spark.corpus.generator import pages_from_documents

        ex = spark.range(3).selectExpr("id as doc_id")
        with pytest.raises(ValueError, match="replicate"):
            pages_from_documents(spark, sf_dir, replicate=4, exclude=ex)
