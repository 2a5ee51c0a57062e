"""Deterministic synthetic Common-Crawl-style page corpus.

Builds the input table of BASELINE.json input_hint shape
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
from the driver-provided `documents` table: `text` is copied verbatim as
the extraction oracle, `html` wraps it in realistic link-dense boilerplate
(nav/header/footer/sidebar/cookie banner/related links) plus a seeded
fraction of span-heavy <table>s whose ground truth is regenerable.

Everything is a pure function of (doc_id, text, lang) — no global RNG —
so the corpus is byte-stable across executors, partitionings, and runs
(a hard requirement of the byte-identical gate; SURVEY.md §7 "hard parts"
item 2).
"""
