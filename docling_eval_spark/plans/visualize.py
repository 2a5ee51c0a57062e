"""HTML visualization sink (S11): side-by-side GT vs extracted text pages.

Rebuild of the reference's visualization export (docling_eval/
prediction_providers/base_prediction_provider.py:138-171 +
visualisation/visualisations.py: side-by-side GT/pred page HTML). Off the
hot path by design: the caller samples a FEW rows (limit), collects them,
and the writer renders static HTML on the driver — never run over the full
corpus.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame

_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>{doc_id}</title><style>
body {{ font-family: sans-serif; margin: 1rem; }}
.cols {{ display: flex; gap: 1rem; }}
.col {{ flex: 1; border: 1px solid #999; padding: .7rem; white-space: pre-wrap; }}
.ok {{ background: #e8f5e9; }} .bad {{ background: #ffebee; }}
table {{ border-collapse: collapse; margin-top: .6rem; }}
td, th {{ border: 1px solid #bbb; padding: 2px 6px; font-size: .8rem; }}
</style></head><body>
<h2>{doc_id} — {url}</h2>
<p class="{cls}">byte_identical: {byte_identical}</p>
<div class="cols">
<div class="col"><h3>ground truth</h3>{gt}</div>
<div class="col"><h3>extracted</h3>{pred}</div>
</div>
{span_table}
</body></html>"""


def visualize_sample(scored: DataFrame, out_dir: str, n: int = 8) -> list[str]:
    """Write up to n side-by-side pages; returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    cols = ["doc_id", "url", "text", "extracted_text", "byte_identical"]
    has_spans = "spans" in scored.columns
    if has_spans:
        cols.append("spans")
    rows = scored.select(*cols).limit(n).collect()
    paths = []
    for r in rows:
        span_table = ""
        if has_spans and r["spans"]:
            body = "".join(
                f"<tr><td>{s['block_idx']}</td><td>{html.escape(s['tag'])}</td>"
                f"<td>{s['is_content']}</td><td>{s['words']}</td>"
                f"<td>{s['link_density']:.3f}</td></tr>"
                for s in r["spans"])
            span_table = ("<table><tr><th>block</th><th>tag</th><th>content"
                          "</th><th>words</th><th>link density</th></tr>"
                          + body + "</table>")
        page = _PAGE.format(
            doc_id=r["doc_id"], url=html.escape(r["url"] or ""),
            cls="ok" if r["byte_identical"] else "bad",
            byte_identical=r["byte_identical"],
            gt=html.escape(r["text"] or ""),
            pred=html.escape(r["extracted_text"] or ""),
            span_table=span_table)
        p = os.path.join(out_dir, f"doc_{r['doc_id']}.html")
        with open(p, "w") as f:
            f.write(page)
        paths.append(p)
    return paths
