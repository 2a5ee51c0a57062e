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


# -- SVG layout overlay (reference visualisation/visualisations.py) -----------
#
# The reference draws GT/pred cluster boxes onto the page images (PIL).
# No image codecs are needed for the rebuild's equivalent: boxes are
# rendered as an SVG overlay in page coordinates — same side-by-side
# GT-vs-prediction cluster view, zero raster dependencies. Page images,
# when present as binary columns, could be inlined as a data URI behind
# the boxes; here the canvas is the page rectangle itself.

_LABEL_COLORS = {
    "text": "#1f77b4", "title": "#d62728", "section_header": "#ff7f0e",
    "table": "#2ca02c", "picture": "#9467bd", "caption": "#8c564b",
    "list_item": "#e377c2", "footnote": "#7f7f7f", "formula": "#bcbd22",
    "page_header": "#17becf", "page_footer": "#17becf",
}


def svg_overlay(page_w: float, page_h: float, boxes,
                stroke_default: str = "#333") -> str:
    """Boxes -> one SVG element in page coordinates. Each box is a dict
    (or Row) with label, l, t, r, b and an optional score; the label is
    drawn at the box's top-left like the reference's cluster legend."""
    parts = [
        f'<svg viewBox="0 0 {page_w:g} {page_h:g}" '
        f'xmlns="http://www.w3.org/2000/svg" '
        f'style="background:#fff;border:1px solid #ccc;max-width:100%">'
    ]
    for b in boxes:
        label = b["label"] or ""
        color = _LABEL_COLORS.get(label, stroke_default)
        x, y = float(b["l"]), float(b["t"])
        w = max(float(b["r"]) - x, 0.0)
        h = max(float(b["b"]) - y, 0.0)
        title = label
        try:
            if b["score"] is not None:
                title = f"{label} {float(b['score']):.2f}"
        except (KeyError, ValueError, TypeError):
            pass
        parts.append(
            f'<rect x="{x:g}" y="{y:g}" width="{w:g}" height="{h:g}" '
            f'fill="{color}" fill-opacity="0.12" stroke="{color}" '
            f'stroke-width="1.5"/>'
            f'<text x="{x:g}" y="{max(y - 2.0, 8.0):g}" font-size="9" '
            f'fill="{color}">{html.escape(title)}</text>')
    parts.append("</svg>")
    return "".join(parts)


_LAYOUT_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>{doc_id}</title><style>
body {{ font-family: sans-serif; margin: 1rem; }}
.cols {{ display: flex; gap: 1rem; }}
.col {{ flex: 1; }}
</style></head><body>
<h2>{doc_id} — layout overlay</h2>
<div class="cols">
<div class="col"><h3>ground truth</h3>{gt_svg}</div>
<div class="col"><h3>prediction</h3>{pred_svg}</div>
</div>
</body></html>"""


def _hex_rgb(color: str) -> tuple[int, int, int]:
    c = color.lstrip("#")
    if len(c) == 3:
        c = "".join(ch * 2 for ch in c)
    return tuple(int(c[i:i + 2], 16) for i in (0, 2, 4))


def draw_boxes(arr, boxes, default: str = "#333", thickness: int = 2):
    """Composite box OUTLINES onto an (h, w, 3) uint8 page image in
    place — the raster twin of svg_overlay, per-label colors included.
    Boxes are clipped to the page; returns the array."""
    import numpy as np

    h, w = arr.shape[:2]
    for b in boxes:
        color = np.array(
            _hex_rgb(_LABEL_COLORS.get(b["label"] or "", default)),
            dtype=np.uint8)
        l = max(int(round(float(b["l"]))), 0)
        t = max(int(round(float(b["t"]))), 0)
        r = min(int(round(float(b["r"]))), w - 1)
        bt = min(int(round(float(b["b"]))), h - 1)
        if r < l or bt < t:
            continue
        th = thickness
        arr[t:min(t + th, bt + 1), l:r + 1] = color          # top edge
        arr[max(bt - th + 1, t):bt + 1, l:r + 1] = color     # bottom edge
        arr[t:bt + 1, l:min(l + th, r + 1)] = color          # left edge
        arr[t:bt + 1, max(r - th + 1, l):r + 1] = color      # right edge
    return arr


def raster_overlay(page_png: bytes, boxes, thickness: int = 2) -> bytes:
    """Decode a page PNG, composite box outlines, re-encode — PIXEL
    parity with the reference's draw-on-the-page-image sink
    (visualisation/visualisations.py:1-226), built entirely on the
    in-repo from-scratch codec (functions/png_codec.py): no Pillow.
    Gray pages are promoted to RGB; alpha channels are preserved."""
    import numpy as np

    from ..functions.png_codec import decode_png, encode_png

    arr = decode_png(page_png)
    if arr.ndim == 2 or arr.shape[2] == 1:
        arr = np.repeat(arr.reshape(arr.shape[0], arr.shape[1], 1), 3, axis=2)
    alpha = None
    if arr.shape[2] == 2:          # gray+alpha
        alpha = arr[:, :, 1:]
        arr = np.repeat(arr[:, :, :1], 3, axis=2)
    elif arr.shape[2] == 4:        # rgba
        alpha = arr[:, :, 3:]
        arr = arr[:, :, :3]
    arr = np.ascontiguousarray(arr)
    draw_boxes(arr, boxes, thickness=thickness)
    if alpha is not None:
        arr = np.concatenate([arr, alpha], axis=2)
    return encode_png(arr)


def visualize_layout_raster(pairs: DataFrame, out_dir: str, n: int = 8,
                            page_image_col: str | None = None,
                            page_w_col: str = "page_width",
                            page_h_col: str = "page_height",
                            gt_col: str = "gt_boxes",
                            pred_col: str = "pred_boxes",
                            thickness: int = 2) -> list[str]:
    """Raster twin of visualize_layout_sample: write up to n PNG pages
    with GT boxes drawn on the left half and predictions on the right
    (side-by-side, like the reference's HTML). Page pixels come from
    `page_image_col` (binary PNG) when given, else a synthesized white
    page of (page_h, page_w). Sampled + collected — never run over the
    full corpus."""
    import numpy as np

    from ..functions.png_codec import decode_png, encode_png

    os.makedirs(out_dir, exist_ok=True)
    cols = ["doc_id", page_w_col, page_h_col, gt_col, pred_col]
    if page_image_col:
        cols.append(page_image_col)
    rows = pairs.select(*cols).limit(n).collect()
    paths = []
    for r in rows:
        if page_image_col:
            base = decode_png(bytes(r[page_image_col]))
            if base.ndim == 2 or base.shape[2] == 1:
                base = np.repeat(
                    base.reshape(base.shape[0], base.shape[1], 1), 3, axis=2)
            base = np.ascontiguousarray(base[:, :, :3])
        else:
            base = np.full((int(r[page_h_col]), int(r[page_w_col]), 3),
                           255, dtype=np.uint8)
        gt = draw_boxes(base.copy(), r[gt_col] or [], thickness=thickness)
        pred = draw_boxes(base.copy(), r[pred_col] or [],
                          thickness=thickness)
        sep = np.zeros((base.shape[0], 2, 3), dtype=np.uint8)
        page = np.concatenate([gt, sep, pred], axis=1)
        p = os.path.join(out_dir, f"layout_{r['doc_id']}.png")
        with open(p, "wb") as f:
            f.write(encode_png(page))
        paths.append(p)
    return paths


def visualize_layout_sample(pairs: DataFrame, out_dir: str, n: int = 8,
                            page_w_col: str = "page_width",
                            page_h_col: str = "page_height",
                            gt_col: str = "gt_boxes",
                            pred_col: str = "pred_boxes") -> list[str]:
    """Write up to n side-by-side GT/pred SVG overlay pages; returns the
    file paths. Expects per-doc box arrays of struct<label,l,t,r,b[,
    score]>. Sampled + collected like visualize_sample — never run over
    the full corpus."""
    os.makedirs(out_dir, exist_ok=True)
    rows = pairs.select("doc_id", page_w_col, page_h_col,
                        gt_col, pred_col).limit(n).collect()
    paths = []
    for r in rows:
        page = _LAYOUT_PAGE.format(
            doc_id=r["doc_id"],
            gt_svg=svg_overlay(r[page_w_col], r[page_h_col],
                               r[gt_col] or []),
            pred_svg=svg_overlay(r[page_w_col], r[page_h_col],
                                 r[pred_col] or []))
        p = os.path.join(out_dir, f"layout_{r['doc_id']}.html")
        with open(p, "w") as f:
            f.write(page)
        paths.append(p)
    return paths
