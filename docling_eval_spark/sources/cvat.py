"""CVAT annotation round-trip: preannotation writer + annotation reader.

Rebuild of the reference's human-annotation loop surfaces
(docling_eval/dataset_builders/cvat_preannotation_builder.py — writes
CVAT task XML per page image with preannotation boxes — and
cvat_dataset_builder.py:263-340 — reads annotated XML back: `<box>`
elements carry label + xtl/ytl/xbr/ybr page coordinates, a `<polyline>`
named `reading_order` carries `x,y;x,y;...` points, and each point is
resolved to the box containing it to recover the annotated reading
order).

The XML dialect is the public CVAT "images" 1.1 export format. Parsing
is a pure function over one image's XML; across a corpus it runs inside
one Arrow-batched stage over (doc_id, xml) rows — per-doc XML is small
annotation metadata, so this stays embarrassingly parallel.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CVAT_SPAN_FIELDS = (
    "image string, idx int, label string, l double, t double, "
    "r double, b double"
)


def to_cvat_xml(boxes, labels, name: str, width: int = 500,
                height: int = 500, reading_order=None) -> str:
    """Spans -> one CVAT `<image>` annotation document (the
    preannotation direction): boxes in the given (document) order plus a
    `reading_order` polyline through the box centers — by default in
    listing order, or along `reading_order` (indices into `boxes`) when
    the annotated order differs from the listing order. The reader
    resolves the polyline back via point-in-box."""
    root = ET.Element("annotations")
    ET.SubElement(root, "version").text = "1.1"
    img = ET.SubElement(root, "image", {
        "id": "0", "name": name,
        "width": str(width), "height": str(height),
    })
    centers = []
    for (l, t, r, b), label in zip(boxes, labels):
        ET.SubElement(img, "box", {
            "label": str(label), "occluded": "0", "source": "manual",
            "xtl": f"{float(l):.2f}", "ytl": f"{float(t):.2f}",
            "xbr": f"{float(r):.2f}", "ybr": f"{float(b):.2f}",
        })
        centers.append(((float(l) + float(r)) / 2, (float(t) + float(b)) / 2))
    if centers:
        seq = centers if reading_order is None else \
            [centers[i] for i in reading_order]
        ET.SubElement(img, "polyline", {
            "label": "reading_order", "occluded": "0", "source": "manual",
            "points": ";".join(f"{x:.2f},{y:.2f}" for x, y in seq),
        })
    return ET.tostring(root, encoding="unicode")


def _find_box(boxes: list[dict], point: tuple[float, float]) -> int:
    """Index of the first box containing the point (reference
    cvat_dataset_builder point-in-box resolution), -1 if none."""
    x, y = point
    for i, bx in enumerate(boxes):
        if bx["l"] <= x <= bx["r"] and bx["t"] <= y <= bx["b"]:
            return i
    return -1


def parse_cvat_images(xml_s: str) -> list[tuple[str, list[dict]]]:
    """CVAT annotation XML -> [(image_name, boxes in ANNOTATED READING
    ORDER)] for EVERY <image> element — a real task export carries all
    annotated pages in one document. Per image: boxes not on the
    polyline keep document order after the ordered ones; images without
    a reading_order polyline yield document order (the reference skips
    images with neither boxes nor polylines — an empty box list here)."""
    root = ET.fromstring(xml_s)
    out = []
    for img in root.iter("image"):
        boxes = [{
            "label": bx.get("label"),
            "l": float(bx.get("xtl")), "t": float(bx.get("ytl")),
            "r": float(bx.get("xbr")), "b": float(bx.get("ybr")),
        } for bx in img.findall("box")]
        order: list[int] = []
        for pl in img.findall("polyline"):
            if pl.get("label") != "reading_order":
                continue
            for point_str in (pl.get("points") or "").split(";"):
                coords = point_str.split(",")
                if len(coords) == 2:
                    i = _find_box(boxes, (float(coords[0]), float(coords[1])))
                    if i >= 0 and i not in order:
                        order.append(i)
        order += [i for i in range(len(boxes)) if i not in order]
        out.append((img.get("name") or "", [boxes[i] for i in order]))
    return out


def parse_cvat_image(xml_s: str) -> list[dict]:
    """Single-image convenience wrapper: ordered boxes of the FIRST
    <image> (empty list if none)."""
    images = parse_cvat_images(xml_s)
    return images[0][1] if images else []


def _cvat_span_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for key_val, xml_s in zip(pdf["_key"], pdf["xml"]):
            for name, boxes in parse_cvat_images(xml_s):
                for idx, bx in enumerate(boxes):
                    rows.append((key_val, name, idx, bx["label"],
                                 bx["l"], bx["t"], bx["r"], bx["b"]))
        yield pd.DataFrame(rows, columns=[
            "_key", "image", "idx", "label", "l", "t", "r", "b"])


def cvat_annotation_spans(df: DataFrame, xml_col: str = "xml",
                          key: str = "doc_id") -> DataFrame:
    """(key, xml) annotation rows -> span rows in annotated reading
    order — the reader half of the CVAT loop, Arrow-batched. Every
    <image> in a row's XML is parsed (real task exports are
    multi-image); the `image` column carries the per-page name. The key
    column keeps its input type (bigint doc ids or string task ids)."""
    ktype = dict(df.dtypes)[key]
    return df.select(F.col(key).alias("_key"),
                     F.col(xml_col).alias("xml")) \
        .mapInPandas(_cvat_span_batches,
                     schema=f"_key {ktype}, {CVAT_SPAN_FIELDS}") \
        .withColumnRenamed("_key", key)
