"""CVAT annotation round-trip (reference cvat_preannotation_builder.py /
cvat_dataset_builder.py:263-340)."""


def test_roundtrip_preserves_boxes_and_order():
    from docling_eval_spark.sources.cvat import parse_cvat_image, to_cvat_xml

    boxes = [(10, 10, 50, 30), (10, 40, 50, 60), (10, 70, 50, 90)]
    labels = ["title", "text", "text"]
    xml_s = to_cvat_xml(boxes, labels, "p.png")
    out = parse_cvat_image(xml_s)
    assert [(b["l"], b["t"], b["r"], b["b"]) for b in out] == \
        [(10.0, 10.0, 50.0, 30.0), (10.0, 40.0, 50.0, 60.0),
         (10.0, 70.0, 50.0, 90.0)]
    assert [b["label"] for b in out] == labels


def test_reading_order_recovered_from_shuffled_listing():
    from docling_eval_spark.sources.cvat import parse_cvat_image, to_cvat_xml

    # boxes listed in order [B, C, A]; polyline visits A, B, C
    boxes = [(10, 40, 50, 60), (10, 70, 50, 90), (10, 10, 50, 30)]
    labels = ["b", "c", "a"]
    xml_s = to_cvat_xml(boxes, labels, "p.png", reading_order=[2, 0, 1])
    out = parse_cvat_image(xml_s)
    assert [b["label"] for b in out] == ["a", "b", "c"]


def test_unordered_boxes_follow_ordered_ones():
    from docling_eval_spark.sources.cvat import parse_cvat_image, to_cvat_xml
    import xml.etree.ElementTree as ET

    # polyline only covers the first box; remaining keep listing order
    boxes = [(0, 0, 10, 10), (20, 0, 30, 10), (40, 0, 50, 10)]
    xml_s = to_cvat_xml(boxes, ["x", "y", "z"], "p.png", reading_order=[1])
    out = parse_cvat_image(xml_s)
    assert [b["label"] for b in out] == ["y", "x", "z"]
    # writer emits well-formed CVAT 1.1
    root = ET.fromstring(xml_s)
    assert root.find("version").text == "1.1"
    assert len(root.find("image").findall("box")) == 3


def test_images_without_annotations():
    from docling_eval_spark.sources.cvat import parse_cvat_image

    assert parse_cvat_image("<annotations><version>1.1</version>"
                            "</annotations>") == []
    assert parse_cvat_image('<annotations><image id="0" name="p.png" '
                            'width="10" height="10"/></annotations>') == []


def test_spark_annotation_spans(spark):
    from docling_eval_spark.sources.cvat import (
        cvat_annotation_spans,
        to_cvat_xml,
    )

    xml_s = to_cvat_xml([(1, 2, 3, 4)], ["text"], "p.png")
    df = spark.createDataFrame([(7, xml_s)], "doc_id bigint, xml string")
    rows = cvat_annotation_spans(df).collect()
    assert [(r["doc_id"], r["image"], r["idx"], r["label"], r["l"], r["b"])
            for r in rows] == [(7, "p.png", 0, "text", 1.0, 4.0)]


def test_multi_image_export_and_string_keys(spark):
    """A real task export carries EVERY page in one XML; string task ids
    must survive (no bigint hardcoding)."""
    import xml.etree.ElementTree as ET

    from docling_eval_spark.sources.cvat import (
        cvat_annotation_spans,
        parse_cvat_images,
        to_cvat_xml,
    )

    one = to_cvat_xml([(0, 0, 5, 5)], ["a"], "p1.png")
    two = to_cvat_xml([(10, 0, 15, 5)], ["b"], "p2.png")
    # merge the two <image> elements under one <annotations> root
    r1, r2 = ET.fromstring(one), ET.fromstring(two)
    r1.append(r2.find("image"))
    merged = ET.tostring(r1, encoding="unicode")
    assert [n for n, _ in parse_cvat_images(merged)] == ["p1.png", "p2.png"]

    df = spark.createDataFrame([("task-9", merged)],
                               "task_id string, xml string")
    rows = cvat_annotation_spans(df, key="task_id") \
        .orderBy("image").collect()
    assert [(r["task_id"], r["image"], r["label"]) for r in rows] == \
        [("task-9", "p1.png", "a"), ("task-9", "p2.png", "b")]
