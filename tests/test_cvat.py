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


class TestDocumentReconstruction:
    def _xml(self):
        from docling_eval_spark.sources.cvat import to_cvat_xml

        boxes = [
            (10, 10, 100, 20),    # 0 title
            (10, 30, 100, 40),    # 1 text (merge head)
            (10, 50, 100, 60),    # 2 text (merge tail)
            (10, 70, 100, 120),   # 3 picture (group head)
            (110, 70, 200, 120),  # 4 picture (group tail)
            (10, 130, 100, 140),  # 5 caption -> picture
            (10, 150, 100, 160),  # 6 list_item (group head)
            (10, 170, 100, 180),  # 7 list_item (group tail)
            (10, 190, 100, 240),  # 8 table
            (10, 250, 100, 260),  # 9 footnote -> table
            (10, 270, 100, 280),  # 10 section_header level 3
            (10, 290, 100, 300),  # 11 caption, UNLINKED
        ]
        labels = ["title", "text", "text", "picture", "picture", "caption",
                  "list_item", "list_item", "table", "footnote",
                  "section_header", "caption"]
        return to_cvat_xml(
            boxes, labels, "doc.png",
            reading_order=[0, 1, 3, 6, 8, 10, 11],
            polylines=[("merge", [1, 2]), ("group", [3, 4]),
                       ("to_caption", [3, 5]), ("group", [6, 7]),
                       ("to_footnote", [8, 9])],
            attributes={10: {"level": "3"}},
        )

    def test_full_reconstruction(self):
        from docling_eval_spark.sources.cvat import parse_cvat_document

        texts = [f"t{i}" for i in range(12)]
        items = parse_cvat_document(self._xml(), texts)
        kinds = [(i["kind"], i["label"]) for i in items]
        assert kinds == [
            ("text", "title"), ("text", "text"),
            ("picture", "picture"), ("text", "caption"),
            ("group", "ordered_list"), ("list_item", "list_item"),
            ("list_item", "list_item"), ("table", "table"),
            ("text", "footnote"), ("heading", "section_header"),
            ("text", "caption"),
        ]
        # merged text joins with a space, extra prov counted
        assert items[1]["text"] == "t1 t2"
        assert items[1]["n_provs"] == 2 and items[1]["merged_boxids"] == [2]
        # picture group: both boxes as provs on ONE picture item
        assert items[2]["n_provs"] == 2 and items[2]["merged_boxids"] == [4]
        # caption/footnote attach to their floating item
        assert items[3]["parent_idx"] == 2 and items[3]["text"] == "t5"
        assert items[8]["parent_idx"] == 7 and items[8]["text"] == "t9"
        # list group: one ordered_list group, both members parented to it
        assert items[5]["parent_idx"] == 4 and items[6]["parent_idx"] == 4
        # heading level from the box attribute
        assert items[9]["level"] == 3
        # the unlinked caption IS emitted standalone (reference warning
        # path); the linked one was consumed by the picture
        assert items[10]["boxid"] == 11 and items[10]["parent_idx"] is None

    def test_no_reading_order_drops_document(self):
        from docling_eval_spark.sources.cvat import parse_cvat_document

        xml = ('<annotations><image id="0" name="x.png" width="10" '
               'height="10"><box label="text" xtl="1" ytl="1" xbr="5" '
               'ybr="5"/></image></annotations>')
        assert parse_cvat_document(xml) == []

    def test_spark_stage(self, spark):
        from docling_eval_spark.sources.cvat import cvat_document_items

        rows = [(7, self._xml(), [f"t{i}" for i in range(12)])]
        df = spark.createDataFrame(
            rows, "doc_id bigint, xml string, texts array<string>")
        out = cvat_document_items(df, texts_col="texts") \
            .orderBy("item_idx").collect()
        assert len(out) == 11
        assert out[1]["text"] == "t1 t2"
        assert out[4]["kind"] == "group" and out[4]["boxid"] == -1
