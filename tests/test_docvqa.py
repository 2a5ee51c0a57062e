"""DocVQA-style QA builder (reference docvqa_builder.py:104-145) + ANLS
(Biten et al. 2019)."""

import json


def test_docvqa_running_index_with_variable_answers(spark):
    from docling_eval_spark.sources.gt_builder import docvqa_kv_cells

    anno = json.dumps({"qa": [
        {"question": "Who?", "answers": ["Alice", "A. Smith", "Ms Smith"]},
        {"question": "When?", "answers": ["1998"]},
    ]})
    df = spark.createDataFrame([(1, anno)], "doc_id bigint, anno string")
    rows = {r["cell_id"]: r for r in docvqa_kv_cells(df).collect()}
    # running index: q0 at 0, answers 1..3; q1 at 4, answer 5
    assert rows[0]["label"] == "KEY" and rows[0]["text"] == "Who?"
    assert rows[0]["n_out"] == 3
    assert [rows[i]["text"] for i in (1, 2, 3)] == \
        ["Alice", "A. Smith", "Ms Smith"]
    assert rows[4]["label"] == "KEY" and rows[4]["qa_idx"] == 1
    assert rows[5]["text"] == "1998" and rows[5]["n_out"] == 1


def test_anls_protocol():
    from docling_eval_spark.functions.text_metrics import anls

    # exact (case/whitespace-normalized) match
    assert anls(" Alice ", ["alice"]) == 1.0
    # best-over-answers
    assert anls("1998", ["1999", "1998"]) == 1.0
    # similarity below tau zeroes out
    assert anls("zebra", ["1998"]) == 0.0
    # one edit on a 10-char answer: 1 - 1/10 = 0.9
    assert abs(anls("chocolatex", ["chocolate"]) - 0.9) < 1e-9
    # empty prediction scores 0 against non-empty answers
    assert anls("", ["x"]) == 0.0
    assert anls("", [""]) == 1.0
