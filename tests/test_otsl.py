"""OTSL token-sequence parsing tests (DocLayNet v2 builder parity:
doclaynet_v2_builder.py:82-255) and the F2 cross-check: an OTSL sequence
and its HTML twin parse to the same span-aware grid."""

from __future__ import annotations

import pytest


def _grid(case: int, d: int = 5) -> list[dict]:
    def cell(r, c, rs=1, cs=1, text=None):
        return {"row": r, "col": c, "rowspan": rs, "colspan": cs,
                "text": f"t {d} {r} {c}" if text is None else text}

    if case == 0:  # colspan head
        spans = [cell(0, 0, 1, 2), cell(0, 2)]
        rest = [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1)]
    elif case == 1:  # rowspan head
        spans = [cell(0, 0, 2, 1), cell(0, 1), cell(0, 2)]
        rest = [(1, 1), (1, 2), (2, 0), (2, 1)]
    else:  # 2x2 block
        spans = [cell(0, 0, 2, 2), cell(0, 2)]
        rest = [(1, 2), (2, 0), (2, 1)]
    return spans + [cell(r, c) for r, c in rest] + [cell(2, 2, text="")]


class TestParse:
    @pytest.mark.parametrize("case", [0, 1, 2])
    @pytest.mark.parametrize("header_rows", [0, 1])
    def test_grid_roundtrip(self, case, header_rows):
        from docling_eval_spark.functions.otsl import (
            grid_to_otsl,
            parse_otsl_cells,
        )

        grid = _grid(case)
        otsl = grid_to_otsl(grid, header_rows=header_rows)
        cells, nr, nc = parse_otsl_cells(otsl)
        assert (nr, nc) == (3, 3)
        assert cells == grid

    @pytest.mark.parametrize("case", [0, 1, 2])
    def test_html_twin_same_grid(self, case):
        """F2 cross-check: OTSL parse == HTML-grid parse of the twin."""
        from docling_eval_spark.functions.otsl import (
            grid_to_otsl,
            parse_otsl_cells,
        )
        from docling_eval_spark.functions.teds import (
            grid_cells_to_html,
            html_table_to_grid_cells,
        )

        grid = _grid(case)
        from_otsl, _, _ = parse_otsl_cells(grid_to_otsl(grid))
        from_html = html_table_to_grid_cells(grid_cells_to_html(grid))
        assert from_otsl == from_html

    def test_loc_tokens_and_wrapper_stripped(self):
        from docling_eval_spark.functions.otsl import parse_otsl_cells

        s = ("<otsl><loc_12><fcel>a<loc_99><lcel><nl>"
             "<fcel>b<fcel>c<nl></otsl>")
        cells, nr, nc = parse_otsl_cells(s)
        assert (nr, nc) == (2, 2)
        assert cells[0] == {"row": 0, "col": 0, "rowspan": 1, "colspan": 2,
                            "text": "a"}
        assert [c["text"] for c in cells] == ["a", "b", "c"]

    def test_ched_rhed_srow_and_ecel(self):
        from docling_eval_spark.functions.otsl import parse_otsl_cells

        s = "<ched>h1<ched>h2<nl><rhed>r1<ecel><nl><srow>s<lcel><nl>"
        cells, nr, nc = parse_otsl_cells(s)
        assert (nr, nc) == (3, 2)
        assert [c["text"] for c in cells] == ["h1", "h2", "r1", "", "s"]
        assert cells[4]["colspan"] == 2

    def test_xcel_block_span(self):
        from docling_eval_spark.functions.otsl import parse_otsl_cells

        s = ("<fcel>big<lcel><fcel>x<nl>"
             "<ucel><xcel><fcel>y<nl>")
        cells, _, _ = parse_otsl_cells(s)
        assert cells[0] == {"row": 0, "col": 0, "rowspan": 2, "colspan": 2,
                            "text": "big"}

    def test_extract_tokens_and_text(self):
        from docling_eval_spark.functions.otsl import extract_tokens_and_text

        tokens, mixed = extract_tokens_and_text(
            "<otsl><fcel>hello world<ecel><nl></otsl>")
        assert tokens == ["<fcel>", "<ecel>", "<nl>"]
        assert mixed == ["<fcel>", "hello world", "<ecel>", "<nl>"]
