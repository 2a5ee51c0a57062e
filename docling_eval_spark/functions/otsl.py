"""OTSL token-sequence table parsing (DocLayNet v2 builder parity).

The reference's DocLayNet v2 builder parses model-emitted OTSL token
strings into TableData (doclaynet_v2_builder.py: extract_tokens_and_text
:82-113, parse_texts :115-232, parse_table_content :234-255). OTSL
(Optimized Table Structure Language, Lysak et al. 2023 — public) encodes
a table as a row-major token matrix:

  <fcel>text   full cell with content      <lcel>  spans left neighbor
  <ecel>       empty cell                  <ucel>  spans upper neighbor
  <ched>text   column-header cell          <xcel>  2-D span continuation
  <rhed>text   row-header cell             <nl>    row separator
  <srow>text   section-row cell

This module re-implements those semantics from scratch as pure
functions, plus grid conversions so OTSL tables plug into the existing
HTML-grid / TEDS machinery (functions/teds.py F2): an OTSL sequence and
its HTML twin must parse to the SAME span-aware grid.
"""

from __future__ import annotations

import itertools
import re

_CELL_START = ("<fcel>", "<ched>", "<rhed>", "<srow>")  # carry text
_CELL_TAGS = _CELL_START + ("<ecel>",)
_SPAN_TAGS = ("<lcel>", "<ucel>", "<xcel>")
_ALL_CELL_TAGS = _CELL_TAGS + _SPAN_TAGS


def extract_tokens_and_text(s: str) -> tuple[list[str], list[str]]:
    """Split an OTSL string into (tag tokens, interleaved tags+texts),
    dropping <loc_*> location tokens, the <otsl> wrapper, and
    whitespace-only fragments (reference :82-113)."""
    parts = re.split(r"(<[^>]+>)", s)

    def keep_tag(p: str) -> bool:
        return not (p.startswith("<loc_") or p in ("<otsl>", "</otsl>"))

    tokens = [p for p in parts
              if re.fullmatch(r"<[^>]+>", p) and keep_tag(p)]
    mixed = [p for p in parts if keep_tag(p) and p.strip()]
    return tokens, mixed


def parse_otsl_cells(s: str) -> tuple[list[dict], int, int]:
    """OTSL string -> (anchor cells [{row,col,rowspan,colspan,text}],
    num_rows, num_cols) with the reference's span-walking semantics
    (parse_texts :115-232): a cell's col_span counts the run of
    <lcel>/<xcel> to its right, row_span the run of <ucel>/<xcel> below
    it in the token matrix."""
    tokens, mixed = extract_tokens_and_text(s)
    row_tokens = [list(grp) for is_nl, grp in
                  itertools.groupby(tokens, lambda t: t == "<nl>")
                  if not is_nl]

    def count_run(r: int, c: int, dr: int, dc: int, which: tuple) -> int:
        span = 0
        while (0 <= r < len(row_tokens) and 0 <= c < len(row_tokens[r])
               and row_tokens[r][c] in which):
            span += 1
            r, c = r + dr, c + dc
        return span

    cells: list[dict] = []
    r_idx = c_idx = 0
    for i, part in enumerate(mixed):
        if part in _CELL_TAGS:
            text = ""
            right_offset = 1
            if part != "<ecel>":
                # the reference assumes the content fragment follows
                # immediately (:174-176); a trailing contentless tag
                # would read the next tag, so guard on tag-ness
                nxt = mixed[i + 1] if i + 1 < len(mixed) else ""
                if nxt and not nxt.startswith("<"):
                    text = nxt
                right_offset = 2
            row_span = col_span = 1
            if i + right_offset < len(mixed):
                if (c_idx + 1 < len(row_tokens[r_idx])
                        and row_tokens[r_idx][c_idx + 1]
                        in ("<lcel>", "<xcel>")):
                    col_span += count_run(r_idx, c_idx + 1, 0, 1,
                                          ("<lcel>", "<xcel>"))
                if (r_idx + 1 < len(row_tokens)
                        and c_idx < len(row_tokens[r_idx + 1])
                        and row_tokens[r_idx + 1][c_idx]
                        in ("<ucel>", "<xcel>")):
                    row_span += count_run(r_idx + 1, c_idx, 1, 0,
                                          ("<ucel>", "<xcel>"))
            cells.append({"row": r_idx, "col": c_idx,
                          "rowspan": row_span, "colspan": col_span,
                          "text": text.strip()})
        if part in _ALL_CELL_TAGS:
            c_idx += 1
        elif part == "<nl>":
            r_idx += 1
            c_idx = 0
    num_rows = len(row_tokens)
    num_cols = max((len(r) for r in row_tokens), default=0)
    return cells, num_rows, num_cols


def parse_table_content(s: str) -> dict:
    """OTSL string -> {num_rows, num_cols, cells} (reference
    parse_table_content :234-255)."""
    cells, num_rows, num_cols = parse_otsl_cells(s)
    return {"num_rows": num_rows, "num_cols": num_cols, "cells": cells}


def grid_to_otsl(cells: list[dict], header_rows: int = 0) -> str:
    """Span-aware grid cells -> canonical OTSL token string (the
    fixture/synthesis direction; inverse of parse_otsl_cells for
    well-formed grids). Anchor cells in the first `header_rows` rows
    emit <ched>; covered positions emit <lcel>/<ucel>/<xcel> per the
    OTSL span rules; absent positions emit <ecel>."""
    if not cells:
        return "<otsl><nl></otsl>"
    nr = max(c["row"] + c["rowspan"] for c in cells)
    nc = max(c["col"] + c["colspan"] for c in cells)
    grid: list[list[str | None]] = [[None] * nc for _ in range(nr)]
    for c in cells:
        for dr in range(c["rowspan"]):
            for dc in range(c["colspan"]):
                if dr == 0 and dc == 0:
                    tag = "<ched>" if c["row"] < header_rows else (
                        "<ecel>" if not c["text"] else "<fcel>")
                    grid[c["row"]][c["col"]] = tag + (
                        c["text"] if tag != "<ecel>" else "")
                elif dr == 0:
                    grid[c["row"] + dr][c["col"] + dc] = "<lcel>"
                elif dc == 0:
                    grid[c["row"] + dr][c["col"] + dc] = "<ucel>"
                else:
                    grid[c["row"] + dr][c["col"] + dc] = "<xcel>"
    parts = ["<otsl>"]
    for row in grid:
        parts += [t if t is not None else "<ecel>" for t in row]
        parts.append("<nl>")
    parts.append("</otsl>")
    return "".join(parts)
