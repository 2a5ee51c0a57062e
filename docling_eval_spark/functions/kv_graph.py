"""Key-value graph cell classification — native column expressions.

Parity target: reference docling_eval/utils/utils.py:536-587
(`classify_cells`): directed graph of cells and links, labels assigned by
degree rules:
  - out-degree 0                         -> VALUE (leaf)
  - in-degree 0 and out-degree > 0       -> KEY
  - in>0, out>0, ALL out-neighbors leaves -> KEY
  - otherwise                            -> UNSPECIFIED

The reference mutates pydantic objects per doc in Python; per-doc graphs
are tiny, so the rebuild evaluates the same rules as higher-order ARRAY
expressions (filter/size/forall) — fully JVM-side, codegen-friendly, and
usable inside any select over a (cells array<int>,
links array<struct<src:int,tgt:int>>) pair of columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _outdeg(links: Column, cell: Column) -> Column:
    return F.size(F.filter(links, lambda l: l["src"] == cell))


def _indeg(links: Column, cell: Column) -> Column:
    return F.size(F.filter(links, lambda l: l["tgt"] == cell))


def classify_kv_cells(cells: Column, links: Column) -> Column:
    """array<struct<cell_id:int, label:string>> with the reference rules."""
    def label(cell: Column) -> Column:
        out_d = _outdeg(links, cell)
        in_d = _indeg(links, cell)
        neighbors_all_leaves = F.forall(
            F.filter(links, lambda l: l["src"] == cell),
            lambda l: _outdeg(links, l["tgt"]) == 0,
        )
        return (
            F.when(out_d == 0, F.lit("VALUE"))
            .when(in_d == 0, F.lit("KEY"))
            .when(neighbors_all_leaves, F.lit("KEY"))
            .otherwise(F.lit("UNSPECIFIED"))
        )

    return F.transform(
        cells, lambda c: F.struct(c.alias("cell_id"), label(c).alias("label"))
    )


def chain_graph(n: Column) -> tuple[Column, Column]:
    """Deterministic test graph: cells 0..n-1, links i -> i+1 (a chain).

    Chain labels have a closed form: 0 -> KEY, n-1 -> VALUE, n-2 -> KEY
    (its only neighbor is the leaf), all other middles -> UNSPECIFIED.
    """
    cells = F.sequence(F.lit(0), n - 1)
    chain = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.struct(i.cast("int").alias("src"),
                           (i + 1).cast("int").alias("tgt")),
    )
    # F.sequence(0, n-2) DESCENDS for n <= 1 (sequence(0, -1) = [0, -1]);
    # a 0- or 1-cell chain has no links
    links = F.when(n >= 2, chain).otherwise(
        F.array().cast("array<struct<src:int,tgt:int>>"))
    return cells, links
