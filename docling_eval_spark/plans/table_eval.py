"""Table pipeline: extracted <table> subtrees -> TEDS scores + shape deltas.

Rebuild of the reference TableEvaluator (docling_eval/evaluators/
table_evaluator.py:130-307): zip GT/pred tables per doc (J2), strip
formatting tags (F4, fixed behavior), TEDS struct+text and struct-only
(F1), is_complex split (F5/A7), and the bounded delta-row/col histogram
(A8) — all per-doc work inside one Arrow-batched UDF, rollups as native
aggregations.

GT here is regenerable (corpus/html_synth.gt_table_html), which keeps the
pipeline hermetic; on a real corpus the GT table column rides along in the
same row (co-located J1 pairing — no join)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEDS_SCHEMA = (
    "doc_id bigint, url string, teds double, teds_struct double, "
    "is_complex boolean, gt_nrows int, gt_ncols int, pred_nrows int, pred_ncols int"
)


def perturb_table_html(html: str, mode: int) -> str:
    """Deterministic shape perturbations for the delta-row/col histogram
    gate: mode 1 appends a row (pred_nrows = gt_nrows + 1 exactly — the
    generator never lets a rowspan spill past the last row), mode 2
    appends a cell to the first row (row 0 always spans the full grid
    width, so pred_ncols = gt_ncols + 1 exactly), mode 3 both, mode 0
    identity."""
    out = html
    if mode in (2, 3) and "</tr>" in out:
        i = out.index("</tr>")
        out = out[:i] + "<td>x</td>" + out[i:]
    if mode in (1, 3) and "</table>" in out:
        j = out.rindex("</table>")
        out = out[:j] + "<tr><td>x</td></tr>" + out[j:]
    return out  # missing-table predictions pass through unperturbed


def _teds_batches(it: Iterator[pd.DataFrame], perturb: bool = False) -> Iterator[pd.DataFrame]:
    from ..corpus.html_synth import gt_table_html
    from ..functions.teds import (
        html_table_to_grid_cells,
        is_complex_table,
        table_shape,
        teds_score,
    )

    for pdf in it:
        rows = []
        for doc_id, url, tables in zip(pdf["doc_id"], pdf["url"], pdf["tables"]):
            gt = gt_table_html(int(doc_id))
            pred = tables[0] if len(tables) else ""
            if perturb:
                pred = perturb_table_html(pred, int(doc_id) % 4)
            gt_cells = html_table_to_grid_cells(gt)
            pred_cells = html_table_to_grid_cells(pred)
            gnr, gnc = table_shape(gt_cells)
            pnr, pnc = table_shape(pred_cells)
            rows.append((
                int(doc_id), url,
                teds_score(gt, pred),
                teds_score(gt, pred, structure_only=True),
                is_complex_table(gt_cells),
                gnr, gnc, pnr, pnc,
            ))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "url", "teds", "teds_struct", "is_complex",
            "gt_nrows", "gt_ncols", "pred_nrows", "pred_ncols",
        ])


def teds_scores(spark: SparkSession, sf_dir: str, n_partitions: int = 16,
                perturb: bool = False) -> DataFrame:
    """Extract table pages and TEDS-score them against regenerable GT.
    `perturb` applies the deterministic shape perturbations (mode =
    doc_id % 4) so the delta histogram has non-trivial bins."""
    from functools import partial

    from ..corpus.generator import pages_from_documents
    from ..extraction.extract import extract_pages
    from ..operators.skew import size_balanced_repartition

    pages = pages_from_documents(spark, sf_dir).where(F.col("doc_id") % 5 == 0)
    ext = extract_pages(size_balanced_repartition(pages, n_partitions))
    return ext.select("doc_id", "url", "tables").mapInPandas(
        partial(_teds_batches, perturb=perturb), schema=TEDS_SCHEMA
    )


def teds_rollup(scores: DataFrame) -> DataFrame:
    """A7 conditional aggregation: all / simple / complex TEDS means, plus
    the A8 bounded delta-row histogram — one pass, JVM-side."""
    clamp = lambda c: F.greatest(F.lit(-10), F.least(F.lit(10), c))  # noqa: E731
    return scores.agg(
        F.count("*").alias("total"),
        F.round(F.avg("teds"), 6).alias("teds_mean"),
        F.round(F.avg(F.when(F.col("is_complex"), F.col("teds"))), 6).alias("teds_complex_mean"),
        F.round(F.avg(F.when(~F.col("is_complex"), F.col("teds"))), 6).alias("teds_simple_mean"),
        F.round(F.avg("teds_struct"), 6).alias("teds_struct_mean"),
        F.sum(F.when(clamp(F.col("gt_nrows") - F.col("pred_nrows")) == 0, 1).otherwise(0)).alias("delta_rows_0"),
        F.sum(F.when(clamp(F.col("gt_ncols") - F.col("pred_ncols")) == 0, 1).otherwise(0)).alias("delta_cols_0"),
    )


def delta_histogram(scores: DataFrame) -> DataFrame:
    """A8 bounded delta-row/col histogram — the FULL -10..10 counter of
    reference table_evaluator.py:51-90, not just the zero bin.

    Reference semantics mirrored exactly: every bin -10..10 is present
    (pre-initialized dict), deltas outside the range are SKIPPED (not
    clamped into the edge bins), and fractions divide by the total
    evaluation count including skipped rows.

    ONE pass over `scores` (the expensive upstream is a TEDS-scoring UDF
    stage — a second consumer would recompute it): each row explodes
    into its two (kind, delta) contributions with out-of-range deltas
    folded to a null bin, and a single partial+final groupBy collects
    the <=22 bin counts. The 21-bin assembly (total incl. skipped,
    fractions, empty bins) is driver-side literal data, mirroring the
    reference's pre-initialized dict. An all-skipped or empty input
    yields fractions of 0.0, never nulls."""
    spark = scores.sparkSession
    d = scores.select(
        (F.col("gt_nrows") - F.col("pred_nrows")).alias("dr"),
        (F.col("gt_ncols") - F.col("pred_ncols")).alias("dc"),
    )
    in_range = lambda c: F.when(F.abs(c) <= 10, c)  # noqa: E731  (else null bin)
    kd = d.select(F.explode(F.array(
        F.struct(F.lit("row").alias("kind"), in_range(F.col("dr")).alias("delta")),
        F.struct(F.lit("col").alias("kind"), in_range(F.col("dc")).alias("delta")),
    )).alias("x")).select("x.kind", "x.delta")
    rows = kd.groupBy("delta").agg(
        F.sum(F.when(F.col("kind") == "row", 1).otherwise(0)).alias("n_rows"),
        F.sum(F.when(F.col("kind") == "col", 1).otherwise(0)).alias("n_cols"),
    ).collect()  # <=22 rows — the distributed work ends at this aggregate
    # 21-bin assembly is driver-side literal data (the reference's
    # pre-initialized dict, table_evaluator.py:53-54) — scores computed
    # exactly once, nothing left cached
    tot = sum(r["n_rows"] for r in rows)
    by = {r["delta"]: r for r in rows if r["delta"] is not None}
    out = []
    for delta in range(-10, 11):
        nr = int(by[delta]["n_rows"]) if delta in by else 0
        nc = int(by[delta]["n_cols"]) if delta in by else 0
        out.append((delta, nr, nc,
                    round(nr / tot, 6) if tot else 0.0,
                    round(nc / tot, 6) if tot else 0.0))
    return spark.createDataFrame(
        out, "delta int, n_rows bigint, n_cols bigint, "
             "frac_rows double, frac_cols double").orderBy("delta")
