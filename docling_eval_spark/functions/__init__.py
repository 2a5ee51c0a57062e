"""Pure metric kernels: numpy/stdlib only, no Spark imports.

These are the batch kernels wrapped by Arrow pandas UDFs in plans/.
They re-implement from scratch (public algorithms only) the scoring
surface of the reference (SURVEY.md §2.8): edit distance, token P/R/F1,
BLEU, METEOR, CER, TEDS tree-edit distance, IoU/greedy matching/mAP,
mask P/R/F1, ARD reading-order distance, and the DatasetStatistics
rollup shape.
"""
