"""DatasetStatistics — the reference's universal rollup shape.

Parity: reference docling_eval/evaluators/stats.py:12-97 (`compute_stats`):
  total, mean (=-1 when empty), median (=-1 when empty),
  std (SAMPLE stdev, 0.0 when n<2), plus a histogram of nr_bins bins over
  [0, 1] (or [0, max(values)] when max_value_is_one=False), with
  numpy.histogram bin-edge semantics (right-inclusive last bin).

Two forms:
  - compute_stats(values): pure numpy, used inside tests and pandas UDFs.
  - stats_agg_exprs(col): Spark Column expressions implementing the same
    rollup declaratively (count/avg/median/stddev_samp + width-bucketed
    histogram via groupBy) so Catalyst keeps it JVM-side — see
    operators/stats_rollup.py.
"""

from __future__ import annotations

import numpy as np


def compute_stats(values, max_value_is_one: bool = True, nr_bins: int = 20) -> dict:
    v = np.asarray(list(values), dtype=np.float64)
    total = int(v.size)
    mean = float(v.mean()) if total > 0 else -1.0
    median = float(np.median(v)) if total > 0 else -1.0
    std = float(v.std(ddof=1)) if total > 1 else 0.0
    max_value = 1.0
    if not max_value_is_one and total > 0:
        max_value = float(v.max())
    hist, bins = np.histogram(v, bins=nr_bins, range=(0.0, max_value))
    return {
        "total": total,
        "mean": mean,
        "median": median,
        "std": std,
        "bins": [float(b) for b in bins],
        "hist": [float(h) for h in hist],
    }
