"""Benchmark harness (driver contract).

Runs the headline jobs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

The flagship number is end-to-end extract+score docs/sec (BASELINE.json
metric). Scaling-efficiency evidence (same job at two parallelism levels)
is produced by tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from docling_eval_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{cpus}]",
                      extra_confs={"spark.sql.shuffle.partitions": str(cpus)})
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # flagship: end-to-end extract + score (full metric suite) + rollup
    from docling_eval_spark.plans.pipeline import flagship, flagship_rollup

    # warmup: spin up the JVM stage machinery + Python UDF workers on a tiny
    # slice so the measured number is steady-state throughput, not one-time
    # worker fork cost (which on a real cluster is amortized across hours).
    flagship_rollup(flagship(spark, "/root/testdata/sf0.001", n_partitions=cpus)).collect()

    def timed(fn, runs: int = 2) -> tuple[float, object]:
        """Steady-state timing: best of `runs` (first run pays one-time
        codegen/broadcast/Python-worker costs that a long-lived cluster
        job amortizes away). Caller-owned persisted results (near_dedup,
        corpus_map, minhash pairs) are released between runs so the 18-
        query sequence measures each query cold-cache, not under the
        accumulated storage of every previous query."""
        best, result = float("inf"), None
        for _ in range(runs):
            t0 = time.perf_counter()
            result = fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best, result

    t_flagship, summary = timed(
        lambda: flagship_rollup(
            flagship(spark, sf_dir, n_partitions=cpus * 2)
        ).collect()[0].asDict()
    )
    timings["flagship_extract_score"] = round(t_flagship, 3)
    n_docs = summary["n_docs"]

    # steady-state throughput: amplify the corpus (x24 deterministic
    # replication) so the measurement is work-bound, not job-overhead-bound
    # — the number a long-running 100 TB job actually sustains per core.
    t_steady, s_sum = timed(
        lambda: flagship_rollup(
            flagship(spark, sf_dir, n_partitions=cpus * 2, replicate=24)
        ).collect()[0].asDict(),
        runs=1,
    )
    timings["flagship_steady_state"] = round(t_steady, 3)
    steady_docs_per_sec = round(s_sum["n_docs"] / t_steady, 2)

    # headline secondary queries (same ones the correctness gate checks)
    qs = entrymod.queries()
    for name in ["teds_tables_identity", "layout_image_metrics",
                 "layout_corpus_map", "reading_order_ard",
                 "minhash_near_dup", "near_dedup_kept", "ocr_page_cer",
                 "table_delta_histogram", "gt_builder_spans",
                 "pricing_summary", "region_revenue",
                 "doc_len_histogram", "dedup_exact", "token_counts",
                 "embedding_topk", "top_parts_per_brand"]:
        t, _ = timed(lambda: qs[name](spark, sf_dir).collect())
        timings[name] = round(t, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "end_to_end_extract_score_plus_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / t_flagship, 2),
        "docs_per_sec_steady_state": steady_docs_per_sec,
        "byte_identical_rate": round(summary["n_byte_identical"] / max(n_docs, 1), 6),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
