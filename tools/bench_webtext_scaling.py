"""Two-level scaling evidence for the web-corpus curation tier.

Same methodology as tools/bench_scaling.py (fresh CPU-pinned JVM per
level, warmup pass, best-of-runs, deterministically amplified corpus),
applied to the JVM-columnar curation chain: Gopher quality flags ->
CCNet corpus-level line dedup (operators/webtext.py). Unlike the
flagship, this chain has corpus-wide shuffles (line-hash winners), so
it evidences that the SHUFFLE-bearing tier also scales N -> 4N, not
just the embarrassingly-parallel Arrow stage.

Usage:
    python tools/bench_webtext_scaling.py [--sf-dir /root/testdata/sf0.1]
        [--levels 8,32] [--runs 2] [--replicate 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def canary() -> float:
    """Single-core CPU probe (~0.24 s on this box unloaded). If it reads
    >0.3 s the host is in a contention window and cross-level efficiency
    numbers from that run should be discarded (BENCH.md)."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(4_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 3)

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from docling_eval_spark.session import get_spark
from docling_eval_spark.corpus.generator import pages_from_documents
from docling_eval_spark.operators.webtext import (
    corpus_line_dedup, with_gopher_quality, with_word_lines)

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; runs = int(sys.argv[3])
replicate = int(sys.argv[4])
spark = get_spark("bench-webtext-scaling", master=f"local[{{cpus}}]",
                  extra_confs={{"spark.sql.shuffle.partitions": str(cpus)}})
spark.sparkContext.setLogLevel("ERROR")


def chain(light):
    lined = with_word_lines(light, words_per_line=3)
    deduped = corpus_line_dedup(lined, text_col="text_lines")
    flagged = with_gopher_quality(deduped.where(F.col("n_kept") > 0))
    return flagged.agg(
        F.count("*").alias("n"),
        F.sum(F.col("gopher_pass").cast("int")).alias("n_pass"),
        F.sum("n_kept").alias("lines_kept"))


# warmup (JVM codegen + shuffle machinery)
chain(pages_from_documents(spark, "/root/testdata/sf0.001",
                           n_partitions=cpus, pages_stage=False)).collect()

light = pages_from_documents(spark, sf_dir, n_partitions=cpus * 2,
                             replicate=replicate, pages_stage=False)
n_docs = light.count()
best = float("inf")
for _ in range(runs):
    t0 = time.perf_counter()
    row = chain(light).collect()[0]
    best = min(best, time.perf_counter() - t0)
print("CHILD " + json.dumps({{
    "cpus": cpus, "n_docs": n_docs, "sec": round(best, 3),
    "docs_per_sec": round(n_docs / best, 2),
    "n_pass": row["n_pass"], "lines_kept": row["lines_kept"]}}))
spark.stop()
"""


_CEILING_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from docling_eval_spark.session import get_spark
cpus = int(sys.argv[1])
spark = get_spark("jvm-ceiling", master=f"local[{{cpus}}]",
                  extra_confs={{"spark.sql.shuffle.partitions": str(cpus)}})
spark.sparkContext.setLogLevel("ERROR")


def mk():
    return (spark.range(0, 20_000_000, 1, cpus * 2)
            .withColumn("s", F.concat(F.lit("word stream value number "),
                                      (F.col("id") % 997).cast("string")))
            .select(F.sum(F.size(F.split("s", " "))).alias("n")))


mk().collect()
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    mk().collect()
    best = min(best, time.perf_counter() - t0)
print("CHILD " + str(round(best, 3)))
spark.stop()
"""


def run_ceiling(cpus: int) -> float:
    """Same-run hardware ceiling: a pure-JVM string workload (no Python,
    no shuffle) at the same pinned level. On this shared-host VM,
    per-core throughput drops as more cores spin (clock/memory-bandwidth
    throttling); the ceiling separates 'the job doesn't scale' from
    'the box doesn't scale'."""
    script = _CEILING_CHILD.format(repo=REPO)
    cmd = [sys.executable, "-c", script, str(cpus)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("CHILD ")), None)
    if line is None:
        sys.stderr.write(proc.stdout[-1000:] + proc.stderr[-2000:])
        raise RuntimeError(f"ceiling level {cpus} failed")
    return float(line[len("CHILD "):])


def run_level(cpus: int, sf_dir: str, runs: int, replicate: int) -> dict:
    script = _CHILD.format(repo=REPO)
    cmd = [sys.executable, "-c", script, str(cpus), sf_dir, str(runs),
           str(replicate)]
    if shutil.which("taskset"):
        # pin to exactly `cpus` cores: a simulated L-core cluster gets L
        # cores for JVM + driver alike
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("CHILD ")), None)
    if line is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"level {cpus} failed")
    return json.loads(line[len("CHILD "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--replicate", type=int, default=20)
    args = ap.parse_args()

    levels = [int(x) for x in args.levels.split(",")]
    c_before = canary()
    results = [run_level(l, args.sf_dir, args.runs, args.replicate)
               for l in levels]
    ceilings = {l: run_ceiling(l) for l in levels}
    for r in results:
        r["ceiling_sec"] = ceilings[r["cpus"]]
    out: dict = {"levels": results, "pairs": [],
                 "host_canary_sec": {"before": c_before,
                                     "after": canary()}}
    by = {r["cpus"]: r for r in results}
    for n in levels:
        if n * 4 in by:
            eff = (by[n * 4]["docs_per_sec"] / by[n]["docs_per_sec"]) / 4
            ceil_eff = (ceilings[n] / ceilings[n * 4]) / 4
            out["pairs"].append(
                {"pair": f"{n}->{n * 4}", "efficiency": round(eff, 3),
                 "hw_ceiling_efficiency": round(ceil_eff, 3)})
    # invariant: the chain's answer must be identical at every level
    answers = {(r["n_pass"], r["lines_kept"]) for r in results}
    out["answer_invariant"] = len(answers) == 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()
