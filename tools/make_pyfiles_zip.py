"""Package docling_eval_spark for `spark-submit --py-files` (north rule).

One self-contained zip, no hidden deps beyond the cluster's Python env
(pyspark/pyarrow/pandas/numpy). Usage:

    python tools/make_pyfiles_zip.py [--out dist/docling_eval_spark.zip]
    spark-submit --py-files dist/docling_eval_spark.zip jobs/extract_job.py \
        --input s3a://bucket/pages --output s3a://bucket/scored \
        --lineage s3a://bucket/lineage --run-id r1
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "docling_eval_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist",
                                                  "docling_eval_spark.zip"))
    args = ap.parse_args()
    print(build(args.out))
