"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "pairs_scored": N,
   "pairs_per_sec": N}

The primary workload is the flagship 3-stage ER pipeline (blocking →
scoring → CC) — the BASELINE.json throughput metric is candidate pairs
scored per second. Additional headline operators (LSH dedup, ANN top-k,
TPC-H-style agg/join/window) cover the rest of the engine surface.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from jmdfane_spark.plans.pipeline import run_pipeline  # noqa: E402
from jmdfane_spark.session import get_spark  # noqa: E402
from jmdfane_spark.sources.tables import documents_as_files  # noqa: E402

HEADLINE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk",
    "eval_pairwise_f1",
    "tpch_pricing_summary",
    "topk_orders_per_customer",
    "txt_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(master=f"local[{cpus}]", app_name="jmdfane-bench")

    timings: dict[str, float] = {}
    total0 = time.time()

    # flagship: full ER pipeline over documents-as-files (brute blocking —
    # this is the pairs-scored throughput workload)
    t0 = time.time()
    files = documents_as_files(spark, sf_dir)
    res = run_pipeline(
        spark, files, threshold=0.80, use_bands=False, use_tfidf=True,
        max_rows_per_task=300,
    )
    res.labels.count()
    timings["er_pipeline_full"] = round(time.time() - t0, 3)
    pairs_scored = res.metrics["pairs_scored"]

    qs = entrymod.queries()
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(time.time() - total0, 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pairs_scored": int(pairs_scored),
        "pairs_per_sec": round(pairs_scored / timings["er_pipeline_full"], 1),
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
