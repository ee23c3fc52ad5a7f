"""spark-submit entry point.

Cluster deployment (north_rule):

    zip -r jmdfane_spark.zip joint_multi_dimensional_…_spark jmdfane_spark
    spark-submit --py-files jmdfane_spark.zip \
        -m joint_multi_dimensional_…_spark \
        --input /path/to/files_table --output /path/out \
        --checkpoint /path/ck --threshold 0.4

On a cluster, master/executors come from spark-submit; locally it falls
back to local[$SPARK_GRAFT_CPUS]. Set SPARK_GRAFT_SUBMITTED=1 under
spark-submit so the session factory does not override the master.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="3-stage ER pipeline over a files table")
    p.add_argument("--input", required=True, help="parquet/Iceberg files table (repo,path,commit,lang,content)")
    p.add_argument("--output", required=True, help="labels output dir")
    p.add_argument("--checkpoint", default=None, help="stage-snapshot dir (resume support)")
    p.add_argument("--threshold", type=float, default=0.40)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument("--no-bands", action="store_true")
    p.add_argument("--no-tfidf", action="store_true")
    p.add_argument("--adaptive", action="store_true", help="per-block mean+kσ threshold (A5)")
    p.add_argument("--max-rows-per-task", type=int, default=2000)
    args = p.parse_args()

    from .plans.pipeline import run_pipeline
    from .session import get_spark

    spark = get_spark(app_name="jmdfane-er")
    files = spark.read.parquet(args.input)
    res = run_pipeline(
        spark,
        files,
        threshold=args.threshold,
        use_bands=not args.no_bands,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        use_tfidf=not args.no_tfidf,
        max_rows_per_task=args.max_rows_per_task,
        checkpoint_dir=args.checkpoint,
        adaptive=args.adaptive,
    )
    res.labels.write.mode("overwrite").partitionBy("block_key").parquet(args.output)
    print(json.dumps({k: v for k, v in res.metrics.items() if k != "cc_metrics"}))


if __name__ == "__main__":
    main()
