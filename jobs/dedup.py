#!/usr/bin/env python
"""Thin spark-submit main for the dedup pipeline (SURVEY.md §7 M7).

Cluster:
    spark-submit --py-files dist/finddup_spark.zip jobs/dedup.py \
        --pages s3://bucket/pages --out s3://bucket/dedup_out

Local:
    python jobs/dedup.py --pages /tmp/pages.parquet --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet/Iceberg path")
    ap.add_argument("--out", required=True, help="output directory for stage tables")
    ap.add_argument("--no-substring", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local mode cores")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from finddup_spark.plans.pipeline import DedupPipeline
    from finddup_spark.sources.tables import load_pages

    # under spark-submit a session already exists; standalone, build local
    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
    else:
        from finddup_spark.session import get_spark

        spark = get_spark(app_name="finddup-dedup", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    pages = load_pages(spark, args.pages)
    pipe = DedupPipeline(
        spark,
        args.out,
        enable_substring=not args.no_substring,
        resume=not args.no_resume,
    )
    run = pipe.run(pages)
    print(json.dumps({
        "stages": [
            {"name": s.name, "rows": s.rows, "wall_ms": s.wall_ms, "skipped": s.skipped}
            for s in run.stages
        ],
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
