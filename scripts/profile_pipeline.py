#!/usr/bin/env python
"""Per-stage scaling profile: run the flagship pipeline on the scale
corpus at a given core count and print stage wall times as JSON.

Usage: python scripts/profile_pipeline.py --cores 8 [--rows 60000]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=60000)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="fixed partition count (data-sized, cluster-size-independent)")
    args = ap.parse_args()

    from finddup_spark.corpus import write_pages_parquet
    from finddup_spark.plans.pipeline import DedupPipeline
    from finddup_spark.session import get_spark
    from finddup_spark.sources.tables import load_pages

    corpus_dir = os.path.join(tempfile.gettempdir(), f"scale_corpus_{args.rows}")
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_pages_parquet(corpus_dir, n_rows=args.rows, seed=42)

    extra = {}
    if os.environ.get("PROFILE_EVENTLOG"):
        os.makedirs("/tmp/spark-events", exist_ok=True)
        extra = {"spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": "/tmp/spark-events"}
    spark = get_spark(app_name=f"profile-{args.cores}", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    out_root = tempfile.mkdtemp(prefix="profile_out_")
    pages = load_pages(spark, pages_path)
    t0 = time.monotonic()
    run = DedupPipeline(spark, out_root, resume=False).run(pages)
    total = time.monotonic() - t0
    stages = {s.name: s.wall_ms / 1000.0 for s in run.stages}
    accounted = sum(stages.values())
    print(json.dumps({
        "cores": args.cores,
        "total_s": round(total, 2),
        "stages_s": {k: round(v, 2) for k, v in stages.items()},
        "unaccounted_s": round(total - accounted, 2),
    }))
    spark.stop()
    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
