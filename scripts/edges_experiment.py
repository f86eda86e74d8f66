#!/usr/bin/env python
"""Time ONLY the edges stage (resume skips upstream stages) under
configurable AQE/partitioning settings — for scaling diagnosis.

Usage: python scripts/edges_experiment.py --cores 8 --out /tmp/edges_exp \
           [--advisory 64m] [--rows 60000] [--fresh]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=60000)
    ap.add_argument("--out", default="/tmp/edges_exp")
    ap.add_argument("--advisory", default=None)
    ap.add_argument("--stage", default="edges")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    from finddup_spark.corpus import write_pages_parquet
    from finddup_spark.plans.pipeline import DedupPipeline, invalidate
    from finddup_spark.session import get_spark
    from finddup_spark.sources.tables import load_pages

    corpus_dir = os.path.join("/tmp", f"scale_corpus_{args.rows}")
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_pages_parquet(corpus_dir, n_rows=args.rows, seed=42)

    extra = {}
    if args.advisory:
        extra["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = args.advisory
    spark = get_spark(app_name="edges-exp", cores=args.cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    if args.fresh:
        import shutil
        shutil.rmtree(args.out, ignore_errors=True)
    else:
        # drop the success markers of the target stage + downstream, keep
        # upstream; then stop after the target stage recomputes
        invalidate(args.out, args.stage)

    pages = load_pages(spark, pages_path)
    t0 = time.monotonic()
    run = DedupPipeline(spark, args.out, resume=True).run(pages)
    total = time.monotonic() - t0
    stages = {s.name: (s.wall_ms / 1000.0 if not s.skipped else "skip")
              for s in run.stages}
    print(json.dumps({"cores": args.cores, "advisory": args.advisory,
                      "total_s": round(total, 2),
                      "stages": {k: (round(v, 2) if isinstance(v, float) else v)
                                 for k, v in stages.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
