#!/usr/bin/env python
"""Break the edges stage into sub-steps and time each (materialized via
write to a throwaway parquet, mirroring real stage cost).

Usage: python scripts/edges_breakdown.py --cores 8 --out /tmp/edges_exp
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
    ap.add_argument("--out", default="/tmp/edges_exp")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from finddup_spark.config import DEFAULT_CONFIG as cfg
    from finddup_spark.operators.lsh import candidate_pairs, verify_pairs
    from finddup_spark.operators.substring import (
        fingerprints,
        substring_candidates,
        verify_substring_pairs,
    )
    from finddup_spark.session import get_spark
    from finddup_spark.sources.tables import load_pages

    pages_path = os.path.join("/tmp", f"scale_corpus_{args.rows}", "pages.parquet")
    spark = get_spark(app_name="edges-bd", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    sink = tempfile.mkdtemp(prefix="edges_bd_")
    t: dict[str, float] = {}

    def mat(name: str, df) -> "object":
        p = os.path.join(sink, name)
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(p)
        t[name] = round(time.monotonic() - t0, 2)
        return spark.read.parquet(p)

    pages = load_pages(spark, pages_path)
    exact = spark.read.parquet(os.path.join(args.out, "exact_clusters"))
    bands = spark.read.parquet(os.path.join(args.out, "bands"))
    reps = exact.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    t0 = time.monotonic()
    texts = pages.select("doc_id", "text").join(reps, "doc_id", "left_semi")
    texts = mat("rep_texts", texts)

    pairs, _stats = candidate_pairs(bands, cfg)
    pairs = mat("mh_pairs", pairs)
    mh_edges = mat("mh_verify", verify_pairs(pairs, texts, cfg, method="minhash"))
    fps = mat("fingerprints", fingerprints(texts, cfg))
    sub_pairs, _ = substring_candidates(fps, cfg)
    sub_pairs = mat("sub_pairs", sub_pairs)
    fresh = sub_pairs.join(mh_edges.select("src", "dst"), ["src", "dst"], "left_anti")
    mat("sub_verify", verify_substring_pairs(fresh, texts, cfg))
    t["TOTAL"] = round(time.monotonic() - t0, 2)
    counts = {n: spark.read.parquet(os.path.join(sink, n)).count()
              for n in ("mh_pairs", "mh_verify", "fingerprints", "sub_pairs", "sub_verify")}
    print(json.dumps({"cores": args.cores, "times_s": t, "counts": counts}))
    spark.stop()
    shutil.rmtree(sink, ignore_errors=True)


if __name__ == "__main__":
    main()
