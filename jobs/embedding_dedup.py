#!/usr/bin/env python
"""Thin spark-submit main for production embedding dedup (SURVEY.md §2.11).

Cluster:
    spark-submit --py-files dist/finddup_spark.zip jobs/embedding_dedup.py \
        --embeddings s3://bucket/embeddings --out s3://bucket/emb_dedup_out

Local:
    python jobs/embedding_dedup.py --embeddings /tmp/emb.parquet --out /tmp/out

Runs hyperplane-LSH blocked candidate generation -> exact-cosine verify ->
connected components (operators/dedup.py:embedding_lsh_dedup) and writes
the (vec_id, cluster_id, keep) assignment plus the hot-bucket truncation
stats as a lineage row — no silent caps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id long, embedding array<float>)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--n-planes", type=int, default=12)
    ap.add_argument("--n-tables", type=int, default=4)
    ap.add_argument("--cores", type=int, default=None, help="local mode cores")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from finddup_spark.operators.dedup import embedding_lsh_dedup

    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
    else:
        from finddup_spark.session import get_spark

        spark = get_spark(app_name="finddup-embedding-dedup", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    emb = spark.read.parquet(args.embeddings)
    first = emb.select("embedding").first()
    if first is None:
        raise SystemExit(f"no embeddings found at {args.embeddings}")
    dim = len(first[0])
    out, stats = embedding_lsh_dedup(
        emb, dim=dim, threshold=args.threshold,
        n_planes=args.n_planes, n_tables=args.n_tables, return_stats=True,
    )
    out.write.mode("overwrite").parquet(os.path.join(args.out, "assignments"))
    srow = stats.collect()[0]
    n = spark.read.parquet(os.path.join(args.out, "assignments")).count()
    print(json.dumps({
        "vectors": n,
        "dim": dim,
        "hot_buckets": int(srow["hot_buckets"] or 0),
        "max_bucket": int(srow["max_bucket"] or 0),
        "pairs_truncated_upper_bound": int(srow["pairs_truncated_upper_bound"] or 0),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()


