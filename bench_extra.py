#!/usr/bin/env python
"""Extra benchmarks / profiling for the optimization rounds (guide §1).

NOT part of the frozen measurement contract (bench.py is): this harness
exists to (a) count the Spark JOBS each headline query launches — at
bench scale the suite is overhead-bound, and every job carries a fixed
scheduling/AQE-replanning cost that a cluster driver pays too — and
(b) capture ``explain("formatted")`` plans for the judge's plan files.

Usage:
  python bench_extra.py --profile            # wall + job/stage counts per query
  python bench_extra.py --profile --only minhash_dedup,simhash_dedup
  python bench_extra.py --plans plans/r06 --suffix before   # write plan files
  python bench_extra.py --noop --only minhash_dedup  # time with noop sink
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _job_count(spark) -> int:
    """Total jobs submitted so far (all threads — job groups are
    thread-local and several operators submit from worker threads)."""
    nj = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return nj if isinstance(nj, int) else nj.get()


def _queries(spark, sf_dir: str):
    """DataFrame builders for every headline query (mirrors bench.py's
    q_* functions but returns the DataFrame so we can explain/noop it)."""
    from pyspark.sql import functions as F

    from finddup_spark.functions.textstats import text_stats
    from finddup_spark.operators.boilerplate import boilerplate_ratio
    from finddup_spark.operators.dedup import (
        cross_modal_dedup,
        embedding_lsh_dedup,
        minhash_dedup,
        simhash_dedup,
    )
    from finddup_spark.operators.exact import exact_clusters
    from finddup_spark.operators.simsearch import brute_force_topk, lsh_topk

    docs = lambda: spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = lambda: spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _dim():
        return len(emb().select("embedding").first()[0])

    return {
        "exact": lambda: exact_clusters(docs()),
        "minhash_dedup": lambda: minhash_dedup(docs()),
        "simhash_dedup": lambda: simhash_dedup(docs()),
        "text_stats": lambda: text_stats(docs()),
        "ann_topk": lambda: brute_force_topk(emb(), k=3, query_ids=list(range(64))),
        "lsh_topk": lambda: lsh_topk(emb(), dim=_dim(), k=3),
        "embedding_lsh_dedup": lambda: embedding_lsh_dedup(
            emb(), dim=_dim(), threshold=0.95
        ),
        "cross_modal_dedup": lambda: cross_modal_dedup(
            docs().select("doc_id", "text"),
            emb().select("vec_id", "embedding"),
            dim=_dim(),
        ),
        "boilerplate_ratio": lambda: boilerplate_ratio(docs(), k=5),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--only", default=None)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--noop", action="store_true", help="noop-sink the query DF instead of count()")
    ap.add_argument("--plans", default=None, help="write explain('formatted') files to this dir")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--pipeline", action="store_true", help="also run the flagship pipeline with job counting")
    args = ap.parse_args()

    from finddup_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=args.cores,
                      shuffle_partitions=max(16, min(2 * args.cores, 64)))
    spark.sparkContext.setLogLevel("ERROR")

    qs = _queries(spark, args.sf_dir)
    if args.only:
        qs = {k: v for k, v in qs.items() if k in args.only.split(",")}

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name, fn in qs.items():
            df = fn()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        spark.stop()
        return

    out = {}
    for rep in range(args.reps):
        if args.pipeline:
            import tempfile

            from bench import q_pipeline

            j0, t0 = _job_count(spark), time.monotonic()
            q_pipeline(spark, args.sf_dir, tempfile.mkdtemp(prefix="bx_pipe_"),
                       "/tmp/scale_corpus_2000/pages.parquet")
            wall, jobs = time.monotonic() - t0, _job_count(spark) - j0
            out.setdefault("pipeline", []).append(
                {"wall_s": round(wall, 3), "jobs": jobs})
        for name, fn in qs.items():
            spark.sparkContext.setJobDescription(f"bx:{name}")
            j0 = _job_count(spark)
            t0 = time.monotonic()
            df = fn()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            wall = time.monotonic() - t0
            jobs = _job_count(spark) - j0
            out.setdefault(name, []).append({"wall_s": round(wall, 3), "jobs": jobs})
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
