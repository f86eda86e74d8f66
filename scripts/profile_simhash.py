"""Warm-JVM job-count + wall profile of simhash_dedup at the bench shape.

Mirrors the bench harness (local[32], shuffle_partitions per bench
formula, warm python-worker/codegen pools via untimed first runs),
then times N repetitions and prints per-rep Spark job counts.
"""
import argparse
import time

ap = argparse.ArgumentParser()
ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
ap.add_argument("--reps", type=int, default=6)
args = ap.parse_args()

from finddup_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="prof-simhash", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

from finddup_spark.operators.dedup import simhash_dedup  # noqa: E402

docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

sc = spark.sparkContext
st = sc.statusTracker()


def njobs() -> int:
    ids = st.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


# warm: JIT, codegen, python worker pool
simhash_dedup(docs).count()
spark.catalog.clearCache()
simhash_dedup(docs).count()
spark.catalog.clearCache()

for i in range(args.reps):
    j0 = njobs()
    t0 = time.monotonic()
    n = simhash_dedup(docs).count()
    wall = time.monotonic() - t0
    j1 = njobs()
    spark.catalog.clearCache()
    print(f"rep {i}: wall={wall:.3f}s rows={n} jobs={j1 - j0}")
spark.stop()
