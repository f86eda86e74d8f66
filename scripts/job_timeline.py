#!/usr/bin/env python
"""Per-job timeline for one headline query: job id, description, wall,
and the DRIVER GAP since the previous job finished (scheduling/planning
time between jobs — the overhead-bound suite's real cost center).

Usage: python scripts/job_timeline.py minhash_dedup [--rep 2]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench_extra import _queries

    from finddup_spark.session import get_spark

    spark = get_spark(app_name="job-timeline", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if name == "pipeline":
        import tempfile

        from bench import q_pipeline

        def run():
            q_pipeline(spark, sf_dir, tempfile.mkdtemp(prefix="jt_pipe_"),
                       "/tmp/scale_corpus_2000/pages.parquet")
    else:
        fn = _queries(spark, sf_dir)[name]

        def run():
            fn().count()

    store = sc._jsc.sc().statusStore()
    for rep in range(reps):
        j0 = store.jobsList(None).size()
        t0 = time.monotonic()
        run()
        wall = time.monotonic() - t0

        jobs = store.jobsList(None)
        rows = []
        for i in range(jobs.size()):
            j = jobs.apply(i)
            sub = j.submissionTime().get().getTime() if j.submissionTime().isDefined() else 0
            comp = j.completionTime().get().getTime() if j.completionTime().isDefined() else 0
            desc = j.description().get() if j.description().isDefined() else j.name()
            rows.append((j.jobId(), sub, comp, desc[:110]))
        rows.sort()
        nnew = jobs.size() - j0
        rows = rows[-nnew:] if nnew > 0 else rows
        prev_end = None
        total_gap = total_run = 0.0
        print(f"== {name} rep {rep}: wall {wall:.2f}s, {len(rows)} jobs ==")
        for jid, sub, comp, desc in rows:
            gap = (sub - prev_end) / 1000.0 if prev_end else 0.0
            dur = (comp - sub) / 1000.0
            total_gap += max(gap, 0)
            total_run += dur
            print(f"  job {jid:4d}  gap {gap:6.3f}s  run {dur:6.3f}s  {desc}")
            prev_end = comp
        print(f"  TOTAL run {total_run:.2f}s  gap {total_gap:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
