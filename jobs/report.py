#!/usr/bin/env python
"""Reference-shaped report over a pipeline output dir (S6 parity,
``print_full_report`` — reference finddup.py:1141-1286).

Cluster:
    spark-submit --py-files dist/finddup_spark.zip jobs/report.py --out <dir>
Local:
    python jobs/report.py --out /tmp/pipe_out [--limit 20]

Sections mirror the reference's stdout report: duplicate groups ordered
by descending byte size with sorted members (finddup.py:1168-1187),
unique count + alphabetical sample (:1189-1205), unknown dirs
(:1272-1286), duplicate dirs, and unprocessed rows by category
(:1207-1270). ``--limit`` caps every listed section — the reference
prints everything because its corpora are one disk; at web scale an
unbounded driver-side print is a collect() of the corpus, so the full
data stays in the parquet stage tables and the report shows the head.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="pipeline output directory")
    ap.add_argument("--limit", type=int, default=20,
                    help="max groups/rows printed per section")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from finddup_spark.functions.report import human_bytes
    from finddup_spark.operators.exact import dup_groups_report, unique_report

    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
    else:
        from finddup_spark.session import get_spark

        spark = get_spark(app_name="finddup-report", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    def table(name: str):
        p = os.path.join(args.out, name)
        return spark.read.parquet(p) if os.path.exists(p) else None

    exact = table("exact_clusters")
    dirs = table("dirs")
    errors = table("errors")
    lim = args.limit

    member = "url" if exact is not None and "url" in exact.columns else "doc_id"
    print("finddup_spark report")
    print("=" * 60)

    if exact is not None:
        n_docs = exact.count()
        dups = dup_groups_report(exact, member_col=member)
        n_groups = dups.count()
        print(f"pages: {n_docs}   duplicate groups: {n_groups}")
        print("\nDuplicate Pages (largest first):")
        for r in dups.select(
            human_bytes("n_bytes").alias("hs"), "members"
        ).head(lim):
            print(f"{r.hs} each:")
            for m in r.members[:lim]:
                print(f"    {m}")
        uniq = unique_report(exact, member_col=member)
        n_uniq = uniq.count()
        print(f"\nUnique Pages: {n_uniq}")
        for r in uniq.head(lim):
            print(f"    {r[member]}")

    if dirs is not None:
        unknown = dirs.filter(F.col("status") == "unknown").orderBy("path")
        print(f"\nUnknown Dirs (error-contaminated): {unknown.count()}")
        for r in unknown.head(lim):
            print(f"    {r.path}/")
        dup_dirs = (
            dirs.filter(F.col("status") == "dup")
            .groupBy("dir_sig")
            .agg(
                F.max("n_bytes").alias("n_bytes"),
                F.sort_array(F.collect_list("path")).alias("members"),
            )
            .orderBy(F.desc("n_bytes"))
        )
        print(f"\nDuplicate Dirs: {dup_dirs.count()} groups")
        for r in dup_dirs.select(
            human_bytes("n_bytes").alias("hs"), "members"
        ).head(lim):
            print(f"{r.hs} each:")
            for m in r.members[:lim]:
                print(f"    {m}/")

    if errors is not None:
        member_e = "url" if "url" in errors.columns else "doc_id"
        n_err = errors.count()
        print(f"\nUnprocessed (unreadable): {n_err}")
        for r in errors.orderBy(member_e).head(lim):
            print(f"    {r[member_e]}")


if __name__ == "__main__":
    main()
