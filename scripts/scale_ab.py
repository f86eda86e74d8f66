#!/usr/bin/env python
"""At-scale A/B: run selected operators on the big pages corpus against a
given source tree (pass the tree root as argv[1]) — used to prove the
round-6 optimizations hold at the 1M-page scale, not just at bench scale.

Usage: python scripts/scale_ab.py /root/repo pipeline,simhash,boilerplate
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

TREE = sys.argv[1]
OPS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["pipeline"]
PAGES = sys.argv[3] if len(sys.argv) > 3 else "/root/scale_corpus_960000/pages.parquet"
sys.path.insert(0, TREE)

from finddup_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"scale-ab-{os.path.basename(TREE)}", cores=32,
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

out = {"tree": TREE, "pages": PAGES}
pages = spark.read.parquet(PAGES)
out["n_pages"] = pages.count()

for op in OPS:
    t0 = time.monotonic()
    if op == "pipeline":
        from finddup_spark.plans.pipeline import DedupPipeline
        from finddup_spark.sources.tables import load_pages

        p = load_pages(spark, PAGES)
        run = DedupPipeline(spark, tempfile.mkdtemp(prefix="scale_ab_"),
                            resume=False).run(p)
        out["pipeline_stages"] = {s.name: s.wall_ms for s in run.stages}
        out["pipeline_finalize_ms"] = run.finalize_ms
    elif op == "simhash":
        from finddup_spark.operators.dedup import simhash_dedup

        docs = pages.selectExpr("doc_id", "text")
        out["simhash_rows"] = simhash_dedup(docs).count()
    elif op == "minhash":
        from finddup_spark.operators.dedup import minhash_dedup

        docs = pages.selectExpr("doc_id", "text")
        out["minhash_rows"] = minhash_dedup(docs).count()
    elif op == "boilerplate":
        from finddup_spark.operators.boilerplate import boilerplate_ratio

        docs = pages.selectExpr("doc_id", "text")
        out["boilerplate_rows"] = boilerplate_ratio(docs, k=5).count()
    out[f"{op}_wall_s"] = round(time.monotonic() - t0, 2)

spark.stop()
print(json.dumps(out))
