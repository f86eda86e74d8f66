"""C1/C2 report scalar helpers (reference num2eng, finddup.py:90-116)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finddup_spark.functions.report import human_bytes, rel_path


def test_human_bytes(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"n": [0, 512, 1024, 1536, 1024**2, 5 * 1024**3]})
    )
    out = [r[0] for r in df.select(human_bytes("n")).collect()]
    assert out == ["0.0", "512.0", "1.0 k", "1.5 k", "1.0 M", "5.0 G"]


def test_rel_path(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["https://h.example/a/b.html", "https://other/x"]})
    )
    out = [r[0] for r in df.select(rel_path("url", "https://h.example")).collect()]
    assert out == ["a/b.html", "https://other/x"]


def test_global_seq_matches_window_and_scales(spark):
    """Two-phase prefix-offset numbering must equal the single-window
    row_number() on a skewed input (one category dominating) while
    keeping its sorts partition-bounded: the executed plan's Window node
    is keyed by the physical partition id, never by category alone."""
    from finddup_spark.operators.report_ops import _global_seq

    n = 20_000
    rows = spark.range(n).select(
        F.when(F.col("id") % 100 == 0, F.lit("rare"))
        .otherwise(F.lit("dominant")).alias("category"),
        F.format_string("u%08d", F.col("id")).alias("url"),
    )
    out = _global_seq(rows, "category", "url").toPandas()
    assert len(out) == n
    for cat, grp in out.groupby("category"):
        g = grp.sort_values("url").reset_index(drop=True)
        assert list(g.seq) == list(range(1, len(g) + 1)), cat

    plan = (
        _global_seq(rows, "category", "url")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__pid" in m.group(1), plan
