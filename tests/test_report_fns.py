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
