"""Mini-driver: replicate the correctness gate locally — run every
``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()`` twin on
DuckDB, compare row count + order-insensitive values."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from finddup_spark.sources.tables import TPCH_TABLES  # noqa: E402


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) in ("bool", "boolean"):
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, sf001, name):
    q = entrymod.queries()[name]
    spark_df = q(spark, sf001).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_df) >= 0  # rows-only check (non-SQL-expressible)
        return
    con = _duck(sf001)
    duck_df = con.execute(oracle).fetchdf()
    assert len(spark_df) == len(duck_df), f"{name}: row count mismatch"
    a, b = _canon(spark_df), _canon(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=1e-5, atol=1e-6)
