"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship exact-dedup clustering on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per SQL-expressible query.

Column names and integer widths are aligned on both sides (driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Exact-duplicate clustering (SURVEY.md M1) over sf0.001 documents."""
    from finddup_spark.operators.exact import exact_clusters

    docs = _docs(spark, SF0001)
    return exact_clusters(docs, id_col="doc_id").select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# queries — each callable (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def _q_exact_block_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 length blocking: lengths with >1 member (reference finddup.py:876)."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.length("text").cast("long").alias("text_len"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def _q_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A7: sha256 grouping with min-doc_id cluster ids."""
    from finddup_spark.operators.exact import exact_clusters

    return exact_clusters(_docs(spark, sf_dir), id_col="doc_id").select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def _q_exact_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 verification: min(text)=max(text) within each sha-256 group."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.sha2("text", 256).alias("content_sha"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            (F.min("text") == F.max("text")).alias("verified"),
        )
    )


def _q_prefix_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 progressive-prefix cheap key (reference 256-byte first pass)."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.substring("text", 1, 64).alias("prefix"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc_id").alias("min_doc"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_block_sizes": _q_exact_block_sizes,
        "exact_clusters": _q_exact_clusters,
        "exact_verify": _q_exact_verify,
        "prefix_block": _q_prefix_block,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_block_sizes": """
            SELECT CAST(length(text) AS BIGINT) AS text_len,
                   count(*) AS cnt
            FROM documents
            GROUP BY 1
            HAVING count(*) > 1
        """,
        "exact_clusters": """
            WITH g AS (
                SELECT sha256(text) AS h,
                       CAST(min(doc_id) AS BIGINT) AS cluster_id,
                       count(*) AS cluster_size
                FROM documents
                GROUP BY 1
            )
            SELECT d.doc_id AS doc_id, g.cluster_id, g.cluster_size
            FROM documents d JOIN g ON sha256(d.text) = g.h
        """,
        "exact_verify": """
            SELECT sha256(text) AS content_sha,
                   count(*) AS cluster_size,
                   min(text) = max(text) AS verified
            FROM documents
            GROUP BY 1
        """,
        "prefix_block": """
            SELECT substring(text, 1, 64) AS prefix,
                   count(*) AS cnt,
                   min(doc_id) AS min_doc
            FROM documents
            GROUP BY 1
        """,
    }
