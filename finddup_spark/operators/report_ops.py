"""Categorized unprocessed-rows report (reference S6/O3).

The reference splits ``unproc_files`` into per-category report sections,
each sorted alphabetically (``print_unproc_files``,
``finddup.py:1207-1270``: unreadable / sockets / FIFOs / symlinks /
changed / ignored). The web analogs:

| reference category | pages analog |
|---|---|
| symlink (F2, ``finddup.py:175-180``) | ``kind = 'redirect'`` |
| socket / fifo (F3/F4, ``:181-192``) | any other non-``page`` kind |
| ignore_files (F1, ``:170-174``) | ignored basename (robots.txt, …) |
| changed (F6, ``:974-1005``) | url re-crawled since the run's snapshot |
| unreadable/other (``:144-149``) | extraction failure (``text IS NULL``) |

Category precedence mirrors the reference's stat-time classification
order (ignored is checked first at ``finddup.py:170-174``, then the
inode-kind branches, then readability; ``changed`` is applied post-hoc
but only ever re-classifies rows that processed cleanly): ignored >
kind > changed > unreadable.

Everything is built-in Spark (CASE + window row_number) — the per-
category alphabetical ordering (O3) is materialized as a ``seq`` column
so it is value-checkable, not just an ORDER BY that a sink may drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import IGNORE_BASENAMES


def unproc_report(
    pages: DataFrame,
    changed_ids: DataFrame | None = None,
    kind_col: str = "kind",
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(category, url, seq): every unprocessable row, categorized, with
    ``seq`` = its 1-based alphabetical position within the category.

    ``changed_ids`` is a one-column (``doc_id``) DataFrame of rows whose
    source changed since the pipeline's snapshot (reference F6) — on
    Iceberg this is the id-diff of two snapshots; callers without change
    tracking pass None.
    """
    basename = F.element_at(F.split(url_col, "/"), -1)
    has_kind = kind_col in pages.columns

    cat = F.when(basename.isin(list(IGNORE_BASENAMES)), F.lit("ignored"))
    if has_kind:
        cat = cat.when(
            F.col(kind_col) == "redirect", F.lit("redirect")
        ).when(F.col(kind_col) != "page", F.col(kind_col))
    if changed_ids is not None:
        marked = pages.join(
            changed_ids.select(F.col(id_col).alias("__chg")).distinct(),
            pages[id_col] == F.col("__chg"),
            "left",
        )
        cat = cat.when(F.col("__chg").isNotNull(), F.lit("changed"))
    else:
        marked = pages
    cat = cat.when(F.col(text_col).isNull(), F.lit("unreadable"))

    rows = (
        marked.select(F.col(url_col), cat.alias("category"))
        .filter(F.col("category").isNotNull())
    )
    return _global_seq(rows, part_col="category", order_col=url_col)


def _global_seq(rows: DataFrame, part_col: str, order_col: str) -> DataFrame:
    """(part_col, order_col, seq): 1-based global position of each row
    within its ``part_col`` group ordered by ``order_col`` — WITHOUT the
    single-reducer ``row_number() OVER (PARTITION BY part)`` window, which
    funnels a whole category (corpus-sized for 'unreadable' at web scale)
    through one task's sort.

    Two-phase prefix-offset numbering (the distributed analog of
    ``zipWithIndex``): range-partition on (part, order) — frozen with an
    eager localCheckpoint so the sampled range boundaries cannot differ
    between the two consuming jobs — then number WITHIN each (physical
    partition, part) slice (bounded by partition size, parallel across
    the cluster), collect the tiny per-(partition, part) count matrix
    (O(shuffle_partitions × categories) rows), and broadcast the
    cumulative offsets back. Range partitioning guarantees every row of a
    part in partition p orders before every row of the same part in
    partition p+1, so offset + local rank is the exact global rank.
    """
    spark = rows.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = rows.repartitionByRange(n_parts, part_col, order_col).localCheckpoint(
        eager=True
    )
    pid = parts.withColumn("__pid", F.spark_partition_id())
    counts = pid.groupBy("__pid", part_col).agg(F.count(F.lit(1)).alias("n")).collect()
    offs: list[tuple[int, str, int]] = []
    running: dict[str, int] = {}
    for r in sorted(counts, key=lambda r: (r[part_col], r["__pid"])):
        offs.append((r["__pid"], r[part_col], running.get(r[part_col], 0)))
        running[r[part_col]] = running.get(r[part_col], 0) + r["n"]
    part_type = rows.schema[part_col].dataType.simpleString()
    # pandas → Arrow: the tuple-list path evaluates through a pickled
    # python-RDD job on every downstream action (guide §6)
    import pandas as pd

    off_df = spark.createDataFrame(
        pd.DataFrame(offs, columns=["__pid", part_col, "__off"], dtype=object),
        f"__pid int, {part_col} {part_type}, __off long",
    )
    w = Window.partitionBy("__pid", part_col).orderBy(order_col)
    return (
        pid.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off_df), ["__pid", part_col])
        .select(
            part_col, order_col, (F.col("__rn") + F.col("__off")).alias("seq")
        )
    )
