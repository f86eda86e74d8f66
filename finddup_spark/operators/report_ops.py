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

    w = Window.partitionBy("category").orderBy(url_col)
    return (
        marked.select(F.col(url_col), cat.alias("category"))
        .filter(F.col("category").isNotNull())
        .withColumn("seq", F.row_number().over(w))
        .select("category", url_col, "seq")
    )
