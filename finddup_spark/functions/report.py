"""Report-side scalar helpers (SURVEY.md §2.8 C1/C2).

The reference formats sizes with ``num2eng`` (k=1024 suffixes,
``finddup.py:90-116``) and prints paths relative to ``master_root``
(``finddup.py:1118-1139``). These are column-expression equivalents so
reports can be produced distributed-side."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNITS = ["", "k", "M", "G", "T", "P"]


def human_bytes(col: str | Column) -> Column:
    """num2eng analog: '12.3 k' / '4.0 M' style, k=1024 (finddup.py:90-116)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    # largest unit as the fallback, then nested when() from the top down
    i_last = len(_UNITS) - 1
    result = F.concat(
        F.round(c / F.lit(float(1024**i_last)), 1).cast("string"),
        F.lit(f" {_UNITS[i_last]}"),
    )
    for i in range(i_last - 1, -1, -1):
        result = F.when(
            c < F.lit(float(1024 ** (i + 1))),
            F.concat(
                F.round(c / F.lit(float(1024**i)), 1).cast("string"),
                F.lit(f" {_UNITS[i]}"),
            ),
        ).otherwise(result)
    return F.rtrim(result)


def rel_path(col: str | Column, root: str) -> Column:
    """C2: path relative to the report root (finddup.py:1118-1139)."""
    c = F.col(col) if isinstance(col, str) else col
    prefix = root if root.endswith("/") else root + "/"
    escaped = prefix.replace("\\", "\\\\").replace(".", r"\.")
    return F.regexp_replace(c, "^" + escaped, "")
