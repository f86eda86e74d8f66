"""Gopher-style repetition filters (training-pipeline operator).

Excessively repetitious documents (scraper loops, keyword-stuffed spam,
boilerplate-heavy listings) are the single most common pathology LLM
corpus pipelines filter before training; the public reference is the
repetition-filter family of Rae et al. 2021 ("Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A1.1):
duplicate-line fractions, duplicate-n-gram fractions, and the character
share of the single most frequent n-gram.

Scale story — ZERO shuffles. Every metric here is a per-row expression
over the document's own token/line/n-gram arrays (split / slice /
array_sort / aggregate higher-order functions), so the whole operator is
one narrow projection: map-only over 100 TB, whole-stage codegen, no
exchange, no UDF. Duplicate counting uses the sorted-run idiom —
``array_sort`` then a single ``aggregate`` pass that tracks the current
run of equal elements — which is O(n log n) per document instead of the
O(n²) count-each-distinct-element form.

Exact semantics (documented because the DuckDB oracle recomputes them
independently via unnest + GROUP BY, not via this implementation):

- tokens = ``split(trim(text), '[ \\t\\n\\x0b\\f\\r]+')`` (the engine /
  oracle shared whitespace class, see :mod:`textstats`); lines =
  ``split(text, '\\n')``.
- ``dup_word_frac`` / ``dup_line_frac`` / ``dup_{n}gram_frac``: fraction
  of occurrences that are repeats of an earlier occurrence, i.e.
  ``1 - n_distinct / n_total`` (0 when the array is empty).
- ``dup_line_char_frac``: characters in repeat occurrences of a line
  (every occurrence after a line's first) / characters in all lines.
- ``top_{n}gram_char_frac``: over all n-grams g, ``max(count(g) *
  chars(g)) / chars(text)`` — the character share covered by the
  heaviest n-gram (count-times-length weighting makes the maximum
  well-defined with no tie-breaking rule; Gopher's "most frequent
  n-gram" is ambiguous under count ties).
- Documents shorter than n tokens have no n-grams: their n-gram metrics
  are 0.0.

Reference parity: finddup's reference has no text-quality tier; this
module extends SURVEY.md §2.8's training-data operator set alongside
textstats.py / boilerplate.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finddup_spark.functions.textstats import _WSP


def _tokens(text: Column) -> Column:
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, _WSP)
    )


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def _ngrams(toks: Column, n: int) -> Column:
    """Overlapping n-token grams joined by single spaces; empty array when
    the document has fewer than n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_frac(arr: Column) -> Column:
    """1 - distinct/total over an array (0 for empty) — the repeat share
    of occurrences. Pure array expression, no shuffle."""
    n = F.size(arr)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(arr)) / n
    ).otherwise(F.lit(0.0))


def _sorted_run_agg(arr: Column, zero: Column, step) -> Column:
    """Single-pass fold over ``array_sort(arr)`` with a
    (prev, run, acc) struct accumulator: ``run`` is the length of the
    current run of equal elements INCLUDING the current one, and ``step``
    maps (acc, elem, run) -> new acc. Equal elements are adjacent after
    the sort, so per-element group statistics need no shuffle and no
    O(n²) rescans."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            zero.alias("acc"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(a.prev.isNotNull() & (a.prev == x), a.run + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            step(
                a.acc,
                x,
                F.when(a.prev.isNotNull() & (a.prev == x), a.run + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("acc"),
        ),
        lambda a: a.acc,
    )


def dup_char_frac(arr: Column) -> Column:
    """Characters in repeat occurrences (run position >= 2) / characters
    in all elements (0 when no characters)."""
    dup_chars = _sorted_run_agg(
        arr,
        F.lit(0).cast("long"),
        lambda acc, x, run: acc + F.when(run >= 2, F.length(x)).otherwise(F.lit(0)),
    )
    total = F.aggregate(
        arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return F.when(total > 0, dup_chars / total).otherwise(F.lit(0.0))


def top_gram_weight(grams: Column) -> Column:
    """max over grams of count(gram) * chars(gram) — the character mass
    of the heaviest gram (0 for an empty array). Within a sorted run the
    weight run*length(x) is maximal at the run's last element, so taking
    the running greatest at every element is exact."""
    return _sorted_run_agg(
        grams,
        F.lit(0).cast("long"),
        lambda acc, x, run: F.greatest(acc, run * F.length(x)),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_ngram_n: int = 5,
    top_ngram_ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Per-document repetition metrics (see module docstring for exact
    semantics): ``(doc_id, n_tokens, n_lines, dup_word_frac,
    dup_line_frac, dup_line_char_frac, dup_{dup_ngram_n}gram_frac,
    top_{n}gram_char_frac ...)``. One map-only projection — the intended
    100 TB plan: no exchange anywhere, every metric a codegen'd array
    expression."""
    c = F.col(text_col)
    toks = _tokens(c)
    lines = _lines(c)
    text_chars = F.length(c)
    cols = [
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(lines).cast("long").alias("n_lines"),
        F.round(dup_frac(toks), 6).alias("dup_word_frac"),
        F.round(dup_frac(lines), 6).alias("dup_line_frac"),
        F.round(dup_char_frac(lines), 6).alias("dup_line_char_frac"),
        F.round(dup_frac(_ngrams(toks, dup_ngram_n)), 6).alias(
            f"dup_{dup_ngram_n}gram_frac"
        ),
    ]
    for n in top_ngram_ns:
        cols.append(
            F.round(
                F.when(
                    text_chars > 0, top_gram_weight(_ngrams(toks, n)) / text_chars
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"top_{n}gram_char_frac")
        )
    return docs.filter(c.isNotNull()).select(*cols)
