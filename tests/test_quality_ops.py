"""Gopher-style repetition filters + benchmark decontamination.

Hand-computed expectations for every repetition metric (the DuckDB
driver oracle recomputes the same semantics independently via unnest +
GROUP BY; here the values themselves are pinned), plus the
hashed-vs-string parity proof for the contamination production path.
"""

import pytest
from pyspark.sql import functions as F

from finddup_spark.functions.repetition import repetition_stats
from finddup_spark.operators.contamination import (
    benchmark_grams,
    contamination_check,
)


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_repetition_stats_hand_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b c"),
            (2, "x y z"),
            (3, ""),
            (4, "l1\nl1\nl2 tail"),
            (5, None),
            (6, "w"),
        ],
        "doc_id long, text string",
    )
    got = _rows(repetition_stats(docs))
    assert set(got) == {1, 2, 3, 4, 6}  # null text filtered

    d1 = got[1]
    # 7 tokens, 3 distinct -> 1 - 3/7
    assert d1["n_tokens"] == 7 and d1["dup_word_frac"] == pytest.approx(1 - 3 / 7, abs=1e-6)
    # 2-grams: 'a b' x3 (len 3) -> 9 chars of 13
    assert d1["top_2gram_char_frac"] == pytest.approx(9 / 13, abs=1e-6)
    # 3-grams: 'a b a' x2 (len 5) -> 10 of 13
    assert d1["top_3gram_char_frac"] == pytest.approx(10 / 13, abs=1e-6)
    # all three 5-grams distinct
    assert d1["dup_5gram_frac"] == 0.0

    d4 = got[4]
    # tokens split on the whitespace class crosses lines: l1 l1 l2 tail
    assert d4["n_tokens"] == 4 and d4["dup_word_frac"] == pytest.approx(0.25, abs=1e-6)
    # lines: l1 / l1 / 'l2 tail' -> 1 dup of 3
    assert d4["n_lines"] == 3 and d4["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # repeat occurrence chars: second 'l1' (2) over all line chars (11)
    assert d4["dup_line_char_frac"] == pytest.approx(2 / 11, abs=1e-6)
    # heaviest 2-gram 'l2 tail' (7 chars) over 13 text chars
    assert d4["top_2gram_char_frac"] == pytest.approx(7 / 13, abs=1e-6)

    # degenerate docs: all-zero metrics, no crashes
    for k in (3, 6):
        for m in (
            "dup_word_frac",
            "dup_line_frac",
            "dup_line_char_frac",
            "dup_5gram_frac",
            "top_2gram_char_frac",
            "top_3gram_char_frac",
        ):
            assert got[k][m] == 0.0, (k, m)


def test_repetition_stats_flags_degenerate_doc(spark):
    """The filter's purpose: a scraper-loop document lights up every
    metric while normal prose stays low."""
    loop = " ".join(["buy cheap pills now"] * 50)
    prose = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, loop), (2, prose)], "doc_id long, text string"
    )
    got = _rows(repetition_stats(docs))
    assert got[1]["dup_word_frac"] > 0.9 and got[1]["dup_5gram_frac"] > 0.9
    assert got[1]["top_2gram_char_frac"] > 0.3
    assert got[2]["dup_word_frac"] == 0.0 and got[2]["dup_5gram_frac"] == 0.0


def test_repetition_stats_is_map_only(spark):
    """The 100 TB contract: one narrow projection, no exchange."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_contamination_check_hand_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "q w e r t y u i o p"),  # contains the benchmark gram
            (2, "q w e r t y u j o p"),  # one token off -> clean
            (3, "e r t y u i o p tail x"),  # shares the shifted window
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "q w e r t y u i")], "bid long, text string"
    )
    got = _rows(contamination_check(docs, bench, n=8))
    assert got[1]["is_contaminated"] is True and got[1]["n_contaminated"] == 1
    assert got[2]["is_contaminated"] is False
    # doc 3's grams are shifted windows, none equal to the bench gram
    assert got[3]["is_contaminated"] is False
    # per-doc distinct gram counts: 10 tokens -> 3 overlapping 8-grams
    assert got[1]["n_grams"] == 3


def test_contamination_short_doc_whole_text_gram(spark):
    """A doc (or bench prompt) under n tokens contaminates via its
    whole-text gram — verbatim short copies are still caught."""
    docs = spark.createDataFrame(
        [(1, "tiny prompt"), (2, "other text")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(1, "tiny prompt")], "bid long, text string")
    got = _rows(contamination_check(docs, bench, n=8))
    assert got[1]["is_contaminated"] is True
    assert got[2]["is_contaminated"] is False


def test_contamination_hashed_matches_string(spark, tiny_corpus):
    """Production path (xxhash64 grams through every shuffle) must equal
    the collision-free string form the SQL oracle recomputes."""
    from finddup_spark.sources.tables import load_pages

    docs = load_pages(spark, tiny_corpus[0]).filter(
        "text is not null"
    ).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    bench = (
        docs.filter(F.col("text").isNotNull() & (F.col("doc_id") % 7 == 0))
        .select(F.array_join(F.slice(toks, 2, 8), " ").alias("text"))
    )
    h = contamination_check(docs, bench, n=8, hashed=True).orderBy("doc_id").collect()
    s = contamination_check(docs, bench, n=8, hashed=False).orderBy("doc_id").collect()
    assert h == s
    assert any(r.is_contaminated for r in h)  # non-vacuous


def test_benchmark_grams_distinct_and_broadcastable(spark):
    bench = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h i")],
        "bid long, text string",
    )
    g = benchmark_grams(bench, n=8)
    # 9 tokens -> 2 windows, duplicated suite rows collapse
    assert g.count() == 2


def test_space_shingle_kernel_edge_parity(spark):
    """The hashed-path numpy shingle kernel must reproduce the string
    path's OUTPUT on adversarial split(" ") semantics: runs of spaces
    (empty tokens), leading/trailing spaces, docs shorter than k, empty
    text, embedded newlines (NOT separators for split(" ")), NUL-byte
    tokens, unicode, and within-doc duplicate grams."""
    import pandas as pd

    from finddup_spark.operators.boilerplate import boilerplate_ratio

    rows = [
        (0, "w1 w2 w3 w4 w5 w6 w7"),
        (1, "a  b c d e f"),          # double space -> empty token
        (2, "short doc"),             # < k tokens
        (3, ""),                      # empty text -> one empty token
        (4, " "),                     # two empty tokens
        (5, "a b c d e"),             # exactly k
        (6, "a b c d e"),             # duplicate doc -> identical grams
        (7, "x\ny z w v u t"),        # newline stays inside a token
        (8, "unicode é ü 漢字 tok six seven"),
        (9, "rep rep rep rep rep rep rep rep"),  # within-doc dup grams
        (10, "\x00 b c d e f"),       # NUL-byte token
        (11, "a b c d e f "),         # trailing space -> empty token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = (
        boilerplate_ratio(docs, k=5, min_df=2, hashed=True)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        boilerplate_ratio(docs, k=5, min_df=2, hashed=False)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # non-vacuous: the duplicate docs share df>=2 grams
    assert a.set_index("doc_id").loc[5, "n_boiler"] > 0
