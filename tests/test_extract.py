"""Extractor byte-identity (SURVEY.md §5.2-3, input_hint invariant)."""

import pandas as pd

from finddup_spark.corpus import generate_pages
from finddup_spark.extract import extract_text, extract_text_series, render_html


def test_roundtrip_simple():
    text = "hello world\n\nsecond para with <tags> & \"quotes\" and 'apostrophes'"
    assert extract_text(render_html(text, "t")) == text


def test_roundtrip_entity_lookalikes():
    # literal entity text must survive escape→unescape exactly once
    text = "literal &amp; and &lt;b&gt; entities\n\n&quot;quoted&quot;"
    assert extract_text(render_html(text)) == text


def test_error_inputs():
    assert extract_text(None) is None
    assert extract_text(b"\xff\xfenot utf8 at all \xff") is None
    assert extract_text(b"<html>no body tags</html>") is None


def test_vectorized_matches_reference_over_corpus():
    pages, _ = generate_pages(300, 7)
    ref = pages.html.map(extract_text)
    vec = extract_text_series(pages.html)
    for i, (a, b) in enumerate(zip(ref, vec)):
        assert (a is None and (b is None or b != b)) or a == b, f"row {i}"


def test_vectorized_matches_ground_truth_text():
    pages, truth = generate_pages(300, 11)
    ok = pages.text.notna()
    vec = extract_text_series(pages.html)
    assert (vec[ok] == pages.text[ok]).all()
    # error rows extract to null
    assert vec[~ok].isna().all()
