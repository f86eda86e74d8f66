"""Deterministic HTML -> text extraction.

The reference reads raw file bytes (``finddup.py:263, 337``) — it has no
extractor. The web-scale input contract (BASELINE.json ``input_hint``)
instead carries ``html: binary`` and requires ``extract_text(html)`` to be
**byte-identical per url** between:

- :func:`extract_text` — the single-process pure-Python reference
  extractor (this repo's stand-in for "the reference extractor"), and
- :func:`extract_text_series` — the pandas/Arrow vectorized path used by
  the Spark pipeline (wrapped as a pandas UDF in
  ``finddup_spark.functions.signatures``).

Both operate on the deterministic template produced by
:func:`render_html`; the byte-identity is pytest-enforced
(tests/test_extract.py), per SURVEY.md §5.2-3.
"""

from __future__ import annotations

import re

import pandas as pd

_BODY_RE = re.compile(r"<body>(.*)</body>", re.DOTALL)
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)

# html.escape(quote=True) produces exactly these five entities.
_UNESCAPES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&amp;", "&"),  # must run LAST so "&amp;lt;" -> "&lt;" (not "<")
]


def _escape(s: str) -> str:
    s = s.replace("&", "&amp;")
    s = s.replace("<", "&lt;").replace(">", "&gt;")
    s = s.replace('"', "&quot;").replace("'", "&#x27;")
    return s


def render_html(text: str, title: str = "") -> bytes:
    """Deterministic page template: one ``<p>`` per ``\\n\\n`` paragraph."""
    paras = text.split("\n\n")
    body = "\n".join(f"<p>{_escape(p)}</p>" for p in paras)
    return (
        "<html><head><meta charset=\"utf-8\"/><title>"
        + _escape(title)
        + "</title></head><body>"
        + body
        + "</body></html>"
    ).encode("utf-8")


def extract_text(html: bytes | None) -> str | None:
    """Pure-Python reference extractor. None/garbage -> None (error row →
    lineage, the analog of the reference's OSError path finddup.py:144-149).
    """
    if html is None:
        return None
    try:
        doc = html.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        return None
    m = _BODY_RE.search(doc)
    if m is None:
        return None
    paras = _P_RE.findall(m.group(1))
    out = []
    for p in paras:
        for ent, ch in _UNESCAPES:
            p = p.replace(ent, ch)
        out.append(p)
    return "\n\n".join(out)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor over an Arrow batch of html binaries.

    Uses pandas C-level ``.str`` ops end-to-end (decode, regex extract,
    findall-join, chained entity replaces) — no per-row Python loop. The
    output must equal ``html.map(extract_text)`` byte-for-byte.
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    body = s.str.extract(_BODY_RE, expand=False)
    paras = body.str.findall(_P_RE)
    joined = paras.map(lambda ps: "\n\n".join(ps) if isinstance(ps, list) else None)
    for ent, ch in _UNESCAPES:
        joined = joined.str.replace(ent, ch, regex=False)
    # non-utf8 inputs: extract_text returns None; replicate by checking
    # whether a strict decode succeeds (vectorized via try-decode once).
    def _strict_ok(b: bytes | None) -> bool:
        if b is None:
            return False
        try:
            b.decode("utf-8")
            return True
        except UnicodeDecodeError:
            return False

    ok = html.map(_strict_ok)
    joined = joined.where(ok, None)
    return joined
