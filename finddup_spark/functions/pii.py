"""PII detection + scrubbing for training-data pipelines — built-ins only.

Before web text reaches a training corpus it passes a PII pass: detect
and redact e-mail addresses, bare IPv4 addresses, and E.164-style phone
numbers. All three detectors are single regexes in the RE2-compatible
subset (no lookaround), evaluated JVM-side via ``regexp_count`` /
``regexp_replace`` — whole-stage codegen, no Python in the hot path, and
the DuckDB oracle runs the byte-identical patterns.

Pattern notes (shared verbatim with the oracle):

- e-mail: the pragmatic ``local@domain.tld`` matcher (no RFC 5322
  quoting — real pipelines use the same approximation);
- IPv4: four 1-3 digit octets with word boundaries; octet range
  (0-255) is NOT validated — a regex range check triples the pattern
  and scrubbing 999.999.999.999 is harmless;
- phone: ``+`` followed by 9-15 digits (E.164 ceiling), word-bounded
  so a ``+`` inside an equation with >8 trailing digits still matches
  (acceptable for a redactor — recall beats precision).

Redaction replaces each match with a fixed tag, longest-pattern first
(e-mail before phone: an e-mail's local part may contain digits but a
phone match cannot contain ``@``; IP last — an IP can never overlap an
already-inserted tag).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: shared verbatim with the DuckDB oracle (RE2-compatible, no lookaround)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{9,15}\b"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(text: str | Column = "text") -> list[Column]:
    """[n_emails, n_ipv4, n_phones] match-count columns for one text."""
    t = _col(text)
    return [
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    ]


def scrub_pii(text: str | Column = "text") -> Column:
    """Text with every PII match replaced by its tag (see module
    docstring for the replacement order)."""
    t = _col(text)
    t = F.regexp_replace(t, EMAIL_RE, EMAIL_TAG)
    t = F.regexp_replace(t, PHONE_RE, PHONE_TAG)
    t = F.regexp_replace(t, IPV4_RE, IPV4_TAG)
    return t
