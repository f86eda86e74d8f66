"""finddup_spark — a PySpark-native web-scale near-duplicate detection engine.

A from-scratch re-expression of the capabilities of ``itsayellow/finddup``
(reference at /root/reference, v0.4.0) for Common-Crawl-style web pages:

- exact-duplicate clustering (generalizes finddup's size-block + progressive
  byte-compare, ``finddup.py:810-917`` + ``finddup.py:388-568``) via
  length-blocking + sha256 grouping + in-group min/max verification;
- site-subtree (directory) duplicate rollup (``finddup.py:571-627``,
  ``finddup.py:1049-1116``) via depth-wise sorted-child-signature hashing;
- fuzzy tiers the reference never had: k-shingle MinHash + LSH banding,
  SimHash, winnowing fingerprints + suffix-array substring matching,
  connected-components cluster resolution;
- training-data-pipeline operators: dedup family (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), ANN similarity search,
  text quality stats, language id, multimodal binary-column plumbing.

Everything is DataFrame-API + vectorized Arrow/pandas UDFs; no RDDs, no
per-row Python in hot paths. See SURVEY.md for the operator-by-operator
mapping to the reference.
"""

__version__ = "0.1.0"
