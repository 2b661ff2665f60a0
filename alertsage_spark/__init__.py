"""alertsage_spark — a PySpark-native full-text index + BM25 query engine.

Re-expresses the query and data-processing capabilities of the reference
(texasbe2trill/AlertSage, studied read-only at /root/reference) as an
idiomatic Spark engine: code-aware tokenization, inverted-index build with
delta+varbyte compressed posting blocks and block-max metadata, segment
manifest checkpoint/resume, BM25 (k1=1.2, b=0.75) top-k retrieval with a
block-max WAND scorer, plus the reference's relational analytics surface
(filters, joins, aggregations, window ranks, top-k, set ops) and the
training-data-pipeline operators (dedup, similarity search, text stats).

Nothing here is a port: the reference is a single-process sklearn/SQLite
notebook tool; this engine is DataFrame/SQL/Arrow-UDF-first and designed
for multi-executor clusters over ~100 TB corpora.
"""

__version__ = "0.2.0"

from alertsage_spark.session import get_spark  # noqa: F401
