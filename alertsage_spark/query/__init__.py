from alertsage_spark.query.bm25 import bm25_topk  # noqa: F401
