"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship BM25 query over sf0.001 documents.
queries()     -> one (spark, sf_dir) callable per implemented operator
                 family from SURVEY.md §2 (see alertsage_spark/catalog.py).
oracle_sql()  -> matching DuckDB SQL for every SQL-expressible entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from alertsage_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 for the 18
    reference scenario queries over the documents corpus."""
    return catalog.ft_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
