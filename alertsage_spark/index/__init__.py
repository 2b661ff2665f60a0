from alertsage_spark.index.build import InvertedIndex, build_index  # noqa: F401
