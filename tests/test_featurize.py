"""M13 hybrid featurization / M7 fusion shape + determinism tests."""

from __future__ import annotations

from alertsage_spark.operators.featurize import feature_stats, hybrid_features

SF_DIR = "/root/testdata/sf0.001"


def test_hybrid_features_shape_and_fusion(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out, model = hybrid_features(docs)
    stats = feature_stats(out).collect()
    assert len(stats) == docs.count()
    n_lang = docs.select("lang").distinct().count()
    n_src = docs.select("source").distinct().count()
    # fused width = tfidf(4096) + onehot(lang) + onehot(source) + 1 numeric
    # (StringIndexer handleInvalid="keep" adds one bucket; OneHotEncoder
    # dropLast=True removes one -> net n categories per column)
    expect = 4096 + n_lang + n_src + 1
    widths = {r["n_features"] for r in stats}
    assert widths == {expect}, (widths, expect)
    for r in stats:
        # every row has text tokens + exactly 2 onehot bits + 1 numeric
        assert r["nnz"] >= 3
        assert r["l2"] > 0.0


def test_hybrid_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, feature_stats(hybrid_features(docs)[0]).collect()))
    b = sorted(map(tuple, feature_stats(hybrid_features(docs)[0]).collect()))
    assert a == b
