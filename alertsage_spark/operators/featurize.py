"""Hybrid featurization pipeline (SURVEY §2.9 M13) + sparse⊕dense
feature fusion (M7).

The reference's production model path is an sklearn ColumnTransformer:
TF-IDF over the cleaned narrative ⊕ OneHot over categoricals ⊕ scaled
numerics, hstacked into one CSR matrix
(/root/reference/notebooks/10_advanced_model_comparison.ipynb cells
12,30; /root/reference/src/triage/cli.py:1234-1246 sparse hstack).

Spark-first analog with pyspark.ml:

    tokenize (shared spec tokenizer, train/infer parity)
      -> HashingTF -> IDF                  [sparse text features]
    StringIndexer -> OneHotEncoder         [per categorical column]
    VectorAssembler(numerics) -> StandardScaler(std only)
      -> VectorAssembler over ALL of them  [M7: sparse⊕dense fusion —
                                            Spark keeps the result
                                            sparse exactly like the
                                            reference's hstack(csr)]

Scale: every stage is a distributed transform; the only fit-time
aggregations are IDF's document-frequency vector (one treeAggregate),
StringIndexer's value counts, and the scaler's variance — all bounded
by vocabulary/cardinality, not corpus size. HashingTF avoids a
vocabulary shuffle entirely (feature hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertsage_spark.tokenizer import tokenize_col


def hybrid_features(
    docs: DataFrame,
    text_col: str = "text",
    cat_cols: tuple[str, ...] = ("lang", "source"),
    num_cols: tuple[str, ...] = ("n_chars",),
    n_text_features: int = 1 << 12,
):
    """Returns (transformed DataFrame with a `features` vector column,
    fitted PipelineModel). Column order of the fused vector:
    [tfidf | onehot(cat_1) | ... | scaled numerics]."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import (
        IDF,
        HashingTF,
        OneHotEncoder,
        StandardScaler,
        StringIndexer,
        VectorAssembler,
    )

    base = docs.withColumn("_toks", tokenize_col(F.col(text_col)))
    stages = []
    fused_inputs = ["_tfidf"]
    stages.append(HashingTF(inputCol="_toks", outputCol="_tf", numFeatures=n_text_features))
    stages.append(IDF(inputCol="_tf", outputCol="_tfidf"))
    for c in cat_cols:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"_{c}_idx", handleInvalid="keep")
        )
        stages.append(OneHotEncoder(inputCols=[f"_{c}_idx"], outputCols=[f"_{c}_oh"]))
        fused_inputs.append(f"_{c}_oh")
    if num_cols:
        stages.append(VectorAssembler(inputCols=list(num_cols), outputCol="_num"))
        stages.append(
            StandardScaler(inputCol="_num", outputCol="_num_scaled", withMean=False)
        )
        fused_inputs.append("_num_scaled")
    # M7 fusion: VectorAssembler concatenates sparse and dense inputs
    # into one (sparse) vector — the reference's hstack([tfidf_csr,
    # onehot, scaled]) (cli.py:1234-1246)
    stages.append(VectorAssembler(inputCols=fused_inputs, outputCol="features"))
    model = Pipeline(stages=stages).fit(base)
    return model.transform(base), model


def feature_stats(transformed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_features, nnz, l2 rounded) — a stable scalar projection of
    the fused vector for checks and the driver's rows-only harness."""
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("features"))
    return transformed.select(
        F.col(id_col),
        F.size(arr).alias("n_features"),
        F.aggregate(
            arr, F.lit(0), lambda a, x: a + F.when(x != 0.0, 1).otherwise(0)
        ).alias("nnz"),
        F.round(
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("l2"),
    )
