"""Deterministic synthetic corpora (pure Spark expressions, no external
data, identical content at any parallelism — safe for scaling runs).

The driver fixture corpus (testdata documents.parquet) has a tiny, flat
vocabulary: median df is ~77% of n_docs, i.e. every term is a stop word.
That is the one distribution where block-max pruning can never win, so
benchmarking WAND there only measures overhead. `zipf_corpus` provides
the realistic complement: a Zipf(1) vocabulary (p(rank) ~ 1/rank via the
inverse-CDF rank = floor(V^u)), giving genuinely selective tail terms —
the workload profile block-max indexes exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 1000003  # prime modulus for the xxhash64 -> uniform(0,1) step


def zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 30_000,
    doclen: int = 60,
    seed: int = 7,
    n_partitions: int = 64,
) -> DataFrame:
    """documents(doc_id, text) with Zipf(1)-distributed tokens t1..tV.

    Token for (doc i, slot j) = 't' + floor(V^u) with
    u = (xxhash64(i, j, seed) mod M)/M — deterministic in (i, j, seed),
    independent of partitioning, all JVM-side expressions.
    """
    j = F.sequence(F.lit(1), F.lit(doclen))

    def tok(jj):
        u = F.pmod(F.xxhash64(F.col("id"), jj, F.lit(seed)), F.lit(_M)) / float(_M)
        return F.concat(
            F.lit("t"), F.floor(F.pow(F.lit(float(vocab)), u)).cast("long").cast("string")
        )

    return (
        spark.range(n_docs)
        .repartition(n_partitions)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.transform(j, tok)).alias("text"),
        )
    )


def zipf_needle_queries(n: int = 12) -> list[tuple[str, str]]:
    """Rare-tail + stop-head query mix — the canonical WAND workload:
    two selective terms (df ~ 40-120 at 160k docs) plus the two most
    common terms (df ~ n_docs)."""
    return [
        (f"Z{i}", f"t{20000 + i * 37} t{12000 + i * 11} t1 t2") for i in range(n)
    ]


_CAMEL_IDENTS = [
    "parseConfig", "readBuffer", "flushQueue", "deltaEncode", "blockMaxWand",
    "mergeSegments", "topKScore", "postingList", "shardRouter", "tokenFilter",
    "queryPlanner", "indexWriter", "segmentMerge", "scoreAccumulator",
    "docIdCodec", "termStats",
]
_SNAKE_IDENTS = [
    "read_buffer", "flush_queue", "delta_encode", "block_max", "merge_runs",
    "top_k", "posting_list", "shard_id", "token_norm", "query_plan",
    "index_dir", "segment_row", "score_sum", "doc_len", "term_df", "avg_dl",
]
_CODE_WORDS = [
    "return", "import", "def", "class", "for", "while", "if", "else",
    "index", "query", "score", "merge", "block", "term", "partition",
]
_LANGS = ["python", "java", "scala", "go", "rust"]


def code_corpus(
    spark: SparkSession,
    n_docs: int,
    doclen: int = 80,
    seed: int = 11,
    n_partitions: int = 64,
) -> DataFrame:
    """North-rule-shaped (repo, path, commit, lang, content) corpus at
    bench scale — code-like content (camelCase + snake_case identifiers,
    a ~30%-hot skew term), generated DISTRIBUTED from pure expressions
    (xxhash64-driven choices), deterministic in (doc index, seed) and
    independent of partitioning."""
    camel = F.array(*[F.lit(w) for w in _CAMEL_IDENTS])
    snake = F.array(*[F.lit(w) for w in _SNAKE_IDENTS])
    words = F.array(*[F.lit(w) for w in _CODE_WORDS])
    langs = F.array(*[F.lit(w) for w in _LANGS])
    j = F.sequence(F.lit(1), F.lit(doclen))

    def pick(arr, n, jj, salt):
        i = F.pmod(F.xxhash64(F.col("id"), jj, F.lit(seed + salt)), F.lit(n))
        return F.element_at(arr, (i + 1).cast("int"))

    def suffix(jj, salt):
        # long-tail identifier space (16 stems x 500 suffixes): real
        # codebases have selective identifiers, not 16 global ones —
        # this is what makes identifier queries the WAND needle case
        # while the shared trigrams stay flat
        return F.pmod(F.xxhash64(F.col("id"), jj, F.lit(seed + salt)), F.lit(500)).cast(
            "string"
        )

    def tok(jj):
        u = F.pmod(F.xxhash64(F.col("id"), jj, F.lit(seed)), F.lit(1000))
        return (
            F.when(u < 300, F.lit("spark"))  # hot term -> skew path
            .when(u < 550, F.concat(pick(camel, len(_CAMEL_IDENTS), jj, 1), suffix(jj, 4)))
            .when(u < 800, F.concat(pick(snake, len(_SNAKE_IDENTS), jj, 2), F.lit("_"), suffix(jj, 5)))
            .otherwise(pick(words, len(_CODE_WORDS), jj, 3))
        )

    return (
        spark.range(n_docs)
        .repartition(n_partitions)
        .select(
            F.concat(
                F.lit("org"), F.pmod(F.col("id"), F.lit(7)).cast("string"),
                F.lit("/repo"), F.pmod(F.col("id"), F.lit(13)).cast("string"),
            ).alias("repo"),
            F.concat(
                F.lit("src/module_"), F.pmod(F.col("id"), F.lit(11)).cast("string"),
                F.lit("/file_"), F.col("id").cast("string"), F.lit(".py"),
            ).alias("path"),
            F.sha2(F.col("id").cast("string"), 256).alias("commit"),
            F.element_at(
                langs, (F.pmod(F.col("id"), F.lit(len(_LANGS))) + 1).cast("int")
            ).alias("lang"),
            F.concat_ws(" ", F.transform(j, tok)).alias("content"),
        )
    )
