"""Inverted-index construction as declarative DataFrame plans.

Replaces the reference's sklearn ``TfidfVectorizer.fit/transform`` forward
index (/root/reference/src/triage/model.py:31-44, config
notebooks/02_prepare_text_and_features.ipynb cell 9) with a term->postings
inverted index:

    docs(doc_id, content)
      -> tokens     (doc_id, toks array<string>)          [pure SQL expr]
      -> doclen     (doc_id, dl)                          [no shuffle]
      -> postings   (term, doc_id, tf)                    [1 shuffle: groupBy]
      -> termstats  (term, df, cf)                        [partial agg free]
      -> corpus     N, avgdl                              [scalar agg]

Scale notes (100 TB / 10^12 docs):
  * the explode+groupBy(term, doc_id) is the only wide shuffle in the
    build; Catalyst's partial aggregation combines map-side so the shuffle
    carries (term, doc_id, partial_tf), not raw token occurrences.
  * termstats is a second agg over the already term-partitioned postings,
    so AQE reuses the partitioning (no extra full shuffle of raw data).
  * doc lengths never shuffle: computed per-row from the token array.
  * hot-term skew is defused downstream at segment build via salting
    (see segments.py); AQE skew-join is the runtime fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertsage_spark.tokenizer import tokenize_col

K1 = 1.2
B = 0.75


def idf_col(df_col, n_docs: int):
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)).

    Always positive; identical formula in the Python oracle
    (query/oracle.py) and the DuckDB SQL oracle (__spark_entry__).
    """
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


@dataclass
class InvertedIndex:
    """Handles to the logical index tables (lazily evaluated DataFrames).

    ``cache()`` pins them for multi-query sessions; ``save()/load``
    round-trips through parquet (the segment/manifest format with varbyte
    compression lives in segments.py — this class is the uncompressed
    relational view used by the exact join+agg scorer).
    """

    doclen: DataFrame  # (doc_id long, dl long)
    postings: DataFrame  # (term string, doc_id long, tf long)
    termstats: DataFrame  # (term string, df long, cf long)
    n_docs: int
    avgdl: float
    mode: str = "text"  # tokenizer mode; query_terms must reuse it

    def cache(self) -> "InvertedIndex":
        self.doclen.cache()
        self.postings.cache()
        self.termstats.cache()
        return self

    def unpersist(self) -> None:
        for d in (self.doclen, self.postings, self.termstats):
            d.unpersist()


def tokens_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", mode: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col), mode=mode).alias("toks")
    )


def build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "text",
) -> InvertedIndex:
    """Build the logical inverted index from a documents DataFrame."""
    toks = tokens_df(docs, id_col, text_col, mode)
    doclen = toks.select("doc_id", F.size("toks").alias("dl"))
    postings = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    termstats = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    row = doclen.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return InvertedIndex(
        doclen=doclen,
        postings=postings,
        termstats=termstats,
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        mode=mode,
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver fixture corpus: documents(doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def build_fielded_index(
    docs: DataFrame,
    fields: list[tuple[str, float]],
    id_col: str = "doc_id",
    mode: str = "text",
) -> InvertedIndex:
    """BM25F-style fielded index: several text columns, each with a
    weight (e.g. [("title", 2.0), ("body", 1.0)]).

    Uses the simplified BM25F of Robertson/Zaragoza (weighted term
    frequencies into the standard saturation): per (term, doc)
    tf = sum_f w_f * tf_f, per doc dl = sum_f w_f * len_f, df counts a
    doc once however many fields hold the term. The result plugs into
    the SAME scorers as build_index — postings.tf and doclen.dl are
    doubles here, which bm25_scores consumes unchanged.

    Scale shape: one union of per-field token explosions feeding the
    same single groupBy(term, doc_id) shuffle as the plain build —
    field count multiplies map-side rows only, never adds a shuffle.
    """
    tok_parts = [
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize_col(F.col(col), mode=mode)).alias("term"),
            F.lit(float(w)).alias("w"),
        )
        for col, w in fields
    ]
    u = tok_parts[0]
    for p in tok_parts[1:]:
        u = u.unionByName(p)
    postings = u.groupBy("term", "doc_id").agg(F.sum("w").alias("tf"))
    dl_parts = [
        docs.select(
            F.col(id_col).alias("doc_id"),
            (F.size(tokenize_col(F.col(col), mode=mode)) * F.lit(float(w))).alias("dl"),
        )
        for col, w in fields
    ]
    ud = dl_parts[0]
    for p in dl_parts[1:]:
        ud = ud.unionByName(p)
    doclen = ud.groupBy("doc_id").agg(F.sum("dl").alias("dl"))
    termstats = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    row = doclen.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    return InvertedIndex(
        doclen=doclen,
        postings=postings,
        termstats=termstats,
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        mode=mode,
    )
