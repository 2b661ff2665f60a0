"""First-class ingest of the north-rule input shape: a table of
source-code repositories with columns (repo, path, commit, lang,
content) — the BASELINE input_hint — normalized to the engine's
(doc_id, text) contract plus the per-row sha256 fidelity table.

Storage format note: the rule names Iceberg tables; this sandbox's
Spark has no Iceberg runtime jar, so ingestion goes through
`spark.read.table(...)` / `spark.read.parquet(...)` interchangeably —
the engine touches only the DataFrame, so pointing `--input` at an
Iceberg table on a real cluster (spark.sql.catalog.* configured) needs
no code change; Iceberg's hidden partitioning and file pruning then
apply to the scan automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CODE_CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def code_doc_id():
    """Deterministic non-negative doc id for a (repo, path, commit) file
    version: pmod(xxhash64(...), 2^62). Non-negative is a segment-encoder
    requirement; 62 bits keeps birthday-collision odds ~n^2/2^63
    (~5e-5 at 10^9 files, ~0.05 at 10^10 — switch to a 128-bit id column
    before that scale)."""
    return F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2**62))


def prepare_code_corpus(
    df: DataFrame, langs: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """(docs(doc_id, text), fidelity(doc_id, content_sha256)) from an
    input_hint-shaped table; ``langs`` optionally prunes by language
    BEFORE anything else (a partition/metadata filter on a real layout).
    Raises on missing columns rather than silently indexing garbage."""
    missing = [c for c in CODE_CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"code corpus input missing columns {missing}; expected "
            f"{CODE_CORPUS_COLUMNS}"
        )
    if langs:
        df = df.filter(F.col("lang").isin(list(langs)))
    docs = df.select(code_doc_id().alias("doc_id"), F.col("content").alias("text"))
    fidelity = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
    )
    return docs, fidelity
