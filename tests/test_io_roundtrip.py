"""Source/sink operators (SURVEY §2.1 S5/S6): JSONL sink with nested
structs, polymorphic JSONL/text source with comment+blank filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_sink_roundtrip_nested(spark, tmp_path):
    """Nested result records -> JSONL -> read back identical (the
    reference's bulk sink, /root/reference/src/triage/cli.py:1877-1899:
    nested probs_sorted list-of-structs per row)."""
    df = spark.createDataFrame(
        [
            (1, "alert a", [("malware", 0.9), ("phishing", 0.05)]),
            (2, "alert b", [("benign_activity", 0.7)]),
        ],
        "id long, text string, probs_sorted array<struct<label:string, prob:double>>",
    )
    out = tmp_path / "out_jsonl"
    df.write.json(str(out))
    back = spark.read.json(str(out), schema=df.schema)
    a = sorted((r["id"], r["text"], tuple(map(tuple, r["probs_sorted"]))) for r in df.collect())
    b = sorted((r["id"], r["text"], tuple(map(tuple, r["probs_sorted"]))) for r in back.collect())
    assert a == b


def test_text_source_comment_blank_filter(spark, tmp_path):
    """Comment/blank-line record filter on a raw text source
    (/root/reference/src/triage/cli.py:1832-1842)."""
    p = tmp_path / "input.txt"
    p.write_text(
        "first record\n"
        "\n"
        "# a comment line\n"
        "   \n"
        "second record\n"
        "#another\n"
        "third record\n"
    )
    lines = spark.read.text(str(p))
    kept = (
        lines.filter(
            (F.length(F.trim("value")) > 0) & ~F.trim("value").startswith("#")
        )
        .select(F.trim("value").alias("v"))
        .collect()
    )
    assert [r["v"] for r in kept] == ["first record", "second record", "third record"]


def test_csv_source_with_schema(spark, tmp_path):
    """CSV corpus scan with explicit schema (S1) + chunk-free write (S2)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    out = tmp_path / "csv"
    docs.select("doc_id", "lang", "n_chars").write.option("header", True).csv(str(out))
    back = spark.read.csv(
        str(out), header=True, schema="doc_id long, lang string, n_chars long"
    )
    assert back.count() == 50
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
