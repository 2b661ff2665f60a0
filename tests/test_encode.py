"""Deterministic text->vector encoder (operators/encode.py): Spark
kernel == single-string reference impl == DuckDB SQL replica, and the
encoded vectors drive the LSH dup pipeline end-to-end."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from alertsage_spark.operators.encode import (
    duckdb_encode_cte,
    encode_py,
    encode_text,
)

TEXTS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog!"),  # near-dup
    (3, "ab"),          # shorter than the n-gram width -> zero vector
    (4, ""),            # empty -> zero vector
    (5, None),          # null -> zero vector
    (6, "SELECT * FROM lineitem WHERE l_quantity > 5"),
]


def test_encode_py_normalized_or_zero():
    for _id, t in TEXTS:
        v = np.array(encode_py(t or ""))
        n = float(np.linalg.norm(v))
        assert n == 0.0 or math.isclose(n, 1.0, rel_tol=1e-12)
    assert encode_py("ab") == [0.0] * 64


def test_spark_kernel_matches_reference_impl(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {r["doc_id"]: list(r["vec"]) for r in encode_text(df).collect()}
    for _id, t in TEXTS:
        assert got[_id] == encode_py(t or ""), _id


def test_duckdb_cte_matches_reference_impl():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR);"
        "INSERT INTO d VALUES "
        + ",".join(
            f"({i}, {'NULL' if t is None else repr(t)})" for i, t in TEXTS
        )
    )
    sql = (
        "WITH "
        + duckdb_encode_cte("SELECT doc_id, coalesce(text,'') AS text FROM d")
        + "\nSELECT doc_id, v FROM encv ORDER BY doc_id"
    )
    for doc_id, v in con.execute(sql).fetchall():
        expected = encode_py(dict(TEXTS)[doc_id] or "")
        assert list(v) == expected, doc_id


def test_encoded_vectors_drive_lsh_dup_pipeline(spark):
    from alertsage_spark.operators.similarity import embedding_dup_pairs

    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    pairs = embedding_dup_pairs(
        encode_text(df), threshold=0.9, id_col="doc_id", vec_col="vec",
        n_tables=32, bits_per_table=16, dim=64,
    ).collect()
    found = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs}
    assert (1, 2) in found and found[(1, 2)] >= 0.9
    assert all(a == 1 and b == 2 for a, b in found)


# ---- property-based parity (hypothesis): Python ref == DuckDB SQL ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(max_size=60),  # FULL unicode: the ASCII-only fold makes
        # the encoder engine-portable even where str.lower() and SQL
        # lower() disagree ('İ', final sigma)
        min_size=1,
        max_size=6,
    )
)
def test_encoder_duckdb_parity_property(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO d VALUES (?, ?)", [i, t])
    sql = (
        "WITH "
        + duckdb_encode_cte("SELECT doc_id, text FROM d")
        + "\nSELECT doc_id, v FROM encv ORDER BY doc_id"
    )
    for doc_id, v in con.execute(sql).fetchall():
        assert list(v) == encode_py(texts[doc_id]), texts[doc_id]
