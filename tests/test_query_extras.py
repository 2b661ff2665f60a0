"""Unit tests for the round-3 query-surface extensions: boolean
retrieval (query/boolean.py), symmetric-delete fuzzy suggestion
(query/fuzzy.py), and hit-highlight snippets (query/snippet.py).

The catalog oracle replica (test_catalog_oracle.py) hash-checks all
three against DuckDB at fixture scale; these tests pin the edge
semantics on tiny constructed corpora where each rule is isolated.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertsage_spark.index.build import build_index
from alertsage_spark.query.boolean import boolean_topk, clauses_df
from alertsage_spark.query.fuzzy import _delete_variants, suggest
from alertsage_spark.query.snippet import snippet_topdocs


@pytest.fixture(scope="module")
def tiny_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "alpha gamma gamma"),
            (4, "beta delta delta"),
        ],
        "doc_id long, text string",
    )
    return build_index(docs)


def _hits(df, qid):
    return [r.doc_id for r in df.filter(F.col("query_id") == qid).orderBy("rank").collect()]


def test_boolean_must_not_excludes(spark, tiny_index):
    qs = [("Q", {"must": ["alpha"], "should": [], "must_not": ["delta"]})]
    out = boolean_topk(tiny_index, clauses_df(spark, qs))
    # docs 1,3 contain alpha without delta; doc 2 has alpha AND delta
    assert set(_hits(out, "Q")) == {1, 3}


def test_boolean_must_requires_all(spark, tiny_index):
    qs = [("Q", {"must": ["alpha", "beta"], "should": [], "must_not": []})]
    out = boolean_topk(tiny_index, clauses_df(spark, qs))
    assert set(_hits(out, "Q")) == {1, 2}


def test_boolean_should_only_is_or(spark, tiny_index):
    qs = [("Q", {"must": [], "should": ["gamma", "delta"], "must_not": []})]
    out = boolean_topk(tiny_index, clauses_df(spark, qs))
    assert set(_hits(out, "Q")) == {1, 2, 3, 4}


def test_boolean_must_not_only_doc_never_appears(spark, tiny_index):
    # doc 4 matches ONLY the must_not clause -> excluded, not scored
    qs = [("Q", {"must": [], "should": ["gamma"], "must_not": ["delta"]})]
    out = boolean_topk(tiny_index, clauses_df(spark, qs))
    assert set(_hits(out, "Q")) == {1, 3}


def test_boolean_duplicate_term_rejected(spark):
    with pytest.raises(ValueError, match="duplicate term"):
        clauses_df(spark, [("Q", {"must": ["x"], "must_not": ["x"]})])


def test_delete_variants_complete(spark):
    out = spark.range(1).select(
        _delete_variants(F.lit("abcd")).alias("v")
    ).collect()[0].v
    assert "abcd" in out            # 0 deletes
    assert {"bcd", "acd", "abd", "abc"} <= set(out)   # 1 delete
    assert {"cd", "bd", "bc", "ad", "ac", "ab"} <= set(out)  # 2 deletes


def test_fuzzy_matches_brute_force_incl_trigram_blind_pair(spark):
    # 'abcd' vs 'abed': levenshtein 1 but ZERO shared trigrams — the
    # case a trigram-blocked suggester would miss; symmetric-delete
    # blocking must find it.
    vocab = spark.createDataFrame(
        [("abcd", 10), ("abed", 7), ("wxyz", 99), ("abcdef", 3)],
        "term string, df long",
    )
    qdf = spark.createDataFrame([("Q1", "abed"), ("Q2", "abcd")],
                                "query_id string, qterm string")
    out = {
        (r.query_id, r.rank): (r.suggestion, r.dist)
        for r in suggest(vocab, qdf, max_dist=2, n=4).collect()
    }
    # brute force for Q1='abed': dist0 abed, dist1 abcd, dist2 abcdef? lev('abed','abcdef')=3 -> no
    assert out[("Q1", 1)] == ("abed", 0)
    assert out[("Q1", 2)] == ("abcd", 1)
    assert ("Q1", 3) not in out
    # Q2='abcd': dist0 abcd, dist1 abed, dist2 abcdef
    assert out[("Q2", 1)] == ("abcd", 0)
    assert out[("Q2", 2)] == ("abed", 1)
    assert out[("Q2", 3)] == ("abcdef", 2)


def test_delete_variants_empty_only_for_short_sources(spark):
    # '' is needed for completeness only when the source itself is
    # <= max_deletes chars ('ab' vs 'cd' share only ''); longer sources
    # must never emit it, keeping the '' join-key population bounded by
    # the alphabet instead of the vocabulary.
    for s, want_empty in (("a", True), ("ab", True), ("abc", False),
                          ("abcd", False)):
        out = spark.range(1).select(
            _delete_variants(F.lit(s)).alias("v")
        ).collect()[0].v
        assert ("" in out) == want_empty, s


def test_fuzzy_short_short_pair_still_complete(spark):
    # 'ab' vs 'cd' (two substitutions, dist 2): the only common delete
    # variant is '' — retained for short sources, so the pair must
    # surface through the ordinary variant equi-join.
    vocab = spark.createDataFrame(
        [("cd", 4), ("ab", 9), ("wxyz", 1)], "term string, df long"
    )
    qdf = spark.createDataFrame([("Q", "ab")], "query_id string, qterm string")
    out = {r.suggestion: r.dist for r in suggest(vocab, qdf, max_dist=2).collect()}
    assert out == {"ab": 0, "cd": 2}


def test_fuzzy_rank_prefers_distance_then_df(spark):
    vocab = spark.createDataFrame(
        [("aaab", 1), ("aaac", 50), ("aaaa", 5)], "term string, df long"
    )
    qdf = spark.createDataFrame([("Q", "aaaa")], "query_id string, qterm string")
    out = [r.suggestion for r in suggest(vocab, qdf).orderBy("rank").collect()]
    # dist 0 first, then dist-1 ties broken by df desc
    assert out == ["aaaa", "aaac", "aaab"]


def test_snippet_term_at_start_and_occurrence_count(spark):
    docs = spark.createDataFrame(
        [(1, "needle at the very start and a needle later"),
         (2, "no match here"),
         (3, "one needle only"),
         (4, "needle needle needle x")],  # ADJACENT occurrences
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame([("S", "needle")], "query_id string, term string")
    rows = {r.doc_id: r for r in snippet_topdocs(docs, qdf, k=4, width=10).collect()}
    assert set(rows) == {1, 3, 4}
    # adjacent occurrences each count (the old ' x '-needle replace
    # counting consumed the shared space and undercounted these)
    assert rows[4].n_occ == 3 and rows[4].rank == 1
    assert rows[1].n_occ == 2 and rows[1].rank == 2
    assert rows[3].n_occ == 1 and rows[3].rank == 3
    # doc 1: first occurrence at position 1 -> no pre-context
    assert rows[1].snip.startswith("[needle]")
    assert rows[1].snip == "[needle] at the ve"
    # doc 3: pre-context clipped to the string start
    assert rows[3].snip == "one [needle] only"


def test_snippet_index_path_matches_bruteforce(spark):
    """r6: the index-backed candidate path (postings tf as n_occ) must be
    row-identical to the tokenize-everything path, adjacent occurrences
    and rank ties included."""
    docs = spark.createDataFrame(
        [(1, "needle at the very start and a needle later"),
         (2, "no match here"),
         (3, "one needle only"),
         (4, "needle needle needle x"),
         (5, "tie needle doc"), (6, "tie needle doc2")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [("S", "needle"), ("T", "tie")], "query_id string, term string"
    )
    brute = sorted(map(tuple, snippet_topdocs(docs, qdf, k=2, width=10).collect()))
    idx = build_index(docs)
    fast = sorted(map(tuple, snippet_topdocs(docs, qdf, k=2, width=10, index=idx).collect()))
    assert brute == fast


# ---- trigram substring/prefix search (query/substring.py) ----

@pytest.fixture(scope="module")
def code_docs(spark):
    return spark.createDataFrame(
        [
            (1, "parseConfig retryBudget"),       # tokens: parse config retry budget
            (2, "a reconfigure pass"),            # 'config' inside a longer token
            (3, "con fig split apart"),           # trigram coincidence ACROSS tokens
            (4, "fig leaf"),                      # 3-char token == pattern 'fig'
            (5, "nothing relevant"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def code_index(code_docs):
    from alertsage_spark.index.build import build_index

    return build_index(code_docs, mode="code")


def _search(spark, code_index, code_docs, pattern, match):
    from alertsage_spark.query.substring import pattern_search

    pats = spark.createDataFrame([("Q", pattern)], "query_id string, pattern string")
    out = pattern_search(code_index, code_docs, pats, match=match)
    return {r.doc_id: r.n_tokens for r in out.collect()}


def test_substring_within_token_and_cross_token_false_positive(spark, code_index, code_docs):
    # doc 3 holds '#con'-ish and '#fig'-ish material in DIFFERENT tokens:
    # trigram AND-intersection may propose it, verify must kill it.
    hits = _search(spark, code_index, code_docs, "config", "contains")
    assert hits == {1: 1, 2: 1}


def test_substring_three_char_token_needs_exact_branch(spark, code_index, code_docs):
    # 'fig' as a standalone 3-char token emits NO trigrams — only the
    # exact-posting union branch can reach doc 4.
    hits = _search(spark, code_index, code_docs, "fig", "contains")
    # config, reconfigure, fig(3-char token), fig(3-char token)
    assert hits == {1: 1, 2: 1, 3: 1, 4: 1}


def test_prefix_verify_kills_suffix_matches(spark, code_index, code_docs):
    hits = _search(spark, code_index, code_docs, "config", "prefix")
    assert hits == {1: 1}  # 'reconfigure' contains but does not start with


def test_pattern_too_short_rejected(spark, code_index, code_docs):
    with pytest.raises(ValueError, match="too short"):
        _search(spark, code_index, code_docs, "ab", "contains")


def test_pattern_search_requires_code_index(spark, code_docs):
    from alertsage_spark.index.build import build_index
    from alertsage_spark.query.substring import pattern_search

    text_idx = build_index(code_docs)  # mode='text': no trigram postings
    pats = spark.createDataFrame([("Q", "config")], "query_id string, pattern string")
    with pytest.raises(ValueError, match="code-mode"):
        pattern_search(text_idx, code_docs, pats)


# ---- BM25F fielded index (index/build.py::build_fielded_index) ----

def test_fielded_index_title_weight_beats_body(spark):
    from alertsage_spark.index.build import build_fielded_index
    from alertsage_spark.query.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "target intro", "filler filler filler"),
            (2, "plain intro", "target filler filler"),
        ],
        "doc_id long, title string, body string",
    )
    idx = build_fielded_index(docs, [("title", 2.0), ("body", 1.0)])
    # weighted tf: doc1 has target in title (tf=2.0), doc2 in body (1.0)
    q = spark.createDataFrame([("Q", "target")], "query_id string, query_text string")
    out = {r.doc_id: r.rank for r in bm25_topk(idx, q, k=2).collect()}
    assert out[1] == 1 and out[2] == 2
    # df counts each doc once; both docs hold the term
    stats = {r.term: r.df for r in idx.termstats.collect()}
    assert stats["target"] == 2
    # dl is weighted: doc1 = 2*2 + 1*3 = 7
    dls = {r.doc_id: r.dl for r in idx.doclen.collect()}
    assert dls[1] == 7.0 and dls[2] == 7.0


# ---- query-string language (query/parse.py) ----

def test_parse_roles_and_camel_expansion():
    from alertsage_spark.query.parse import parse_query

    p = parse_query('+scanTable -badWord keep "exact phrase"')
    assert sorted(p["must"]) == ["exact", "phrase", "scan", "table"]
    assert sorted(p["must_not"]) == ["bad", "word"]
    assert p["should"] == ["keep"]
    assert p["phrases"] == [["exact", "phrase"]]


def test_parse_role_precedence_keeps_strongest():
    from alertsage_spark.query.parse import parse_query

    p = parse_query("-scan scan +scan")
    # must_not outranks must outranks should
    assert p["must_not"] == ["scan"] and not p["must"] and not p["should"]


def test_parse_quoted_single_token_is_a_word():
    from alertsage_spark.query.parse import parse_query

    p = parse_query('-"filter" "word"')
    assert p["must_not"] == ["filter"]
    assert p["should"] == ["word"]
    assert p["phrases"] == []


def test_parse_negated_phrase_rejected():
    from alertsage_spark.query.parse import parse_query

    with pytest.raises(ValueError, match="negated phrases"):
        parse_query('-"alpha beta"')


def test_search_phrase_gates_contiguity(spark):
    from alertsage_spark.query.parse import search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),   # contiguous 'alpha beta'
            (2, "alpha gamma beta"),   # both tokens, NOT contiguous
            (3, "beta alpha delta"),   # reversed order
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    out = search(spark, idx, docs, [("Q", '"alpha beta"'), ("R", "gamma")], k=5)
    rows = {(r.query_id, r.doc_id): r.rank for r in out.collect()}
    assert [d for (q, d) in rows if q == "Q"] == [1]
    # phrase-free query untouched by the gate; ranks dense
    r_hits = sorted((rows[k], k[1]) for k in rows if k[0] == "R")
    assert [d for _, d in r_hits] == [1, 2] and [r for r, _ in r_hits] == [1, 2]


def test_snippet_ranks_per_term_not_per_query(spark):
    """Multi-term queries: each term gets its own top-k — a term with
    high-count matches must not evict another term's snippets."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha alpha"),
         (2, "alpha alpha alpha"),
         (3, "beta only here")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [("S", "alpha"), ("S", "beta")], "query_id string, term string"
    )
    out = snippet_topdocs(docs, qdf, k=2, width=10).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r.term, []).append((r.rank, r.doc_id, r.n_occ))
    assert sorted(by_term["alpha"]) == [(1, 1, 4), (2, 2, 3)]
    assert sorted(by_term["beta"]) == [(1, 3, 1)]  # not evicted by alpha


def test_pattern_slice_terms_covers_short_patterns():
    """The slice rule must include the pattern trigram even when the
    pattern is exactly 3 chars (tokenize_py emits no token trigrams
    below TRIGRAM_MIN_LEN=4 — the bug class a tokenizer-derived slice
    hits)."""
    from alertsage_spark.query.substring import pattern_slice_terms

    assert pattern_slice_terms(["dow"]) == ["#dow", "dow"]
    assert pattern_slice_terms(["usto"]) == ["#sto", "#ust", "usto"]


def test_pattern_search_on_sliced_segment_view(spark, code_docs, tmp_path):
    """pattern_search over a compressed segment index's relational view
    sliced by pattern_slice_terms must equal the full relational-index
    result (candidate completeness on the LSM path)."""
    from alertsage_spark.index.segments import build_segments, load_index
    from alertsage_spark.query.substring import pattern_search, pattern_slice_terms

    d = str(tmp_path / "cidx")
    build_segments(spark, code_docs, d, n_shards=2, n_groups=1, mode="code")
    seg = load_index(spark, d)
    pats = spark.createDataFrame(
        [("Q1", "fig"), ("Q2", "config")], "query_id string, pattern string"
    )
    inv = seg.as_inverted_index(terms=pattern_slice_terms(["fig", "config"]))
    got = sorted(
        (r.query_id, r.doc_id, r.n_tokens)
        for r in pattern_search(inv, code_docs, pats, match="contains").collect()
    )
    from alertsage_spark.index.build import build_index

    full = build_index(code_docs, mode="code")
    want = sorted(
        (r.query_id, r.doc_id, r.n_tokens)
        for r in pattern_search(full, code_docs, pats, match="contains").collect()
    )
    assert got == want and got


# ---- hybrid RRF fusion (query/hybrid.py) ----

def test_rrf_fuse_semantics(spark):
    from alertsage_spark.query.hybrid import rrf_fuse

    text = spark.createDataFrame(
        [("Q", 1, 1), ("Q", 2, 2), ("Q", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    vec = spark.createDataFrame(
        [("Q", 2, 1), ("Q", 4, 2)],
        "query_id string, doc_id long, rank int",
    )
    out = {r["doc_id"]: (r["rrf"], r["rank"])
           for r in rrf_fuse(text, vec, k=10).collect()}
    # doc 2 appears in BOTH lists -> highest fused score
    assert out[2][1] == 1
    assert out[2][0] == round(1 / 62 + 1 / 61, 9)
    # single-list docs score by their one reciprocal; rank-1 text (doc1)
    # beats rank-2 vec (doc4); doc3 last
    assert out[1][0] == round(1 / 61, 9)
    assert [d for d, v in sorted(out.items(), key=lambda x: x[1][1])] == [2, 1, 4, 3]


def test_hybrid_rrf_end_to_end_tiny(spark):
    from alertsage_spark.index.build import build_index
    from alertsage_spark.query.hybrid import hybrid_rrf

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"),
         (3, "unrelated text entirely"), (4, "alpha beta gamma extra")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [("Q", "alpha beta gamma")], "query_id string, query_text string"
    )
    out = [r["doc_id"] for r in hybrid_rrf(docs, qs, build_index(docs), k=3)
           .orderBy("rank").collect()]
    # doc 1 is the exact lexical+semantic match; doc 3 never ranks top-3
    assert out[0] == 1 and 3 not in out


def test_hybrid_rrf_ann_fusion_rederived(spark):
    """hybrid_rrf_ann's fused scores must equal RRF recomputed from its
    two legs run independently (BM25 ranks + batched-ANN ranks) — the
    fusion is pure arithmetic over ranks, whatever the vector leg."""
    from alertsage_spark.index.build import build_index
    from alertsage_spark.operators.encode import DIM, encode_py, encode_text
    from alertsage_spark.operators.similarity import (
        lsh_ann_topk_batch,
        with_lsh_signatures,
    )
    from alertsage_spark.query.bm25 import bm25_topk
    from alertsage_spark.query.hybrid import hybrid_rrf_ann

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    qs = spark.createDataFrame(
        [("Q1", "ransomware incident response"),
         ("Q2", "phishing email credential theft")],
        "query_id string, query_text string",
    )
    sig = with_lsh_signatures(
        encode_text(docs), 8, 4, 42, id_col="doc_id", vec_col="vec", dim=DIM
    ).cache()
    try:
        out = hybrid_rrf_ann(
            docs, qs, build_index(docs), k=10, k_each=20, sig_docs=sig
        ).collect()
        t = {(r["query_id"], r["doc_id"]): r["rank"]
             for r in bm25_topk(build_index(docs), qs, k=20).collect()}
        v = {(r["query_id"], r["doc_id"]): r["rank"]
             for r in lsh_ann_topk_batch(
                 sig,
                 [(r["query_id"], encode_py(r["query_text"]))
                  for r in qs.collect()],
                 k=20, id_col="doc_id", vec_col="vec").collect()}
        assert len(out) > 0
        for r in out:
            key = (r["query_id"], r["doc_id"])
            want = 0.0
            if key in t:
                want += 1.0 / (60 + t[key])
            if key in v:
                want += 1.0 / (60 + v[key])
            assert abs(r["rrf"] - round(want, 9)) < 1e-12, key
            assert 1 <= r["rank"] <= 10
    finally:
        sig.unpersist()


def test_hybrid_rrf_ann_inline_fallback(spark):
    """The sig_docs=None fallback (encode + signatures computed inline,
    cached inside) must produce the same fusion as the precomputed-
    signature path."""
    from alertsage_spark.index.build import build_index
    from alertsage_spark.operators.encode import DIM, encode_text
    from alertsage_spark.operators.similarity import with_lsh_signatures
    from alertsage_spark.query.hybrid import hybrid_rrf_ann

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(200)
    qs = spark.createDataFrame(
        [("Q", "malware lateral movement")],
        "query_id string, query_text string",
    )
    idx = build_index(docs)
    inline = {(r["query_id"], r["doc_id"], r["rrf"], r["rank"])
              for r in hybrid_rrf_ann(docs, qs, idx, k=5).collect()}
    sig = with_lsh_signatures(
        encode_text(docs), 8, 4, 42, id_col="doc_id", vec_col="vec", dim=DIM
    )
    pre = {(r["query_id"], r["doc_id"], r["rrf"], r["rank"])
           for r in hybrid_rrf_ann(docs, qs, idx, k=5, sig_docs=sig).collect()}
    assert inline == pre and len(inline) > 0
