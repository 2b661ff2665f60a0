"""The lazy public API facade (alertsage_spark/__init__.py PEP 562)
must resolve every advertised name to a callable — a user switching
from the reference programs against exactly this surface."""

import alertsage_spark as asp

PUBLIC_API = [
    "build_segments", "load_index", "append_group", "delete_docs",
    "suggest_n_shards", "merge_segments", "maybe_compact", "build_index",
    "build_fielded_index",
    "wand_topk", "bm25_topk", "boolean_topk", "clauses_df", "suggest",
    "snippet_topdocs", "pattern_search", "parse_query", "search",
    "prepare_code_corpus",
    "exact_dedup", "minhash_lsh_pairs", "cosine_topk", "lsh_ann_topk",
    "ivf_ann_topk", "embedding_dup_pairs", "hybrid_features",
    "keyword_evidence_gate", "get_spark",
]


def test_every_public_name_resolves_callable():
    for name in PUBLIC_API:
        assert callable(getattr(asp, name)), name


def test_unknown_name_raises_attribute_error():
    try:
        asp.definitely_not_an_api
    except AttributeError:
        pass
    else:
        raise AssertionError("expected AttributeError")
