"""Trigram-accelerated substring and prefix search (Zoekt/Google-
Code-Search style) over the code-mode inverted index.

The north rule's code tokenizer emits, besides each identifier token,
'#'-prefixed character trigrams of every token of length >= 4
(tokenizer.py). Those trigram postings are exactly a substring index:
a token containing pattern P (|P| >= 3) contiguously contains every
3-gram of P, so

    candidates(P) =   docs holding ALL trigrams of P          (AND-join)
                    ∪ docs holding the exact token P          (covers the
                      len-3 tokens, which emit no trigrams)

is a PROVABLY COMPLETE candidate set for "some token of the doc
contains P": a matching token of length >= 4 contributes all of P's
trigrams; a matching token of length 3 IS P. The verify step then
re-tokenizes only the candidates and counts matching tokens, removing
trigram coincidences (a doc can hold P's trigrams spread across
different tokens). Patterns contain no spaces, so token-stream
verification cannot cross token boundaries.

Prefix search ("sca%") is the same machinery with a startswith verify —
a prefix is in particular a substring, so the same candidate set is
complete for it.

Scale shape: pattern trigrams are tiny and BROADCAST against the
trigram postings (a selective slice of one FileScan — '#' terms are
their own key range in the sorted dictionary); the AND-intersection is
one (query, doc) hash-agg; verification re-tokenizes only the
candidate docs reached by an equi-join on doc_id. Brute-force scan of
the corpus exists only in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertsage_spark.index.build import InvertedIndex
from alertsage_spark.tokenizer import token_trigrams_col, tokenize_col

MIN_PATTERN_LEN = 3


def pattern_slice_terms(patterns: list[str]) -> list[str]:
    """The exact posting-term slice a pattern_search over ``patterns``
    can touch: each pattern as an exact token plus its PATTERN trigrams
    '#'+p[i:i+3]. Use for SegmentIndex.as_inverted_index(terms=...) so
    only the needed posting lists are decoded. NOTE: this is the
    pattern-trigram rule, not the token-trigram rule — a 3-char pattern
    emits no token trigrams (TRIGRAM_MIN_LEN=4) but its one pattern
    trigram is still a live posting term the search must read."""
    from alertsage_spark.tokenizer import TRIGRAM_PREFIX

    return sorted(
        set(patterns)
        | {
            TRIGRAM_PREFIX + p[i : i + 3]
            for p in patterns
            for i in range(len(p) - 2)
        }
    )


def _pattern_trigrams(col):
    # |P| >= 3 guaranteed -> sequence stop >= start (Spark sequence
    # DESCENDS for stop < start rather than returning empty). The
    # trigram rule itself is the tokenizer's ONE definition.
    return F.array_distinct(token_trigrams_col(col))


def pattern_search(
    index: InvertedIndex,
    docs: DataFrame,
    patterns,
    match: str = "contains",
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_presliced: bool = False,
) -> DataFrame:
    """Docs with >= 1 token matching each pattern.

    index:    code-mode index (mode='code'; its '#' trigram postings are
              the accelerator).
    patterns: (query_id, pattern) — tokenizer-normalized, no spaces,
              len >= MIN_PATTERN_LEN. Either a DataFrame or a plain list
              of (query_id, pattern) tuples; pass the LIST when the
              strings are driver-side literals — the DataFrame is then
              built from it (one source of truth, no drift) and the
              per-call validation collect (~0.3 s of pure scheduling) is
              skipped. (An earlier pattern_list= bypass parameter let a
              mismatched list silently drop candidates; review-caught,
              replaced by this single-argument form.)
    match:    'contains' (substring anywhere in a token) or 'prefix'.
    Returns (query_id, doc_id, n_tokens bigint) — n_tokens counts
    matching token OCCURRENCES (duplicates included), > 0 by
    construction.
    """
    if match not in ("contains", "prefix"):
        raise ValueError(f"unknown match mode: {match}")
    if index.mode != "code":
        raise ValueError("pattern_search needs a code-mode index (trigram terms)")
    if isinstance(patterns, list):
        from alertsage_spark.session import local_df

        plist = sorted({p for _q, p in patterns})
        patterns = local_df(
            docs.sparkSession, patterns, "query_id string, pattern string"
        )
    else:
        # ONE driver action serves both validation and the slice
        # derivation (patterns are query-side tiny by construction)
        plist = [
            r["pattern"] for r in patterns.select("pattern").distinct().collect()
        ]
    bad = [p for p in plist if p is None or len(p) < MIN_PATTERN_LEN or " " in p]
    if bad:
        raise ValueError(f"pattern too short or contains spaces: {bad[0]!r}")

    # Prefilter postings to the exact term slice the patterns can touch:
    # a broadcast JOIN alone does not prune the postings scan, so
    # without this every query batch reads the whole postings relation
    # (measured 2x full scans per call at sf0.1; at corpus scale the
    # IN-filter is the difference between a metadata-pruned read and a
    # table scan). Callers that already sliced the postings relation
    # (SegmentIndex.as_inverted_index(terms=pattern_slice_terms(...)))
    # pass postings_presliced=True to skip the redundant filter.
    postings = index.postings
    if not postings_presliced:
        postings = postings.filter(F.col("term").isin(pattern_slice_terms(plist)))

    # ONE probe relation carries both candidate branches — each pattern's
    # trigrams (kind 'tri') and the pattern itself as an exact token
    # (kind 'exact', the completeness branch for 3-char tokens, which
    # emit no trigrams). The terms are disjoint by construction (trigram
    # terms carry the '#' prefix), so one postings join + ONE hash-agg
    # per (query, pattern, doc) replaces the former join+agg+join+union+
    # distinct chain (r5: two fewer shuffles; the union's distinct is
    # subsumed by the groupBy). Candidate rule unchanged and still
    # provably complete: ALL trigrams present OR the exact token posted.
    #
    # r6 agg shape: the counted rows are provably distinct already —
    # postings hold ONE row per (term, doc) and the probe relation holds
    # each (query, pattern, term) once (trigrams pass array_distinct;
    # the exact probe is a disjoint term namespace) — so the former
    # count_distinct aggregations are plain conditional counts, which
    # drops Spark's distinct-aggregate Expand + second aggregation pass.
    ptri = patterns.select(
        "query_id",
        "pattern",
        F.explode(_pattern_trigrams(F.col("pattern"))).alias("term"),
        F.lit("tri").alias("kind"),
    )
    probes = ptri.unionByName(
        patterns.select(
            "query_id",
            "pattern",
            F.col("pattern").alias("term"),
            F.lit("exact").alias("kind"),
        )
    )
    agg = (
        F.broadcast(probes)
        .join(postings, "term")
        .groupBy("query_id", "pattern", "doc_id")
        .agg(
            F.count(
                F.when(F.col("kind") == "tri", F.lit(1))
            ).alias("hit_tri"),
            F.max(
                F.when(F.col("kind") == "exact", F.lit(1)).otherwise(F.lit(0))
            ).alias("hit_exact"),
        )
    )
    # driver-side literals: the required-trigram count per pattern is a
    # pure function of the pattern string (plist is in hand on both
    # input paths) — a literal CASE map replaces the former n_tri
    # aggregation + broadcast join (one fewer aggregate and join per
    # call; same trigram rule as pattern_slice_terms: distinct 3-grams)
    ntri_map = F.create_map(
        *[
            c
            for p in plist
            for c in (
                F.lit(p),
                F.lit(len({p[i : i + 3] for i in range(len(p) - 2)})),
            )
        ]
    )
    cands = agg.filter(
        (F.col("hit_tri") == ntri_map[F.col("pattern")])
        | (F.col("hit_exact") == 1)
    ).select("query_id", "pattern", "doc_id")
    # ONE broadcast of the candidate set serves BOTH joins below — the
    # two subtrees are identical, so the second is a ReusedExchange and
    # the probe join + aggregation runs once per action (r6; candidates
    # are top-of-aggregation tiny, but their size ESTIMATE is not —
    # without the hint the verify semi-join planned as a SortMergeJoin
    # that shuffled the whole corpus).
    bc = F.broadcast(cands)

    pred = F.contains if match == "contains" else F.startswith
    # semi-join FIRST, tokenize AFTER: the verify re-tokenizes ONLY the
    # candidate docs (a tokenize-then-join projection would evaluate the
    # tokenizer over the whole corpus before the join prunes it); no
    # pre-distinct: left_semi deduplicates by construction.
    from alertsage_spark.session import spread_small_scan

    docs_sel = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    cand_docs = spread_small_scan(
        docs_sel.join(bc, "doc_id", "left_semi"), probe=docs_sel
    )  # fixture scans are 1-2 partitions; the verify tokenize was
    # running single-core (measured 1.8 -> 1.2s with the spread);
    # probe the plain scan — .rdd on the joined plan would materialize
    # the candidate broadcast stage eagerly
    toks = cand_docs.select(
        "doc_id",
        tokenize_col(F.col("_text")).alias("toks"),  # plain tokens: the
        # verify semantics are over identifiers, not trigram terms
    )
    return (
        toks.join(bc, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.size(F.filter("toks", lambda t: pred(t, F.col("pattern"))))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
