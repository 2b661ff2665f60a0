"""Independent pure-Python BM25 oracle for rank-identity testing.

Mirrors the reference's test strategy of golden scenario evaluation
(/root/reference/notebooks/07_scenario_based_evaluation.ipynb cells 2-5:
18 hand-written SOC narratives run through the full pipeline) — here the
golden answers are computed by this dependency-free implementation and the
Spark engine must match doc-ids AND scores rank-identically.

Shares ONLY the tokenizer spec (tokenize_py) with the engine; everything
else (tf counting, df, idf, length norm, ranking) is re-derived
independently so a bug in the DataFrame plan cannot cancel out.
"""

from __future__ import annotations

import math
from collections import Counter

from alertsage_spark.tokenizer import code_query_terms, tokenize_py

K1 = 1.2
B = 0.75


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, str]], mode: str = "text") -> None:
        """docs: list of (doc_id, text)."""
        self.mode = mode
        self.doc_tfs: dict[int, Counter] = {}
        self.doclen: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize_py(text, mode=mode)
            self.doc_tfs[doc_id] = Counter(toks)
            self.doclen[doc_id] = len(toks)
        self.n_docs = len(self.doc_tfs)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )
        self.df: Counter = Counter()
        for tfs in self.doc_tfs.values():
            for term in tfs:
                self.df[term] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, query_terms: set[str], doc_id: int) -> float:
        tfs = self.doc_tfs[doc_id]
        dl = self.doclen[doc_id]
        s = 0.0
        for term in sorted(query_terms):  # fixed summation order
            tf = tfs.get(term, 0)
            if tf == 0:
                continue
            norm = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            s += self.idf(term) * norm
        return s

    def topk(self, query_text: str, k: int = 10, min_score: float | None = None) -> list[tuple[int, float, int]]:
        """[(doc_id, score_rounded6, rank)] with the engine's tie-break:
        (round(score, 6) desc, doc_id asc)."""
        if self.mode == "code":
            # same exact-identifier short-circuit as the engine
            # (tokenizer.code_query_terms): known base tokens contribute
            # only exact postings; trigram fallback for unknown tokens
            qterms = set(code_query_terms(query_text, self.df.__contains__))
        else:
            qterms = set(tokenize_py(query_text, mode=self.mode))
        hits = []
        for doc_id in self.doc_tfs:
            s = self.score(qterms, doc_id)
            if s > 0.0 and (min_score is None or s >= min_score):
                hits.append((doc_id, round(s, 6)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return [(d, s, i + 1) for i, (d, s) in enumerate(hits[:k])]
