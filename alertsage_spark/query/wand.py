"""Top-k BM25 over compressed segments: block-max WAND + vectorized TAAT.

Query plan (batch of queries, one Spark job):

    segments.filter(term IN query_terms OR term IS NULL)
                                             <- parquet pushdown: only
                                                query-term rows + the
                                                per-shard doclen rows
      groupBy(shard_id) -> applyInPandas(scorer)
                                             <- per-shard task: every
                                                query scored against the
                                                shard's local postings,
                                                doc lengths decoded from
                                                the shard's own doclen row
      -> global window rank (round(score,6) desc, doc_id asc) <= k

Document-sharding makes this embarrassingly parallel: no shuffle of
postings at query time, one small shuffle of per-shard top-k candidates.

Two scorers, both exact (rank-identical to the join+agg path and the
Python oracle — property-tested):

  * ``taat``: vectorized term-at-a-time — decode all matched postings,
    one np.add.at group-sum, exact top-k with rounded-tie margin. Zero
    per-row Python; optimal for few/selective terms or small shards.
  * ``wand``: Block-Max WAND (public algorithm: Broder et al. WAND +
    Ding & Suel block-max bounds): doc-at-a-time pivoting with per-block
    upper bounds idf * norm(block_max_tf, block_min_dl) — valid because
    the BM25 tf-norm is monotone in tf and anti-monotone in dl. Skips
    decoding blocks that cannot beat the running top-k threshold; wins at
    scale on long posting lists. Exactness is protected by an epsilon
    margin (1e-5) under the rounded tie-break comparator.
"""

from __future__ import annotations

import heapq
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from alertsage_spark.index.compress import (
    B,
    K1,
    bm25_norm,
    decode_block,
    delta_decode,
    varbyte_decode,
)
from alertsage_spark.index.segments import SegmentIndex, decode_doclen_row
from alertsage_spark.tokenizer import tokenize_py

THETA_EPS = 1e-5


def _idf(df: int, n_docs: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


class PostingIterator:
    """Cursor over one term's compressed blocks with block skipping."""

    __slots__ = ("row", "idf", "avgdl", "n_blocks", "last_docs", "bounds",
                 "block_idx", "docs", "tfs", "pos", "exhausted", "global_ub")

    def __init__(self, row: dict, idf: float, avgdl: float) -> None:
        self.row = row
        self.idf = idf
        self.avgdl = avgdl
        self.last_docs = np.asarray(row["block_last_docs"], dtype=np.int64)
        self.n_blocks = len(self.last_docs)
        # per-block upper bound: idf * norm(max_tf, min_dl) — computed at
        # query time from the stored (max_tf, min_dl) pairs + global avgdl
        self.bounds = (
            idf
            * bm25_norm(
                np.asarray(row["block_max_tfs"], dtype=np.int64),
                np.asarray(row["block_min_dls"], dtype=np.int64),
                avgdl,
            )
            if self.n_blocks
            else np.empty(0)
        )
        self.global_ub = float(self.bounds.max()) if self.n_blocks else 0.0
        self.block_idx = -1
        self.exhausted = self.n_blocks == 0
        self.docs = np.empty(0, dtype=np.int64)
        self.tfs = np.empty(0, dtype=np.int64)
        self.pos = 0
        if not self.exhausted:
            self._load_block(0)

    def _load_block(self, bi: int) -> None:
        self.block_idx = bi
        self.docs, self.tfs = decode_block(self.row, bi)
        self.pos = 0

    @property
    def cur_doc(self) -> int:
        return int(self.docs[self.pos])

    @property
    def cur_tf(self) -> int:
        return int(self.tfs[self.pos])

    def block_ub(self) -> float:
        return float(self.bounds[self.block_idx])

    def block_last(self) -> int:
        return int(self.last_docs[self.block_idx])

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (block-skip via last_docs)."""
        if self.exhausted or self.cur_doc >= target:
            return
        if target > self.block_last():
            bi = int(np.searchsorted(self.last_docs, target, side="left"))
            if bi >= self.n_blocks:
                self.exhausted = True
                return
            self._load_block(bi)
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):  # defensive; implies block scan bug
            self.exhausted = True

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            if self.block_idx + 1 < self.n_blocks:
                self._load_block(self.block_idx + 1)
            else:
                self.exhausted = True


def _score_tf(tf: float, dl: float, idf: float, avgdl: float) -> float:
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def wand_topk_shard(
    iters: list[PostingIterator],
    dl_lookup,
    k: int,
    avgdl: float,
) -> list[tuple[int, float]]:
    """Block-Max WAND over one shard. Returns [(doc_id, exact_score)] of
    all fully-evaluated docs that were in the running top-k margin."""
    live = [it for it in iters if not it.exhausted]
    heap: list[tuple[float, int]] = []  # (score, doc) min-heap of size k
    results: list[tuple[int, float]] = []
    while live:
        live = [it for it in live if not it.exhausted]
        if not live:
            break
        live.sort(key=lambda it: it.cur_doc)
        theta = heap[0][0] - THETA_EPS if len(heap) >= k else 0.0
        acc = 0.0
        pivot = -1
        for i, it in enumerate(live):
            acc += it.global_ub
            if acc > theta:
                pivot = i
                break
        if pivot < 0:
            break  # no doc can beat theta anymore
        pivot_doc = live[pivot].cur_doc
        if live[0].cur_doc == pivot_doc:
            # block-max check: refine UB with current blocks
            for it in live[: pivot + 1]:
                it.seek(pivot_doc)
            live2 = [it for it in live[: pivot + 1] if not it.exhausted]
            bm_ub = 0.0
            for it in live2:
                if it.cur_doc <= it.block_last():
                    bm_ub += it.block_ub()
            if bm_ub <= theta and live2:
                d2 = min(it.block_last() for it in live2) + 1
                if d2 <= pivot_doc:
                    d2 = pivot_doc + 1
                for it in live2:
                    it.seek(d2)
                continue
            dl = float(dl_lookup(pivot_doc))
            score = 0.0
            for it in live:
                if not it.exhausted and it.cur_doc == pivot_doc:
                    score += _score_tf(float(it.cur_tf), dl, it.idf, it.avgdl)
                    it.advance()
            if len(heap) < k:
                heapq.heappush(heap, (score, pivot_doc))
                results.append((pivot_doc, score))
            elif score > heap[0][0] - THETA_EPS:
                results.append((pivot_doc, score))
                if score > heap[0][0]:
                    heapq.heapreplace(heap, (score, pivot_doc))
        else:
            for it in live[:pivot]:
                it.seek(pivot_doc)
    return results


def taat_topk_shard(
    term_rows: list[tuple[dict, float]],
    dl_docs: np.ndarray,
    dl_vals: np.ndarray,
    k: int,
    avgdl: float,
) -> list[tuple[int, float]]:
    """Vectorized exact TAAT: decode every matched posting, one group-sum."""
    all_docs = []
    all_scores = []
    for row, idf in term_rows:
        deltas_all = []
        tfs_all = []
        do, to = row["block_doc_offsets"], row["block_tf_offsets"]
        for bi in range(len(do) - 1):
            deltas_all.append(delta_decode(varbyte_decode(row["doc_bytes"][do[bi]: do[bi + 1]])).astype(np.int64))
            tfs_all.append(varbyte_decode(row["tf_bytes"][to[bi]: to[bi + 1]]).astype(np.float64))
        docs = np.concatenate(deltas_all)
        tfs = np.concatenate(tfs_all)
        dl_idx = np.searchsorted(dl_docs, docs)
        if dl_idx.max(initial=-1) >= len(dl_docs) or not np.array_equal(
            dl_docs[dl_idx], docs
        ):
            raise ValueError(
                "posting doc_id absent from the shard's doclen rows — a group "
                "built with a different n_shards/layout was appended"
            )
        dl = dl_vals[dl_idx].astype(np.float64)
        scores = idf * (tfs * (K1 + 1.0)) / (tfs + K1 * (1.0 - B + B * dl / avgdl))
        all_docs.append(docs)
        all_scores.append(scores)
    if not all_docs:
        return []
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(sums, inv, scores)
    if len(uniq) > k:
        # kth-largest exact score, then keep every candidate within the
        # rounding margin so rounded ties at the boundary break by doc_id
        s_k = np.partition(sums, len(sums) - k)[len(sums) - k]
        cand = np.flatnonzero(sums >= s_k - 1e-6)
    else:
        cand = np.arange(len(uniq))
    order = cand[np.lexsort((uniq[cand], -np.round(sums[cand], 6)))][:k]
    return [(int(uniq[i]), float(sums[i])) for i in order]


def _make_scorer(query_terms: dict[str, list[str]], idf_map: dict[str, float],
                 avgdl: float, k: int, algo: str):
    def scorer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": str, "doc_id": "int64", "score": "float64"}
        )
        dl_pdf = pdf[pdf["term"].isna()]
        if dl_pdf.empty:
            return out_empty
        # a shard carries one doclen row per committed group; an
        # un-compacted multi-group index therefore has several — merge
        dl_parts = [decode_doclen_row(r) for _, r in dl_pdf.iterrows()]
        dl_docs = np.concatenate([p[0] for p in dl_parts])
        dl_vals = np.concatenate([p[1] for p in dl_parts])
        order = np.argsort(dl_docs, kind="stable")
        dl_docs, dl_vals = dl_docs[order], dl_vals[order]
        seg_pdf = pdf[pdf["term"].notna()]
        if seg_pdf.empty:
            return out_empty
        # one row per (term, committed group): an un-compacted index has
        # several runs per term — score them all (disjoint doc appends
        # are exact; re-ingests of the SAME doc require merge_segments)
        by_term: dict[str, list] = {}
        for _, r in seg_pdf.iterrows():
            by_term.setdefault(r["term"], []).append(r)
        out_q, out_d, out_s = [], [], []
        for qid, terms in query_terms.items():
            rows = [
                (run, idf_map[t])
                for t in terms
                if t in by_term
                for run in by_term[t]
            ]
            if not rows:
                continue
            if algo == "wand":
                def dl_lookup(doc, _d=dl_docs, _v=dl_vals):
                    return _v[np.searchsorted(_d, doc)]
                iters = [PostingIterator(r, idf, avgdl) for r, idf in rows]
                hits = wand_topk_shard(iters, dl_lookup, k, avgdl)
                hits.sort(key=lambda x: (-round(x[1], 6), x[0]))
                hits = hits[:k]
            else:
                hits = taat_topk_shard(rows, dl_docs, dl_vals, k, avgdl)
            for d, s in hits:
                out_q.append(qid)
                out_d.append(d)
                out_s.append(s)
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return scorer


def wand_topk(
    spark: SparkSession,
    index: SegmentIndex,
    queries: Iterable[tuple[str, str]],
    k: int = 10,
    algo: str = "wand",
) -> DataFrame:
    """Batch top-k over a compressed SegmentIndex.

    queries: iterable of (query_id, query_text). Tokenization uses the
    shared spec (driver-side tokenize_py on the tiny query set — parity
    with the index-side tokenizer is covered by tests).
    """
    mode = index.stats.get("mode", "text")
    query_terms = {
        qid: sorted(set(tokenize_py(text, mode=mode))) for qid, text in queries
    }
    all_terms = sorted({t for ts in query_terms.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], "query_id string, doc_id long, score double, rank int")
    df_rows = (
        index.termstats.filter(F.col("term").isin(all_terms))
        .select("term", "df")
        .collect()
    )
    n_docs = index.stats["n_docs"]
    idf_map = {r["term"]: _idf(int(r["df"]), n_docs) for r in df_rows}
    avgdl = float(index.stats["avgdl"])
    if algo == "auto":
        # both scorers are exact; pick by matched-postings volume. TAAT's
        # single vectorized pass wins while decode cost is small; WAND's
        # block skipping wins once posting lists are long enough for the
        # top-k threshold to prune whole blocks.
        total_matched = sum(int(r["df"]) for r in df_rows)
        algo = "taat" if total_matched < 200_000 * len(query_terms) else "wand"

    seg = index.segments.filter(
        F.col("term").isin(all_terms) | F.col("term").isNull()
    )
    scorer = _make_scorer(query_terms, idf_map, avgdl, k, algo)
    candidates = seg.groupBy("shard_id").applyInPandas(
        scorer, schema="query_id string, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )
