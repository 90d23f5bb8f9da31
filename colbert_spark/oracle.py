"""Pure-Python reference engine: in-memory inverted index + exact BM25 top-k.

Plays the role the ColBERT ranker plays in the reference
(``colbert/ranking/colbert_ranker.py:75-137``: candidate generation → exact
scoring → sort desc → truncate to depth). The Spark engine must reproduce this
oracle's top-k (doc_id, score) rank-identically:

  * scores accumulated in float64, per-query terms processed in sorted order
    (fixes float addition order);
  * deterministic tie-break ``(-score, doc_id)``;
  * exact collection statistics (N, avgdl, df) — no approximations
    (north_star requirement).

BM25 variant: Robertson/Sparck-Jones idf with +1 floor (Lucene-style, always
positive):  idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))
  score(q,d) = Σ_{t ∈ unique(q)} qtf(t) · idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
with k1=0.9, b=0.4 (defaults per FIXTURES.md).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from colbert_spark.functions.tokenizer import py_tokenize

K1_DEFAULT = 0.9
B_DEFAULT = 0.4


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(
    tf: int, doclen: int, avgdl: float, idf: float, k1: float = K1_DEFAULT, b: float = B_DEFAULT
) -> float:
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doclen / avgdl))


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_id, text) pairs."""

    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)  # term -> [(doc_id, tf)]
    doclens: dict[int, int] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0

    @classmethod
    def build(cls, docs: list[tuple[int, str]], k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> "OracleIndex":
        idx = cls(k1=k1, b=b)
        for doc_id, text in docs:
            terms = py_tokenize(text)
            idx.doclens[doc_id] = len(terms)
            for term, tf in Counter(terms).items():
                idx.postings.setdefault(term, []).append((doc_id, tf))
        idx.n_docs = len(idx.doclens)
        total = sum(idx.doclens.values())
        idx.avgdl = total / idx.n_docs if idx.n_docs else 0.0
        for plist in idx.postings.values():
            plist.sort()
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def score_all(self, question: str) -> dict[int, float]:
        """Exact BM25 scores for every matching doc; float64, sorted-term order."""
        qterms = py_tokenize(question)
        scores: dict[int, float] = {}
        for term, qtf in sorted(Counter(qterms).items()):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = bm25_idf(self.n_docs, len(plist))
            for doc_id, tf in plist:
                s = qtf * bm25_term_score(tf, self.doclens[doc_id], self.avgdl, idf, self.k1, self.b)
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        return scores

    def topk(self, question: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), ordered by (-score, doc_id) — the golden output."""
        scores = self.score_all(question)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def topk_boolean(
        self,
        question: str,
        k: int = 10,
        require_groups: list[list[str]] | None = None,
        exclude_terms: list[str] | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k under boolean constraints: score `question` as plain BM25,
        keep docs containing ≥1 term of EVERY require group (MUST, filter
        context — no score contribution) and none of `exclude_terms`
        (MUST_NOT). A require group with no in-vocabulary term matches no
        document."""
        scores = self.score_all(question)
        if require_groups:
            for grp in require_groups:
                members = set()
                found = False
                for t in grp:
                    plist = self.postings.get(t)
                    if plist:
                        found = True
                        members.update(d for d, _ in plist)
                if not found:
                    return []
                scores = {d: s for d, s in scores.items() if d in members}
        if exclude_terms:
            banned = set()
            for t in exclude_terms:
                banned.update(d for d, _ in self.postings.get(t, ()))
            scores = {d: s for d, s in scores.items() if d not in banned}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def term_upper_bound(self, term: str) -> float:
        """Max possible BM25 contribution of `term` over all docs (for WAND tests)."""
        plist = self.postings.get(term)
        if not plist:
            return 0.0
        idf = bm25_idf(self.n_docs, len(plist))
        return max(
            bm25_term_score(tf, self.doclens[doc_id], self.avgdl, idf, self.k1, self.b)
            for doc_id, tf in plist
        )
