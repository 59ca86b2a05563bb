"""Single-process oracle indexer/searcher (SURVEY §5 test plan, item b).

A trivially-correct plain-Python implementation of the same spec as the Ray
engine — word/trigram tokenization, df/tf statistics, AND intersection,
BM25 top-k — implemented independently (dicts and loops, no shared
vectorized kernels) so differential tests are meaningful. The Ray engine
must be rank-identical (doc ids AND fp64 scores) to this oracle.

BM25 spec (shared contract, also encoded in the DuckDB oracle SQL):
    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score     = Σ_t idf * tfn   accumulated in ascending term_id order (fp64)
    k1 = 1.2, b = 0.75, avgdl = total_tokens / N
    order: score desc, doc_id asc (deterministic tie-break)
"""

from __future__ import annotations

import math
import re

from . import BM25_B, BM25_K1
from .hashing import fnv1a64

_WORD_RE = re.compile(r"[^a-z0-9]+")


def oracle_tokenize(text: str, mode: str = "word") -> list[int]:
    """All term ids of a text, one per token occurrence (with repeats)."""
    if mode == "word":
        return [fnv1a64(t) for t in _WORD_RE.split(text.lower()) if t]
    if mode == "trigram":
        runes = [ord(c) & 0xFFFF for c in text]
        return [(runes[i] << 32) | (runes[i + 1] << 16) | runes[i + 2]
                for i in range(len(runes) - 2)]
    raise ValueError(mode)


class OracleIndex:
    """Dict-based inverted index: term_id -> {doc_id: tf}."""

    def __init__(self, mode: str = "word"):
        self.mode = mode
        self.postings: dict[int, dict[int, int]] = {}
        self.dl: dict[int, int] = {}
        self.ndocs = 0

    @classmethod
    def build(cls, texts: list[str], doc_ids: list[int],
              mode: str = "word") -> "OracleIndex":
        idx = cls(mode)
        for text, doc in zip(texts, doc_ids):
            doc = int(doc)
            terms = oracle_tokenize(text, mode)
            idx.dl[doc] = len(terms)
            idx.ndocs += 1
            for t in terms:
                idx.postings.setdefault(t, {}).setdefault(doc, 0)
                idx.postings[t][doc] += 1
        return idx

    # --- statistics -----------------------------------------------------
    @property
    def avgdl(self) -> float:
        return sum(self.dl.values()) / self.ndocs if self.ndocs else 0.0

    def df(self, term_id: int) -> int:
        return len(self.postings.get(term_id, {}))

    def idf(self, term_id: int) -> float:
        df = self.df(term_id)
        return math.log(1.0 + (self.ndocs - df + 0.5) / (df + 0.5))

    # --- query ops ------------------------------------------------------
    def query_terms(self, q: str) -> list[int]:
        """Distinct query term ids, first-occurrence order."""
        seen, out = set(), []
        for t in oracle_tokenize(q, self.mode):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def match(self, q: str) -> list[int]:
        """AND over all query terms → ascending doc ids (J3 analog)."""
        terms = self.query_terms(q)
        if not terms:
            return []
        # df-ascending intersection order (reference's intended optimization,
        # search_cond.go:688-698)
        terms.sort(key=lambda t: (self.df(t), t))
        docs = set(self.postings.get(terms[0], {}))
        for t in terms[1:]:
            docs &= set(self.postings.get(t, {}))
            if not docs:
                break
        return sorted(docs)

    def bm25(self, q: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k BM25 (OR semantics). Deterministic accumulation + ties."""
        terms = sorted(self.query_terms(q))  # ascending term_id accumulation
        if not terms or not self.ndocs:
            return []
        avgdl = self.avgdl
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = self.idf(t)
            for doc in sorted(plist):
                tf = plist[doc]
                dl = self.dl[doc]
                tfn = tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
                scores[doc] = scores.get(doc, 0.0) + idf * tfn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def count(self, q: str) -> int:
        return len(self.match(q))
