"""Pure-Python/numpy reference BM25 — the oracle standing in for the
reference's Elasticsearch results (SURVEY §5.4).

Same analyzer contract as the engine
(snowplow_elasticsearch_loader_spark.functions.analyze), same Lucene
BM25 formula (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))), same
quantized ranking contract (round(score, 6) desc, doc_id asc).

Kept deliberately simple (<100 lines of logic) and independent of
Spark so it can't share bugs with the engine.
"""

from __future__ import annotations

import math
import re
from collections import Counter

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = {}
        self.doclen: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text)
            self.doclen[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.doclen)
        self.avgdl = (
            float(sum(self.doclen.values())) / float(self.n_docs) if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score_rounded)]; accumulation in ascending
        term order — the shared determinism contract."""
        qterms = sorted(Counter(tokenize(query)).items())
        scores: dict[int, float] = {}
        for term, qtf in qterms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w = float(qtf) * self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doclen[doc_id]
                norm = self.k1 * (1.0 - self.b + self.b * float(dl) / self.avgdl)
                contrib = w * (float(tf) * (self.k1 + 1.0)) / (float(tf) + norm)
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        ranked = sorted(
            ((round(s, 6), d) for d, s in scores.items()), key=lambda x: (-x[0], x[1])
        )
        return [(i + 1, d, s) for i, (s, d) in enumerate(ranked[:k])]
