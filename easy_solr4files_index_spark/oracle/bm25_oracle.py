"""Brute-force pure-Python/numpy BM25 oracle (SURVEY.md §5.2).

Shares only the tokenizer *spec* with the engine (tokenize_py), not the
Spark code path. Implements the exact Lucene-default formula the engine
claims (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)), exact dl,
tie-break score desc then doc_id asc) — reference: solrconfig.xml:39
(luceneMatchVersion ⇒ BM25 default), schema.xml:1218-1227 (no override).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from ..functions.tokenizer import LUCENE_STOPWORDS, tokenize_py


@dataclass
class OracleIndex:
    doc_keys: list[tuple[str, str, str]]        # (repo, path, commit) sorted = doc_id order
    meta: list[dict]                            # per doc: repo/path/commit/lang
    tfs: list[Counter]                          # per doc term -> tf
    dls: list[int]
    df: Counter
    n: int
    avgdl: float
    k1: float = 1.2
    b: float = 0.75


def build_oracle(rows: list[dict], stopwords=LUCENE_STOPWORDS,
                 include_path_tokens: bool = True, k1: float = 1.2, b: float = 0.75) -> OracleIndex:
    """rows: dicts with repo, path, commit, lang, content."""
    rows = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    tfs, dls, df = [], [], Counter()
    for r in rows:
        text = r["content"] or ""
        if include_path_tokens:
            text = f"{text} {r['path']}" if text else r["path"]
        toks = tokenize_py(text, stopwords)
        c = Counter(toks)
        tfs.append(c)
        dls.append(len(toks))
        for t in c:
            df[t] += 1
    n = len(rows)
    avgdl = (sum(dls) / n) if n else 0.0
    return OracleIndex(
        doc_keys=[(r["repo"], r["path"], r["commit"]) for r in rows],
        meta=[{k: r.get(k) for k in ("repo", "path", "commit", "lang")} for r in rows],
        tfs=tfs, dls=dls, df=df, n=n, avgdl=avgdl, k1=k1, b=b,
    )


def oracle_search(idx: OracleIndex, text: str | None, k: int = 10, skip: int = 0,
                  filters: dict[str, list[str]] | None = None,
                  stopwords=LUCENE_STOPWORDS) -> list[dict]:
    def passes(i: int) -> bool:
        if not filters:
            return True
        return all(idx.meta[i].get(key) in set(vals) for key, vals in filters.items())

    if text is None:
        hits = [(1.0, i) for i in range(idx.n) if passes(i)]
        hits.sort(key=lambda x: x[1])
        page = hits[skip:skip + k]
        return [{"doc_id": i, **idx.meta[i], "score": s} for s, i in page]

    terms = sorted(set(tokenize_py(text, stopwords)))
    if not terms:
        return []
    avgdl = idx.avgdl if idx.avgdl > 0 else 1.0
    scored = []
    for i in range(idx.n):
        if not passes(i):
            continue
        s = 0.0
        for t in terms:
            tf = idx.tfs[i].get(t, 0)
            if tf == 0:
                continue
            dfi = idx.df[t]
            idf = math.log(1.0 + (idx.n - dfi + 0.5) / (dfi + 0.5))
            s += idf * tf * (idx.k1 + 1.0) / (tf + idx.k1 * (1.0 - idx.b + idx.b * idx.dls[i] / avgdl))
        if s > 0.0:
            scored.append((s, i))
    scored.sort(key=lambda x: (-x[0], x[1]))
    page = scored[skip:skip + k]
    return [{"doc_id": i, **idx.meta[i], "score": s} for s, i in page]
