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
    toks: list[list[str]]                       # per doc ordered token stream (phrases)
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
    tfs, streams, dls, df = [], [], [], Counter()
    for r in rows:
        text = r["content"] or ""
        if include_path_tokens:
            text = f"{text} {r['path']}" if text else r["path"]
        toks = tokenize_py(text, stopwords)
        c = Counter(toks)
        tfs.append(c)
        streams.append(toks)
        dls.append(len(toks))
        for t in c:
            df[t] += 1
    n = len(rows)
    avgdl = (sum(dls) / n) if n else 0.0
    return OracleIndex(
        doc_keys=[(r["repo"], r["path"], r["commit"]) for r in rows],
        meta=[{k: r.get(k) for k in ("repo", "path", "commit", "lang")} for r in rows],
        tfs=tfs, toks=streams, dls=dls, df=df, n=n, avgdl=avgdl, k1=k1, b=b,
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


def _idf(idx: OracleIndex, t: str) -> float:
    dfi = idx.df.get(t, 0)
    return math.log(1.0 + (idx.n - dfi + 0.5) / (dfi + 0.5))


def _tfnorm(idx: OracleIndex, tf: float, dl: int) -> float:
    avgdl = idx.avgdl if idx.avgdl > 0 else 1.0
    return tf * (idx.k1 + 1.0) / (tf + idx.k1 * (1.0 - idx.b + idx.b * dl / avgdl))


def _phrase_tf(toks: list[str], phrase: tuple[str, ...]) -> int:
    """Exact phrase frequency by direct scan of the token stream."""
    n = 0
    L = len(phrase)
    for s in range(len(toks) - L + 1):
        if all(toks[s + i] == phrase[i] for i in range(L)):
            n += 1
    return n


def oracle_search_boolean(idx: OracleIndex, text: str, k: int = 10, skip: int = 0,
                          filters: dict[str, list[str]] | None = None,
                          stopwords=LUCENE_STOPWORDS) -> list[dict]:
    """Dismax boolean/phrase search by brute force: parses with the
    shared grammar spec (operators/dismax.py), then per doc evaluates
    Lucene BooleanQuery semantics directly — MUSTs all match, MUST_NOTs
    none, else ≥1 SHOULD; phrase clauses score with tf = exact phrase
    frequency (token-stream scan) and idf = Σ idf over the phrase's term
    sequence (BM25Similarity.idfExplain for PhraseQuery)."""
    from ..operators.dismax import parse_dismax

    clauses = parse_dismax(text, stopwords)
    if not any(c.occur in ("should", "must") for c in clauses):
        return []

    def passes(i: int) -> bool:
        if not filters:
            return True
        return all(idx.meta[i].get(key) in set(vals) for key, vals in filters.items())

    n_must = sum(1 for c in clauses if c.occur == "must")
    scored = []
    for i in range(idx.n):
        if not passes(i):
            continue
        s, musts_hit, any_should, prohibited = 0.0, 0, False, False
        for c in clauses:
            if c.is_phrase:
                tf = _phrase_tf(idx.toks[i], c.terms)
                cidf = sum(_idf(idx, t) for t in c.terms)
            else:
                tf = idx.tfs[i].get(c.terms[0], 0)
                cidf = _idf(idx, c.terms[0])
            if tf == 0:
                continue
            if c.occur == "must_not":
                prohibited = True
                break
            if c.occur == "must":
                musts_hit += 1
            else:
                any_should = True
            s += cidf * _tfnorm(idx, float(tf), idx.dls[i])
        if prohibited or musts_hit < n_must:
            continue
        if n_must == 0 and not any_should:
            continue
        scored.append((s, i))
    scored.sort(key=lambda x: (-x[0], x[1]))
    page = scored[skip:skip + k]
    return [{"doc_id": i, **idx.meta[i], "score": s} for s, i in page]
