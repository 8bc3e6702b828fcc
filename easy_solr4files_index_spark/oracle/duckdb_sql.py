"""DuckDB oracle-SQL generator for the driver's correctness gate.

Every engine query in ``__spark_entry__.queries()`` has a matching ANSI
SQL string built here that recomputes the SAME result from the raw
``documents`` parquet view: same docs-adapter mapping
(sources/docs_source.py), same tokenizer chain (functions/tokenizer.py —
one regex spec shared by Spark exprs, pandas UDF, Python, and this SQL),
same BM25 formula (operators/query.py), same tie-break.
"""

from __future__ import annotations

from ..functions.tokenizer import LUCENE_STOPWORDS, stopword_not_in_sql, tokenize_duckdb_sql

K1, B = 1.2, 0.75

# (repo, path) is the unique doc key after the adapter; doc_id is its
# dense rank — identical to operators/docids.assign_doc_ids because the
# 40-hex commit is a function of (repo, doc_id) and never perturbs order.
PREFIX = f"""
WITH docs AS (
  SELECT source AS repo,
         'docs/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS path,
         lang,
         coalesce(text, '') AS content
  FROM documents
),
ids AS (
  SELECT repo, path, lang,
         row_number() OVER (ORDER BY repo, path) - 1 AS doc_id
  FROM docs
),
toks0 AS (
  SELECT repo, path,
         unnest({tokenize_duckdb_sql("content || ' ' || path")}) AS term
  FROM docs
),
tok AS (SELECT * FROM toks0 WHERE {stopword_not_in_sql(LUCENE_STOPWORDS)}),
dl0 AS (SELECT repo, path, count(*) AS dl FROM tok GROUP BY 1, 2),
docl AS (
  SELECT i.doc_id, d.repo, d.path, d.lang, coalesce(dl0.dl, 0) AS dl
  FROM docs d
  JOIN ids i USING (repo, path)
  LEFT JOIN dl0 USING (repo, path)
),
g AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docl),
tf AS (SELECT term, repo, path, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
"""


def _values(terms: list[str]) -> str:
    return ", ".join(f"('{t}')" for t in sorted(set(terms)))


def _filters_where(filters: dict[str, list[str]] | None, alias: str = "docl") -> str:
    if not filters:
        return "TRUE"
    clauses = []
    for key, vals in filters.items():
        quoted = ", ".join(f"'{v}'" for v in vals)
        clauses.append(f"{alias}.{key} IN ({quoted})")
    return " AND ".join(clauses)


def bm25_topk_sql(terms: list[str], k: int = 10, skip: int = 0,
                  filters: dict[str, list[str]] | None = None) -> str:
    """Top-k page: (doc_id, repo, path, lang, score) — engine column order."""
    return f"""{PREFIX},
q(term) AS (VALUES {_values(terms)}),
sc AS (
  SELECT tf.repo, tf.path,
         sum( ln(1 + (g.n - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf * ({K1} + 1.0)
              / (tf.tf + {K1} * (1.0 - {B} + {B} * docl.dl / g.avgdl)) ) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN q USING (term)
  JOIN docl USING (repo, path)
  CROSS JOIN g
  GROUP BY 1, 2
)
SELECT docl.doc_id, sc.repo, sc.path, docl.lang, round(sc.score, 4) AS score
FROM sc JOIN docl USING (repo, path)
WHERE {_filters_where(filters)}
ORDER BY sc.score DESC, sc.repo, sc.path
LIMIT {k} OFFSET {skip}
"""


def matchall_sql(k: int = 10, skip: int = 0,
                 filters: dict[str, list[str]] | None = None) -> str:
    return f"""{PREFIX}
SELECT doc_id, repo, path, lang, 1.0 AS score
FROM docl
WHERE {_filters_where(filters)}
ORDER BY doc_id
LIMIT {k} OFFSET {skip}
"""


def numfound_sql(terms: list[str], filters: dict[str, list[str]] | None = None) -> str:
    return f"""{PREFIX},
q(term) AS (VALUES {_values(terms)})
SELECT count(DISTINCT (docl.repo, docl.path)) AS found
FROM tf JOIN q USING (term) JOIN docl USING (repo, path)
WHERE {_filters_where(filters)}
"""


def termstats_sql(terms: list[str]) -> str:
    return f"""{PREFIX},
q(term) AS (VALUES {_values(terms)})
SELECT dft.term, dft.df FROM dft JOIN q USING (term)
"""


def global_stats_sql() -> str:
    return f"""{PREFIX}
SELECT n AS n_docs, round(avgdl, 6) AS avgdl FROM g
"""


def doc_stats_sql(repo: str) -> str:
    return f"""{PREFIX}
SELECT doc_id, repo, path, dl FROM docl WHERE repo = '{repo}'
"""


def sha256_sql() -> str:
    """Per-row content invariant (input_hint: sha256 equality vs source)."""
    return """
SELECT source AS repo,
       'docs/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS path,
       sha256(coalesce(text, '')) AS sha256
FROM documents
"""


def delete_prefix_sql(repo: str) -> str:
    """Remaining per-repo doc counts after the `id:<bagId>*` delete analog."""
    return f"""{PREFIX}
SELECT repo, count(*) AS cnt FROM docl WHERE repo <> '{repo}' GROUP BY repo
"""


def path_prefix_sql(prefix: str) -> str:
    """P14 prefix predicate over the doc key (folder-delete analog)."""
    return f"""{PREFIX}
SELECT doc_id, repo, path FROM docl WHERE path LIKE '{prefix}%'
"""
