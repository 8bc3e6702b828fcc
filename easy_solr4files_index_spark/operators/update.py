"""Incremental maintenance: delete-by-query + delete-before-insert upsert.

The reference deletes by unique-key prefix before reindexing a bag
(`deleteDocuments(s"id:${bag.bagId}*")`, EasySolr4filesIndexApp.scala:48-49;
arbitrary delete queries via UpdateServlet.scala:73-87 and the CLI,
CommandLineOptions.scala:39-45). Our doc key is (repo, path, commit); the
bagId-prefix analog is "every doc of one repo" and the folder analog
(docs/index.md:19 `id:.../Documents/*`) is a path prefix.

Deleting from a logical index = anti-filter on docs_store + tf, then
refresh termstats and the global scalars (N, avgdl). Spark-first: these
are plain filters — Catalyst pushes them into both scans; at physical-
index level this becomes an Iceberg row-level delete + snapshot commit
(SURVEY.md §2.1 S11-S12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .index_build import FtsIndex, IndexConfig, build_index


def delete_where(index: FtsIndex, predicate: F.Column) -> FtsIndex:
    """New index with docs matching ``predicate`` (over docs_store cols)
    removed. Stats (df, N, avgdl) are recomputed — BM25 scores after a
    delete match a fresh build of the remaining corpus exactly."""
    doomed = index.docs_store.filter(predicate).select("doc_id")
    docs_store = index.docs_store.join(doomed, "doc_id", "left_anti").persist()
    tf = index.tf.join(doomed, "doc_id", "left_anti").persist()
    termstats = tf.groupBy("term").agg(F.count("*").alias("df"))
    # phrase queries read index.positions — anti-filter it by the same
    # doomed set (it is a lazy plan; the filter costs nothing until a
    # phrase query runs, and then it is the same semijoin shape as tf)
    positions = (index.positions.join(doomed, "doc_id", "left_anti")
                 if index.positions is not None else None)
    g = docs_store.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    return FtsIndex(spark=index.spark, config=index.config, docs_store=docs_store,
                    tf=tf, termstats=termstats,
                    n_docs=g["n"] or 0, avgdl=float(g["avgdl"] or 0.0),
                    positions=positions)


def delete_by_repo(index: FtsIndex, repo: str) -> FtsIndex:
    """`id:<bagId>*` analog (EasySolr4filesIndexApp.scala:49)."""
    return delete_where(index, F.col("repo") == repo)


def delete_by_path_prefix(index: FtsIndex, repo: str, prefix: str) -> FtsIndex:
    """Folder-delete analog (`id:<uuid>/Documents/*`, docs/index.md:19)."""
    return delete_where(index, (F.col("repo") == repo) & F.col("path").startswith(prefix))


def upsert_repos(spark, source_docs: DataFrame, new_docs: DataFrame,
                 config: IndexConfig | None = None) -> FtsIndex:
    """Delete-before-insert per repo (the reference's idempotent update
    cycle, EasySolr4filesIndexApp.scala:48-51): every repo present in
    ``new_docs`` fully replaces that repo in ``source_docs``, and the
    union is indexed. The index does not store content (like Solr's
    stored=false ``text`` field, schema.xml:213), so updates take the
    source table, not an existing FtsIndex.

    docIDs are reassigned (they are ranks); rank-identity is preserved
    because ids remain the (repo, path, commit) order.
    """
    repos = [r["repo"] for r in new_docs.select("repo").distinct().collect()]
    merged = source_docs.filter(~F.col("repo").isin(repos)).unionByName(new_docs)
    return build_index(spark, merged, config)
