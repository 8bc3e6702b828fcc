"""Sources for the engine's canonical input table
``docs(repo, path, commit, lang, content)`` (BASELINE.json input_hint).

This is the analog of the reference's bag-store tree walk
(Vault.scala:34-51 lists stores/bags, Bag.scala:66-68 lists files): one
row = one file, uniquely keyed by (repo, path, commit), the way a Solr
doc is keyed by ``<bagId>/<filePath>`` (Solr.scala:51).

Two sources:
  * ``load_docs`` — deterministic adapter over the driver-provided
    ``documents.parquet`` (doc_id, text, lang, source, n_chars). The
    mapping is pure SQL, replicated verbatim in oracle queries.
  * ``synth_code_docs`` — seeded synthetic source-code corpus for unit
    tests (camelCase/snake_case identifiers, language keyword pools,
    Zipf-skewed hot terms; FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string"

# The documents.parquet -> docs mapping, kept trivially SQL-expressible so
# DuckDB oracles reconstruct identical rows:
#   repo    = source
#   path    = 'docs/' || lpad(doc_id, 8, '0') || '.txt'
#   commit  = rpad(md5(source || ':' || doc_id), 40, '0')   (40-hex like git)
#   lang    = lang
#   content = coalesce(text, '')
# plus deterministic access-control columns (pure functions of the raw
# doc_id, so DuckDB oracles reproduce them) modeling the reference's
# auth-info fields (AuthorisationItem.scala:37-39, RightsFor.scala):
#   accessible_to  = doc_id % 10 -> 0:NONE 1:RESTRICTED_REQUEST
#                    2,3:KNOWN else:ANONYMOUS
#   date_available = TIMESTAMP '2020-01-01' + (doc_id % 3650) days
#   depositor      = 'user' || (doc_id % 7)

# the pinned "now" for `easy_dataset_date_available:[* TO NOW]` filters
# (SearchServlet.scala:109) — fixed so results are deterministic
ACCESS_NOW = "2026-08-17"


def _acl_columns(doc_id_col: F.Column) -> dict[str, F.Column]:
    m = doc_id_col % 10
    return {
        "accessible_to": (
            F.when(m == 0, "NONE")
            .when(m == 1, "RESTRICTED_REQUEST")
            .when(m.isin(2, 3), "KNOWN")
            .otherwise("ANONYMOUS")),
        # built from doc_id_col (not a hardcoded column name) so callers
        # may pass any id expression/rename without silently reading the
        # wrong column
        "date_available": (
            F.lit("2020-01-01").cast("timestamp")
            + F.make_interval(days=(doc_id_col % 3650).cast("int"))),
        "depositor": F.concat(F.lit("user"), (doc_id_col % 7).cast("string")),
    }


def load_docs(spark: SparkSession, sf_dir: str,
              with_acl: bool = True) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = [
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.lpad(F.col("doc_id").cast("string"), 8, "0"), F.lit(".txt")).alias("path"),
        F.rpad(F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))), 40, "0").alias("commit"),
        F.col("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    ]
    if with_acl:
        acl = _acl_columns(F.col("doc_id"))
        cols += [
            acl["accessible_to"].alias("accessible_to"),
            acl["date_available"].alias("date_available"),
            acl["depositor"].alias("depositor"),
        ]
    return d.select(*cols)


def auth_info_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 auth-info fetch modeled as a TABLE read — one row per file with
    the easy-auth-info response fields (AuthorisationItem.scala:31-39:
    itemId, owner, dateAvailable, accessibleTo, visibleTo, licenseKey,
    licenseTitle). The reference fetches these per file over HTTP
    (AuthorisationComponent.scala:41-51) — one round-trip per file, the
    very pattern that caps its indexer at sequential throughput; the
    Spark-native equivalent of that data dependency is a JOIN against
    the auth service's exported table (see join_auth_info). Field values
    are the same deterministic doc_id functions as _acl_columns, so
    DuckDB oracles reproduce them exactly."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    acl = _acl_columns(F.col("doc_id"))
    m = F.col("doc_id") % 10
    return d.select(
        # itemId = <bagId>/<filePath> (AuthorisationItem.scala:31;
        # FileItem.scala:24 strips the prefix back off)
        F.concat(F.col("source"), F.lit("/docs/"),
                 F.lpad(F.col("doc_id").cast("string"), 8, "0"),
                 F.lit(".txt")).alias("item_id"),
        acl["depositor"].alias("owner"),
        acl["date_available"].alias("date_available"),
        acl["accessible_to"].alias("accessible_to"),
        # visibleTo: NONE files are also invisible; everything else public
        F.when(m == 0, "NONE").otherwise("ANONYMOUS").alias("visible_to"),
        F.concat(F.lit("lic"), (F.col("doc_id") % 3).cast("string")).alias("license_key"),
        F.concat(F.lit("License "), (F.col("doc_id") % 3).cast("string")).alias("license_title"),
    )


def join_auth_info(docs: DataFrame, auth: DataFrame) -> DataFrame:
    """J4 auth-info join at ingest: every file joins its AuthorisationItem
    by item_id = repo/path (FileItem.scala:21-24); files whose
    accessibleTo == NONE are dropped — the reference never submits them
    (EasySolr4filesIndexApp.scala:131-137, `isAccessible` at
    AuthorisationItem.scala:37-39). The joined owner/accessibleTo/
    dateAvailable become the indexed access-control fields
    (FileItem.scala:36-37), replacing the inline _acl_columns derivation.

    Scale shape: an equi-join on the file key — co-partitionable with the
    docs scan (both sides key by file identity), no driver round-trips;
    at 100 TB this is a shuffle-or-broadcast join Catalyst plans by side
    size, versus the reference's per-file HTTP fetch."""
    keyed = docs.withColumn("item_id",
                            F.concat(F.col("repo"), F.lit("/"), F.col("path")))
    return (keyed.join(auth, "item_id")
            .filter(F.col("accessible_to") != "NONE")
            .withColumnRenamed("owner", "depositor")
            .drop("item_id", "visible_to", "license_key", "license_title"))


def ingest_acl_filter(docs: DataFrame) -> DataFrame:
    """P6 ingest accessibility filter: files whose accessibleTo == NONE are
    never indexed (EasySolr4filesIndexApp.scala:125-144, RightsFor.scala:19-20).
    No-op when the source carries no accessible_to column."""
    if "accessible_to" not in docs.columns:
        return docs
    return docs.filter(F.col("accessible_to") != "NONE")


DOCS_FROM_DOCUMENTS_SQL = """
SELECT source AS repo,
       'docs/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS path,
       rpad(md5(source || ':' || CAST(doc_id AS VARCHAR)), 40, '0') AS commit,
       lang,
       coalesce(text, '') AS content
FROM documents
"""

_LANG_KEYWORDS = {
    "java": ["public", "class", "void", "static", "final", "return", "new", "extends"],
    "python": ["def", "class", "return", "import", "self", "lambda", "yield", "None"],
    "scala": ["def", "val", "object", "trait", "case", "match", "implicit", "extends"],
    "go": ["func", "package", "struct", "interface", "defer", "chan", "range", "nil"],
    "text": ["license", "copyright", "permission", "notice", "software", "documentation"],
}

_IDENT_STEMS = [
    "parse", "build", "index", "query", "token", "score", "merge", "block",
    "read", "write", "fetch", "cache", "hash", "split", "filter", "count",
]


def _make_identifier(rng: random.Random) -> str:
    parts = rng.sample(_IDENT_STEMS, rng.randint(2, 3))
    style = rng.random()
    if style < 0.4:  # camelCase
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    if style < 0.7:  # snake_case
        return "_".join(parts)
    return "-".join(parts)  # kebab-case


def synth_code_docs(spark: SparkSession, n_docs: int = 400, seed: int = 7,
                    n_repos: int = 6) -> DataFrame:
    """Deterministic synthetic code corpus (FIXTURES.md §1). Content is a
    pure function of (repo, path, commit, seed). Zipf-skews the token
    'license' as the hot term to exercise skew handling."""
    rows = []
    langs = list(_LANG_KEYWORDS)
    for i in range(n_docs):
        rng = random.Random(f"{seed}:{i}")
        repo = f"org{i % n_repos}/proj{(i // n_repos) % 3}"
        lang = langs[i % len(langs)]
        ext = {"java": "java", "python": "py", "scala": "scala", "go": "go", "text": "md"}[lang]
        path = f"src/mod{i % 9}/File{i:04d}.{ext}"
        commit = hashlib.sha1(f"{repo}:{i // 10}".encode()).hexdigest()
        words: list[str] = []
        # license-boilerplate header: stopword-heavy + the hot term
        if rng.random() < 0.8:
            words += ["license", "licensed", "under", "the", "apache", "license"]
        body_len = rng.randint(20, 120) if rng.random() > 0.02 else 0
        kw = _LANG_KEYWORDS[lang]
        for _ in range(body_len):
            r = rng.random()
            if r < 0.3:
                words.append(rng.choice(kw))
            elif r < 0.7:
                words.append(_make_identifier(rng))
            elif r < 0.75:
                words.append("license")  # hot term, Zipf head
            else:
                words.append(rng.choice(_IDENT_STEMS))
        rows.append((repo, path, commit, lang, " ".join(words)))
    return spark.createDataFrame(rows, DOCS_SCHEMA)
