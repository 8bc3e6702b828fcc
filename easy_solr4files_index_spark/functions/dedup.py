"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

First-class training-data-pipeline ops over the ``documents`` table.
All heavy lifting is Catalyst (list exprs + joins + hash aggregates);
nothing here uses per-row Python. Each op has a DuckDB-SQL twin.

Scale notes:
  * exact: groupBy(md5) — partial agg, no skew (hashes are uniform).
  * ngram-Jaccard: shingle self-join; exact but O(pairs-sharing-a-
    shingle) — the brute-force baseline. At 100 TB use minhash_lsh to
    generate candidates first, then verify candidates with this.
  * MinHash+LSH: 32 perms × 8 bands × 4 rows; candidates = equal band
    signature. Everything is a hash groupBy; hot bands (boilerplate
    shingle sets) are bounded by banding.
  * SimHash: 32-bit, tf-weighted; one explode over (doc×bit) then a
    hash agg — embarrassingly parallel.

Shingling/tokens use the UNFILTERED analyzer stream (no stopword
removal) — dedup must stay faithful to content, unlike search.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import MD5INT_DUCK, MD5INT_SPARK
from .tokenizer import tokenize_duckdb_sql, tokenize_expr

P31 = 2147483647  # 2^31 - 1 (Mersenne prime) — minhash modulus
N_PERMS, N_BANDS = 32, 8  # 4 rows per band

_rng = random.Random(1234)
PERMS = [(i, _rng.randrange(1, P31), _rng.randrange(0, P31)) for i in range(N_PERMS)]


# ------------------------------------------------------------------ exact

def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_md5, cnt, min_doc_id) per distinct content — cnt > 1 ⇒ dups."""
    return (docs.groupBy(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_md5"))
            .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_doc_id")))


def exact_dup_groups_sql() -> str:
    return """
SELECT md5(coalesce(text, '')) AS content_md5,
       count(*) AS cnt, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------- shingles

def _shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh) — DISTINCT 3-gram token shingles."""
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")), stopwords=())
    sh = F.expr(
        "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t) - 3), "
        "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) "
        "ELSE cast(array() as array<string>) END")
    return (docs.select("doc_id", toks.alias("t"))
            .select("doc_id", F.explode(F.array_distinct(sh)).alias("sh")))


_SHINGLES_SQL = """
tok AS (
  SELECT doc_id, list_filter({tok}, t -> t <> '') AS l FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))) AS sh
  FROM tok WHERE len(l) >= 3
)
"""


def _shingles_sql() -> str:
    return _SHINGLES_SQL.format(tok=tokenize_duckdb_sql("text"))


# ------------------------------------------------------------ ngram jaccard

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.6,
                        text_col: str = "text") -> DataFrame:
    """(a, b, jaccard) for doc pairs with 3-gram shingle Jaccard ≥ threshold."""
    sh = _shingles(docs, text_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (sh.alias("x").join(sh.alias("y"),
                                (F.col("x.sh") == F.col("y.sh")) &
                                (F.col("x.doc_id") < F.col("y.doc_id")))
             .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
           .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
           .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", "jaccard"))
    return out


def ngram_jaccard_pairs_sql(threshold: float = 0.6) -> str:
    return f"""
WITH {_shingles_sql()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {threshold}
"""


# ------------------------------------------------------------- minhash LSH

def minhash_signatures_wide(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, mh0..mh31) — 32 permutations h_i(x) = (a_i·x + b_i) mod
    (2^31−1), as 32 ``min`` aggregate EXPRESSIONS inside ONE hash
    aggregate over (doc_id) — the SimHash shape.

    The round-1..3 form crossJoined every shingle row against the 32-row
    perm table before a groupBy(doc_id, perm): at 200k docs × ~200
    shingles that is a 1.3B-row intermediate feeding TWO aggregates (min,
    then collect_list+array_sort per band). Here the shuffle carries one
    partially-aggregated row per doc per map task and the per-shingle
    md5 is evaluated once, not per perm; band signatures derive from the
    32 columns row-locally, so the whole signature stage is one exchange.
    """
    sh = _shingles(docs, text_col)
    x = (F.expr(MD5INT_SPARK.format(x="sh")) % F.lit(P31)).alias("x")
    aggs = [F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(P31)).alias(f"mh{i}")
            for i, a, b in PERMS]
    return sh.select("doc_id", x).groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, perm, mh) — narrow view of :func:`minhash_signatures_wide`
    (kept for tests/inspection; the band path never widens back)."""
    wide = minhash_signatures_wide(docs, text_col)
    mh = F.array(*[F.col(f"mh{i}") for i in range(N_PERMS)])
    return (wide.select("doc_id", F.posexplode(mh).alias("perm", "mh")))


def minhash_band_candidates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(a, b) candidate near-dup pairs: ≥1 equal LSH band signature.

    Band signatures are md5 over the band's mh values in perm order —
    byte-identical to the DuckDB twin's ``string_agg(... ORDER BY perm)``
    — computed row-locally from the wide signature columns (no second
    aggregate), then exploded to (doc_id, band, sig) for the equi-join."""
    rows = N_PERMS // N_BANDS
    wide = minhash_signatures_wide(docs, text_col)
    sigs = F.array(*[
        F.md5(F.concat_ws(",", *[F.col(f"mh{b * rows + r}").cast("string")
                                 for r in range(rows)]))
        for b in range(N_BANDS)])
    bands = wide.select("doc_id", F.posexplode(sigs).alias("band", "sig"))
    return (bands.alias("x").join(
        bands.alias("y"),
        (F.col("x.band") == F.col("y.band")) & (F.col("x.sig") == F.col("y.sig")) &
        (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct())


def _perms_values_sql() -> str:
    return ", ".join(f"({i}, {a}, {b})" for i, a, b in PERMS)


def minhash_band_candidates_sql() -> str:
    rows_per_band = N_PERMS // N_BANDS
    md5i = MD5INT_DUCK.format(x="sh")
    return f"""
WITH {_shingles_sql()},
perms(perm, a, b) AS (VALUES {_perms_values_sql()}),
mh AS (
  SELECT s.doc_id, p.perm,
         min((p.a * ({md5i} % {P31}) + p.b) % {P31}) AS mh
  FROM sh s CROSS JOIN perms p
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, CAST(perm // {rows_per_band} AS INT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS sig
  FROM mh GROUP BY 1, 2
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y
  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
"""


# ------------------------------------------------------------- dedup apply

def dedup_apply(docs: DataFrame, threshold: float = 0.6,
                text_col: str = "text", max_iters: int = 25) -> DataFrame:
    """(doc_id, keep_doc_id) — the COMPOSED at-scale dedup operator:
    MinHash-LSH band candidates → Jaccard verification on CANDIDATE PAIRS
    ONLY → connected components (iterative min-label propagation) →
    keep = min doc_id per near-dup cluster. keep_doc_id == doc_id means
    the doc survives deduplication.

    Scale shape: the expensive shingle-equality self-join runs only over
    docs that appear in some LSH candidate pair (a left-semi cut), so
    verification cost is O(candidate pairs), never O(all pairs) — the
    standalone ngram_jaccard_pairs brute force is demoted to a verifier.
    Label propagation converges in O(cluster diameter) rounds (near-dup
    clusters are band-connected and shallow); each round is one join +
    one hash aggregate, lineage truncated via localCheckpoint.
    """
    cand = minhash_band_candidates(docs, text_col).persist()
    in_cand = (cand.select(F.col("a").alias("doc_id"))
               .union(cand.select(F.col("b").alias("doc_id"))).distinct())
    # semi-join the RAW docs before re-tokenizing: Catalyst cannot push a
    # join below the shingle explode, so cutting first means the verify
    # pass tokenizes only docs that appear in some candidate pair
    shc = _shingles(docs.join(in_cand, "doc_id", "left_semi"),
                    text_col).persist()
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    shx = shc.select(F.col("doc_id").alias("a"), "sh")
    shy = shc.select(F.col("doc_id").alias("b"), "sh")
    inter = (cand.join(shx, "a").join(shy, ["b", "sh"])
             .groupBy("a", "b").agg(F.count("*").alias("inter")))
    ver = (inter
           .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
           .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
           .filter(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
                   >= threshold)
           .select("a", "b"))

    edges = (ver.union(ver.select(F.col("b").alias("a"), F.col("a").alias("b")))
             .toDF("src", "dst").persist())
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")).localCheckpoint())
    for _ in range(max_iters):
        nbr = (edges.join(labels, edges["dst"] == labels["doc_id"])
               .groupBy("src").agg(F.min("label").alias("nl")))
        new_labels = (labels.join(nbr, labels["doc_id"] == nbr["src"], "left")
                      .select(labels["doc_id"],
                              F.least(labels["label"],
                                      F.coalesce(nbr["nl"], labels["label"])).alias("label"))
                      .localCheckpoint())
        changed = (new_labels.alias("n").join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.label") < F.col("o.label")).count())
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"dedup_apply: no fixpoint after {max_iters} rounds")

    out = (docs.select("doc_id")
           .join(labels.withColumnRenamed("label", "keep_doc_id"), "doc_id", "left")
           .select("doc_id", F.coalesce("keep_doc_id", "doc_id").alias("keep_doc_id")))
    cand.unpersist()
    shc.unpersist()
    edges.unpersist()
    return out


def dedup_apply_sql(threshold: float = 0.6) -> str:
    """DuckDB twin: same candidates/verify, transitive closure via a
    recursive CTE, keep = min doc_id of the component (incl. self)."""
    rows_per_band = N_PERMS // N_BANDS
    md5i = MD5INT_DUCK.format(x="sh")
    return f"""
WITH RECURSIVE {_shingles_sql()},
perms(perm, a, b) AS (VALUES {_perms_values_sql()}),
mh AS (
  SELECT s.doc_id, p.perm,
         min((p.a * ({md5i} % {P31}) + p.b) % {P31}) AS mh
  FROM sh s CROSS JOIN perms p
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, CAST(perm // {rows_per_band} AS INT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS sig
  FROM mh GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
  GROUP BY 1, 2
),
ver AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {threshold}
),
edges AS (SELECT a AS src, b AS dst FROM ver UNION SELECT b, a FROM ver),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
  WHERE e.dst <> r.src
),
lab AS (SELECT src AS doc_id, least(src, min(dst)) AS keep FROM reach GROUP BY src)
SELECT d.doc_id, coalesce(lab.keep, d.doc_id) AS keep_doc_id
FROM documents d LEFT JOIN lab USING (doc_id)
"""


# ----------------------------------------------------------------- simhash

def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit tf-weighted SimHash over analyzer tokens.

    The 32 per-bit weighted sums are 32 aggregate EXPRESSIONS inside one
    hash aggregate over (doc_id) — not a 32× row explode: the shuffle
    carries one row per (doc, term), and map-side partial aggregation
    collapses it to one row per doc per map task. (Round-1 shape exploded
    (doc, term) × 32 bits, multiplying the tf shuffle ×32 for nothing.)
    """
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")), stopwords=())
    tf = (docs.select("doc_id", F.explode(toks).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    x32 = F.expr(MD5INT_SPARK.format(x="term")) % F.lit(4294967296)
    per_bit = [
        F.sum(F.col("tf") * (2 * F.expr(f"shiftright(x, {j}) & 1") - 1)).alias(f"s{j}")
        for j in range(32)
    ]
    sums = tf.withColumn("x", x32).groupBy("doc_id").agg(*per_bit)
    sig_expr = None
    for j in range(32):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig_expr = bit if sig_expr is None else sig_expr + bit
    sig = sums.select("doc_id", sig_expr.alias("simhash"))
    return docs.select("doc_id").join(sig, "doc_id", "left").fillna({"simhash": 0})


def simhash_candidates(docs: DataFrame, max_hamming: int = 3,
                       text_col: str = "text") -> DataFrame:
    """(a, b, hamming) — near-dup pairs with SimHash Hamming distance
    ≤ max_hamming (≤ 7 supported). Pigeonhole banding: split the 32-bit
    signature into (max_hamming + 1) chunks; any
    pair within distance h must agree on ≥1 chunk, so the candidate join
    is an equality join on (chunk_id, chunk_value) — a hash shuffle, never
    an all-pairs product. Exact Hamming verified with bit_count(xor).
    """
    n_chunks = max_hamming + 1
    assert n_chunks <= 8, "max_hamming must be <= 7 for a 32-bit signature"
    width = 32 // n_chunks + (1 if 32 % n_chunks else 0)
    sig = simhash32(docs, text_col)
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.expr(f"(simhash >> {i * width}) & {(1 << width) - 1}").alias("val"))
            for i in range(n_chunks)])).alias("c")
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    pairs = (chunks.alias("x").join(
        chunks.alias("y"),
        (F.col("x.chunk") == F.col("y.chunk")) & (F.col("x.val") == F.col("y.val")) &
        (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"),
                F.col("x.simhash").alias("sa"), F.col("y.simhash").alias("sb"))
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming"))
    return pairs


def simhash_candidates_sql(max_hamming: int = 3) -> str:
    n_chunks = max_hamming + 1
    width = 32 // n_chunks + (1 if 32 % n_chunks else 0)
    mask = (1 << width) - 1
    sig_sql = simhash32_sql().strip()
    chunk_rows = ", ".join(f"({i})" for i in range(n_chunks))
    return f"""
WITH sigs AS ({sig_sql}),
ck(chunk) AS (VALUES {chunk_rows}),
chunks AS (
  SELECT s.doc_id, s.simhash, ck.chunk,
         (s.simhash >> (ck.chunk * {width})) & {mask} AS val
  FROM sigs s CROSS JOIN ck
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM chunks x JOIN chunks y
  ON x.chunk = y.chunk AND x.val = y.val AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


def simhash32_sql() -> str:
    md5i = MD5INT_DUCK.format(x="term")
    tok = tokenize_duckdb_sql("text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter({tok}, t -> t <> '')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
bits AS (
  SELECT tf.doc_id, j.j,
         sum(tf.tf * (2 * ((({md5i} % 4294967296) >> j.j) % 2) - 1)) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, 32)) AS j) j
  GROUP BY 1, 2
),
sig AS (
  -- CAST: DuckDB integer sum() is HUGEINT; Spark emits int64
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY 1
)
SELECT d.doc_id, coalesce(sig.simhash, 0) AS simhash
FROM documents d LEFT JOIN sig USING (doc_id)
"""
