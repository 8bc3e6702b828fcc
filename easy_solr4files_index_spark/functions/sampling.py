"""Deterministic corpus sampling for training-data pipelines.

``DataFrame.sample`` is seed-dependent on partitioning (a repartition or
speculative re-execution changes the sample), which is unacceptable for
reproducible corpus construction. These operators key every decision on
a content-independent HASH of stable identity columns, so the sample is
a pure function of the data — identical across runs, partitionings,
cluster sizes, and engines (the hash is the md5-derived 56-bit integer
shared with textstats, computable identically in DuckDB for the oracle
twins; xxhash64 would be Spark-only).

  * hash_sample     — Bernoulli keep-with-probability-`rate`, salted:
                      different salts give independent samples (e.g.
                      train/validation splits that never overlap via
                      disjoint rate windows).
  * cap_per_key     — at most n docs per key (domain/repo quotas — the
                      anti-domination rule of web-corpus recipes), the
                      winners chosen by the same deterministic hash
                      order, ties broken by doc_id.

Both are single-purpose building blocks for curate()-style pipelines:
hash_sample is map-only (pipelines inside the scan at any corpus size);
cap_per_key is one hash-partitioned window over the key — the shuffle
carries only (key, hash, doc_id)-projected rows when the caller selects
ids, and skew is bounded by the cap itself (only the first n survive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .textstats import MD5INT_DUCK, MD5INT_SPARK

_M = 1_000_000  # sampling resolution: keep iff pmod(h, _M) < rate * _M


def _hash_col(cols: tuple[str, ...], salt: str) -> Column:
    parts = ", ".join([f"cast({c} as string)" for c in cols]
                      + [f"'{salt}'"])
    return F.expr(MD5INT_SPARK.format(x=f"concat_ws(':', {parts})"))


def _hash_sql(cols: tuple[str, ...], salt: str) -> str:
    parts = " || ':' || ".join([f"CAST({c} AS VARCHAR)" for c in cols]
                               + [f"'{salt}'"])
    return MD5INT_DUCK.format(x=f"({parts})")


def hash_sample(docs: DataFrame, rate: float, salt: str = "",
                cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff
    ``pmod(md5int(cols, salt), 1e6) < rate * 1e6``. Map-only; exactly
    reproducible for a given (data, cols, salt, rate)."""
    # round, not int: int(0.3 * 1e6) truncates the binary-float product
    # to 299999 — a realized rate a hair below nominal (ADVICE r4)
    keep = F.pmod(_hash_col(cols, salt), F.lit(_M)) < round(rate * _M)
    return docs.filter(keep)


def hash_sample_sql(rate: float, salt: str = "",
                    cols: tuple[str, ...] = ("doc_id",),
                    source: str = "documents") -> str:
    return (f"SELECT * FROM {source} "
            f"WHERE {_hash_sql(cols, salt)} % {_M} < {round(rate * _M)}")


def cap_per_key(docs: DataFrame, key: str, n: int,
                cols: tuple[str, ...] = ("doc_id",),
                salt: str = "") -> DataFrame:
    """At most ``n`` rows per ``key`` (per-domain/per-repo quota), the
    survivors picked by deterministic hash order (tie-break doc_id) —
    NOT by arrival order, so the quota is stable under repartitioning."""
    h = _hash_col(cols, salt)
    w = Window.partitionBy(key).orderBy(h.asc(), F.col("doc_id").asc())
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def cap_per_key_sql(key: str, n: int, cols: tuple[str, ...] = ("doc_id",),
                    salt: str = "", source: str = "documents") -> str:
    return f"""
SELECT * EXCLUDE (_rn) FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {key}
    ORDER BY {_hash_sql(cols, salt)} ASC, doc_id ASC) AS _rn
  FROM {source})
WHERE _rn <= {n}
"""
