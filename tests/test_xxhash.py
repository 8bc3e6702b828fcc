"""Parity of the pure-Python XXH64 (functions/xxhash.py) with Spark's
``xxhash64`` expression — the physical index's term-bucket partitioner
(postings._tbucket). A drift here would silently break query-side
partition pruning (wrong tbucket ⇒ term not found ⇒ empty results), so
the whole hash space of input shapes is exercised: every tail-length
class of the algorithm (0..32+ bytes), UTF-8 multibyte, and random
identifier-like terms.
"""

import random
import string

from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions.xxhash import term_bucket, xxhash64


def test_xxhash64_matches_spark(spark):
    terms = [chr(97 + (n % 26)) * n for n in range(40)]  # every tail class
    terms += ["spark", "join", "naïve-ütf8-日本語", "_", "-", "0" * 33]
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "_-éß"
    terms += ["".join(rng.choices(alphabet, k=rng.randint(1, 80))) for _ in range(150)]
    terms = [t for t in terms if t]  # empty string: Spark hashes non-null only

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(32)).cast("int").alias("tb"),
    ).collect()
    assert rows
    for r in rows:
        assert xxhash64(r["term"]) == r["h"], r["term"]
        assert term_bucket(r["term"], 32) == r["tb"], r["term"]
