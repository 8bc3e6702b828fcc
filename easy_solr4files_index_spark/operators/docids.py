"""Deterministic dense docID assignment, scalable (no global sort).

The reference keys documents by the composite string ``bagId/filePath``
(Solr.scala:51); Lucene assigns its own internal dense docIDs. Our engine
needs *deterministic* dense ids keyed by (repo, path, commit) so that
BM25 tie-breaks (score desc, doc_id asc) are rank-identical across runs
AND across cluster sizes (north_rule).

``monotonically_increasing_id`` is partition-layout-dependent and a
``row_number() OVER (ORDER BY ...)`` collapses to a single partition —
both wrong at 10^12 rows. Instead, a bucketed prefix-sum scheme whose
bucket id is a PURE FUNCTION OF THE ROW:

  1. pick P-1 range boundaries ONCE on the driver, from a deterministic
     hash-mod sample of the keys (no randomness: the sample is
     ``xxhash64(key) % S == 0``, a property of the data);
  2. bucket = searchsorted(boundaries, key), evaluated as a Catalyst
     when-chain over struct comparisons — every execution of any plan
     containing it agrees, because nothing is resampled;
  3. count rows per bucket + exclusive prefix-sum, computed IN-PLAN (a
     tiny single-partition window over the P-row counts aggregate,
     broadcast-joined back — no extra driver action);
  4. doc_id = offset[bucket] + (row_number within bucket, ordered by
     key) - 1  ==  the row's global rank in (repo, path, commit) order.

Why not ``repartitionByRange`` + ``spark_partition_id()``: Spark's
RangePartitioner seeds its reservoir sampling with the RDD id
(``sketch`` uses ``byteswap32(idx ^ (rdd.id << 16))``), and every
action materializes fresh RDD ids — so two executions of the same
range-shuffle plan draw DIFFERENT boundaries whenever partitions hold
more rows than the sample size. A count pass + rank pass built on it
silently disagree at scale (measured at 200k docs: ~5,700 duplicated
ids per build, caught by write_index's docID-density tripwire). The
round-2 fix was persisting the shuffled rows (pins one execution, but
caching full rows anti-scaled); the hash-mod-sampled literal
boundaries make both passes agree by construction with nothing cached.

Keys are unique (module precondition), so no tie straddles a boundary
ambiguously. The total order ranked is COALESCED-lexicographic: each
component compares as ``coalesce(c, '')``, with the null flags of all
three components as the final tie-break (nulls first). Buckets compare
only the coalesced tuple, so every coalesce-tie lands in ONE bucket and
the within-bucket sort (coalesced components, then null flags) is a
strict refinement — rank order and bucket order can never disagree,
whatever boundaries the sample draws. (Ordering raw columns instead —
Spark's nulls-first — would disagree with the coalesced bucket
comparator on rows like (x, null, z) vs (x, '', a), making doc_id
boundary- and hence cluster-size-dependent.) For null-free keys the
order is plain lexicographic, unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

KEY = ["repo", "path", "commit"]

# target driver-side sample size per range bucket: boundaries drawn from
# ~128 sampled keys per bucket are balanced to a few percent, and the
# driver holds only ~128*P keys at ANY corpus size (P buckets)
_SAMPLE_PER_BUCKET = 128

# inputs at or below this row count rank entirely on the driver (a few MB
# of keys) and broadcast the literal mapping back — micro-batch appends
# are fixed-latency-bound and the bucket/window/prefix-sum plan costs
# more exchanges than the data is worth. Far below any executor-memory
# concern and far above any real maintenance bag.
_DRIVER_RANK_MAX = 65536


def _join_back(docs: DataFrame, mapping: DataFrame) -> DataFrame:
    """Null-SAFE 1:1 join of the (key -> doc_id) mapping onto the full
    rows (keys are unique, module precondition): plain equi-join would
    silently DROP rows with a null key component. Both sides may descend
    from the same plan (self-join), so qualify through aliases."""
    d, m = docs.alias("_docs"), mapping.alias("_map")
    cond = None
    for kcol in KEY:
        c = F.col(f"_docs.{kcol}").eqNullSafe(F.col(f"_map.{kcol}"))
        cond = c if cond is None else (cond & c)
    return (d.join(m, cond)
            .select(*[F.col(f"_docs.{c}") for c in docs.columns],
                    F.col("_map.doc_id")))


def _order_cols() -> list[F.Column]:
    """The engine's total key order (module header): all coalesced
    components first (the bucket comparator's order), then the null
    flags as tie-breaks (null before '' among coalesce-ties). The
    coalesced prefix makes this a refinement of the bucket order."""
    cols = [F.coalesce(F.col(k), F.lit("")).asc() for k in KEY]
    cols += [F.col(k).isNull().desc() for k in KEY]
    return cols


# past this boundary count the when-chain's codegen cost outgrows its
# benefit (and Catalyst expression trees have practical depth limits at
# cluster-scale P) — switch to the Arrow-vectorized searchsorted
_MAX_WHEN_CHAIN = 256

# Separator for the Arrow fallback's concatenated keys. Concat order
# equals tuple lexicographic order IFF the separator sorts strictly below
# every code point appearing in the components (prefix cases like "ab" vs
# ("a","y") then resolve identically in both forms) — so the fallback
# VALIDATES that no component contains \x00 or \x01 and fails loudly on a
# hit (both are illegal in git paths/refs and hex commits, so a hit means
# corrupt input, and silent mis-bucketing would surface later as a
# misleading "non-deterministic plan" density-tripwire error). NUL itself
# cannot be the separator: numpy's unicode conversion NUL-terminates, so
# pandas/numpy scalar concat silently DROPS "\x00" (verified on this
# stack) — the order guarantee would break invisibly.
_SEP = "\x01"
_BELOW_SEP = "[\x00\x01]"


def _bucket_expr(boundaries: list[tuple]) -> F.Column:
    """searchsorted(boundaries, key): bucket i holds keys in
    [b_{i-1}, b_i). Comparison is over COALESCED keys (null -> '') on
    both sides — boundaries arrive already coalesced — so all
    coalesce-ties share a bucket and the within-bucket sort
    (_order_cols) refines this order; see the module header.

    Two physical forms, same function: a Catalyst when-chain over struct
    comparisons while the chain stays codegen-friendly (local / small-P
    runs), else a pandas UDF doing np.searchsorted over the broadcast
    boundary list (cluster-scale P: 10^12 rows at 4x-cores buckets means
    ~10^5 boundaries — far past expression-tree limits, trivial for a
    vectorized binary search)."""
    if len(boundaries) <= _MAX_WHEN_CHAIN:
        skey = F.struct(*[F.coalesce(F.col(k), F.lit("")).alias(k) for k in KEY])
        expr = F.lit(len(boundaries))
        # build the chain back-to-front: when(skey < b0, 0) must win first
        for i in range(len(boundaries) - 1, -1, -1):
            b = F.struct(*[F.lit(v if v is not None else "").alias(k)
                           for k, v in zip(KEY, boundaries[i])])
            expr = F.when(skey < b, i).otherwise(expr)
        return expr

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    import re
    for b in boundaries:
        if any(v is not None and re.search(_BELOW_SEP, v) for v in b):
            raise ValueError("key boundary contains a code point <= the "
                             f"separator, concat order undefined: {b!r}")
    flat = np.array([_SEP.join(v if v is not None else "" for v in b)
                     for b in boundaries], dtype=object)

    def _bucket_fn(repo, path, commit):
        # vectorized guard: a \x00/\x01 inside any component would make
        # the concatenated key's order diverge from the tuple order the
        # within-bucket sort (_order_cols) uses — fail loudly instead of
        # silently mis-bucketing
        for part in (repo, path, commit):
            bad = part.str.contains(_BELOW_SEP, regex=True, na=False)
            if bad.any():
                raise ValueError("key component contains a code point <= "
                                 f"the bucket separator: {part[bad].iloc[0]!r}")
        key = (repo.fillna("") + _SEP + path.fillna("")
               + _SEP + commit.fillna(""))
        return pd.Series(np.searchsorted(flat, key.to_numpy(dtype=object),
                                         side="right"), dtype="int32")

    # call-form (no type hints): `from __future__ import annotations`
    # stringifies hints beyond what pandas_udf's inference resolves
    _bucket = pandas_udf(_bucket_fn, "int")
    return _bucket(*[F.col(k) for k in KEY])


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Returns docs + ``doc_id bigint`` = dense global rank by KEY.

    The rank is computed on a KEYS-ONLY projection (repo, path, commit --
    tens of bytes per row, column-pruned at the parquet scan) and joined
    back to the full rows by key. Earlier revisions range-shuffled and
    ``.persist()``-ed the FULL rows (content included) so the count job
    and the rank job would observe one partition layout; measured at
    200k docs that cache was the build's dominant Amdahl term (cache
    population + read cost ~22s at local[2] but ~47s at local[8]: block
    manager contention under concurrent columnar cache writes -- the same
    pathology as round 2's tf cache). With literal hash-mod-sampled
    boundaries (module header) the bucket id is a pure row function, so
    the keys-only plan can simply run in several jobs -- every execution
    agrees, nothing is cached, and write_index's docID-density tripwire
    (sum/min/max of doc_id == the dense 0..n-1 series, observed on the
    docs_store write) guards the invariant end-to-end.

    Content moves through exactly ONE shuffle: the join back (hash by
    KEY). At 10^12 rows the mapping side is far too large to broadcast --
    the shuffled equi-join IS the scalable shape, and AQE picks
    sort-merge vs shuffled-hash from the actual sizes.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        # 4x the core count: with exactly one task per core a single
        # straggler idles everything else for the whole stage; smaller
        # range partitions give the scheduler slack to rebalance (the
        # prefix-sum cost is P integers on the driver -- negligible)
        num_partitions = max(4 * spark.sparkContext.defaultParallelism, 8)

    keys = docs.select(*KEY)
    n_total = keys.count()
    if n_total <= _DRIVER_RANK_MAX:
        # Small-input fast path (micro-batch appends/upserts, where fixed
        # per-stage latency dominates): the keys fit trivially on the
        # driver, so compute the EXACT ranks there in the same total
        # order (_order_cols: coalesced components, then null-before-''
        # among coalesce-ties) and broadcast-join the literal mapping
        # back. Downstream plans shrink from
        # bucket/window/prefix-sum/self-join to scan + one broadcast
        # hash join — several fewer exchanges per consuming job, which
        # is the whole cost of a 250-file bag. Determinism is free: the
        # mapping is a driver-side literal.
        rows = keys.collect()
        order = sorted(range(n_total), key=lambda i: (
            tuple(v if v is not None else "" for v in rows[i]),
            # null sorts BEFORE '' among coalesce-ties (isNull().desc())
            tuple(0 if v is None else 1 for v in rows[i])))
        from pyspark.sql.types import LongType, StructField, StructType
        schema = StructType(list(keys.schema.fields)
                            + [StructField("doc_id", LongType(), False)])
        mapping = spark.createDataFrame(
            [(*rows[i], r) for r, i in enumerate(order)], schema=schema)
        return _join_back(docs, F.broadcast(mapping))
    # deterministic sample: a key is sampled iff xxhash64(key) % S == 0 --
    # a property of the data, identical in every execution. S targets
    # ~_SAMPLE_PER_BUCKET keys per bucket on the driver. (S needs
    # n_total, so count and sample stay two actions: a single-pass
    # collect_list at any FIXED modulus is either too coarse for small
    # corpora or an unbounded driver collect at 10^12 rows.)
    s_mod = max(1, n_total // (_SAMPLE_PER_BUCKET * num_partitions))
    sample = keys if s_mod == 1 else keys.filter(
        F.pmod(F.xxhash64(*KEY), F.lit(s_mod)) == 0)
    # boundaries are coalesced (null -> '') at collection: the bucket
    # comparator and np.searchsorted both operate on coalesced keys, so
    # boundary order must be the plain-tuple order of the coalesced form
    # (sorting the raw null-first form here would hand searchsorted an
    # unsorted array). set(): equal SAMPLED boundaries just merge buckets
    # (duplicate keys are a precondition violation).
    skeys = sorted({tuple(v if v is not None else "" for v in r)
                    for r in sample.collect()})
    if len(skeys) > 1 and num_partitions > 1:
        step = len(skeys) / num_partitions
        idxs = sorted({int((i + 1) * step) for i in range(num_partitions - 1)
                       if int((i + 1) * step) < len(skeys)})
        boundaries = [skeys[i] for i in idxs]
    else:
        boundaries = []

    bucketed = keys.withColumn("_pid", _bucket_expr(boundaries))
    # exclusive prefix-sum of bucket counts, IN-PLAN: the counts agg is a
    # subquery feeding a single-partition window over P rows (tiny) that
    # broadcast-joins back onto the rank stream — one fewer driver action
    # than collecting counts first, which matters on the per-micro-batch
    # maintenance path where fixed job latency dominates small bags.
    counts_df = bucketed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_df = counts_df.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
        .cast("long").alias("_offset"))
    w = Window.partitionBy("_pid").orderBy(*_order_cols())
    mapping = (
        bucketed.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .select(*KEY, (F.col("_offset") + F.col("_rn") - 1)
                .cast("long").alias("doc_id"))
    )
    # keys are unique (module precondition, see header), so the join-back
    # is 1:1; at 10^12 rows the mapping side is far too large to
    # broadcast — the shuffled equi-join IS the scalable shape, and AQE
    # picks sort-merge vs shuffled-hash from the actual sizes.
    return _join_back(docs, mapping)
