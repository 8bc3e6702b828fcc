"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k (exact baseline) + IVF-style cluster pruning
(the scale path) + sign-LSH bucketing.

Spark-first: dot products are `F.zip_with` + `F.aggregate` (JVM
codegen, no Python); top-k per query is a window rank — at 100 TB the
query side is tiny (broadcast) and the corpus scan is embarrassingly
parallel. IVF assignment is a crossJoin against ≤ a few hundred
broadcast centroids, rank-1 per vector — shuffle-free except the final
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(query_id, neighbor_id, cos, rank) — exact brute-force cosine top-k.
    Queries are broadcast; corpus scan is a single pass."""
    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")))
    c = emb.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v"))
    pairs = (c.crossJoin(F.broadcast(q))
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("cos", F.round(
                 _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def cosine_topk_sql(query_ids: list[int], k: int = 5,
                    exclude_ids: list[int] | None = None) -> str:
    """``exclude_ids`` drops vectors from the NEIGHBOR side (the oracle
    for tombstoned/deleted vectors, functions/ivf.py:ivf_delete)."""
    ids = ", ".join(str(i) for i in query_ids)
    excl = (f" AND f.vec_id NOT IN ({', '.join(str(i) for i in exclude_ids)})"
            if exclude_ids else "")
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, i, x AS qx FROM flat WHERE vec_id IN ({ids})),
dots AS (
  SELECT q.query_id, f.vec_id AS neighbor_id,
         sum(q.qx * f.x) AS dot,
         sqrt(sum(q.qx * q.qx)) AS nq, sqrt(sum(f.x * f.x)) AS nv
  FROM flat f JOIN q ON q.i = f.i AND f.vec_id <> q.query_id{excl}
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, round(dot / (nq * nv), 6) AS cos,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY dot / (nq * nv) DESC, neighbor_id) AS INT) AS rank
FROM dots
QUALIFY rank <= {k}
"""


def ivf_assign(emb: DataFrame, n_centroids: int = 8,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Assign every non-centroid vector to its max-cosine centroid
    (centroids = the first ``n_centroids`` vec_ids — deterministic
    stand-in for a k-means fit). Returns (centroid_id, cnt)."""
    cent = (emb.filter(F.col(id_col) < n_centroids)
            .select(F.col(id_col).alias("centroid_id"), _as_double(F.col(vec_col)).alias("cv")))
    rest = (emb.filter(F.col(id_col) >= n_centroids)
            .select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")))
    pairs = (rest.crossJoin(F.broadcast(cent))
             .withColumn("cos", _dot(F.col("cv"), F.col("v")) / (_norm(F.col("cv")) * _norm(F.col("v")))))
    # argmax by (cos desc, centroid_id asc) as one map-side-combinable
    # max_by aggregate — no corpus-scale rank-1 window sort
    key = F.struct(F.col("cos").alias("s"), (-F.col("centroid_id")).alias("c"))
    assign = pairs.groupBy("vid").agg(
        F.max_by("centroid_id", key).alias("centroid_id"))
    return assign.groupBy("centroid_id").agg(F.count("*").alias("cnt"))


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Lloyd k-means over an embedding column — the real IVF centroid
    fit (round 1 used "first k vectors" as a stand-in).

    Per iteration: ONE Arrow-vectorized pass (`mapInPandas`) computes the
    assign + partial recenter sums per partition — distances are a BLAS
    matmul ``‖x‖² − 2·X·Cᵀ + ‖c‖²`` over the whole Arrow batch, argmin
    ties break to the lowest centroid_id (numpy first-min), and only
    k×(dim+1) partial sums leave each partition. A single hash aggregate
    merges the partials; only k×dim floats ever reach the driver, so the
    loop is cluster-size independent. Iterations are a fixed small count
    (k-means converges fast and reproducibility matters more than the
    last 0.1% inertia). Init = the first k vectors by id (reproducible).

    Returns (centroid_id int, cv array<double>). Iterative ⇒ not
    SQL-expressible; gated by tests/test_streaming_kmeans.py (inertia
    improvement + full-probe IVF exactness) instead of a DuckDB twin.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    corpus = emb.select(F.col(id_col).alias("vid"),
                        _as_double(F.col(vec_col)).alias("v")).persist()
    cent_rows = [list(r["v"]) for r in
                 corpus.filter(F.col("vid") < k).orderBy("vid").collect()]
    dim = len(cent_rows[0])
    part_schema = T.StructType(
        [T.StructField("centroid_id", T.IntegerType())]
        + [T.StructField(f"s{i}", T.DoubleType()) for i in range(dim)]
        + [T.StructField("cnt", T.LongType())])
    for _ in range(iters):
        cent = np.asarray(cent_rows, dtype=np.float64)  # k × dim, closure
        c2 = (cent * cent).sum(axis=1)

        def partials(batches, _c=cent, _c2=c2):
            sums = np.zeros_like(_c)
            cnts = np.zeros(len(_c), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                d2 = ((x * x).sum(axis=1)[:, None]
                      - 2.0 * (x @ _c.T) + _c2[None, :])
                a = np.argmin(d2, axis=1)  # first min = lowest centroid_id
                np.add.at(sums, a, x)
                cnts += np.bincount(a, minlength=len(_c))
            live = np.flatnonzero(cnts)
            if len(live):
                out = pd.DataFrame({"centroid_id": live.astype("int32")})
                for i in range(len(_c[0])):
                    out[f"s{i}"] = sums[live, i]
                out["cnt"] = cnts[live]
                yield out

        # merge partials in ONE hash aggregate (dim+1 sum expressions);
        # ≤ partitions×k rows shuffle, k rows collect
        merged = (corpus.mapInPandas(partials, part_schema)
                  .groupBy("centroid_id")
                  .agg(F.sum("cnt").alias("n"),
                       *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)])
                  .collect())
        new = {int(r["centroid_id"]):
               [float(r[f"s{i}"]) / r["n"] for i in range(dim)]
               for r in merged}
        # empty clusters keep their previous centroid (deterministic)
        cent_rows = [new.get(i, v) for i, v in enumerate(cent_rows)]
    corpus.unpersist()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(cent_rows)],
        "centroid_id int, cv array<double>")


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = 8, nprobe: int | None = None,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: DataFrame | None = None) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) — IVF-PRUNED cosine top-k, the
    ANN *query* path the assignment primitives exist for.

    Every corpus vector (centroids included) is assigned to its nearest
    centroid cell; each query scans only its ``nprobe`` nearest cells.
    The cell restriction is a broadcast equi-join on centroid_id.

    SCALE NOTE: this variant recomputes the corpus→centroid assignment
    in-plan per call — right for ad-hoc corpora with no index at rest,
    and as the semantics oracle, but at 100 TB the assignment scan
    dominates. The production path is functions/ivf.py: ``ivf_build``
    pays the assignment ONCE and writes the corpus partitioned by
    centroid_id; ``ivf_search`` then reads only the probed cells via a
    static partition filter (cells touched = nprobe × queries,
    independent of corpus size — PLANS.md `ann_ivf_materialized`).
    ``nprobe = n_centroids`` scans every cell and is EXACTLY brute
    force (the correctness gate); smaller nprobe trades recall for a
    ~nprobe/n_centroids scan fraction (recall sweep:
    tests/test_similarity_dedup.py).
    """
    nprobe = n_centroids if nprobe is None else nprobe
    if centroids is not None:
        # a kmeans_fit result (centroid_id, cv) — better cells, same plan
        cent = centroids
        n_centroids = cent.count()
        nprobe = min(nprobe, n_centroids)
    else:
        cent = (emb.filter(F.col(id_col) < n_centroids)
                .select(F.col(id_col).alias("centroid_id"),
                        _as_double(F.col(vec_col)).alias("cv")))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v"))
    acos = _dot(F.col("cv"), F.col("v")) / (_norm(F.col("cv")) * _norm(F.col("v")))
    # corpus→cell argmax as a max_by aggregate (map-side combine collapses
    # the k×|corpus| crossJoin rows before the exchange; the old rank-1
    # window shuffled and sorted them all)
    ka = F.struct(F.col("acos").alias("s"), (-F.col("centroid_id")).alias("c"))
    assign = (corpus.crossJoin(F.broadcast(cent))
              .withColumn("acos", acos)
              .groupBy("neighbor_id")
              .agg(F.max_by(F.struct("centroid_id", "v"), ka).alias("b"))
              .select("neighbor_id", F.col("b.v").alias("v"),
                      F.col("b.centroid_id").alias("centroid_id")))

    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")))
    qcos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    wq = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(),
                                                F.col("centroid_id").asc())
    probes = (q.crossJoin(F.broadcast(cent))
              .withColumn("qcos", qcos)
              .withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe)
              .select("query_id", "qv", "centroid_id"))

    # the pruned scan: only cells in some query's probe set are read
    cand = assign.join(F.broadcast(probes), "centroid_id")
    pairs = (cand.filter(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("cos", F.round(
                 _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def ivf_assign_sql(n_centroids: int = 8) -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (SELECT vec_id AS centroid_id, i, x AS cx FROM flat WHERE vec_id < {n_centroids}),
dots AS (
  SELECT f.vec_id AS vid, c.centroid_id,
         sum(c.cx * f.x) / (sqrt(sum(c.cx * c.cx)) * sqrt(sum(f.x * f.x))) AS cos
  FROM flat f JOIN cent c ON c.i = f.i
  WHERE f.vec_id >= {n_centroids}
  GROUP BY 1, 2
),
assign AS (
  SELECT vid, centroid_id
  FROM dots
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cos DESC, centroid_id) = 1
)
SELECT centroid_id, count(*) AS cnt FROM assign GROUP BY 1
"""


def signlsh_buckets(emb: DataFrame, n_planes: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Sign-LSH: bucket = sign bits of dot products with ``n_planes``
    deterministic hyperplanes (the first n_planes vectors). Returns
    (bucket, cnt) — the bucketed-ANN scale path's partitioning key."""
    planes = (emb.filter(F.col(id_col) < n_planes)
              .select(F.col(id_col).alias("pid"), _as_double(F.col(vec_col)).alias("pv")))
    rest = (emb.filter(F.col(id_col) >= n_planes)
            .select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")))
    # round before the sign test: the dot is a float sum whose association
    # order differs between engines (array-order here, join-row-order in the
    # oracle); a near-zero dot could flip sign without the quantization
    bit = F.when(F.round(_dot(F.col("pv"), F.col("v")), 6) > 0,
                 F.expr("shiftleft(cast(1 as bigint), cast(pid as int))")).otherwise(F.lit(0))
    buckets = (rest.crossJoin(F.broadcast(planes))
               .groupBy("vid").agg(F.sum(bit).alias("bucket")))
    return buckets.groupBy("bucket").agg(F.count("*").alias("cnt"))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.4,
                        n_planes: int = 4, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(a, b, cos) — embedding-cosine near-duplicate pairs: sign-LSH
    bucket equality generates candidates (the at-scale cut: a hash
    equi-join on the bucket key, ~1/2^planes of all pairs), exact cosine
    verifies. Same algorithm in the SQL twin — LSH recall loss (pairs
    straddling a hyperplane) is inherent and identical on both sides;
    raise planes for precision of the cut, lower for recall."""
    planes = (emb.filter(F.col(id_col) < n_planes)
              .select(F.col(id_col).alias("pid"), _as_double(F.col(vec_col)).alias("pv")))
    rest = (emb.filter(F.col(id_col) >= n_planes)
            .select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")))
    bit = F.when(F.round(_dot(F.col("pv"), F.col("v")), 6) > 0,
                 F.expr("shiftleft(cast(1 as bigint), cast(pid as int))")).otherwise(F.lit(0))
    buckets = (rest.crossJoin(F.broadcast(planes))
               .groupBy("vid").agg(F.sum(bit).alias("bucket"),
                                   F.first("v").alias("v")))
    x = buckets.select(F.col("vid").alias("a"), F.col("bucket"), F.col("v").alias("va"))
    y = buckets.select(F.col("vid").alias("b"), F.col("bucket"), F.col("v").alias("vb"))
    pairs = (x.join(y, "bucket").filter(F.col("a") < F.col("b"))
             .withColumn("cos", F.round(
                 _dot(F.col("va"), F.col("vb"))
                 / (_norm(F.col("va")) * _norm(F.col("vb"))), 6))
             .filter(F.col("cos") >= threshold)
             .select("a", "b", "cos"))
    return pairs


def embedding_near_dups_sql(threshold: float = 0.4, n_planes: int = 4) -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
planes AS (SELECT vec_id AS pid, i, x AS px FROM flat WHERE vec_id < {n_planes}),
dots AS (
  SELECT f.vec_id AS vid, p.pid, sum(p.px * f.x) AS dot
  FROM flat f JOIN planes p ON p.i = f.i
  WHERE f.vec_id >= {n_planes}
  GROUP BY 1, 2
),
buckets AS (
  SELECT vid,
         CAST(sum(CASE WHEN round(dot, 6) > 0 THEN CAST(1 AS BIGINT) << pid ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY 1
),
pairs AS (
  SELECT x.vid AS a, y.vid AS b FROM buckets x
  JOIN buckets y ON x.bucket = y.bucket AND x.vid < y.vid
),
cos AS (
  SELECT p.a, p.b,
         round(sum(fa.x * fb.x) / (sqrt(sum(fa.x * fa.x)) * sqrt(sum(fb.x * fb.x))), 6) AS cos
  FROM pairs p
  JOIN flat fa ON fa.vec_id = p.a
  JOIN flat fb ON fb.vec_id = p.b AND fb.i = fa.i
  GROUP BY 1, 2
)
SELECT a, b, cos FROM cos WHERE cos >= {threshold}
"""


def signlsh_buckets_sql(n_planes: int = 4) -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
planes AS (SELECT vec_id AS pid, i, x AS px FROM flat WHERE vec_id < {n_planes}),
dots AS (
  SELECT f.vec_id AS vid, p.pid, sum(p.px * f.x) AS dot
  FROM flat f JOIN planes p ON p.i = f.i
  WHERE f.vec_id >= {n_planes}
  GROUP BY 1, 2
),
buckets AS (
  -- CAST: DuckDB integer sum() is HUGEINT; round() matches the Spark side
  SELECT vid,
         CAST(sum(CASE WHEN round(dot, 6) > 0 THEN CAST(1 AS BIGINT) << pid ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY 1
)
SELECT bucket, count(*) AS cnt FROM buckets GROUP BY 1
"""
