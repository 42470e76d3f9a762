"""Similarity search over embedding columns (array<float>).

Two paths, as a real 100 TB deployment would have:
- `brute_force_topk`: exact cosine top-k. The fast form keeps the whole
  dot product inside JVM array expressions (zip_with + aggregate) — one
  pass over candidates per query batch, no shuffle of the vectors.
  The `exact_fixed_point=True` form routes through posexplode + integer
  fixed-point sums so it is bit-reproducible against a SQL oracle.
- `lsh_bucketed_topk`: the scale path — random-hyperplane LSH buckets
  (SimHash for vectors) prune candidates to matching buckets, then exact
  re-rank within the bucket. Probabilistic recall; rows-only checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FIXED_POINT_SCALE = 1_000_000_000  # products are in [-1,1]·dim → fits long


def dot_expr(a: Column, b: Column) -> Column:
    """JVM-side dot product: zip_with multiply, aggregate sum (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_fixed_point: bool = False,
) -> DataFrame:
    """Exact cosine top-k of each query vector against all candidates.

    Queries (a handful of rows) are broadcast; candidates stream by in one
    pass; top-k per query is a TakeOrdered-style window. Ties broken by
    candidate id so results are total-ordered.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if exact_fixed_point:
        return _brute_force_topk_fixed_point(embeddings, q, k, id_col, vec_col)
    pairs = embeddings.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _brute_force_topk_fixed_point(embeddings: DataFrame, q: DataFrame, k: int,
                                  id_col: str, vec_col: str) -> DataFrame:
    """Oracle-grade variant: per-dimension products are fixed-pointed with
    floor(x*1e9+0.5) (an IEEE-identical op in any engine) and summed as
    exact integers, so cosine is bit-reproducible in SQL."""
    cand = embeddings.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "cval")
    )
    qexp = q.select("query_id", F.posexplode("qvec").alias("pos", "qval"))
    prods = cand.join(F.broadcast(qexp), "pos").filter(F.col(id_col) != F.col("query_id"))
    fp = lambda c: F.floor(c * FIXED_POINT_SCALE + F.lit(0.5))  # noqa: E731
    dots = prods.groupBy("query_id", id_col).agg(
        (F.sum(fp(F.col("cval").cast("double") * F.col("qval").cast("double")))
         / F.lit(float(FIXED_POINT_SCALE))).alias("dot")
    )
    norms = (
        embeddings.select(F.col(id_col).alias("nid"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("nid")
        .agg((F.sum(fp(F.col("v").cast("double") * F.col("v").cast("double")))
              / F.lit(float(FIXED_POINT_SCALE))).alias("sqnorm"))
    )
    scored = (
        dots.join(F.broadcast(norms.withColumnsRenamed({"nid": "query_id", "sqnorm": "qn"})), "query_id")
        .join(norms.withColumnRenamed("sqnorm", "cn"), F.col(id_col) == F.col("nid"))
        .select(
            "query_id", id_col,
            (F.col("dot") / (F.sqrt("qn") * F.sqrt("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer → probe the
    query's `n_probe` nearest cells → exact cosine re-rank inside them.

    Deterministic end to end: centroids seed from the `n_centroids`
    smallest vec_ids and refine with fixed Lloyd iterations, all as
    DataFrame ops (zip_with sums, one shuffle per iteration). At scale the
    cell id is the table's partition key, so each query touches n_probe
    partitions instead of the full corpus — same layout story as the LSH
    variant, but with data-adaptive cells (better recall on clustered
    embeddings; LSH needs no training pass).
    """
    def nearest_centroid(cents: DataFrame, vecs: DataFrame, vcol: str) -> DataFrame:
        scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
            "__d", cosine_expr(F.col(vcol), F.col("__cvec"))
        )
        w = Window.partitionBy(vecs.columns[0]).orderBy(F.col("__d").desc(), F.col("cell"))
        return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)

    cents = (
        embeddings.orderBy(id_col).limit(n_centroids)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("__cvec"))
    )
    for _ in range(lloyd_iterations):
        assigned = nearest_centroid(cents, embeddings.select(id_col, vec_col), vec_col)
        # new centroid = dimension-wise mean, via posexplode so a hot cell
        # spreads over (cell, dim) groups instead of one aggregation buffer
        dim_means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg((F.sum(F.col("val").cast("double")) / F.count(F.lit(1))).alias("m"))
        )
        cents = dim_means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("__cvec")
        )
        # centroids are n_centroids rows — materialize to the driver so the
        # next Lloyd pass doesn't re-evaluate this whole lineage lazily
        cents = cents.sparkSession.createDataFrame(
            [(r["cell"], list(r["__cvec"])) for r in cents.collect()],
            "cell long, __cvec array<double>",
        )
    assigned = nearest_centroid(cents, embeddings.select(id_col, vec_col), vec_col).select(
        id_col, vec_col, "cell"
    )
    q = assigned.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # probe cells: n_probe nearest centroids per query
    qcells = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__d", cosine_expr(F.col("qvec"), F.col("__cvec")))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("__d").desc(), F.col("cell"))
            ),
        )
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    pairs = assigned.join(F.broadcast(qcells), "cell").filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col(id_col), cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pairwise_cosine(embeddings: DataFrame, pairs: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact fixed-point cosine for given (id_a, id_b) pairs — the verify
    kernel of embedding-cosine near-dup dedup (candidate pairs come from
    LSH buckets at scale; here they are caller-supplied).

    Per-dimension products are fixed-pointed with floor(x*1e9+0.5) and
    summed as exact integers so the result is bit-reproducible in SQL.
    The dot product stays inside JVM array expressions — no posexplode,
    no shuffle of the vectors beyond the pair join itself.
    """
    fp_dot = lambda a, b: (  # noqa: E731
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(float(FIXED_POINT_SCALE)) + F.lit(0.5)
            ).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        / F.lit(float(FIXED_POINT_SCALE))
    )
    ea = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    eb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    joined = pairs.join(ea, "id_a").join(eb, "id_b")
    return joined.select(
        "id_a",
        "id_b",
        (fp_dot(F.col("__va"), F.col("__vb"))
         / (F.sqrt(fp_dot(F.col("__va"), F.col("__va")))
            * F.sqrt(fp_dot(F.col("__vb"), F.col("__vb"))))).alias("cosine"),
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy needed at the
    executor): values in [-1, 1)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(state / float(1 << 30) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sign bits of the vector against each hyperplane."""
    bits = [
        F.when(
            dot_expr(vec, F.array(*[F.lit(v) for v in plane])) > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates restricted to the query's hyperplane bucket, exact
    cosine re-rank inside the bucket. At 100 TB the bucket column is what
    the table would be hash-partitioned/bucketed BY, making each query a
    single-partition scan instead of a full pass."""
    planes = random_hyperplanes(dim, n_planes)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket")
    )
    pairs = bucketed.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col(id_col), cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
