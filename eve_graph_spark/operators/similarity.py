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

    Scale shape: centroids are tiny (n_centroids rows) and live on the
    driver; the corpus is huge and is only ever touched by NARROW maps.
    Cell assignment is an argmax-dot against a centroid literal array —
    no row blowup, no shuffle — so each Lloyd pass costs one map plus one
    (n_centroids × dim)-cell partial aggregation. At scale the cell id is
    the table's partition key, so each query touches n_probe partitions
    instead of the full corpus — same layout story as the LSH variant,
    but with data-adaptive cells (better recall on clustered embeddings;
    LSH needs no training pass).

    Deterministic end to end: centroids seed from the `n_centroids`
    smallest vec_ids, refined with fixed Lloyd iterations; assignment ties
    break toward the lowest cell id (strict > in the fold keeps the first
    maximum).
    """
    def _unit(vec: list[float]) -> list[float]:
        n = sum(x * x for x in vec) ** 0.5 or 1.0
        return [x / n for x in vec]

    def _cent_lit(cents: list[tuple[int, list[float]]]) -> F.Column:
        # unit-normalized driver-side so argmax dot == argmax cosine
        return F.array(*[
            F.struct(
                F.lit(cell).cast("long").alias("cell"),
                F.array(*[F.lit(x) for x in _unit(vec)]).alias("cvec"),
            )
            for cell, vec in cents
        ])

    def _cell_expr(cents: list[tuple[int, list[float]]], vcol: str) -> F.Column:
        # narrow argmax: score all centroids in one transform, then pick the
        # first maximum (ties → lowest cell id; cents is sorted by cell)
        scores = F.transform(
            _cent_lit(cents), lambda s: dot_expr(F.col(vcol), s["cvec"])
        )
        pos = F.array_position(scores, F.array_max(scores))
        cell_ids = F.array(*[F.lit(c).cast("long") for c, _ in cents])
        return F.element_at(cell_ids, pos.cast("int"))

    seed = (
        embeddings.orderBy(id_col).limit(n_centroids)
        .select(id_col, vec_col)
        .collect()
    )
    cents = [
        (i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seed)
    ]
    dim = len(cents[0][1])
    for _ in range(lloyd_iterations):
        assigned = embeddings.select(
            id_col, vec_col, _cell_expr(cents, vec_col).alias("cell")
        )
        # new centroid = dimension-wise mean: one shuffle of
        # (n_centroids × dim) map-combined partials, no row blowup
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.col(vec_col)[i].cast("double")).alias(f"__s{i}")
                for i in range(dim)
            ],
        ).collect()
        cents = sorted(
            (r["cell"], [r[f"__s{i}"] / r["__n"] for i in range(dim)])
            for r in sums
        )
    assigned = embeddings.select(
        id_col, vec_col, _cell_expr(cents, vec_col).alias("cell")
    )
    q = assigned.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # probe cells: n_probe nearest centroids per query (q is a handful of rows)
    qcells = (
        q.select("query_id", "qvec", F.explode(_cent_lit(cents)).alias("__s"))
        .select(
            "query_id", "qvec",
            F.col("__s")["cell"].alias("cell"),
            dot_expr(F.col("qvec"), F.col("__s")["cvec"]).alias("__d"),
        )
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
