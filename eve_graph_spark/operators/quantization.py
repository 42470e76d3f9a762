"""Scalar (int8) embedding quantization — the vector-storage operator.

At 100 TB an embedding corpus is dominated by float32 vectors; per-dim
affine int8 cuts storage/IO 4x and is the standard first rung below PQ
(similarity.ivf_pq_index). Two-phase plan:

1. stats pass: per-dimension min/max — ONE shuffle of 64 cells
   (posexplode is map-side; partial min/max combine before the wire);
2. quantize pass: the 64 (min, scale) pairs are collected (model-sized,
   like kmeans centroids) and baked into a scan-side zip_with expression
   — codes and reconstruction error are computed in one codegen stage
   with ZERO further shuffle.

Determinism: min/max of floats are exact; scale = (max-min)/255 and the
code = floor((x-min)/scale + 0.5) are single IEEE double ops both engines
execute identically; the reported MSE is an exact integer sum of
floor(err^2 * 1e12 + 0.5). So the SQL oracle replays codes AND error
bit-for-bit. Constant dimensions (max == min) map to code 0 and zero
error (scale-0 guard on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_LEVELS = 255  # int8-style: codes 0..255
ERR_FP = 1_000_000_000_000  # 1e12 fixed point for squared errors


def dim_stats(embeddings: DataFrame, vec_col: str = "embedding",
              dim: int = 64) -> list[tuple[float, float]]:
    """[(min, max)] per dimension — the stats pass (64-cell shuffle)."""
    rows = (
        embeddings.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(F.posexplode(vec_col).alias("idx", "v"))
        .groupBy("idx")
        .agg(F.min(F.col("v").cast("double")).alias("mn"),
             F.max(F.col("v").cast("double")).alias("mx"))
        .collect()
    )
    out = [(0.0, 0.0)] * dim
    for r in rows:
        out[r["idx"]] = (r["mn"], r["mx"])
    return out


def _code_expr(xm: Column, scale: Column) -> Column:
    """floor(xm/scale + 0.5) for xm = (x - min), clamped to [0, Q_LEVELS];
    0 when the dimension is constant (scale == 0)."""
    raw = F.floor(xm / scale + F.lit(0.5))
    return F.when(scale == 0.0, F.lit(0).cast("long")).otherwise(
        F.greatest(F.lit(0).cast("long"),
                   F.least(F.lit(Q_LEVELS).cast("long"), raw.cast("long")))
    )


def quantization_report(embeddings: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """(id, code_checksum, mse): per-vector position-weighted code checksum
    (pins the exact int8 codes without shipping dim columns) and exact
    fixed-point reconstruction MSE. The quantize pass is one scan-side
    expression against the broadcast per-dim (min, scale) literals."""
    stats = dim_stats(embeddings, vec_col, dim)
    mins = F.array(*[F.lit(float(mn)).cast("double") for mn, _ in stats])
    scales = F.array(
        *[F.lit((mx - mn) / Q_LEVELS).cast("double") for mn, mx in stats]
    )
    emb = embeddings.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    codes = F.zip_with(
        F.zip_with(F.col("x"), mins, lambda x, mn: x - mn),
        scales,
        _code_expr,
    )
    checksum = F.aggregate(
        F.zip_with(codes, F.sequence(F.lit(1), F.lit(dim)),
                   lambda q, i: q * i.cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    dequant = F.zip_with(
        F.zip_with(codes.cast("array<double>"), scales, lambda q, s: q * s),
        mins, lambda qs, mn: qs + mn,
    )
    err_fixed = F.aggregate(
        F.zip_with(F.col("x"), dequant,
                   lambda x, xq: F.floor((x - xq) * (x - xq) * ERR_FP + F.lit(0.5)).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    return emb.select(
        F.col("id"),
        checksum.alias("code_checksum"),
        (err_fixed.cast("double") / F.lit(float(ERR_FP)) / F.lit(float(dim))).alias("mse"),
    )


def quantization_oracle_sql(dim: int = 64, table: str = "embeddings",
                            id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB replay: same stats, same code formula, same fixed-point MSE.
    Kept adjacent to the operator (lockstep rule, see clustering.py)."""
    return f"""
WITH qe AS (
    SELECT {id_col} AS id, i - 1 AS idx, CAST({vec_col}[i] AS DOUBLE) AS x
    FROM {table}, unnest(range(1, {dim + 1})) AS u(i)
    WHERE {vec_col} IS NOT NULL AND len({vec_col}) = {dim}
),
qstats AS (
    SELECT idx, MIN(x) AS mn, (MAX(x) - MIN(x)) / {Q_LEVELS} AS scale
    FROM qe GROUP BY idx
),
qcodes AS (
    SELECT e.id, e.idx, e.x, s.mn, s.scale,
           CASE WHEN s.scale = 0 THEN CAST(0 AS BIGINT)
                ELSE GREATEST(CAST(0 AS BIGINT), LEAST(CAST({Q_LEVELS} AS BIGINT),
                     CAST(FLOOR((e.x - s.mn) / s.scale + 0.5) AS BIGINT)))
           END AS q
    FROM qe e JOIN qstats s USING (idx)
)
SELECT id AS {id_col},
       CAST(SUM(q * (idx + 1)) AS BIGINT) AS code_checksum,
       CAST(SUM(CAST(FLOOR((x - (mn + q * scale)) * (x - (mn + q * scale)) * {ERR_FP} + 0.5) AS BIGINT)) AS DOUBLE)
           / {ERR_FP}.0 / {dim}.0 AS mse
FROM qcodes GROUP BY id
"""
