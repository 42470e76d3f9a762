"""Pandas UDF / applyInPandas surface — the engine's UDF+UDAF story.

Three Arrow-batched shapes, one example each (the LLM-pipeline operators
already use mapInPandas in `multimodal.py` and applyInPandasWithState in
`streaming/stateful.py`):

- scalar `@pandas_udf`: vectorized column function (whole Arrow batch per
  call, ~10-100× over row-at-a-time Python UDFs);
- grouped applyInPandas: per-group pandas transform (grouped-map UDF) —
  the shuffle is by the group key, each group becomes one pandas frame;
- both are the LAST resort: anything expressible as built-in column
  expressions stays JVM-side (see text_analysis.py for that discipline).

Determinism: `normalize_by_group` uses (v - min)/(max - min) — min/max are
exact and the two float ops are single IEEE operations, so numpy and any
SQL engine produce identical doubles (a mean/std z-score would not: float
sums are order-dependent).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def vectorized_mean_word_len(texts: pd.Series) -> pd.Series:
    """Scalar pandas UDF example: mean word length per document, computed
    over the whole Arrow batch with vectorized str ops."""
    n_chars = texts.str.replace(" ", "", regex=False).str.len()
    n_words = texts.str.split(" ").str.len()
    return (n_chars / n_words).astype("float64")


def normalize_by_group(df: DataFrame, key_cols: list[str], value_col: str,
                       out_col: str = "norm_value") -> DataFrame:
    """Grouped-map applyInPandas: min-max normalize `value_col` within each
    key group (0.0 for constant groups). One shuffle by the group key; each
    group is handed to pandas as a single frame — groups must fit in
    executor memory, which is the documented applyInPandas contract (use
    the window-function formulation instead for mega-groups)."""
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{out_fields}, {out_col} double"

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        mn, mx = v.min(), v.max()
        norm = (v - mn) / (mx - mn) if mx != mn else pd.Series(0.0, index=v.index)
        return pdf.assign(**{out_col: norm})

    return df.groupBy(*key_cols).applyInPandas(_norm, schema)


@pandas_udf("double")
def weighted_mean_udaf(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg pandas UDF (a Python UDAF): weighted mean per group,
    usable directly in groupBy().agg(...) and as a window function. The
    whole group arrives as Arrow-backed Series; Spark handles the
    partial/merge plumbing by shuffling full groups (grouped-agg UDFs
    cannot partial-aggregate — for map-side combine use the pure-column
    fixed-point formulation, e.g. `_dsum` in queries.py)."""
    denom = float(weights.sum())
    if denom == 0.0:
        return float("nan")
    return float((values * weights).sum() / denom)


def weighted_mean_by_group(df: DataFrame, key_col: str, value_col: str,
                           weight_col: str) -> DataFrame:
    from pyspark.sql import functions as F

    return df.groupBy(key_col).agg(
        weighted_mean_udaf(F.col(value_col), F.col(weight_col)).alias("weighted_mean")
    )
