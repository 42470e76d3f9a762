"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path. Each has an exactly-equivalent DuckDB SQL twin in
eve_graph_spark/queries.py; determinism notes inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deliberately small: the point is the operator shape (argmax of
# per-language token-set hit counts), not linguistic quality.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "und", "das", "in", "zu", "den", "ist", "von", "mit"),
}


def words(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang`."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: w.isin(*sw)))


def lang_id_expr(text: Column) -> Column:
    """Language-ID heuristic: argmax of stopword hits, deterministic
    tie-break en > es > de, 'und' (undetermined) when no hits at all."""
    en, es, de = (stopword_hits(text, L) for L in ("en", "es", "de"))
    return (
        F.when((en == 0) & (es == 0) & (de == 0), F.lit("und"))
        .when((en >= es) & (en >= de), F.lit("en"))
        .when(es >= de, F.lit("es"))
        .otherwise(F.lit("de"))
    )


def word_count(text: Column) -> Column:
    return F.size(words(text))


def punct_count(text: Column) -> Column:
    """Number of ASCII punctuation chars — count via strip-and-diff."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))


def quality_score_expr(text: Column) -> Column:
    """Quality score: mean word length + stopword ratio − punctuation ratio.

    Written as one explicit left-to-right chain of single double ops so
    Spark and DuckDB produce the identical double. TOTAL by construction:
    NULL text coalesces to '' and the punct ratio guards length 0 (ANSI
    Spark raises DIVIDE_BY_ZERO where DuckDB returns NULL — an explicit
    CASE is the only expression both engines agree on), so quality is
    always a number and never hits engine-divergent NULL ordering in the
    rank/decile/budget consumers. Mirrored by queries._QUALITY_SQL.
    """
    t = F.coalesce(text, F.lit(""))
    wc = word_count(t).cast("double")  # split('') = [''] -> never 0
    mean_wlen = F.length(t).cast("double") / wc
    stop_ratio = stopword_hits(t, "en").cast("double") / wc
    punct_ratio = F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        punct_count(t).cast("double") / F.length(t).cast("double")
    )
    return mean_wlen + stop_ratio - punct_ratio


# BPE-ish tokenizer regex: letter runs | single digits | single symbols.
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"


def token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex (letters runs, digits, symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def chunk_expr(words_col: str, chunk_words: int = 50, stride: int = 40) -> Column:
    """Overlapping word-window chunks as array<string> — the LLM-training
    chunking pass (context-window splitting with overlap). Pure array
    expressions: one split, n_chunks slices; no UDF, no shuffle.

    `words_col` must be an array<string> column NAME (materialize
    `split(text, ' ')` once in a projection first — embedding the split
    here would make Catalyst re-split the doc once per chunk, the same
    trap the simhash rewrite removed).

    n_chunks = 1 for short docs, else 1 + ceil((n - chunk)/stride),
    computed with exact integer `div` (a double division could round
    across the boundary).
    """
    return F.expr(
        f"transform(sequence(0, CASE WHEN size({words_col}) <= {chunk_words} THEN 0 "
        f"ELSE (size({words_col}) - {chunk_words} + {stride} - 1) div {stride} END), "
        f"i -> concat_ws(' ', slice({words_col}, i * {stride} + 1, {chunk_words})))"
    )


FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_PREFIX = 64


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash of the first 64 chars,
    h = (h*31 + code) mod 1e9+7 — pure integer math, portable bit-for-bit."""
    n = F.least(F.length(text), F.lit(FINGERPRINT_PREFIX))
    codes = F.transform(F.sequence(F.lit(1), n), lambda i: F.ascii(text.substr(i, F.lit(1))))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


# PII redaction — training-data curation scrub pass. Patterns stay inside
# the RE2 ∩ Java-regex common subset (no lookarounds, no backrefs) so the
# same pattern string runs JVM-side in Spark and in DuckDB oracles.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{1,3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and +CC phone numbers with typed
    placeholder tokens. Pure regexp_replace chain: JVM-side, codegen'd,
    zero shuffle — runs inside the scan stage at any scale."""
    out = text
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality signals per document.

    (Rae et al. 2021, "Scaling Language Models" §A1.1 repetition filters —
    public paper, re-derived here as relational algebra.)

    Returns (id, n_words, n_distinct_words, top_word_n, top_bigram_n,
    dup_word_frac, top_word_frac, top_bigram_frac).

    Shape (r13, guide §2.4 — remove shuffles outright): every statistic is
    a function of ONE document's own gram multiset, so nothing needs to
    leave the row. Grams are sorted in-row (`array_sort`) and counted as
    runs of equal adjacent elements — n = size, n_distinct =
    size(array_distinct), top = longest run (`_top_run_expr`, an O(len)
    fold) — one corpus scan, ZERO exchanges, no Generate nodes. The
    previous form exploded the corpus twice and ran four
    (doc, gram)-keyed aggregate exchanges plus a doc-keyed join for
    per-doc answers; identical counts by construction (run length in a
    sorted array == per-value multiplicity == the exploded COUNT/MAX),
    pinned by a parity test against the explode form. Still O(len·log len)
    per doc, never the O(len²) of the naive
    transform(distinct, w -> size(filter(...))) shape.

    Fractions are single IEEE double divisions (portable bit-for-bit to
    the DuckDB oracle). Docs with < 2 words have no bigrams:
    top_bigram_frac = 0.0 by convention. Docs with NULL text produce no
    row (the explode form dropped them; the filter keeps that contract).
    """
    text = F.col(text_col)
    ws = F.split(F.lower(text), " ")
    # Guard: sequence(1, 0) is DESCENDING [1, 0] in Spark (step defaults
    # to -1 when start > stop), so a 1-word doc would index out of bounds.
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    n_words = F.size(ws).cast("long")
    n_bigrams = F.size(bigrams).cast("long")
    nd_words = F.size(F.array_distinct(ws)).cast("long")
    top_w = _top_run_expr(F.array_sort(ws))
    top_b = _top_run_expr(F.array_sort(bigrams))
    dbl = lambda c: c.cast("double")  # noqa: E731
    return df.filter(ws.isNotNull()).select(
        F.col(id_col),
        n_words.alias("n_words"),
        nd_words.alias("n_distinct_words"),
        top_w.alias("top_word_n"),
        top_b.alias("top_bigram_n"),
        ((dbl(n_words) - dbl(nd_words)) / dbl(n_words)).alias("dup_word_frac"),
        (dbl(top_w) / dbl(n_words)).alias("top_word_frac"),
        F.when(n_bigrams > 0, dbl(top_b) / dbl(n_bigrams))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def _top_run_expr(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED string array —
    i.e. the max multiplicity of any value, exactly MAX(cnt) of the
    exploded per-(row, gram) COUNT aggregate it replaces (r13). Empty
    array → 0 (matching the explode form's absent-row → COALESCE(·, 0)).
    Assumes non-null elements (split/concat_ws never emit them); a NULL
    element would start a fresh run per occurrence instead of grouping."""
    one = F.lit(1).cast("long")
    st = F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("maxrun"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + one).otherwise(one).alias("run"),
            F.greatest(
                acc["maxrun"],
                F.when(acc["prev"].eqNullSafe(x), acc["run"] + one).otherwise(one),
            ).alias("maxrun"),
        ),
    )
    return st["maxrun"]
