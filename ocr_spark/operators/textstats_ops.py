"""Text-analysis operators over a documents table.

Two tiers by design:
- **JVM-side** (token counts, quality ratios): pure ``pyspark.sql.functions``
  expressions inside whole-stage codegen — these have DuckDB oracle SQL.
- **Kernel-side** (language ID, simhash, winnowing fingerprints): vectorized
  pandas UDFs over ``ocr_spark.functions.textstats`` — deterministic, pytest
  golden-checked, rows-only for the driver oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ocr_spark.functions import textstats as K

# ---------------------------------------------------------------------------
# JVM-side (oracle-matchable)
# ---------------------------------------------------------------------------
def _n_ws_tokens(t):
    """THE whitespace token COUNT spec (shared by token_stats, the quality
    ratios' denominators, and pack_sequences; mirrored in every DuckDB
    oracle as ``len(regexp_extract_all(text, '\\S+'))``): maximal \\S+
    runs.  NOT trim+split — ``trim`` strips only ASCII spaces, so a text
    ending in '\\n' or starting with '\\t' grew phantom empty tokens that
    deflated every ratio.  The word-GRAM spec (exploded_word_ngrams) is a
    separate frozen spec and deliberately unchanged."""
    return F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy (codegen, no UDF).

    ``n_subwords`` counts maximal runs of [A-Za-z0-9] plus single
    non-alphanumeric non-space chars — a deterministic stand-in for a BPE
    pre-tokenizer's piece count.
    """
    t = F.col(text_col)
    return df.withColumn(
        "n_tokens",
        _n_ws_tokens(t),
    ).withColumn(
        "n_subwords",
        F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals (codegen)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = _n_ws_tokens(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    stop = r"(?i)\b(the|of|and|to|in|a|is|that|it|for)\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop), 0))
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words_q", n_words)
        .withColumn(
            "punct_ratio",
            F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(n_stop / F.greatest(n_words, F.lit(1)), 6),
        )
        .withColumn(
            "mean_word_len",
            F.round(
                (F.length(F.regexp_replace(t, r"\s+", ""))) / F.greatest(n_words, F.lit(1)),
                6,
            ),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")


def with_gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-quality signals (Rae et al. 2021 heuristics),
    pure codegen: symbol-to-word ratio ('#' and ellipsis), fraction of
    lines starting with a bullet, fraction of lines ending in an ellipsis,
    and the count of DISTINCT required stopwords present."""
    t = F.col(text_col)
    n_words = _n_ws_tokens(t)
    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), 0))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[•\-\*]")))
    ellipsis = F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
    toks = F.array_distinct(F.regexp_extract_all(F.lower(t), F.lit(r"\S+"), 0))
    stops = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))
    )
    dup_lines = (n_lines - F.size(F.array_distinct(lines))) / F.greatest(
        n_lines, F.lit(1)
    )
    return (
        df.withColumn(
            "symbol_word_ratio", n_symbols / F.greatest(n_words, F.lit(1))
        )
        .withColumn("bullet_line_ratio", bullet / F.greatest(n_lines, F.lit(1)))
        .withColumn("ellipsis_line_ratio", ellipsis / F.greatest(n_lines, F.lit(1)))
        .withColumn("dup_line_ratio", dup_lines)
        .withColumn("n_gopher_stopwords", stops)
    )


# ---------------------------------------------------------------------------
# kernel-side (pandas UDFs)
# ---------------------------------------------------------------------------
@pandas_udf(T.StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    # batch form (one inverted-table probe per word, not 16 set probes) —
    # bit-identical to the scalar spec, ~10x on stopword-dense docs
    return pd.Series(
        K.detect_lang_batch(list(text.fillna(""))), index=text.index
    )


def _to_i64(h: int) -> int:
    """Reinterpret uint64 as signed int64 (same 64 bits, two's complement)."""
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    import numpy as np

    sh = K.simhash_batch(list(text.fillna("")))  # one kernel call per batch
    return pd.Series(sh.view(np.int64), index=text.index)


@pandas_udf(T.ArrayType(T.LongType()))
def fingerprints_udf(text: pd.Series) -> pd.Series:
    return text.fillna("").map(
        lambda t: [_to_i64(h) for h in K.rolling_fingerprints(t)]
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", detect_lang_udf(F.col(text_col)))


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash", simhash_udf(F.col(text_col)))


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprints", fingerprints_udf(F.col(text_col)))
