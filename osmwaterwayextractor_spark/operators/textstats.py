"""Text-analysis operators for training-data pipelines (graft brief).

All pure Catalyst (JVM codegen); one Arrow kernel for the rolling-hash
fingerprint (order-dependent, not expressible as column algebra).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# tiny per-language marker-word lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def _count_token(text, tok: str):
    """Occurrences of ``tok`` as a whitespace-delimited word (padded trick —
    identical semantics in the DuckDB oracle SQL)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {tok} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def with_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy: ceil(chars/4) bound."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return docs.withColumn("n_tokens", toks).withColumn(
        "n_subwords_est", F.ceil(F.length(text_col) / 4).cast("long")
    )


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    stop_hits = None
    for tok in LANG_MARKERS["en"]:
        c = _count_token(t, tok)
        stop_hits = c if stop_hits is None else stop_hits + c
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0)
    length_ok = F.when((n_chars >= 20) & (n_chars <= 20000), 1.0).otherwise(0.0)
    score = (
        0.4 * alpha_ratio
        + 0.2 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
        + 0.2 * length_ok
    )
    return (
        docs.withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word-count language ID (deterministic tie-break by lang code)."""
    scores = []
    for lang, toks in sorted(LANG_MARKERS.items()):
        s = None
        for tok in toks:
            c = _count_token(F.col(text_col), tok)
            s = c if s is None else s + c
        scores.append(F.struct(s.alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return docs.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling polynomial hash over
    ``window``-byte windows (Arrow kernel — order-dependent rolling state)."""

    @pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        B = np.uint64(1000003)
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if b.shape[0] == 0:
                out[i] = 0
                continue
            if b.shape[0] < window:
                h = np.uint64(0)
                for x in b:
                    h = h * B + np.uint64(x)
                out[i] = np.int64(h.astype(np.int64))
                continue
            # rolling hash over all windows, vectorized via prefix powers
            n = b.shape[0]
            pw = np.ones(window, dtype=np.uint64)
            for j in range(1, window):
                pw[j] = pw[j - 1] * B
            # hash_w[i] = sum b[i+j] * B^(window-1-j)
            acc = np.zeros(n - window + 1, dtype=np.uint64)
            for j in range(window):
                acc += b[j : n - window + 1 + j].astype(np.uint64) * pw[window - 1 - j]
            out[i] = np.int64(acc.min().astype(np.int64))
        return pd.Series(out)

    return docs.withColumn("fingerprint", _fp(F.col(text_col)))
