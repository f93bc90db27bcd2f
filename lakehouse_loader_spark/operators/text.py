"""Text-analysis operators over a document table: tokenization, token
counting, quality scoring, language ID, fingerprinting.

All hot-path expressions are JVM-side built-ins / higher-order functions —
no Python UDFs — so they stay inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists for the n-gram/stopword language heuristic.
# Deliberately small & deterministic: language ID here is a scoring operator,
# not a model.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}

# BPE-ish word-piece pattern: runs of letters, runs of digits, or a single
# non-space symbol — a cheap deterministic stand-in for subword tokenization.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (JVM split, no UDF).  Trim first: split("\\s+") on
    leading/trailing whitespace yields phantom empty tokens."""
    return F.split(F.trim(text), r"\s+")


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (with duplicates) that are stopwords of ``lang``."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces."""
    toks = tokens_col(F.col(text_col))
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("bigint"),
            "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
            "n_bpe_pieces": F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("bigint"),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length stats, alpha/space/stopword ratios, mean
    token length.  Ratios are single IEEE divisions of exact integer counts,
    so they are bit-identical across engines without rounding."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("bigint")
    n_stop = stopword_hits(toks, "en").cast("bigint")
    # exact sum of token lengths (no single-separator assumption)
    token_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return df.withColumns(
        {
            "n_chars_q": n_chars,
            "n_tokens_q": n_tokens,
            "alpha_ratio": n_alpha.cast("double") / n_chars.cast("double"),
            "stopword_ratio": n_stop.cast("double") / n_tokens.cast("double"),
            "mean_token_len": token_chars.cast("double") / n_tokens.cast("double"),
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-list language scoring: per-language hit counts and an argmax
    label (first language in STOPWORDS order wins ties; 'und' = no hits)."""
    toks = tokens_col(F.col(text_col))
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", stopword_hits(toks, lang).cast("bigint"))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    label = F.lit("und")
    # reversed so earlier languages override later ones on score ties
    for lang in reversed(list(STOPWORDS)):
        label = F.when((best > 0) & (F.col(f"hits_{lang}") == best), lang).otherwise(label)
    return out.withColumn("lang_pred", label)


# Polynomial rolling-hash fingerprint parameters (Rabin-Karp style).
FP_BASE = 31
FP_MOD = 2_147_483_648  # 2^31: keeps acc*31+c < 2^36, no 64-bit overflow


def fingerprint_col(text: Column) -> Column:
    """Deterministic polynomial rolling hash over the character stream,
    computed with a higher-order fold (JVM-side, no UDF):
    ``acc = (acc*31 + ascii(ch)) mod 2^31``."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )
