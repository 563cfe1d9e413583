"""Text analysis for training-data pipelines: quality scoring, token
counting, language ID, fingerprinting. All JVM-side built-ins (no Python
in the hot path) so they run at 100TB scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import WS_CLASS, norm_text, norm_tokens

# negated char class listing the WS chars explicitly: a bare \s inside
# would be Java-vs-RE2 divergent (vertical tab), silently changing the
# DuckDB oracle's ratio on \x0B documents — the exact trap WS_CLASS
# documents
_PUNCT_CLASS = r"[^\p{L}\p{N}_ \t\n\x0B\f\r]"
_REGEX_TOK = r"\w+|[^\w \t\n\x0B\f\r]"

# small multilingual stopword lists for the n-gram/stopword-hit heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}

def add_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, word count, mean word length, punctuation
    ratio, stopword ratio (en), uppercase ratio, digit ratio.

    Character classes use explicit Unicode properties (\\p{L}, \\p{Nd},
    \\p{Lu}) rather than Java's ASCII-only \\w / [A-Z]: with \\w every
    CJK or accented character counts as "punctuation" and the curation
    gate would delete all non-ASCII documents — fatal for a multilingual
    training-data pipeline. \\p classes are also RE2-compatible, so the
    DuckDB oracle computes the identical ratio.

    Stopword ratio counts OCCURRENCES (density), not distinct types:
    array_intersect capped the numerator at 10, so a 10k-word fluent
    document scored ≤0.001 while a 20-word snippet scored 0.5 — the
    opposite of a quality signal.

    stop_hits (r5): ONE regexp_count with WS-boundary lookarounds
    instead of the transform(lower)+filter+array_contains chain —
    higher-order functions are CodegenFallback (interpreted per
    element), and the chain also blocked subexpression elimination of
    the shared split. Integer-identical to the token-membership
    semantics by construction (token = maximal non-WS run; lookarounds
    assert WS-or-edge on both sides; lower() commutes with WS), proven
    exactly equal on the full fixture corpus + WS edge rows
    (test_text), ~25% cheaper per execution."""
    t = F.col(text_col)
    # word stats over the SHARED tokenizer (collapse runs, trim, empty
    # -> []): the raw split counted empty edge tokens (' hi ' -> 3
    # "words") and the (n_chars - n_words + 1) mean assumed exactly one
    # separator char, inflating mean word length on newline/indent-heavy
    # pages — a systematic quality-gate bias
    t_norm, toks = norm_tokens(text_col, lower=False)
    n_chars = F.length(t)
    n_words = F.size(toks)
    # token chars = normalized length minus the n_words-1 single spaces
    word_chars = F.length(t_norm) - F.greatest(n_words - 1, F.lit(0))
    sw_pat = r"(?<=^|[ \t\n\x0B\f\r])(?:%s)(?=[ \t\n\x0B\f\r]|$)" % "|".join(
        _STOPWORDS["en"]
    )
    stop_hits = F.regexp_count(F.lower(t), F.lit(sw_pat))
    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_words": n_words,
            "q_mean_word_len": word_chars / F.greatest(n_words, F.lit(1)),
            "q_punct_ratio": (
                n_chars - F.length(F.regexp_replace(t, _PUNCT_CLASS, ""))
            ) / F.greatest(n_chars, F.lit(1)),
            "q_digit_ratio": (
                n_chars - F.length(F.regexp_replace(t, r"\p{Nd}", ""))
            ) / F.greatest(n_chars, F.lit(1)),
            "q_upper_ratio": (
                n_chars - F.length(F.regexp_replace(t, r"\p{Lu}", ""))
            ) / F.greatest(n_chars, F.lit(1)),
            "q_stopword_ratio": stop_hits / F.greatest(n_words, F.lit(1)),
        }
    )


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (words and punctuation counted separately)."""
    t = F.col(text_col)
    _, toks = norm_tokens(text_col, lower=False)
    return df.withColumns(
        {
            "tok_ws": F.size(toks),
            "tok_regex": F.size(F.regexp_extract_all(t, F.lit(_REGEX_TOK), 0)),
        }
    )


def add_language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred",
    impl: str = "pandas",
) -> DataFrame:
    """Language ID — char-trigram log-likelihood profiles (see
    text/langid.py; replaced the stopword-vote toy in r4 behind the
    same API). Default impl='pandas' is an Arrow-batched kernel (the
    measured-fastest path — higher-order functions never enter codegen,
    see langid.py); pass impl='expr' for the bitwise-identical pure-JVM
    projection on executors without Python workers."""
    from featurewiz_spark.text.langid import add_language_id_ngram

    return add_language_id_ngram(df, text_col, out_col, impl=impl)


def add_language_id_stopword(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Legacy language ID via stopword-hit voting: per language, count
    distinct stopword hits in the text; argmax wins. Ties break to 'en'
    first (an explicit priority field in the comparison struct — the
    bare lexicographic array_max could never pick 'en' over 'es'/'fr'),
    then to the greatest language code. Declarative: transform/array
    ops over a lowered token array. Kept as the zero-setup fallback and
    the baseline the accuracy probe (tools/langid_probe.py) beats."""
    toks = F.transform(F.split(F.col(text_col), WS_CLASS), lambda w: F.lower(w))
    scores = []
    for lang, words in _STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.array_intersect(toks, sw)).alias("hits"),
                F.lit(1 if lang == "en" else 0).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    )


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowered text
    (content hash) + xxhash64 (fast 64-bit) — both JVM built-ins. Uses
    the SHARED _norm.norm_text definition (collapse -> trim -> lower):
    the previous private collapse skipped trim, so texts differing only
    by leading/trailing whitespace fingerprinted differently."""
    norm = norm_text(text_col, lower=True)
    return df.withColumns(
        {
            "fp_md5": F.md5(norm),
            "fp_xx64": F.xxhash64(norm),
        }
    )
