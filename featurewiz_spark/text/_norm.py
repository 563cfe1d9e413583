"""ONE whitespace-normalization / tokenization definition, emitted as
both a Spark Column and a DuckDB SQL fragment.

Every corpus-text operator (segment dedup, repetition signals,
decontamination, bigram LM, TF-IDF) shares this tokenizer; a module
re-implementing it privately is how the "generated from the same
definition — the two engines cannot drift" discipline silently breaks.

Two cross-engine traps this module owns:

- **Explicit whitespace class, not ``\\s``**: Java's ``\\s`` matches
  vertical tab ``\\x0B``; RE2's (DuckDB's) does not — 'foo\\x0Bbar'
  would tokenize differently per engine. ``WS_CLASS`` spells out the
  exact characters so the two pattern texts are byte-identical AND
  semantically identical.
- **Collapse BEFORE trim**: both engines' ``trim`` strips only spaces,
  so ``trim`` first leaves a leading '\\n' alive, the collapse turns it
  into a leading space, and ``split`` then emits a bogus empty first
  token (which would rank FIRST in ascending tie-breaks). Collapsing
  first turns every whitespace run into a single space; trimming last
  removes the edge spaces.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Java \s ⊇ RE2 \s (vertical tab) — spell the class out, see module doc
WS_CLASS = r"[ \t\n\x0B\f\r]+"


def norm_text(text_col, lower: bool = True):
    """Whitespace-collapsed, trimmed (and by default lowercased) text
    Column; NULL propagates, empty/all-whitespace input yields ''.
    Accepts a column name or a Column so composed operators (e.g. the
    BPE encode fold) reuse THIS definition instead of inlining it."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.trim(F.regexp_replace(c, WS_CLASS, " "))
    return F.lower(t) if lower else t


def norm_tokens(text_col: str, lower: bool = True):
    """(normalized text, token array) — the token array is empty (not
    ['']) for empty/all-whitespace input, NULL text yields NULL/empty."""
    t = norm_text(text_col, lower)
    toks = F.when(F.length(t) > 0, F.split(t, " ")).otherwise(
        F.array().cast("array<string>")
    )
    return t, toks


def norm_text_sql(expr: str, lower: bool = True) -> str:
    """DuckDB fragment mirroring :func:`norm_text` byte-for-byte."""
    t = f"trim(regexp_replace({expr}, '{WS_CLASS}', ' ', 'g'))"
    return f"lower({t})" if lower else t


def norm_tokens_sql(expr: str, lower: bool = True) -> tuple[str, str]:
    """(normalized-text SQL, token-array SQL) mirroring
    :func:`norm_tokens`; pair with a ``WHERE t <> ''`` guard, which is
    how the callers' generated SQL expresses the empty-array case."""
    t = norm_text_sql(expr, lower)
    return t, f"string_split({t}, ' ')"


def h60(col):
    """Portable 60-bit hash Column (identical integer in Spark and
    DuckDB): first 15 hex chars of md5, parsed base-16. ONE definition —
    this is the cross-engine join-key contract shared by the LM,
    classifier, decontamination, mixing, and packing operators."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB fragment mirroring :func:`h60` for a string SQL expr."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
