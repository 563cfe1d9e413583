"""Unicode normalization for web text — NFC/NFKC + control strip +
whitespace collapse, cross-engine byte-identical.

Every production web-corpus pipeline canonicalizes text BEFORE hashing
(CCNet normalizes before dedup; C4 strips control bytes; HTML
extractors emit decomposed sequences like ``e + U+0301`` that must
compare equal to the precomposed ``é`` or exact dedup silently splits
identical pages into distinct hash groups). The reference's pandas
pipeline never needs this because it consumes already-clean CSV
columns; at Common-Crawl scale it is the first projection after
``html → text`` extraction (text/extract.py).

Plan shape / scale notes
------------------------
Three stages, ONE narrow projection, zero shuffles:

1. control strip — pure JVM ``regexp_replace`` with an explicitly
   spelled-out class (see ``CONTROL_CLASS``): C0 minus the whitespace
   chars the collapse stage owns, DEL, and the C1 block.
2. NFC composition — the ONLY Python step, an Arrow-batched
   ``pandas_udf``; inside the kernel, strings that are pure ASCII
   (``str.isascii()``, an O(n) C check) bypass ``unicodedata`` —
   NFC/NFKC are the identity on ASCII, so English-heavy shards pay
   almost nothing.
3. whitespace collapse + trim — the shared ``_norm.WS_CLASS``
   definition (collapse BEFORE trim; Java-vs-RE2 ``\\s`` divergence
   documented there).

Cross-engine traps this module owns:

- **Stage order is part of the contract.** Controls are stripped
  BEFORE composition: ``e + CTRL + U+0301`` only composes once the
  control byte between base and combining mark is gone. The DuckDB
  mirror (``unicode_normalize_sql``) applies the same three stages in
  the same order.
- **Explicit hex classes, not POSIX names**: Java's ``\\p{Cntrl}`` is
  C0+DEL only, RE2's ``[[:cntrl:]]`` likewise, and neither covers C1 —
  and relying on either would also couple the two engines' class
  tables. Both pattern TEXTS here are byte-identical.
- **NFC tables**: CPython ``unicodedata`` and DuckDB's utf8proc both
  implement the (stability-guaranteed) Unicode normalization
  algorithm; composition of long-assigned codepoints is identical.
  tests/test_normalize.py pins parity on an adversarial corpus
  (combining marks, Hangul jamo, compatibility ligatures, singletons).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ._norm import WS_CLASS

# C0 controls minus \t\n\x0B\f\r (those are whitespace — the collapse
# stage turns them into single spaces), DEL, and the C1 block. The
# brace hex escape form is accepted by BOTH java.util.regex and RE2
# with identical semantics, so the pattern text is shared verbatim.
CONTROL_CLASS = r"[\x{00}-\x{08}\x{0E}-\x{1F}\x{7F}\x{80}-\x{9F}]"

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _nfc_udf(form: str):
    """Arrow-batched normalizer; ASCII fast path, NULL-safe."""
    import unicodedata

    def _batch(s):
        return s.map(
            lambda t: t
            if t is None or t.isascii()
            else unicodedata.normalize(form, t)
        )

    return F.pandas_udf(_batch, StringType())


def unicode_normalize_col(
    text_col: str | Column,
    form: str = "NFC",
    collapse_ws: bool = True,
) -> Column:
    """The normalization pipeline as a Column (strip → compose →
    collapse). NULL propagates; all-junk input yields ``''``."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.regexp_replace(c, CONTROL_CLASS, "")
    c = _nfc_udf(form)(c)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, WS_CLASS, " "))
    return c


def add_unicode_normalized(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    collapse_ws: bool = True,
) -> DataFrame:
    """Append the normalized text as ``out_col`` (default
    ``{text_col}_norm``). One projection; no shuffle."""
    out = out_col or f"{text_col}_norm"
    if out in df.columns and out != text_col:
        raise ValueError(f"output column {out!r} already exists")
    return df.withColumn(
        out, unicode_normalize_col(text_col, form=form, collapse_ws=collapse_ws)
    )


def unicode_normalize_sql(expr: str, collapse_ws: bool = True) -> str:
    """DuckDB fragment mirroring :func:`unicode_normalize_col` with
    ``form='NFC'`` byte-for-byte (DuckDB exposes only NFC; the NFKC/
    NFD/NFKD forms are pytest-gated against ``unicodedata``)."""
    c = f"regexp_replace({expr}, '{CONTROL_CLASS}', '', 'g')"
    c = f"nfc_normalize({c})"
    if collapse_ws:
        c = f"trim(regexp_replace({c}, '{WS_CLASS}', ' ', 'g'))"
    return c
