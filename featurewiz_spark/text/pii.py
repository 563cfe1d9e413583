"""PII masking for web-text corpora: emails, IPv4 addresses, phone
numbers replaced by typed placeholder tokens, with per-rule match
counts as quality/compliance features.

Standard pre-training curation step (public practice: C4, The Pile,
RefinedWeb all describe regex-based PII scrubbing); featurewiz has no
text operators — this is one of the LLM-training-data-pipeline
additions the builder's brief makes first-class.

Engine notes:

- Everything is JVM ``regexp_replace`` / ``regexp_count`` — whole-stage
  codegen, rides the scan, no shuffle, no Python.
- Patterns are RE2-compatible (no lookaround, no backreferences) so the
  DuckDB oracle (:func:`mask_pii_sql`) evaluates the IDENTICAL pattern
  text; cross-engine agreement is pinned by an adversarial-string
  pytest (greedy-quantifier and word-boundary cases included).
- Rules apply in a fixed order (email -> ipv4 -> phone) and each rule
  counts on the PREVIOUS rule's output, so counts are exactly "matches
  this rule masked": an IPv4 inside an already-masked email is neither
  double-counted nor double-masked, and the 3-octet tail of a masked
  IP can't be re-matched as a phone number.

At 10^12 documents this is a pure map: no exchange, bounded memory,
and the regex cost is linear in bytes scanned — the scan dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered (name, RE2+Java-compatible pattern, replacement token).
# Order matters: email first (it contains dots/digits a later rule
# could chew on), then IPv4, then the greediest rule (phone) last.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b",
        "<PHONE>",
    ),
)


def mask_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_masked",
    count_prefix: str = "pii_",
) -> DataFrame:
    """Append ``out_col`` (text with every :data:`PII_RULES` match
    replaced by its token) and one ``{count_prefix}{rule}_n`` INT
    column per rule (number of masked occurrences, counted on the
    stage the rule actually ran on). NULL text yields NULL masked
    text and 0 counts."""
    staged = F.col(text_col)
    cols: dict[str, F.Column] = {}
    for name, pattern, token in PII_RULES:
        cols[f"{count_prefix}{name}_n"] = F.coalesce(
            F.regexp_count(staged, F.lit(pattern)), F.lit(0)
        ).cast("int")
        staged = F.regexp_replace(staged, pattern, token)
    cols[out_col] = staged
    return df.withColumns(cols)


def mask_pii_sql(
    text_expr: str,
    out_col: str = "text_masked",
    count_prefix: str = "pii_",
) -> dict[str, str]:
    """DuckDB SQL expression strings mirroring :func:`mask_pii` for a
    text SQL expression — generated from the same :data:`PII_RULES`
    table so the two engines share one definition. Returns output
    column -> SQL expression (DuckDB regexp is RE2; ``'g'`` makes
    regexp_replace global like Spark's)."""
    staged = text_expr
    out: dict[str, str] = {}
    for name, pattern, token in PII_RULES:
        if "'" in pattern or "'" in token:  # keep literals embeddable
            raise ValueError("PII rule contains a single quote")
        out[f"{count_prefix}{name}_n"] = (
            f"CAST(coalesce(len(regexp_extract_all({staged}, '{pattern}')), 0) AS INT)"
        )
        staged = f"regexp_replace({staged}, '{pattern}', '{token}', 'g')"
    out[out_col] = staged
    return out
