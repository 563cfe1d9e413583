"""C4 + Gopher heuristic cleaning filters for web-corpus curation.

The two canonical public rule sets every LLM data pipeline starts from:

- **C4** (Raffel et al. 2020, §2.2 of the T5 paper): line-level
  filtering — keep only lines that end in terminal punctuation
  (``. ! ? "``), have at least ``min_words_per_line`` words, and do not
  contain the word "javascript"; page-level — drop pages containing
  "lorem ipsum" or a curly brace ``{``, and pages with fewer than
  ``min_kept_lines`` surviving lines (the paper counts sentences; this
  engine counts kept lines, the standard streaming re-derivation —
  documented deviation).
- **Gopher** (Rae et al. 2021, §A1.1): document-level quality gates —
  word count in [min_words, max_words], mean word length in [3, 10],
  symbol-to-word ratio (``#`` and ``…``) below 0.1, at most 90% of
  lines starting with a bullet, at most 30% ending with an ellipsis, at
  least 80% of words containing a letter, and at least two distinct
  hits from the 8-stopword presence list.

Everything is pure JVM expressions (split / filter / transform /
aggregate higher-order functions + RE2-compatible regexes) — the
filters ride the parquet scan inside whole-stage codegen at 100 TB, no
shuffle and no Python. The generated DuckDB mirror evaluates the same
byte-identical patterns over the same shared tokenizer (text/_norm.py),
and every fraction is rounded to 6 dp on BOTH sides before the keep
flags are derived from the rounded values, so the engines cannot
disagree at a threshold edge.

Cross-engine notes: lines split on ``\\r?\\n`` in both engines (a
trailing ``\\r`` would otherwise defeat the terminal-punctuation
anchor); word counts use the explicit whitespace class from _norm.py
(Java ``\\s`` ⊇ RE2 ``\\s``); character classes are Unicode properties
(``\\p{L}``), not ASCII ``\\w``, so multilingual pages are not
penalized for being non-ASCII.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import WS_CLASS, norm_tokens, norm_tokens_sql

# byte-identical pattern texts for both engines (RE2-compatible: no
# lookaround, explicit classes). End anchors are \z, NOT $: Java's $
# matches BEFORE a final line terminator (\r, ,  ,  )
# while RE2's $ matches only at end-of-string, so 'line.\r' would keep
# in Spark and drop in the oracle; \z is strict end-of-text in both.
LINE_SPLIT_RE = r"\r?\n"
TERMINAL_RE = "[.!?\"]\\z"
BULLET_RE = r"^[-*•‣▪]"
ELLIPSIS_RE = "(\\.\\.\\.|…)\\z"
SYMBOL_CLASS = r"[#…]"
ALPHA_RE = r"\p{L}"

# Gopher's "required word" presence list (≥2 distinct must appear)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Gopher §A1.1 thresholds
G_MIN_WORDS, G_MAX_WORDS = 50, 100_000
G_MIN_MWL, G_MAX_MWL = 3.0, 10.0
G_MAX_SYMBOL_RATIO = 0.1
G_MAX_BULLET_FRAC = 0.9
G_MAX_ELLIPSIS_FRAC = 0.3
G_MIN_ALPHA_FRAC = 0.8
G_MIN_STOP_HITS = 2


def add_c4_gopher_filters(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
    rounding: int = 6,
) -> DataFrame:
    """Append the C4 line-filtered text + page flags and the Gopher
    quality stats + keep flag (see module docstring for the rules).

    Output columns: ``c4_clean_text`` (kept lines re-joined with \\n),
    ``c4_n_lines``, ``c4_n_kept_lines``, ``c4_has_lorem``,
    ``c4_has_brace``, ``c4_keep``; ``gopher_n_words``,
    ``gopher_mean_word_len``, ``gopher_symbol_ratio``,
    ``gopher_frac_bullet``, ``gopher_frac_ellipsis``,
    ``gopher_frac_alpha``, ``gopher_stop_hits``, ``gopher_keep``.

    NULL text: the C4 outputs and the line/char-based Gopher fractions
    are NULL (NULL propagates through split/regexp), token-based Gopher
    stats are the empty-document zeros (norm_tokens maps NULL to []),
    ``c4_keep`` is NULL (unknown), and ``gopher_keep`` is False (the
    word-count gate fails at 0) — never a silent keep. The generated
    mirror reproduces exactly this shape."""
    t = F.col(text_col)
    clash = {
        "c4_clean_text", "c4_n_lines", "c4_n_kept_lines", "c4_has_lorem",
        "c4_has_brace", "c4_keep", "gopher_n_words", "gopher_mean_word_len",
        "gopher_symbol_ratio", "gopher_frac_bullet", "gopher_frac_ellipsis",
        "gopher_frac_alpha", "gopher_stop_hits", "gopher_keep",
    } & set(df.columns)
    if clash:
        raise ValueError(f"add_c4_gopher_filters: columns exist: {sorted(clash)}")

    lines = F.transform(F.split(t, LINE_SPLIT_RE), lambda l: F.trim(l))
    n_lines = F.size(lines)

    def line_ok(l):
        return (
            (F.size(F.split(l, WS_CLASS)) >= min_words_per_line)
            & l.rlike(TERMINAL_RE)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    kept = F.filter(lines, line_ok)
    n_kept = F.size(kept)
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    has_brace = F.contains(t, F.lit("{"))
    c4_keep = (n_kept >= min_kept_lines) & ~has_lorem & ~has_brace

    _, toks = norm_tokens(text_col)
    nw = F.size(toks)
    nw1 = F.greatest(nw, F.lit(1))
    nl1 = F.greatest(n_lines, F.lit(1))
    sum_len = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    mean_wl = F.round(sum_len / nw1, rounding)
    n_sym = F.length(t) - F.length(F.regexp_replace(t, SYMBOL_CLASS, ""))
    sym_ratio = F.round(n_sym / nw1, rounding)
    frac_bullet = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(BULLET_RE))) / nl1, rounding
    )
    frac_ellipsis = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(ELLIPSIS_RE))) / nl1, rounding
    )
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda w: w.rlike(ALPHA_RE))) / nw1, rounding
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))
    )
    out = df.withColumns(
        {
            "c4_clean_text": F.array_join(kept, "\n"),
            "c4_n_lines": n_lines,
            "c4_n_kept_lines": n_kept,
            "c4_has_lorem": has_lorem,
            "c4_has_brace": has_brace,
            "c4_keep": c4_keep,
            "gopher_n_words": nw,
            "gopher_mean_word_len": mean_wl,
            "gopher_symbol_ratio": sym_ratio,
            "gopher_frac_bullet": frac_bullet,
            "gopher_frac_ellipsis": frac_ellipsis,
            "gopher_frac_alpha": frac_alpha,
            "gopher_stop_hits": stop_hits,
        }
    )
    # keep derived from the ROUNDED stats (threshold-edge safety; the
    # mirror does the same), on nw/stop_hits exact ints otherwise
    return out.withColumn(
        "gopher_keep",
        F.col("gopher_n_words").between(G_MIN_WORDS, G_MAX_WORDS)
        & F.col("gopher_mean_word_len").between(G_MIN_MWL, G_MAX_MWL)
        & (F.col("gopher_symbol_ratio") < G_MAX_SYMBOL_RATIO)
        & (F.col("gopher_frac_bullet") <= G_MAX_BULLET_FRAC)
        & (F.col("gopher_frac_ellipsis") <= G_MAX_ELLIPSIS_FRAC)
        & (F.col("gopher_frac_alpha") >= G_MIN_ALPHA_FRAC)
        & (F.col("gopher_stop_hits") >= G_MIN_STOP_HITS),
    )


def c4_gopher_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
    rounding: int = 6,
) -> str:
    """DuckDB mirror of :func:`add_c4_gopher_filters` — full SELECT
    returning (id_col + every output column), generated from the SAME
    pattern constants and shared tokenizer, fractions rounded before
    the keep flags like the Spark side."""
    t = text_col
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    line_ok = (
        f"len(string_split_regex(l, '{WS_CLASS}')) >= {min_words_per_line} "
        f"AND regexp_matches(l, '{TERMINAL_RE}') "
        "AND NOT contains(lower(l), 'javascript')"
    )
    _, toks_sql = norm_tokens_sql(t)
    norm_t_sql, _ = norm_tokens_sql(t)
    return f"""
WITH __cg AS (
    SELECT {id_col},
           {t} AS t,
           list_transform(string_split_regex({t}, '{LINE_SPLIT_RE}'),
                          l -> trim(l)) AS lines,
           CASE WHEN {t} IS NULL OR {norm_t_sql} = '' THEN []::VARCHAR[]
                ELSE {toks_sql} END AS toks
    FROM {src}),
__cg2 AS (
    SELECT {id_col}, t, lines, toks,
           list_filter(lines, l -> {line_ok}) AS kept,
           len(lines) AS n_lines,
           len(toks) AS nw,
           greatest(len(toks), 1) AS nw1,
           greatest(len(lines), 1) AS nl1
    FROM __cg)
SELECT {id_col},
       CASE WHEN t IS NULL THEN NULL
            -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
            ELSE coalesce(array_to_string(kept, chr(10)), '') END
           AS c4_clean_text,
       n_lines AS c4_n_lines,
       len(kept) AS c4_n_kept_lines,
       contains(lower(t), 'lorem ipsum') AS c4_has_lorem,
       contains(t, '{{') AS c4_has_brace,
       (len(kept) >= {min_kept_lines}
        AND NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(t, '{{')) AS c4_keep,
       nw AS gopher_n_words,
       round(1.0 * coalesce(list_sum(list_transform(toks, w -> len(w))), 0)
             / nw1, {rounding}) AS gopher_mean_word_len,
       round(1.0 * (len(t) - len(regexp_replace(t, '{SYMBOL_CLASS}', '', 'g')))
             / nw1, {rounding}) AS gopher_symbol_ratio,
       round(1.0 * len(list_filter(lines,
                 l -> regexp_matches(l, '{BULLET_RE}')))
             / nl1, {rounding}) AS gopher_frac_bullet,
       round(1.0 * len(list_filter(lines,
                 l -> regexp_matches(l, '{ELLIPSIS_RE}')))
             / nl1, {rounding}) AS gopher_frac_ellipsis,
       round(1.0 * len(list_filter(toks,
                 w -> regexp_matches(w, '{ALPHA_RE}')))
             / nw1, {rounding}) AS gopher_frac_alpha,
       len(list_intersect(toks, [{stop_list}])) AS gopher_stop_hits,
       (nw BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
        AND round(1.0 * coalesce(list_sum(list_transform(toks, w -> len(w))), 0) / nw1,
                  {rounding}) BETWEEN {G_MIN_MWL} AND {G_MAX_MWL}
        AND round(1.0 * (len(t) - len(regexp_replace(t, '{SYMBOL_CLASS}', '', 'g')))
                  / nw1, {rounding}) < {G_MAX_SYMBOL_RATIO}
        AND round(1.0 * len(list_filter(lines,
                      l -> regexp_matches(l, '{BULLET_RE}'))) / nl1,
                  {rounding}) <= {G_MAX_BULLET_FRAC}
        AND round(1.0 * len(list_filter(lines,
                      l -> regexp_matches(l, '{ELLIPSIS_RE}'))) / nl1,
                  {rounding}) <= {G_MAX_ELLIPSIS_FRAC}
        AND round(1.0 * len(list_filter(toks,
                      w -> regexp_matches(w, '{ALPHA_RE}'))) / nw1,
                  {rounding}) >= {G_MIN_ALPHA_FRAC}
        AND len(list_intersect(toks, [{stop_list}])) >= {G_MIN_STOP_HITS}
       ) AS gopher_keep
FROM __cg2
"""
