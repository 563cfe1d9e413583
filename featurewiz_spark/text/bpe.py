"""Byte-pair-encoding tokenizer: distributed fit stage + pure-JVM
encode (Sennrich et al. 2016, the canonical subword tokenizer for LLM
pretraining corpora).

Spark-first decomposition — the three stages have wildly different
scale profiles, and the design matches each to the right substrate:

1. **word counts** (:func:`bpe_word_counts`) — the 100 TB-heavy stage:
   ONE hash aggregate over the tokenized corpus (map-side partial
   combine collapses web text's Zipfian head before the shuffle; a
   10⁸-occurrence stopword costs one row per map task), then an
   optional deterministic cap (count desc, word asc) that compiles to
   TakeOrderedAndProject — no global sort.
2. **merge learning** (:func:`bpe_train`) — iterative, inherently
   sequential, and TINY: it runs on the capped word-frequency table
   (≤ ``max_words`` rows — the same driver-side-bounded-model pattern
   as IVF centroids in operators/similarity.py). A guarded collect
   raises with the cap before pulling anything big. For users who want
   the per-round pair statistics distributed instead,
   :func:`bpe_pair_counts` is the round aggregate as a DataFrame op
   (one shuffle per merge round — the documented trade).
3. **encode** (:func:`bpe_encode`) — the stage that actually runs over
   100 TB, and it is 100 % JVM codegen, ZERO Python, ZERO shuffle: the
   fitted merge list is folded into the plan as a chain of literal
   ``replace`` expressions over a delimiter-doubled symbol sequence.
   Whole-stage codegen keeps the entire tokenization inside one
   projection riding the scan.

The delimiter-doubling trick (what makes encode a replace-fold)
---------------------------------------------------------------
A symbol sequence ``[a, b, c]`` is rendered ``␟␟a␟␟b␟␟c␟␟`` (U+001F
unit separator, doubled between/around symbols). Merging pair (a, b)
is then the single literal replace ``␟a␟␟b␟ → ␟ab␟``: each occurrence
keeps one separator on each side, so two ADJACENT occurrences
(``abab``) share no matched bytes and standard non-overlapping
left-to-right ``replace`` rewrites both in one pass, preserving the
doubled-form invariant. Applying the learned merges once each, in
rank order, is exactly BPE encoding: a pair learned at rank k can only
become adjacent through merges ranked < k (a later merge only creates
symbols that participate in later-ranked pairs), so no re-scan is ever
needed — the same order-of-application argument subword-nmt's
``apply_bpe`` relies on. tests/test_bpe.py pins the fold against an
independent iterative lowest-rank-first reference encoder.

Word boundaries: each word ends with the end-of-word symbol ``</w>``
(multi-char is fine — symbols are delimiter-separated). Whole
documents encode as ONE sequence, safe because no learned merge's LEFT
element ends with ``</w>``: inside a training word the marker is
terminal (nothing follows it), and the one way to spell such a pair
anyway — literal ``</w>`` text inside a word — is excluded from pair
counting by the trainer and REJECTED by the encode fold's guard, so no
replace ever matches across a word boundary.

Cross-engine: every stage has a DuckDB mirror generated from the same
merge list / delimiter constants (``bpe_encode_sql``,
``bpe_word_counts_sql``) — Spark ``replace``/``btrim``/``split`` and
DuckDB ``replace``/``trim``/``string_split`` agree on non-overlapping
left-to-right semantics, and both engines' ``regexp_replace`` treat
``(.)`` as one CODE POINT (matching Python's per-codepoint
``tuple(word)`` in the trainer) — probed in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._norm import norm_text, norm_text_sql, norm_tokens

# U+001F unit separator: stripped from input text on BOTH engines
# before sequence construction, so "no symbol contains the delimiter"
# holds by construction, not by assumption.
DELIM = "\x1f"
DD = DELIM * 2
EOW = "</w>"

__all__ = [
    "bpe_word_counts",
    "bpe_word_counts_sql",
    "bpe_train",
    "train_from_counts",
    "bpe_pair_counts",
    "bpe_encode",
    "bpe_encode_tokens_col",
    "bpe_encode_sql",
]


# ---------------------------------------------------------------------------
# stage 1: distributed word counts
# ---------------------------------------------------------------------------


def bpe_word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int | None = None,
    lower: bool = True,
) -> DataFrame:
    """``(word, cnt)`` frequency table over the shared tokenizer
    (_norm.norm_tokens), delimiter-stripped. The only shuffle in the
    whole fit path; ``max_words`` caps via TakeOrderedAndProject."""
    _, toks = norm_tokens(text_col, lower=lower)
    w = (
        df.select(F.explode(toks).alias("word"))
        .select(F.replace(F.col("word"), F.lit(DELIM), F.lit("")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= int(min_count))
    )
    if max_words is not None:
        w = w.orderBy(F.col("cnt").desc(), F.col("word")).limit(int(max_words))
    return w


def bpe_word_counts_sql(
    src: str,
    text_expr: str = "text",
    min_count: int = 1,
    max_words: int | None = None,
    lower: bool = True,
) -> str:
    """DuckDB mirror of :func:`bpe_word_counts`."""
    t = norm_text_sql(text_expr, lower=lower)
    cap = f"LIMIT {int(max_words)}" if max_words is not None else ""
    return f"""
        SELECT word, cnt FROM (
            SELECT word, count(*) AS cnt FROM (
                SELECT replace(tok, chr(31), '') AS word
                FROM (SELECT unnest(string_split({t}, ' ')) AS tok
                      FROM {src} WHERE {t} <> '')
            ) WHERE word <> '' GROUP BY 1
        ) WHERE cnt >= {int(min_count)}
        ORDER BY cnt DESC, word {cap}
    """


# ---------------------------------------------------------------------------
# stage 2: merge learning (driver-side on the capped table)
# ---------------------------------------------------------------------------


def _merge_syms(syms: tuple, pair: tuple) -> tuple:
    """Left-to-right non-overlapping merge of ``pair`` in ``syms`` —
    the same semantics as the string ``replace`` in the encode fold."""
    out, i, n = [], 0, len(syms)
    a, b = pair
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_counts: DataFrame,
    num_merges: int,
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a ``(word, cnt)`` table.

    Driver-side by design: the input is the CAPPED frequency table
    (stage 1 already collapsed the corpus), bounded like IVF
    centroids. A pre-count guard raises before collecting an uncapped
    table. Deterministic: best pair = highest weighted count, ties
    broken by lexicographically smallest (left, right) pair.
    """
    # ONE job: the guard is folded into the collect itself (limit
    # max_words+1 bounds the driver either way) — a separate count()
    # would re-execute the whole corpus word-count aggregate
    rows = word_counts.select("word", "cnt").limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"word_counts has > {max_words} rows; cap it first "
            f"(bpe_word_counts(..., max_words={max_words})) or raise "
            "max_words — bpe_train collects the table to the driver"
        )
    counts = {}
    for r in rows:
        counts[r["word"]] = counts.get(r["word"], 0) + int(r["cnt"])
    return train_from_counts(counts, num_merges)


def train_from_counts(
    counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge-learning loop on a plain ``{word: cnt}``
    dict — :func:`bpe_train` after its collect, exposed so tests (and
    users with an already-local vocabulary) can train without a
    DataFrame."""
    vocab: dict[tuple, int] = {}
    for word, cnt in counts.items():
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                if p[0].endswith(EOW):
                    # only spellable by literal '</w>' text inside a
                    # word; a merge with this left element would merge
                    # across word boundaries in the encode fold (the
                    # guard there rejects it), so never learn one
                    continue
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            m = _merge_syms(syms, best)
            nxt[m] = nxt.get(m, 0) + cnt
        vocab = nxt
    return merges


def bpe_pair_counts(
    word_counts: DataFrame, merges: list[tuple[str, str]] | None = None
) -> DataFrame:
    """ONE round of pair statistics as a distributed aggregate:
    ``(left, right, cnt)`` over the current symbol sequences of a
    ``(word, cnt)`` table, where "current" = after applying the
    ``merges`` learned so far (the encode replace-fold builds the
    sequences, so no driver state is needed). A fully distributed
    training loop is k rounds of this + a driver argmax per round —
    one shuffle per merge, the documented trade vs the default
    capped-collect :func:`bpe_train`."""
    syms = bpe_encode_tokens_col(F.col("word"), merges or [], lower=False)
    pairs = F.expr(
        "transform(sequence(1, size(__syms) - 1), "
        "i -> struct(__syms[i - 1] AS left, __syms[i] AS right))"
    )
    return (
        word_counts.withColumn("__syms", syms)
        .where(F.size("__syms") >= 2)
        .select(F.explode(pairs).alias("p"), F.col("cnt"))
        # mirror train_from_counts: terminal-left pairs (left ends with
        # the EOW marker — spellable only by literal '</w>' text) are
        # never candidates, the encode fold cannot apply them
        .where(~F.col("p.left").endswith(EOW))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# stage 3: pure-JVM encode (replace-fold)
# ---------------------------------------------------------------------------


def bpe_encode_tokens_col(
    text_col: str | Column,
    merges: list[tuple[str, str]],
    lower: bool = True,
) -> Column:
    """Token array Column: the merge list folded into the plan as a
    chain of literal ``replace`` expressions — zero Python, zero
    shuffle, one whole-stage-codegen projection. NULL text → NULL,
    empty/all-junk text → empty array (mirrored exactly in
    :func:`bpe_encode_sql`)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # strip the delimiter BEFORE the whitespace collapse so a
    # whitespace-separated delimiter-only token vanishes (leaving one
    # collapsed space) instead of leaving a double space that the
    # space→</w> replace would turn into a spurious bare '</w>' token —
    # this matches bpe_word_counts, which strips per token and drops
    # the resulting empty words from the fit
    t = norm_text(F.replace(c, F.lit(DELIM), F.lit("")), lower=lower)
    # every codepoint becomes a symbol: 'ab cd' -> '␟␟a␟␟b␟␟ ␟␟c␟␟d␟␟'
    # (?s): Java's default dot excludes U+2028/U+2029/U+0085 while
    # RE2's excludes only \n — DOTALL makes both engines (and the
    # trainer's per-codepoint tuple(word)) agree on every character
    body = F.regexp_replace(t, "(?s)(.)", "$1" + DD)
    seq = F.concat(F.lit(DD), body, F.lit(EOW + DD))
    # the single-space symbol (norm collapsed runs) becomes </w>
    seq = F.replace(seq, F.lit(DELIM + " " + DELIM), F.lit(DELIM + EOW + DELIM))
    for a, b in merges:
        if DELIM in a or DELIM in b:
            raise ValueError("merge symbols must not contain the delimiter")
        if a.endswith(EOW):
            # a left element ending in the end-of-word marker is only
            # spellable by literal '</w>' text inside a training word;
            # applying it in the fold would merge ACROSS word
            # boundaries (the previous word's terminal symbol + the
            # next word's first). train_from_counts never emits one —
            # reject lists from other trainers.
            raise ValueError(
                f"merge left element {a!r} ends with the end-of-word "
                "marker — applying it would merge across word boundaries"
            )
        seq = F.replace(
            seq,
            F.lit(DELIM + a + DD + b + DELIM),
            F.lit(DELIM + a + b + DELIM),
        )
    toks = F.split(F.btrim(seq, F.lit(DELIM)), DD)
    return (
        F.when(t.isNull(), F.lit(None).cast("array<string>"))
        .when(F.length(t) == 0, F.array().cast("array<string>"))
        .otherwise(toks)
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    prefix: str = "bpe_",
    lower: bool = True,
) -> DataFrame:
    """Append ``{prefix}tokens`` (array<string>) and
    ``{prefix}n_tokens`` (int) — the deployed-scale stage."""
    for col in (f"{prefix}tokens", f"{prefix}n_tokens"):
        if col in df.columns:
            raise ValueError(f"output column {col!r} already exists")
    toks = bpe_encode_tokens_col(text_col, merges, lower=lower)
    out = df.withColumn(f"{prefix}tokens", toks)
    return out.withColumn(f"{prefix}n_tokens", F.size(F.col(f"{prefix}tokens")))


def bpe_encode_sql(
    text_expr: str,
    merges: list[tuple[str, str]],
    lower: bool = True,
) -> str:
    """DuckDB fragment: LIST of tokens mirroring
    :func:`bpe_encode_tokens_col` element-for-element, generated from
    the SAME merge list and delimiter constants."""
    t = norm_text_sql(f"replace({text_expr}, chr(31), '')", lower=lower)
    body = rf"regexp_replace({t}, '(?s)(.)', '\1' || chr(31) || chr(31), 'g')"
    seq = f"chr(31) || chr(31) || {body} || '</w>' || chr(31) || chr(31)"
    seq = (
        f"replace({seq}, chr(31) || ' ' || chr(31), "
        f"chr(31) || '</w>' || chr(31))"
    )
    for a, b in merges:
        if DELIM in a or DELIM in b:
            # same guard as the Spark fold — a delimiter inside a
            # symbol would silently corrupt the replace chain here
            raise ValueError("merge symbols must not contain the delimiter")
        if a.endswith(EOW):
            raise ValueError(
                f"merge left element {a!r} ends with the end-of-word "
                "marker — applying it would merge across word boundaries"
            )
        pa = a.replace("'", "''")
        pb = b.replace("'", "''")
        seq = (
            f"replace({seq}, chr(31) || '{pa}' || chr(31) || chr(31) || "
            f"'{pb}' || chr(31), chr(31) || '{pa}{pb}' || chr(31))"
        )
    toks = f"string_split(trim({seq}, chr(31)), chr(31) || chr(31))"
    return (
        f"CASE WHEN {t} IS NULL THEN NULL "
        f"WHEN length({t}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE {toks} END"
    )
