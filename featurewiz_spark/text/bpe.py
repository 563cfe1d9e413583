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

from typing import Iterator

import pandas as pd
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
    "bpe_encode_kernel_col",
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
    DataFrame.

    Incremental (r6): the original loop recomputed EVERY pair count
    over the WHOLE vocabulary each round — O(merges × vocab × word_len)
    (an 8k-merge vocabulary on a 200k-word table is ~10^10 Python
    steps). This version keeps authoritative pair counts, updates only
    the words that actually contain the merged pair, and selects the
    best pair from a lazily-invalidated heap — O(total updates ×
    log vocab). Output identical merge-for-merge (same counts, same
    (-count, pair) tie-break; differential-tested against the
    round-rescan reference in tests/test_r6_opt.py).

    A pair with LEFT element ending in the end-of-word marker is never
    learned (only spellable by literal '</w>' text inside a word; a
    merge with this left element would merge across word boundaries in
    the encode fold, whose guard rejects it)."""
    import heapq

    # collapse identical symbol sequences exactly like the reference's
    # vocab dict (two raw words normalizing to the same sequence)
    vocab: dict[tuple, int] = {}
    for word, cnt in counts.items():
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(cnt)
    entries: list[list] = [[list(s), c] for s, c in vocab.items()]

    def word_pairs(syms: list) -> dict[tuple, int]:
        out: dict[tuple, int] = {}
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            if p[0].endswith(EOW):
                continue
            out[p] = out.get(p, 0) + 1
        return out

    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set[int]] = {}
    for wid, (syms, cnt) in enumerate(entries):
        for p, occ in word_pairs(syms).items():
            pair_counts[p] = pair_counts.get(p, 0) + occ * cnt
            pair_words.setdefault(p, set()).add(wid)

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        best = None
        while heap:
            negc, p = heap[0]
            cur = pair_counts.get(p, 0)
            if cur <= 0 or -negc != cur:
                heapq.heappop(heap)  # stale or exhausted entry
                continue
            best = p
            break
        if best is None:
            break
        merges.append(best)
        for wid in list(pair_words.get(best, ())):
            syms, cnt = entries[wid]
            before = word_pairs(syms)
            if best not in before:
                continue  # stale membership from an earlier update
            merged = list(_merge_syms(tuple(syms), best))
            after = word_pairs(merged)
            entries[wid][0] = merged
            for p in before.keys() | after.keys():
                delta = (after.get(p, 0) - before.get(p, 0)) * cnt
                if delta == 0:
                    continue
                nc = pair_counts.get(p, 0) + delta
                pair_counts[p] = nc
                if delta > 0:
                    pair_words.setdefault(p, set()).add(wid)
                if nc > 0:
                    heapq.heappush(heap, (-nc, p))
        # the merged pair is gone everywhere by construction
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
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


# Above this merge count, bpe_encode switches from the plan-folded
# replace chain to the Arrow kernel. The fold is structurally bounded:
# the r6 probe measured the driver's recursive Column→Expression
# conversion overflowing the JVM thread stack between 256 and 512
# chained replaces (StackOverflowError before planning even starts) —
# a production 16k-32k-merge vocabulary cannot run as a fold at all.
# 256 keeps the pure-JVM zero-Python path for small vocabularies
# (every oracle-gated query uses ≤ 64 merges) with a 2x margin below
# the measured failure point; override per call with engine= or
# globally via FW_BPE_FOLD_MAX_MERGES (e.g. on a driver with a larger
# -Xss). The kernel is O(doc_len) per doc regardless of merge count
# (per-task distinct-word cache), so routing above the cap is also the
# faster choice, not just the safe one — see BENCH/BPE.md r6 rows.
FOLD_MAX_MERGES = 256


def _bpe_encode_words(merges: list[tuple[str, str]]):
    """Per-task encoder factory: returns ``encode(word) -> list[str]``
    applying ``merges`` IN RANK ORDER with the exact fold semantics —
    merge r rewrites every non-overlapping occurrence left-to-right,
    and an occurrence of a pair created by a LATER-ranked merge is
    never revisited (the fold's single forward pass per merge). A heap
    of candidate ranks makes this O(applied · word_len) per word
    instead of O(merges · word_len): after applying rank r, only
    newly-adjacent pairs with rank > r are (re)pushed. Duplicate pairs
    in the merge list (a pair re-learned at a later rank after earlier
    merges re-create its adjacency) keep ALL their ranks."""
    import bisect
    import heapq

    ranklists: dict[tuple[str, str], list[int]] = {}
    for i, (a, b) in enumerate(merges):
        ranklists.setdefault((a, b), []).append(i)

    def encode(word: str) -> list[str]:
        syms = list(word)
        syms.append(EOW)
        heap: list[int] = []
        seen: set[int] = set()

        def push(pair, after: int) -> None:
            lst = ranklists.get(pair)
            if not lst:
                return
            j = bisect.bisect_right(lst, after)
            if j < len(lst) and lst[j] not in seen:
                seen.add(lst[j])
                heapq.heappush(heap, lst[j])

        for i in range(len(syms) - 1):
            push((syms[i], syms[i + 1]), -1)
        while heap:
            r = heapq.heappop(heap)
            a, b = merges[r]
            out: list[str] = []
            i, n = 0, len(syms)
            changed = False
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                syms = out
                for i in range(len(syms) - 1):
                    push((syms[i], syms[i + 1]), r)
        return syms

    return encode


def bpe_encode_kernel_col(
    text_col: str | Column,
    merges: list[tuple[str, str]],
    lower: bool = True,
) -> Column:
    """Arrow-kernel encode — the production path for realistic (16k+)
    vocabularies, where the replace-fold's O(merges × doc_len) passes
    and O(merges)-deep expression tree are structurally unaffordable
    (the driver's Column→Expression conversion stack-overflows near 8k
    chained replaces). Differential-tested token-identical to the fold
    (tests/test_bpe.py).

    Parity by construction: normalization (delimiter strip, whitespace
    collapse, trim, lower) runs in the JVM via the SAME ``norm_text``
    expression as the fold, so the Python side only splits on the
    single collapsed space and applies merges; per-task state is one
    distinct-word → tokens dict (Zipfian corpora hit it constantly),
    built once per task (iterator-form pandas UDF)."""
    from pyspark.sql.functions import pandas_udf

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for a, b in merges:
        if DELIM in a or DELIM in b:
            raise ValueError("merge symbols must not contain the delimiter")
        if a.endswith(EOW):
            raise ValueError(
                f"merge left element {a!r} ends with the end-of-word "
                "marker — applying it would merge across word boundaries"
            )
    mlocal = [(a, b) for a, b in merges]

    @pandas_udf("array<string>")
    def _encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encode_word = _bpe_encode_words(mlocal)
        cache: dict[str, list[str]] = {}

        def doc(t: str) -> list[str]:
            if not t:
                return []
            toks: list[str] = []
            for w in t.split(" "):
                enc = cache.get(w)
                if enc is None:
                    enc = encode_word(w)
                    cache[w] = enc
                toks.extend(enc)
            return toks

        for s in batches:
            yield s.map(doc, na_action="ignore")

    t = norm_text(F.replace(c, F.lit(DELIM), F.lit("")), lower=lower)
    return _encode(t)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    prefix: str = "bpe_",
    lower: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Append ``{prefix}tokens`` (array<string>) and
    ``{prefix}n_tokens`` (int) — the deployed-scale stage.

    engine: "auto" (default) uses the pure-JVM replace-fold up to
    ``FOLD_MAX_MERGES`` merges and the Arrow kernel above it (see
    FOLD_MAX_MERGES for the measured rationale); "fold" / "kernel"
    force a path. Both produce identical tokens."""
    for col in (f"{prefix}tokens", f"{prefix}n_tokens"):
        if col in df.columns:
            raise ValueError(f"output column {col!r} already exists")
    if engine == "auto":
        import os

        cap = int(os.environ.get("FW_BPE_FOLD_MAX_MERGES", FOLD_MAX_MERGES))
        engine = "fold" if len(merges) <= cap else "kernel"
    if engine == "fold":
        toks = bpe_encode_tokens_col(text_col, merges, lower=lower)
    elif engine == "kernel":
        toks = bpe_encode_kernel_col(text_col, merges, lower=lower)
    else:
        raise ValueError(f"engine must be auto|fold|kernel, got {engine!r}")
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
