"""Segment-level dedup and repetition quality signals for web-scale
training-data curation.

Two public-knowledge techniques re-expressed as declarative Spark plans:

- :func:`duplicate_segment_filter` — CCNet-style removal of segments
  (lines / paragraphs / fixed-size token chunks) that repeat across many
  documents: navigation bars, cookie banners, boilerplate footers. The
  reference (featurewiz) has no corpus-level text operator; this is one
  of the LLM-training-data-pipeline additions the builder's brief makes
  first-class, alongside the document-level dedup family in
  operators/dedup.py.
- :func:`add_repetition_signals` — Gopher-style within-document
  repetition ratios (duplicate-chunk fraction, top n-gram mass,
  duplicate-word fraction) used as quality-filter features.

Scale notes (the part that matters at 10^12 docs):

- duplicate_segment_filter is three exchanges total: one hash aggregate
  for segment document-frequency (map-side partials collapse repeated
  boilerplate before the shuffle), one join of segments to that
  frequency table on the segment hash (the build side is one row per
  DISTINCT segment, so hot boilerplate hashes are a skewed PROBE side —
  AQE skew-join splits them; no row explosion because the join is 1:N,
  not N:M), and one hash aggregate back to doc_id to reassemble. No
  windows, no per-key sorts, no Python.
- add_repetition_signals shuffles on (doc_id, gram) then doc_id — both
  hash aggregates with partial aggregation; gram cardinality within a
  doc is bounded by doc length, so no hot keys beyond doc size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import norm_text, norm_text_sql


def _chunk_segments(text_col: str, chunk_tokens: int):
    """(tokens-normalized-text, chunk array) expressions: collapse
    whitespace, trim, split on single spaces, group into fixed
    ``chunk_tokens``-token chunks (last chunk may be short). Empty text
    yields an empty chunk array."""
    t = norm_text(text_col, lower=False)
    toks = F.split(t, " ")
    n = F.size(toks)
    nchunks = F.floor((n + chunk_tokens - 1) / chunk_tokens).cast("int")
    idx = F.when(
        (F.length(t) > 0) & (nchunks >= 1), F.sequence(F.lit(0), nchunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        idx,
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    return chunks


def duplicate_segment_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str | None = None,
    chunk_tokens: int | None = None,
    min_docs: int = 2,
    normalize: bool = True,
    out_col: str = "text_clean",
    join_sep: str | None = None,
) -> DataFrame:
    """Remove segments that occur in >= ``min_docs`` DISTINCT documents
    (cross-corpus boilerplate), keeping surviving segments in original
    order. CCNet-style paragraph dedup, re-derived from the public
    method description (Wenzek et al. 2020) — not ported from any
    implementation.

    Segmentation: ``sep`` (a regex, e.g. ``"\\n"``) splits on a
    delimiter for corpora with line structure; ``chunk_tokens`` groups
    whitespace tokens into fixed-size chunks for flat text. Exactly one
    must be given. Segments whose normalized form is empty are dropped
    before hashing (split artifacts carry no content).

    ``normalize``: hash ``lower(segment)`` so case variants of the same
    boilerplate collapse; the REASSEMBLED text always uses the original
    segment casing.

    Returns one row per input document: ``(id_col, out_col,
    n_segments, n_removed)``; a document whose every segment was
    boilerplate comes back with ``out_col = ''``.
    """
    if (sep is None) == (chunk_tokens is None):
        raise ValueError("give exactly one of sep= or chunk_tokens=")
    if sep is not None:
        chunks = F.filter(
            F.split(F.col(text_col), sep),
            lambda s: F.trim(s) != "",
        )
        # ANY separator regex means line/paragraph structure — reassemble
        # with newlines (the old exact-match on the literal r"\n" fell
        # back to ' ' for CRLF-safe patterns like r"\r?\n", silently
        # flattening every document's line structure). Override with
        # join_sep for exotic separators. For CRLF corpora pass
        # sep=r"\r?\n": with a bare r"\n" the trailing \r stays on each
        # segment, so identical boilerplate hashes differently.
        jsep = "\n" if join_sep is None else join_sep
    else:
        chunks = _chunk_segments(text_col, chunk_tokens)
        jsep = " " if join_sep is None else join_sep

    segs = df.select(
        F.col(id_col), F.posexplode(chunks).alias("__pos", "__seg")
    )
    norm = F.lower(F.col("__seg")) if normalize else F.col("__seg")
    segs = segs.withColumn("__h", F.md5(norm))

    freq = segs.groupBy("__h").agg(
        F.countDistinct(id_col).alias("__dfreq")
    )
    flagged = segs.join(freq, on="__h").withColumn(
        "__keep", F.col("__dfreq") < F.lit(min_docs)
    )
    # collect_list skips NULLs: when(__keep, struct) keeps only surviving
    # segments, array_sort restores text order (pos is unique per doc, so
    # the struct sort is total) — one aggregate computes counts AND the
    # reassembled text.
    agg = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("__pos"), F.col("__seg")),
                        )
                    )
                ),
                lambda x: x["__seg"],
            ),
            jsep,
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_segments"),
        (F.count(F.lit(1)) - F.sum(F.col("__keep").cast("long"))).alias(
            "n_removed"
        ),
    )
    base = df.select(id_col)
    return (
        base.join(agg, on=id_col, how="left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn("n_segments", F.coalesce("n_segments", F.lit(0)))
        .withColumn("n_removed", F.coalesce("n_removed", F.lit(0)))
    )


def duplicate_segment_filter_sql(
    src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    min_docs: int = 2,
) -> str:
    """DuckDB mirror of :func:`duplicate_segment_filter` (chunk mode,
    normalize=True) — generated next to the operator so the two sides
    share the segmentation definition. Returns a full SELECT."""
    ck = int(chunk_tokens)
    return f"""
WITH __dsf_base AS (
    SELECT {id_col},
           {norm_text_sql(text_col, lower=False)} AS t
    FROM {src}),
__dsf_toks AS (
    SELECT {id_col}, string_split(t, ' ') AS w
    FROM __dsf_base WHERE t <> ''),
__dsf_segs AS (
    SELECT {id_col}, i AS pos,
           array_to_string(list_slice(w, i*{ck}+1, i*{ck}+{ck}), ' ') AS seg
    FROM __dsf_toks,
         LATERAL unnest(generate_series(0,
             CAST((len(w)+{ck}-1)//{ck} AS INT) - 1)) AS g(i)),
__dsf_h AS (
    SELECT {id_col}, pos, seg, md5(lower(seg)) AS h FROM __dsf_segs),
__dsf_freq AS (
    SELECT h, count(DISTINCT {id_col}) AS dfreq FROM __dsf_h GROUP BY h),
__dsf_fl AS (
    SELECT s.{id_col}, s.pos, s.seg, (f.dfreq < {min_docs}) AS keep
    FROM __dsf_h s JOIN __dsf_freq f USING (h)),
__dsf_agg AS (
    SELECT {id_col},
           coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY pos), '') AS text_clean,
           count(*) AS n_segments,
           count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_removed
    FROM __dsf_fl GROUP BY {id_col})
SELECT d.{id_col},
       coalesce(a.text_clean, '') AS text_clean,
       CAST(coalesce(a.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed
FROM {src} d LEFT JOIN __dsf_agg a USING ({id_col})
"""


def add_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    ngram_ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style within-document repetition ratios (Rae et al. 2021,
    public method description):

    - ``rep_dup_chunk_frac`` — fraction of fixed-size token chunks whose
      lowered form occurs more than once in the document,
    - ``rep_dup_word_frac`` — 1 - distinct(words)/words (lowered),
    - ``rep_top{n}gram_frac`` — occurrences of the document's most
      frequent word n-gram / total n-grams, for each n in ``ngram_ns``.

    High values flag machine-generated / template pages a quality gate
    should drop. All ratios are NULL-free (empty docs score 0) and
    rounded to 6 decimals for cross-engine comparison.

    Plan: one explode of (gram kind, gram) per doc, then two hash
    aggregates — (doc, kind, gram) counts, then per (doc, kind) max/sum
    — pivoted back by kind and joined to the input on ``id_col``. Every
    aggregate gets map-side partials; nothing is per-key sorted.
    """
    out_cols = {"rep_dup_chunk_frac", "rep_dup_word_frac"} | {
        f"rep_top{nn}gram_frac" for nn in ngram_ns
    }
    clash = (out_cols | {c for c in df.columns if c.startswith("__")}) & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"add_repetition_signals: column(s) {sorted(clash)} collide "
            "with outputs / the internal '__' namespace — rename them"
        )
    t = norm_text(text_col, lower=False)
    toks = F.split(F.lower(t), " ")
    n = F.size(toks)

    kinds = []
    # chunk grams
    chunks = _chunk_segments(text_col, chunk_tokens)
    kinds.append(("chunk", F.transform(chunks, lambda c: F.lower(c))))
    kinds.append(("word", F.when(F.length(t) > 0, toks).otherwise(
        F.array().cast("array<string>"))))
    def _ngrams(nn: int):
        # one-arg lambda on purpose: a second parameter (even a bound
        # default) makes pyspark pass (element, index) and the index
        # would silently replace the n-gram length
        idx = F.when(
            (F.length(t) > 0) & (n - nn >= 0), F.sequence(F.lit(0), n - nn)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, nn), " ")
        )

    for nn in ngram_ns:
        kinds.append((f"g{nn}", _ngrams(nn)))

    exploded = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kind).alias("kind"), arr.alias("grams")
                    )
                    for kind, arr in kinds
                ]
            )
        ).alias("kg"),
    ).select(
        id_col,
        F.col("kg.kind").alias("__kind"),
        F.explode(F.col("kg.grams")).alias("__gram"),
    )
    counts = exploded.groupBy(id_col, "__kind", "__gram").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_kind = counts.groupBy(id_col, "__kind").agg(
        F.max("__c").alias("__maxc"),
        F.sum("__c").alias("__total"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
            "__dupmass"
        ),
        F.count(F.lit(1)).alias("__distinct"),
    )
    pivoted = per_kind.groupBy(id_col).agg(
        *[
            F.max(
                F.when(F.col("__kind") == kind, F.col(field))
            ).alias(f"__{kind}_{field.strip('_')}")
            for kind in [k for k, _ in kinds]
            for field in ("__maxc", "__total", "__dupmass", "__distinct")
        ]
    )

    def _ratio(num, den):
        return F.round(
            F.coalesce(
                num / F.nullif(den.cast("double"), F.lit(0.0)), F.lit(0.0)
            ),
            6,
        )

    out = df.join(pivoted, on=id_col, how="left")
    result = out.withColumns(
        {
            "rep_dup_chunk_frac": _ratio(
                F.coalesce(F.col("__chunk_dupmass"), F.lit(0)),
                F.coalesce(F.col("__chunk_total"), F.lit(0)),
            ),
            "rep_dup_word_frac": _ratio(
                F.coalesce(F.col("__word_total"), F.lit(0))
                - F.coalesce(F.col("__word_distinct"), F.lit(0)),
                F.coalesce(F.col("__word_total"), F.lit(0)),
            ),
            **{
                f"rep_top{nn}gram_frac": _ratio(
                    F.coalesce(F.col(f"__g{nn}_maxc"), F.lit(0)),
                    F.coalesce(F.col(f"__g{nn}_total"), F.lit(0)),
                )
                for nn in ngram_ns
            },
        }
    )
    drop = [c for c in result.columns if c.startswith("__")]
    return result.drop(*drop)


def repetition_signals_sql(
    src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    ngram_ns: tuple[int, ...] = (2, 3),
) -> str:
    """DuckDB mirror of :func:`add_repetition_signals` — full SELECT
    returning (id_col, rep_dup_chunk_frac, rep_dup_word_frac,
    rep_top{n}gram_frac...)."""
    ck = int(chunk_tokens)
    gram_selects = []
    for nn in ngram_ns:
        gram_selects.append(
            f"""SELECT {id_col}, 'g{nn}' AS kind,
           array_to_string(list_slice(w, i, i+{nn}-1), ' ') AS gram
    FROM __rep_toks, LATERAL unnest(generate_series(1, len(w)-{nn}+1)) AS s(i)
    WHERE len(w) >= {nn}"""
        )
    gram_union = "\n    UNION ALL\n    ".join(gram_selects)
    topcols = ",\n       ".join(
        f"round(coalesce(g{nn}_maxc / nullif(CAST(g{nn}_total AS DOUBLE), 0), 0), 6) AS rep_top{nn}gram_frac"
        for nn in ngram_ns
    )
    aggcols = ",\n           ".join(
        x
        for nn in ngram_ns
        for x in (
            f"max(CASE WHEN kind = 'g{nn}' THEN maxc END) AS g{nn}_maxc",
            f"max(CASE WHEN kind = 'g{nn}' THEN total END) AS g{nn}_total",
        )
    )
    return f"""
WITH __rep_base AS (
    SELECT {id_col},
           {norm_text_sql(text_col)} AS t
    FROM {src}),
__rep_toks AS (
    SELECT {id_col}, string_split(t, ' ') AS w
    FROM __rep_base WHERE t <> ''),
__rep_grams AS (
    SELECT {id_col}, 'chunk' AS kind,
           array_to_string(list_slice(w, i*{ck}+1, i*{ck}+{ck}), ' ') AS gram
    FROM __rep_toks,
         LATERAL unnest(generate_series(0,
             CAST((len(w)+{ck}-1)//{ck} AS INT) - 1)) AS c(i)
    UNION ALL
    SELECT {id_col}, 'word' AS kind, unnest(w) AS gram FROM __rep_toks
    UNION ALL
    {gram_union}),
__rep_counts AS (
    SELECT {id_col}, kind, gram, count(*) AS c
    FROM __rep_grams GROUP BY 1, 2, 3),
__rep_kind AS (
    SELECT {id_col}, kind, max(c) AS maxc, sum(c) AS total,
           sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupmass,
           count(*) AS n_distinct
    FROM __rep_counts GROUP BY 1, 2),
__rep_piv AS (
    SELECT {id_col},
           max(CASE WHEN kind = 'chunk' THEN dupmass END) AS chunk_dupmass,
           max(CASE WHEN kind = 'chunk' THEN total END) AS chunk_total,
           max(CASE WHEN kind = 'word' THEN total END) AS word_total,
           max(CASE WHEN kind = 'word' THEN n_distinct END) AS word_distinct,
           {aggcols}
    FROM __rep_kind GROUP BY 1)
SELECT d.{id_col},
       round(coalesce(chunk_dupmass / nullif(CAST(chunk_total AS DOUBLE), 0), 0), 6) AS rep_dup_chunk_frac,
       round(coalesce((word_total - word_distinct) / nullif(CAST(word_total AS DOUBLE), 0), 0), 6) AS rep_dup_word_frac,
       {topcols}
FROM {src} d LEFT JOIN __rep_piv p USING ({id_col})
"""


def snapshot_churn(
    df: DataFrame,
    entity_col: str,
    version_col: str,
    text_col: str = "text",
    rounding: int = 6,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Cross-snapshot content churn — the Common-Crawl refresh
    question: per (entity, version), how much of the page's token SET
    changed versus the previous snapshot. Appends ``churn_added`` /
    ``churn_removed`` (distinct tokens gained/lost), and
    ``churn_jaccard`` (distinct-token Jaccard vs the previous
    snapshot, rounded); the first snapshot of an entity gets NULLs.

    Plan: ONE shuffle (hash partition by entity) + ONE sort shared by
    the single lag window; the set arithmetic is array_distinct /
    array_except / array_intersect on the token arrays — pure JVM
    codegen riding the window's projection. Window partition =
    one entity's snapshot history (bounded by crawl cadence, never a
    corpus-scale hot key).

    Determinism: the lag window orders by ``version_col`` alone, so
    duplicate (entity, version) pairs make the previous-snapshot choice
    partition-order-dependent. Either guarantee unique versions per
    entity, or pass ``tiebreak_col`` (e.g. the id column) to pin the
    order — the SQL mirror accepts the same knob.
    """
    from pyspark.sql import Window

    from featurewiz_spark.text._norm import norm_tokens

    for c in ("churn_added", "churn_removed", "churn_jaccard"):
        if c in df.columns:
            raise ValueError(f"snapshot_churn: column {c!r} exists")
    _, toks = norm_tokens(text_col)
    order = [F.col(version_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    cur = F.array_distinct(toks)
    prev = F.lag(cur).over(w)
    return (
        df.withColumn("__cur", cur)
        .withColumn("__prev", prev)
        .withColumns(
            {
                "churn_added": F.size(
                    F.array_except(F.col("__cur"), F.col("__prev"))
                ),
                "churn_removed": F.size(
                    F.array_except(F.col("__prev"), F.col("__cur"))
                ),
                "churn_jaccard": F.round(
                    F.size(F.array_intersect(F.col("__cur"), F.col("__prev")))
                    / F.greatest(
                        F.size(F.array_union(F.col("__cur"), F.col("__prev"))),
                        F.lit(1),
                    ),
                    rounding,
                ),
            }
        )
        .drop("__cur", "__prev")
    )


def snapshot_churn_sql(
    src: str,
    entity_col: str,
    version_col: str,
    text_col: str = "text",
    id_cols: str = "doc_id",
    rounding: int = 6,
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB mirror of :func:`snapshot_churn` — full SELECT returning
    (id_cols, entity, version, churn columns); same shared tokenizer,
    distinct-set arithmetic via list_distinct/list_filter."""
    from featurewiz_spark.text._norm import norm_tokens_sql

    t_sql, w_sql = norm_tokens_sql(text_col)
    return f"""
WITH __sc AS (
    SELECT {id_cols}, {entity_col}, {version_col},
           CASE WHEN {text_col} IS NULL OR {t_sql} = ''
                THEN []::VARCHAR[]
                ELSE list_distinct({w_sql}) END AS cur
    FROM {src}),
__sc2 AS (
    SELECT *, lag(cur) OVER (
        PARTITION BY {entity_col} ORDER BY {version_col}{
            ", " + tiebreak_col if tiebreak_col is not None else ""}) AS prev
    FROM __sc)
SELECT {id_cols}, {entity_col}, {version_col},
       -- prev IS NULL (first snapshot): Spark's set ops propagate the
       -- NULL array to NULL sizes; DuckDB's list_contains(NULL, t)
       -- lambda would silently yield 0 instead — pin NULL explicitly
       CASE WHEN prev IS NULL THEN NULL ELSE
       CAST(len(list_filter(cur, t -> NOT list_contains(prev, t))) AS INT)
       END AS churn_added,
       CASE WHEN prev IS NULL THEN NULL ELSE
       CAST(len(list_filter(prev, t -> NOT list_contains(cur, t))) AS INT)
       END AS churn_removed,
       CASE WHEN prev IS NULL THEN NULL ELSE
       round(1.0 * len(list_filter(cur, t -> list_contains(prev, t)))
             / greatest(len(list_distinct(cur || prev)), 1), {rounding})
       END AS churn_jaccard
FROM __sc2
"""
