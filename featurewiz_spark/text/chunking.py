"""Document chunking into fixed-size token windows with overlap.

The curated-corpus -> training-examples step of an LLM data pipeline:
every document becomes ``ceil`` - many windows of at most ``max_tokens``
whitespace tokens, consecutive windows sharing ``overlap`` tokens so no
context is lost at boundaries (the standard sliding-window convention,
e.g. the HuggingFace ``return_overflowing_tokens`` stride semantics,
re-derived from the public description).

Window rule (stride = max_tokens - overlap): window k starts at token
``k * stride``; window k >= 1 exists iff the previous window was
clamped by the document end — i.e. iff ``(k-1) * stride + max_tokens <
n_tokens`` — so every emitted window contributes at least one new
token and a doc shorter than ``max_tokens`` yields exactly one window.
Empty documents yield none.

Scale shape: a pure projection + explode — rides the scan, zero
shuffles, output rows ~ corpus tokens / stride. The oracle SQL is
generated from the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import (
    h60,
    h60_sql,
    norm_tokens,
    norm_tokens_sql,
)


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
    lower: bool = False,
) -> DataFrame:
    """Explode each document into (id_col, chunk_idx, chunk_start,
    chunk_n_tokens, chunk_text) sliding windows. ``chunk_start`` is the
    0-based token offset; ``chunk_text`` joins the window's tokens with
    single spaces (whitespace-normalized; case preserved unless
    ``lower``)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not (0 <= overlap < max_tokens):
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    _, toks = norm_tokens(text_col, lower=lower)
    n = F.size(toks)
    extra = F.greatest(n - max_tokens, F.lit(0))
    n_chunks = F.when(
        n > 0,
        (1 + F.floor((extra + stride - 1) / stride)).cast("int"),
    ).otherwise(F.lit(0))
    idx = F.when(
        n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    out = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(idx).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return out.select(
        id_col,
        "chunk_idx",
        start.alias("chunk_start"),
        F.least(F.lit(max_tokens), F.col("__n") - start).alias(
            "chunk_n_tokens"
        ),
        F.array_join(
            F.slice(F.col("__toks"), start + 1, max_tokens), " "
        ).alias("chunk_text"),
    )


def chunk_documents_sql(
    docs_src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
    lower: bool = False,
) -> str:
    """DuckDB mirror of :func:`chunk_documents` — same tokenizer
    (text/_norm.py) and window arithmetic."""
    if max_tokens <= 0 or not (0 <= overlap < max_tokens):
        raise ValueError("bad max_tokens/overlap")
    stride = max_tokens - overlap
    t_sql, w_sql = norm_tokens_sql(text_col, lower=lower)
    return f"""
WITH __ck_toks AS (
    SELECT {id_col}, w, len(w) AS n
    FROM (SELECT {id_col}, {w_sql} AS w, {t_sql} AS t
          FROM {docs_src}) s
    WHERE t <> ''),
__ck_idx AS (
    SELECT {id_col}, w, n, CAST(i AS INT) AS chunk_idx
    FROM __ck_toks,
         LATERAL unnest(generate_series(0,
             (greatest(n - {max_tokens}, 0) + {stride} - 1) // {stride}
         )) AS g(i))
SELECT {id_col}, chunk_idx,
       chunk_idx * {stride} AS chunk_start,
       CAST(least({max_tokens}, n - chunk_idx * {stride}) AS INT)
           AS chunk_n_tokens,
       array_to_string(
           list_slice(w, chunk_idx * {stride} + 1,
                      chunk_idx * {stride} + {max_tokens}), ' ')
           AS chunk_text
FROM __ck_idx
"""


def pack_sequences(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 8,
) -> "DataFrame":
    """GPT-style concat-and-chunk sequence packing: documents are laid
    end-to-end in a deterministic order and cut every ``budget`` tokens;
    each document learns WHICH training sequence it starts in and at
    what offset. Output: input columns + ``pack_shard``, ``n_tokens``,
    ``pack_id`` (global: shard * 2^40 + within-shard pack), and
    ``pack_offset``.

    Scale shape: the running token sum is a per-shard ordered window —
    shard = md5-60(id) % n_shards (portable hash, identical in the
    mirror), order = id. Choose ``n_shards`` ∝ corpus so a shard's
    partition stays task-sized (the same knob as every bucketed op
    here); each shard packs independently, which is exactly how a
    multi-host tokenizer farm shards packing in practice. All
    arithmetic is exact integers — the mirror cannot drift by a ULP.

    A document with more tokens than remain in its starting pack spills
    into the next pack(s) — concat-and-chunk semantics (documents cross
    sequence boundaries; the standard GPT pretraining layout).
    """
    from pyspark.sql import Window

    for c in ("pack_shard", "n_tokens", "pack_id", "pack_offset",
              "__pk_start"):
        if c in docs.columns:
            raise ValueError(f"pack_sequences: column {c!r} exists")
    _, toks = norm_tokens(text_col)
    shard = F.pmod(h60(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
        "int"
    )
    d = docs.withColumn("pack_shard", shard).withColumn(
        "n_tokens", F.size(toks).cast("long")
    )
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # `div`, not floor(a/b): '/' is DOUBLE division, which silently
    # loses integer precision once a shard's running token sum passes
    # 2^53 — at 10^12-doc scale that is reachable; `div` stays exact
    # BIGINT like the mirror's `//`
    return (
        d.withColumn("__pk_start", start)
        .withColumn(
            "pack_id",
            F.col("pack_shard").cast("long") * F.lit(1 << 40)
            + F.expr(f"__pk_start div {int(budget)}"),
        )
        .withColumn(
            "pack_offset", F.pmod(F.col("__pk_start"), F.lit(budget)).cast("long")
        )
        .drop("__pk_start")
    )


def pack_sequences_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 8,
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`pack_sequences` — same portable shard
    hash, same ordered window, exact integer arithmetic (window sums
    cast from HUGEINT back to BIGINT)."""
    t_sql, w_sql = norm_tokens_sql(text_col)
    shard = f"(({h60_sql(f'{id_col}::VARCHAR')}) % {n_shards})::INT"
    ntok = (
        f"CASE WHEN {t_sql} = '' OR {text_col} IS NULL THEN 0"
        f" ELSE len({w_sql}) END::BIGINT"
    )
    return f"""
WITH __ps AS (
    SELECT {select_cols}, {shard} AS pack_shard, {ntok} AS n_tokens
    FROM {src}),
__ps2 AS (
    SELECT *,
           (sum(n_tokens) OVER (
                PARTITION BY pack_shard ORDER BY {id_col}
                ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS strt
    FROM __ps)
SELECT * EXCLUDE (strt),
       (pack_shard::BIGINT * {1 << 40} + strt // {budget})::BIGINT AS pack_id,
       (strt % {budget})::BIGINT AS pack_offset
FROM __ps2
"""
