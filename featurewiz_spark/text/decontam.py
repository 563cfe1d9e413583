"""Benchmark decontamination: flag or drop training documents that
share any word n-gram with a held-out evaluation set.

The standard published recipe (GPT-3 appendix C, The Pile, FineWeb all
describe n-gram-overlap decontamination): normalize text, form n-token
shingles, and treat a training document as contaminated when any of
its shingles appears in any benchmark text. featurewiz has no text
operators — this is an LLM-training-data-pipeline addition per the
builder's brief.

Scale shape (the part that matters at 10^12 docs):

- The benchmark side is SMALL (eval suites are 10^4..10^6 items); its
  distinct gram set is hashed to 60-bit ints (8 bytes each) and
  BROADCAST — the corpus is never shuffled. The corpus side is scan ->
  explode -> broadcast semi-join -> one hash aggregate back to doc_id
  (map-side partials collapse repeated grams before the exchange).
- ``broadcast_bench=False`` switches to a shuffle join for benchmark
  sets too big to broadcast; semantics identical.
- Gram hashing uses the portable md5-60 family (identical int in Spark
  and DuckDB), so the oracle verifies the exact hashed pipeline, not a
  lookalike. 60-bit collisions over-flag at ~n_grams^2/2^61 — at 10^6
  benchmark grams that is ~1e-7 expected false collisions, and
  over-flagging is the safe direction for decontamination.
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


def _gram_hashes(text_col: str, n: int):
    """Array of md5-60 hashes of the n-token shingles of ``text_col``
    (empty array for texts shorter than ``n`` tokens)."""
    t, toks = norm_tokens(text_col)
    idx = F.when(
        (F.length(t) > 0) & (F.size(toks) - n >= 0),
        F.sequence(F.lit(0), F.size(toks) - n),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: h60(F.array_join(F.slice(toks, i + 1, n), " "))
    )


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct md5-60 hashes of every n-gram in the benchmark corpus
    — one column ``gram_h`` (long)."""
    return (
        bench.select(F.explode(_gram_hashes(text_col, n)).alias("gram_h"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    mode: str = "flag",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag (``mode='flag'``) or remove (``mode='drop'``) documents
    sharing any n-token shingle with ``bench``.

    ``flag`` appends ``is_contaminated`` (int 0/1) and
    ``n_contaminated_grams`` (distinct matching shingles, int) to
    ``docs``; ``drop`` returns only the clean rows of ``docs``
    unchanged. Documents shorter than ``n`` tokens are never
    contaminated.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    if mode == "flag":
        clash = {"is_contaminated", "n_contaminated_grams"} & set(docs.columns)
        if clash:
            raise ValueError(
                f"decontaminate: output columns exist: {sorted(clash)} — "
                "rename them before re-flagging against another benchmark"
            )
    bg = benchmark_grams(bench, bench_text_col or text_col, n)
    if broadcast_bench:
        bg = F.broadcast(bg)
    doc_grams = docs.select(
        F.col(id_col), F.explode(_gram_hashes(text_col, n)).alias("gram_h")
    )
    hits = (
        doc_grams.join(bg, "gram_h")
        .groupBy(id_col)
        .agg(F.count_distinct("gram_h").cast("int").alias("n_contaminated_grams"))
    )
    if mode == "drop":
        return docs.join(hits, id_col, "left_anti")
    return docs.join(hits, id_col, "left").withColumns(
        {
            "n_contaminated_grams": F.coalesce(
                F.col("n_contaminated_grams"), F.lit(0)
            ),
            "is_contaminated": (
                F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0
            ).cast("int"),
        }
    )


def decontaminate_sql(
    docs_src: str,
    bench_src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    mode: str = "flag",
) -> str:
    """DuckDB mirror of :func:`decontaminate` — full SELECT returning
    (id_col, is_contaminated, n_contaminated_grams) for ``flag`` or
    the clean ``id_col`` rows for ``drop``. Generated from the same
    normalization / shingle / md5-60 definitions."""
    btc = bench_text_col or text_col

    def grams(src: str, col: str, ident: str) -> str:
        t_sql, w_sql = norm_tokens_sql(col)
        gh = h60_sql(f"array_to_string(list_slice(w, i, i+{n}-1), ' ')")
        return f"""
    SELECT {ident},
           {gh} AS gram_h
    FROM (SELECT {ident},
                 {w_sql} AS w,
                 {t_sql} AS t
          FROM {src}) s,
         LATERAL unnest(generate_series(1, len(w)-{n}+1)) AS g(i)
    WHERE t <> '' AND len(w) >= {n}"""

    body = f"""
WITH __bench_grams AS (
    SELECT DISTINCT gram_h FROM ({grams(bench_src, btc, "1 AS one")}) b),
__doc_grams AS ({grams(docs_src, text_col, id_col)}),
__hits AS (
    SELECT {id_col}, CAST(count(DISTINCT d.gram_h) AS INT) AS n_contaminated_grams
    FROM __doc_grams d JOIN __bench_grams USING (gram_h)
    GROUP BY {id_col})"""
    if mode == "drop":
        # ANTI JOIN, not NOT IN: a NULL id makes NOT IN drop the row
        # (NULL comparison) where Spark's left_anti keeps it — the two
        # sides must share one semantics for null keys.
        return (
            body
            + f"""
SELECT d.* FROM {docs_src} d
ANTI JOIN __hits h ON d.{id_col} = h.{id_col}"""
        )
    return (
        body
        + f"""
SELECT d.{id_col},
       CAST(coalesce(h.n_contaminated_grams, 0) > 0 AS INT) AS is_contaminated,
       coalesce(h.n_contaminated_grams, 0) AS n_contaminated_grams
FROM {docs_src} d LEFT JOIN __hits h USING ({id_col})"""
    )
