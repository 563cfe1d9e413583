"""Embedding-space corpus curation: SemDeDup-style semantic dedup and
Johnson-Lindenstrauss random projection.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates — documents whose embeddings nearly coincide even when
their text differs — by (1) clustering the embedding space so the
quadratic pair search is bounded per cluster, then (2) inside each
cluster dropping every point that has a near-neighbor (cosine ≥
threshold) with a smaller index, keeping one representative per
near-dup group. This module re-derives both stages Spark-first:

- **Clustering** is a deterministic Voronoi assignment to k seed
  vectors chosen by a portable hash order (md5 of the id) — a pure
  projection (k dot products per row inside whole-stage codegen, NO
  shuffle, no iterative k-means), which is what makes the whole
  operator strictly SQL-mirrorable for the oracle. The iterative
  k-means path (`similarity.ivf_centroids`) remains available for
  callers who want data-adaptive cells; pass its assignments via
  ``cluster_col``.
- **Within-cluster dedup** is ONE shuffle on the cluster id plus a
  vectorized Arrow kernel (row-blocked GEMM, the same bounded-memory
  shape as `similarity.cosine_near_dup_pairs`): task memory is
  block_rows × cluster_size doubles, never cluster_size².

At 10^12 docs the contract is the paper's: pick n_clusters so the
expected cluster (corpus / n_clusters) fits a task — the quadratic
cost is *per cluster*, and clusters are independent tasks. Skew guard:
`max_cluster_size` drops oversized clusters from the pair search
(keeping all their members) instead of letting one hot Voronoi cell
own an unsplittable quadratic task — the explicit-coverage-cap
pattern shared with the LSH ops.

Random projection (JL): y = R·x / sqrt(d_out) with R ∈ {±1}^{d_out×d_in}
derived from md5 — the classic Achlioptas (2003) database-friendly
transform. The sign matrix is generated driver-side at plan-build time
and inlined as literals, so the plan is a pure codegen projection and
the generated DuckDB mirror evaluates the byte-identical arithmetic
(same left-to-right association order → bit-identical doubles before
the final rounding).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_ROWS = 256


def seed_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
) -> list[list[float]]:
    """The k cluster seeds: the rows with the smallest
    (md5(id-as-string), id) — a portable deterministic order both
    engines can reproduce (DuckDB: ``ORDER BY md5(id::VARCHAR), id``).
    Driver-collects k rows (tiny); seeds become plan literals."""
    rows = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(n_clusters)
        .collect()
    )
    return [[float(x) for x in r["__v"]] for r in rows]


def _cosine_to_seed(vec_col: str, seed: list[float]):
    """cos(x, seed) as a codegen expression: zip_with dot product in
    index order (deterministic association), norms via aggregate."""
    arr = F.col(vec_col)
    lits = F.array(*[F.lit(float(v)) for v in seed])
    dot = F.aggregate(
        F.zip_with(arr, lits, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nx = F.sqrt(
        F.aggregate(
            arr,
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    ns = math.sqrt(sum(v * v for v in seed))
    return dot / (nx * F.lit(ns))


def assign_to_seeds(
    df: DataFrame,
    seeds: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Voronoi assignment: ``out_col`` = index of the max-cosine seed,
    ties broken toward the SMALLEST seed index (matches the SQL
    mirror's ``ORDER BY cos DESC, cluster ASC``). Pure projection —
    max over struct(cos, -index) rides whole-stage codegen; no
    shuffle, no UDF."""
    # cosines rounded to 9 dp before the argmax (mirror rounds the
    # same): the two engines' dot products differ by ULPs, and an
    # unrounded max could flip between near-equidistant seeds; after
    # rounding, exact ties resolve by the shared smallest-index rule
    cands = F.array(
        *[
            F.struct(
                F.round(_cosine_to_seed(vec_col, s), 9).alias("c"),
                F.lit(-i).alias("ni"),
            )
            for i, s in enumerate(seeds)
        ]
    )
    return df.withColumn(out_col, (-F.array_max(cands)["ni"]).cast("int"))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.95,
    cluster_col: str | None = None,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup keep/drop decision per vector (see module docstring).
    Returns (id_col, cluster, keep): ``keep`` is False iff some vector
    in the same cluster has cosine ≥ threshold AND a smaller id — so
    exactly one representative (the min id) of each within-cluster
    near-dup group survives, the paper's rule.

    ``cluster_col``: use a precomputed assignment (e.g. IVF k-means
    cells) instead of the built-in seeded Voronoi assignment.
    ``max_cluster_size``: clusters larger than this skip the pair
    search (all members kept) — an explicit coverage cap, logged in
    the plan rather than a silent straggler.

    Zero-norm embeddings are degenerate (cosine undefined — the kernel
    guards the division, the engines' NaN orderings differ): exclude
    them upstream."""
    if cluster_col is None:
        if "cluster" in df.columns:
            raise ValueError(
                "semantic_dedup: df already has a 'cluster' column — pass "
                "cluster_col='cluster' to use it, or rename it first"
            )
        seeds = seed_vectors(df, id_col, vec_col, n_clusters)
        assigned = assign_to_seeds(df, seeds, vec_col, "cluster")
    else:
        if cluster_col != "cluster" and "cluster" in df.columns:
            raise ValueError(
                "semantic_dedup: 'cluster' is reserved for the assignment "
                f"column; rename the existing 'cluster' or pass it as "
                f"cluster_col instead of {cluster_col!r}"
            )
        assigned = (
            df
            if cluster_col == "cluster"
            else df.withColumnRenamed(cluster_col, "cluster")
        )
    # output types follow the INPUT schema: hardcoding (long, int) would
    # silently wrap hash-derived cluster ids >= 2^31 in the int32 cast
    # and crash on non-long id columns (string doc hashes sort/compare
    # fine — the min-id rule only needs an ordering)
    schema = T.StructType(
        [
            T.StructField(id_col, assigned.schema[id_col].dataType),
            T.StructField("cluster", assigned.schema["cluster"].dataType),
            T.StructField("keep", T.BooleanType()),
        ]
    )
    thr = float(threshold)
    cap = max_cluster_size

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        if n >= 2 and (cap is None or n <= cap):
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.maximum(
                np.linalg.norm(M, axis=1, keepdims=True), 1e-12
            )
            bs = min(_BLOCK_ROWS, n)
            buf = np.empty((bs, n), dtype=np.float64)
            ids_arr = pdf[id_col].to_numpy()
            for s in range(0, n, bs):
                e = min(s + bs, n)
                blk = buf[: e - s]
                np.matmul(Mn[s:e], Mn.T, out=blk)
                # row g is a dup iff ANY row with a STRICTLY SMALLER id
                # reaches the threshold — compare ids, not positions,
                # so a duplicated id keeps both copies exactly like the
                # mirror's `y.id < x.id` EXISTS. Cosines are rounded to
                # 9 dp before the compare (the SQL rounds identically):
                # numpy's GEMM and DuckDB's sequential fold differ by
                # ULPs, and an unrounded threshold could flip at the
                # edge.
                mask = ids_arr[None, :] < ids_arr[s:e, None]
                keep[s:e] &= ~((np.round(blk, 9) >= thr) & mask).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],  # pass through, Arrow enforces schema
                "cluster": pdf["cluster"],
                "keep": keep,
            }
        )

    return (
        assigned.select("cluster", id_col, vec_col)
        .groupBy("cluster")
        .applyInPandas(per_cluster, schema=schema)
    )


def semantic_dedup_sql(
    src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.95,
) -> str:
    """DuckDB mirror of the seeded-Voronoi :func:`semantic_dedup` —
    full SELECT returning (id_col, cluster, keep). Strictly recomputes
    the same seeds (md5 order), the same argmax-with-min-index
    tie-break, and the same keep rule via a correlated all-pairs
    EXISTS (fine at oracle scale; the Spark side is the bounded
    kernel)."""
    thr = float(threshold)
    return f"""
WITH __sd_seeds AS (
    SELECT {vec_col} AS semb,
           row_number() OVER (
               ORDER BY md5({id_col}::VARCHAR), {id_col}) - 1 AS cluster
    FROM {src}
    QUALIFY row_number() OVER (
        ORDER BY md5({id_col}::VARCHAR), {id_col}) <= {n_clusters}),
__sd_assign AS (
    SELECT a.{id_col}, a.{vec_col}, s.cluster,
           row_number() OVER (
               PARTITION BY a.{id_col}
               ORDER BY round(list_cosine_similarity(
                   a.{vec_col}::DOUBLE[], s.semb::DOUBLE[]), 9) DESC,
               s.cluster) AS rn
    FROM {src} a CROSS JOIN __sd_seeds s),
__sd AS (
    SELECT {id_col}, {vec_col}, cluster
    FROM __sd_assign WHERE rn = 1)
SELECT x.{id_col}, x.cluster::INT AS cluster,
       NOT EXISTS (
           SELECT 1 FROM __sd y
           WHERE y.cluster = x.cluster AND y.{id_col} < x.{id_col}
             AND round(list_cosine_similarity(
                     x.{vec_col}::DOUBLE[], y.{vec_col}::DOUBLE[]), 9)
                 >= {thr}
       ) AS keep
FROM __sd x
"""


def _jl_sign(seed: int, d: int, j: int) -> int:
    """±1 from md5(f"{seed}:{d}:{j}") parity — engine-independent
    because it is evaluated in the plan builder, not the engines."""
    h = hashlib.md5(f"{seed}:{d}:{j}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    in_dim: int | None = None,
    out_dim: int = 16,
    seed: int = 42,
    prefix: str = "proj_",
    rounding: int | None = 6,
) -> DataFrame:
    """Append ``out_dim`` columns ``prefix{d}`` = (Σ_j ±x_j)/sqrt(out_dim)
    with md5-derived signs (see module docstring). Pure codegen
    projection; zero shuffles. ``in_dim`` defaults to a driver peek of
    one row. Sums associate left-to-right in input-index order —
    bit-identical to the generated SQL mirror before rounding."""
    if in_dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("n")).first()
        if row is None:
            raise ValueError("random_projection: empty input, pass in_dim")
        n = row["n"]
        # size(NULL) is NULL under ANSI (-1 legacy); an empty array is 0
        # — either way the peek learned nothing, so fail with the cure
        # instead of building a degenerate 0-term projection
        if n is None or int(n) <= 0:
            raise ValueError(
                "random_projection: first row's vector is NULL/empty — "
                "pass in_dim explicitly"
            )
        in_dim = int(n)
    inv = 1.0 / math.sqrt(out_dim)
    out = df
    for d in range(out_dim):
        acc = None
        for j in range(1, in_dim + 1):
            # F.get, not element_at: ANSI mode makes element_at THROW on
            # an out-of-bounds index, so one short vector would abort the
            # whole job; get yields NULL -> proj NULL for that row, which
            # matches the DuckDB mirror's embedding[j] semantics
            term = F.get(F.col(vec_col), j - 1).cast("double")
            if _jl_sign(seed, d, j) < 0:
                term = -term
            acc = term if acc is None else acc + term
        col = acc * F.lit(inv)
        if rounding is not None:
            col = F.round(col, rounding)
        out = out.withColumn(f"{prefix}{d}", col)
    return out


def random_projection_sql(
    src: str,
    select_cols: list[str],
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 42,
    prefix: str = "proj_",
    rounding: int = 6,
) -> str:
    """DuckDB mirror of :func:`random_projection`: the same md5 sign
    matrix, the same left-to-right association order."""
    inv = 1.0 / math.sqrt(out_dim)
    cols = []
    for d in range(out_dim):
        expr = None
        for j in range(1, in_dim + 1):
            t = f"{vec_col}[{j}]::DOUBLE"
            t = f"-{t}" if _jl_sign(seed, d, j) < 0 else t
            expr = t if expr is None else f"{expr} + {t}"
        cols.append(
            f"round(({expr}) * {inv!r}, {rounding}) AS {prefix}{d}"
        )
    sel = ", ".join(select_cols + cols)
    return f"SELECT {sel} FROM {src}"
