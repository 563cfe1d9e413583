"""Binning / discretization / outlier capping (SURVEY.md §2.9).

Fit = one quantile/aggregate pass (exact `percentile` at test scale,
`percentile_approx` at 100TB); apply = pure `when`/`Bucketizer`
expressions replayable on test with train-fitted edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bin(
    df: DataFrame, col: str, bins: int = 4, exact: bool = True,
    out_col: str | None = None,
) -> tuple[DataFrame, list[float]]:
    """B2 quantile binning (EDA_binning_numeric_column_displaying_bins,
    reference featurewiz/featurewiz.py:2659-2693: qcut edges on train,
    cut on test). Returns (df, edges) — edges are the fitted state."""
    out_col = out_col or f"{col}_bin"
    qs = [i / bins for i in range(1, bins)]
    if exact:
        edges = df.agg(
            F.expr(f"percentile(`{col}`, array({','.join(map(str, qs))}))")
        ).first()[0]
    else:
        edges = df.approxQuantile(col, qs, 0.001)
    return apply_bin_edges(df, col, list(edges), out_col), list(edges)


def apply_bin_edges(
    df: DataFrame, col: str, edges: list[float], out_col: str | None = None
) -> DataFrame:
    """Replay fitted edges (train→test contract): bin i ⇔
    value ≤ edges[i], last bin open-ended — matches pd.cut with
    right-closed intervals."""
    out_col = out_col or f"{col}_bin"
    e = F.lit(len(edges))
    for i in reversed(range(len(edges))):
        e = F.when(F.col(col) <= F.lit(edges[i]), F.lit(i)).otherwise(e)
    return df.withColumn(out_col, F.when(F.col(col).isNull(), None).otherwise(e))


def iqr_cap(
    df: DataFrame, col: str, k: float = 1.5, cap_low: bool = True
) -> tuple[DataFrame, dict]:
    """B4 IQR outlier capping (FE_capping_outliers_beyond_IQR_Range,
    reference featurewiz/featurewiz.py:2023-2102): values beyond
    Q3 + k·IQR (and below Q1 − k·IQR) are clamped to the fence."""
    q1, q3 = df.agg(
        F.expr(f"percentile(`{col}`, 0.25)"), F.expr(f"percentile(`{col}`, 0.75)")
    ).first()
    iqr = q3 - q1
    hi, lo = q3 + k * iqr, q1 - k * iqr
    e = F.when(F.col(col) > hi, F.lit(hi))
    if cap_low:
        e = e.when(F.col(col) < lo, F.lit(lo))
    out = df.withColumn(col, e.otherwise(F.col(col)))
    return out, {"low": lo, "high": hi}


def nth_largest_cap(
    df: DataFrame, col: str, cap_at_nth_largest: int = 5
) -> tuple[DataFrame, dict]:
    """O3 faithful nth-largest capping (FE_capping_outliers_beyond_IQR_
    Range, reference featurewiz/featurewiz.py:2076-2085): rows holding
    the column MAXIMUM are replaced by the value at overall rank
    (num_max_rows + n) descending — i.e. the n-th largest value below
    the max (counting duplicates like pandas nlargest). No floor is put
    under minimums (reference docstring says so explicitly).

    Plan: one agg for (max, num_maxs) + one TakeOrderedAndProject
    (orderBy desc → limit num_maxs+n, top-k per partition then a
    driver-side merge of k values — never a full sort) + one scan to
    rewrite. Scales to any row count for modest n."""
    mx = df.agg(F.max(col).alias("mx")).first()["mx"]
    num_maxs = df.filter(F.col(col) == mx).count()
    topk = (
        df.select(col)
        .orderBy(F.desc(col))
        .limit(num_maxs + cap_at_nth_largest)
        .agg(F.min(col))
        .first()[0]
    )
    out = df.withColumn(
        col, F.when(F.col(col) == mx, F.lit(topk)).otherwise(F.col(col))
    )
    return out, {"max": mx, "num_maxs": num_maxs, "capped_value": topk}


def iqr_outlier_row_drop(
    df: DataFrame, cols: list[str], k: float = 1.5, min_outlier_cols: int = 4,
    percentile_mode: str = "exact",
) -> tuple[DataFrame, dict]:
    """B4 multi-column outlier ROW-DROP (reference featurewiz.py:
    2093-2102, drop=True): a row outside the Q1−k·IQR .. Q3+k·IQR fence
    in MORE than 3 columns (i.e. ≥ min_outlier_cols=4) is dropped.

    ONE percentile aggregate fits every fence; the drop is a pure
    filter expression (sum of per-column indicators) — scan-speed at
    any scale, no shuffle. percentile_mode="exact" (oracle parity;
    ObjectHashAggregate, no codegen) or "approx" (percentile_approx —
    the 100TB default, same q01-median tradeoff documented in
    BENCH/PLAN_AUDIT.md; fences move by at most the sketch error,
    which IQR-fence semantics tolerate by design)."""
    fn = "percentile" if percentile_mode == "exact" else "percentile_approx"
    aggs = []
    for c in cols:
        # backtick-quoted identifiers: raw interpolation breaks (or
        # silently mis-resolves) column names containing spaces/dots —
        # the same string-interpolation defect class fixed in
        # functions/strings.py (r1 bug #7)
        aggs += [
            F.expr(f"{fn}(`{c}`, 0.25)").alias(f"{c}__q1"),
            F.expr(f"{fn}(`{c}`, 0.75)").alias(f"{c}__q3"),
        ]
    st = df.agg(*aggs).first().asDict()
    fences = {}
    flags = []
    for c in cols:
        q1, q3 = st[f"{c}__q1"], st[f"{c}__q3"]
        iqr = q3 - q1
        lo, hi = q1 - k * iqr, q3 + k * iqr
        fences[c] = (lo, hi)
        # coalesce: a NULL value makes the comparison NULL, which would
        # make the SUMMED indicator NULL and the filter drop the row —
        # the reference's pandas comparisons treat NaN as False and KEEP
        # such rows (nulls are not outliers)
        flags.append(
            F.coalesce(
                ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))).cast("int"),
                F.lit(0),
            )
        )
    n_out = sum(flags[1:], flags[0]) if flags else F.lit(0)
    out = df.filter(n_out < F.lit(min_outlier_cols))
    return out, {"fences": fences, "min_outlier_cols": min_outlier_cols}


def mad_outlier_cap(
    df: DataFrame, col: str, thresh: float = 3.5
) -> tuple[DataFrame, dict]:
    """B5 MADD outlier cap (is_outlier / FE_find_and_cap_outliers,
    reference featurewiz/featurewiz.py:2211-2340): modified z-score
    0.6745·|x−med|/MAD > thresh → clamp to the threshold boundary."""
    med = df.agg(F.expr(f"percentile(`{col}`, 0.5)")).first()[0]
    mad = df.agg(
        F.expr(f"percentile(abs(`{col}` - {med!r}), 0.5)")
    ).first()[0]
    if not mad:
        return df, {"median": med, "mad": 0.0}
    hi = med + thresh * mad / 0.6745
    lo = med - thresh * mad / 0.6745
    out = df.withColumn(
        col,
        F.when(F.col(col) > hi, F.lit(hi))
        .when(F.col(col) < lo, F.lit(lo))
        .otherwise(F.col(col)),
    )
    return out, {"median": med, "mad": mad, "low": lo, "high": hi}


def uniform_bin(
    df: DataFrame, col: str, bins: int = 4, out_col: str | None = None
) -> tuple[DataFrame, list[float]]:
    """B1 KBinsDiscretizer strategy='uniform' (FE_discretize_numeric_
    variables, reference featurewiz/featurewiz.py:2481-2523): equal-width
    edges between min and max from one agg pass."""
    out_col = out_col or f"{col}_bin"
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / bins or 1.0
    edges = [lo + width * i for i in range(1, bins)]
    return apply_bin_edges(df, col, edges, out_col), edges


def kmeans_bin_edges(
    df: DataFrame, col: str, bins: int = 4, hist_bins: int = 1024,
    max_iter: int = 50,
) -> list[float]:
    """B1 KBinsDiscretizer strategy='kmeans' — 1-D k-means re-derived for
    scale: ONE groupBy pass compresses the column to a ≤hist_bins
    weighted histogram, then driver-side Lloyd iterations on the (value,
    weight) pairs (exact same optimum as row-level 1-D k-means up to
    histogram resolution, at any data size). Deterministic init =
    equal-spaced quantile centers. Returns bin edges (midpoints between
    sorted final centers), applied via apply_bin_edges."""
    import numpy as np

    lo, hi = df.agg(F.min(col), F.max(col)).first()
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        return []
    w = (hi - lo) / hist_bins
    hist = (
        # drop NULLs explicitly: they would surface as a b=None histogram
        # row and crash the driver-side midpoint arithmetic
        df.where(F.col(col).isNotNull())
        .select(
            F.least(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(w)), F.lit(hist_bins - 1)
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    vals = np.array([lo + (r["b"] + 0.5) * w for r in hist])
    wts = np.array([r["count"] for r in hist], dtype=np.float64)
    order = np.argsort(vals)
    vals, wts = vals[order], wts[order]
    # init: weighted quantile positions
    cum = np.cumsum(wts) / wts.sum()
    centers = np.array(
        [vals[np.searchsorted(cum, (i + 0.5) / bins)] for i in range(bins)]
    )
    for _ in range(max_iter):
        assign = np.argmin(np.abs(vals[:, None] - centers[None, :]), axis=1)
        new = np.array(
            [
                np.average(vals[assign == j], weights=wts[assign == j])
                if (assign == j).any()
                else centers[j]
                for j in range(bins)
            ]
        )
        if np.allclose(new, centers):
            break
        centers = new
    centers = np.sort(centers)
    return [float((centers[i] + centers[i + 1]) / 2) for i in range(bins - 1)]


def gmm_bin_params(
    df: DataFrame, col: str, bins: int = 4, hist_bins: int = 2048,
    max_iter: int = 200, tol: float = 1e-10,
) -> list[tuple[float, float, float]]:
    """B1 strategy='gaussian' (reference FE_discretize_numeric_variables,
    featurewiz/featurewiz.py:2507-2510: 1-D GaussianMixture fit_predict)
    re-derived for scale: the same ONE-pass weighted histogram as
    kmeans_bin_edges, then driver-side EM on (value, weight) pairs —
    identical optimum to row-level EM up to histogram resolution at any
    data size. Components are relabeled by ASCENDING MEAN (sklearn's
    component order is RNG-dependent; ours is deterministic). Returns
    [(weight, mean, std), ...]."""
    import numpy as np

    lo, hi = df.agg(F.min(col), F.max(col)).first()
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        return [(1.0, lo, 1.0)]
    w = (hi - lo) / hist_bins
    hist = (
        df.where(F.col(col).isNotNull())  # b=None row would crash below
        .select(
            F.least(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(w)), F.lit(hist_bins - 1)
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    vals = np.array([lo + (r["b"] + 0.5) * w for r in hist])
    wts = np.array([r["count"] for r in hist], dtype=np.float64)
    order = np.argsort(vals)
    vals, wts = vals[order], wts[order]
    n = wts.sum()
    # deterministic init: weighted-quantile means, global std, equal priors
    cum = np.cumsum(wts) / n
    mu = np.array([vals[np.searchsorted(cum, (i + 0.5) / bins)] for i in range(bins)])
    gvar = np.average((vals - np.average(vals, weights=wts)) ** 2, weights=wts)
    sig = np.full(bins, max(np.sqrt(gvar) / bins, 1e-6 * (hi - lo)))
    pi = np.full(bins, 1.0 / bins)
    floor = 1e-6 * (hi - lo)
    prev_ll = -np.inf
    for _ in range(max_iter):
        logp = (
            np.log(np.maximum(pi[None, :], 1e-300))
            - np.log(sig[None, :])
            - 0.5 * ((vals[:, None] - mu[None, :]) / sig[None, :]) ** 2
        )
        m = logp.max(axis=1, keepdims=True)
        p = np.exp(logp - m)
        tot = p.sum(axis=1, keepdims=True)
        resp = p / tot
        ll = float(np.sum(wts * (np.log(tot[:, 0]) + m[:, 0])))
        rw = resp * wts[:, None]
        nk = np.maximum(rw.sum(axis=0), 1e-12)
        pi = nk / n
        mu = (rw * vals[:, None]).sum(axis=0) / nk
        sig = np.sqrt(
            np.maximum((rw * (vals[:, None] - mu[None, :]) ** 2).sum(axis=0) / nk,
                       floor**2)
        )
        if abs(ll - prev_ll) < tol * (abs(prev_ll) + 1):
            break
        prev_ll = ll
    order = np.argsort(mu)
    return [(float(pi[j]), float(mu[j]), float(sig[j])) for j in order]


def apply_gmm_bins(
    df: DataFrame, col: str, params: list[tuple[float, float, float]],
    out_col: str,
) -> DataFrame:
    """Assign each row its argmax-posterior component — fully JVM-side:
    array_max over (log π_k − log σ_k − (x−μ_k)²/2σ_k², k) structs, the
    same declarative argmax idiom as the langid scorer. Null → null."""
    import math

    x = F.col(col).cast("double")
    scores = [
        F.struct(
            (
                F.lit(math.log(max(p, 1e-300)) - math.log(s))
                - (x - F.lit(m)) * (x - F.lit(m)) / F.lit(2 * s * s)
            ).alias("score"),
            F.lit(k).alias("k"),
        )
        for k, (p, m, s) in enumerate(params)
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col, F.when(x.isNotNull(), best["k"]).cast("int")
    )


def tree_bin_edges(
    df: DataFrame, col: str, target: str, max_depth: int = 2, sample_rows: int = 10000,
) -> list[float]:
    """B3 entropy/tree binning (Binning_Transformer, reference
    my_encoders.py:1136-1267, thresholds :1228-1232): fit a shallow
    decision tree on (x, y), use its split thresholds as edges.

    Pure-numpy exact greedy variance-reduction splits on a deterministic
    capped sample (the reference also fits sklearn on in-memory data).
    The sample is HASH-ordered (xxhash64 of the row values), not
    value-ordered: `.orderBy(col).limit(n)` would train on the n
    SMALLEST values — at any table larger than the cap the "sample" is
    the bottom of the distribution and the learned edges are garbage
    (r1 verdict bug #4). Hash order is uniform over the table and
    stable across partitioning/cluster size.
    """
    import numpy as np

    pdf = (
        df.select(col, target)
        .dropna()
        .withColumn("__h", F.xxhash64(F.col(col), F.col(target)))
        .orderBy("__h", col, target)
        .limit(sample_rows)
        .drop("__h")
        .toPandas()
    )
    x = pdf[col].to_numpy(dtype=float)
    y = pdf[target].to_numpy(dtype=float)

    edges: list[float] = []

    def split(xs, ys, depth):
        if depth >= max_depth or len(xs) < 8:
            return
        order = np.argsort(xs, kind="stable")
        xs, ys = xs[order], ys[order]
        csum = np.cumsum(ys)
        csq = np.cumsum(ys**2)
        n = len(ys)
        tot_sum, tot_sq = csum[-1], csq[-1]
        best, best_i = -1.0, -1
        for i in range(4, n - 4):
            if xs[i] == xs[i - 1]:
                continue
            ls, lq, ln = csum[i - 1], csq[i - 1], i
            rs, rq, rn = tot_sum - ls, tot_sq - lq, n - i
            sse = (lq - ls**2 / ln) + (rq - rs**2 / rn)
            gain = (tot_sq - tot_sum**2 / n) - sse
            if gain > best:
                best, best_i = gain, i
        if best_i < 0 or best <= 1e-12:
            return
        thr = (xs[best_i - 1] + xs[best_i]) / 2.0
        edges.append(float(thr))
        split(xs[:best_i], ys[:best_i], depth + 1)
        split(xs[best_i:], ys[best_i:], depth + 1)

    split(x, y, 0)
    return sorted(edges)
