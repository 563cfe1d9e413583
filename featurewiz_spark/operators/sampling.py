"""Row sampling / splitting (SURVEY.md §2.2 P9/P10, §2.1 S4).

The reference splits with sklearn train_test_split (random/stratified)
or sequential head-slices for time series (split_data_n_ways,
featurewiz/featurewiz.py:2362-2454; stratified sampler :2842-2870;
nrows load sampling :267-276). Spark-first: randomSplit for random,
sampleBy for stratified, percent_rank over the time column for
sequential — none of them collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import h60, h60_sql


def split_n_ways(
    df: DataFrame,
    weights: list[float],
    how: str = "random",
    seed: int = 42,
    stratify_col: str | None = None,
    time_col: str | None = None,
) -> list[DataFrame]:
    """P9 split_data_n_ways (reference featurewiz/featurewiz.py:2362-2454):
    2/3/4/6-way split.

    how='random'     → randomSplit(weights, seed)
    how='sequential' → time-ordered contiguous slices via percent_rank
                       over time_col (regression/time-series mode)
    how='stratified' → per-class randomSplit preserved by a seeded hash
                       on (stratify_col, row) — every class keeps ~the
                       same proportions in each slice.
    """
    total = sum(weights)
    bounds = []
    acc = 0.0
    for w in weights:
        acc += w / total
        bounds.append(acc)
    # float accumulation can end at 0.99999...8 while percent_rank of
    # the last row is exactly 1.0 — that row would fall outside EVERY
    # slice. The final bound is 1.0 by definition; pin it.
    bounds[-1] = 1.0
    if how == "random":
        return df.randomSplit(list(weights), seed=seed)
    if how in ("sequential", "stratified") and "__pr" in df.columns:
        raise ValueError("split_n_ways: column '__pr' is used internally")
    if how == "sequential":
        if not time_col:
            raise ValueError("sequential split needs time_col")
        w = Window.orderBy(F.col(time_col))
        ranked = df.withColumn("__pr", F.percent_rank().over(w))
        out = []
        lo = -0.1
        for hi in bounds:
            out.append(ranked.filter((F.col("__pr") > lo) & (F.col("__pr") <= hi)).drop("__pr"))
            lo = hi
        return out
    if how == "stratified":
        if not stratify_col:
            raise ValueError("stratified split needs stratify_col")
        # uniform-in-[0,1) seeded hash per row, ranked WITHIN each class:
        # percent_rank inside the class makes the proportions exact per
        # class (sklearn's stratified behavior), not just in expectation
        w = Window.partitionBy(stratify_col).orderBy(
            F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
        )
        ranked = df.withColumn("__pr", F.percent_rank().over(w))
        out = []
        lo = -0.1
        for hi in bounds:
            out.append(ranked.filter((F.col("__pr") > lo) & (F.col("__pr") <= hi)).drop("__pr"))
            lo = hi
        return out
    raise ValueError(how)


def stratified_sample(
    df: DataFrame, strata_col: str, n_rows: int, seed: int = 42,
    min_class_rows: int = 3, method: str = "bernoulli",
    hash_col: str | None = None,
) -> DataFrame:
    """P10 EDA_randomly_select_rows_from_dataframe (reference
    featurewiz/featurewiz.py:2842-2870): drop classes with ≤ min_class_rows
    rows, then sample each remaining class at the global fraction
    n_rows/N.

    method="bernoulli" (reference parity): `sampleBy` — one pass, no
    data collect, but Spark's per-row RNG folds in the partition index,
    so the SELECTED SET (not just its size) changes with partitioning.
    method="hash" (scale/reproducibility path): per stratum take the
    floor(frac·n_k) rows with the smallest md5(hash_col) — fully
    deterministic across runs, partitionings, and cluster sizes, and
    re-derivable by any SQL engine (driver oracle q53). Requires
    `hash_col` (a unique row id)."""
    # sentinel-filled strata key: isin()/sampleBy() never match a NULL
    # stratum, which silently dropped the whole NULL class even when it
    # passed the min_class_rows gate. The string-cast sentinel keeps the
    # NULL class a first-class stratum for both methods (identical
    # partitions for non-null values, so the hash-mode selected set is
    # unchanged on null-free data — q53 parity).
    clash = {"__strata", "__rn", "__n"} & set(df.columns)
    if clash:
        raise ValueError(
            f"stratified_sample: column(s) {sorted(clash)} are used "
            "internally — rename them"
        )
    skey = F.coalesce(F.col(strata_col).cast("string"), F.lit("__fw_null__"))
    kdf = df.withColumn("__strata", skey)
    counts = {r[0]: r[1] for r in kdf.groupBy("__strata").count().collect()}
    keep = {k: v for k, v in counts.items() if v > min_class_rows}
    total = sum(keep.values())
    if total <= n_rows:
        return kdf.filter(F.col("__strata").isin(list(keep))).drop("__strata")
    frac = n_rows / total
    kept = kdf.filter(F.col("__strata").isin(list(keep)))
    if method == "bernoulli":
        fractions = {k: min(1.0, frac) for k in keep}
        return kept.sampleBy("__strata", fractions=fractions, seed=seed).drop(
            "__strata"
        )
    if method != "hash":
        raise ValueError(method)
    if hash_col is None:
        raise ValueError("method='hash' requires hash_col (a unique row id)")
    from pyspark.sql import Window

    h = h60(F.col(hash_col).cast("string"))
    w = Window.partitionBy("__strata").orderBy(h, F.col(hash_col))
    cnt_w = Window.partitionBy("__strata")
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt_w))
        .filter(F.col("__rn") <= F.floor(F.lit(frac) * F.col("__n")))
        .drop("__rn", "__n", "__strata")
    )


def head_sample(df: DataFrame, n_rows: int) -> DataFrame:
    """S4 regression-mode load sampling: first-N rows (reference
    featurewiz/featurewiz.py:267-270)."""
    return df.limit(n_rows)


def temperature_mixing_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    temperature: float = 0.5,
    target_frac: float = 0.5,
    rounding: int = 9,
) -> DataFrame:
    """Deterministic temperature-scaled stratum rebalancing — the
    CCNet/LLaMA multilingual mixing rule: target probability of stratum
    s is p_s ∝ n_s^T (T<1 upweights rare strata), and each row keeps
    with rate r_s = min(1, target_frac·N·p_s / n_s) decided by a
    portable md5-hash coin, so the SAME rows are chosen on every run,
    every partitioning, and every engine (no RNG, no shuffle, no
    collect of data rows — only the tiny per-stratum count table hits
    the driver).

    Appends ``mix_rate`` (the stratum's keep rate, rounded — the
    rounding is the cross-engine contract: libm pow may differ by an
    ulp between engines, the rounded rate cannot) and ``mix_keep``
    (hash_frac < mix_rate). NULL strata get NULL rate/keep. Filter on
    ``mix_keep`` to materialize the mix.

    T=0.5 uses math.sqrt (correctly rounded IEEE, bit-identical in any
    engine); other T use pow. The generated SQL mirror
    (:func:`temperature_mixing_sql`) recomputes counts and rates with
    an ORDER-pinned sum so the normalizer associates in the same
    stratum order as this driver-side loop.
    """
    import math

    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["s"] is not None
    }
    if not counts:
        raise ValueError("temperature_mixing_sample: no non-null strata")
    tot = sum(counts.values())
    powed = {
        s: math.sqrt(c) if temperature == 0.5 else math.pow(c, temperature)
        for s, c in counts.items()
    }
    z = 0.0
    for s in sorted(powed):  # pinned association order (mirror matches)
        z += powed[s]
    # HALF-AWAY rounding to match DuckDB's round() — Python's round()
    # is banker's half-even, and an exact-tie rate (power-of-two counts)
    # would round differently per engine, flipping every id whose hash
    # coin lands in the gap. floor(x*p + 0.5)/p reproduces DuckDB's
    # algorithm including the same double-scaling imprecision.
    def _round_away(x: float) -> float:
        p = 10.0 ** rounding
        return math.floor(x * p + 0.5) / p

    rates = {
        s: _round_away(min(1.0, target_frac * tot * (powed[s] / z) / counts[s]))
        for s in counts
    }
    mapping = F.create_map(
        *[x for s in sorted(rates) for x in (F.lit(s), F.lit(rates[s]))]
    )
    hash_frac = h60(F.col(id_col).cast("string")) / F.lit(float(1 << 60))
    return df.withColumn("mix_rate", mapping[F.col(strata_col)]).withColumn(
        "mix_keep",
        F.when(F.col("mix_rate").isNotNull(), hash_frac < F.col("mix_rate")),
    )


def temperature_mixing_sql(
    src: str,
    strata_col: str,
    id_col: str,
    temperature: float = 0.5,
    target_frac: float = 0.5,
    rounding: int = 9,
    select_cols: str = "d.*",
) -> str:
    """DuckDB mirror of :func:`temperature_mixing_sample` — recomputes
    the count table, the temperature weights (sqrt for T=0.5 — the
    correctly-rounded case — else pow), an ORDER BY-pinned normalizer
    sum matching the driver loop's sorted-stratum association, and the
    same rounded rate + md5-coin decision.

    select_cols defaults to ``d.*`` (the data table's columns only) —
    a bare ``*`` would expand over the LEFT JOIN to also pull the rate
    table's ``s`` and ``mix_rate``, duplicating ``mix_rate`` in the
    output shape."""
    pw = (
        f"sqrt(n)" if temperature == 0.5 else f"pow(n, {temperature!r})"
    )
    hash_frac = f"(({h60_sql(f'{id_col}::VARCHAR')}) / {float(1 << 60)!r})"
    return f"""
WITH __tm_counts AS (
    SELECT {strata_col} AS s, count(*) AS n
    FROM {src} WHERE {strata_col} IS NOT NULL GROUP BY 1),
__tm_tot AS (SELECT sum(n) AS tot FROM __tm_counts),
__tm_z AS (SELECT sum({pw} ORDER BY s) AS z FROM __tm_counts),
__tm_rates AS (
    SELECT s,
           round(least(1.0,
               {target_frac!r} * (SELECT tot FROM __tm_tot)
               * ({pw} / (SELECT z FROM __tm_z)) / n), {rounding}) AS mix_rate
    FROM __tm_counts)
SELECT {select_cols}, r.mix_rate,
       CASE WHEN r.mix_rate IS NULL THEN NULL
            ELSE {hash_frac} < r.mix_rate END AS mix_keep
FROM {src} d LEFT JOIN __tm_rates r ON d.{strata_col} = r.s
"""


def cap_per_key(
    df: DataFrame,
    keys: list[str],
    n: int,
    order_col: str,
    tie_col: str | None = None,
    ascending: bool = True,
    keep_rank: bool = False,
) -> DataFrame:
    """Per-key quota cap — the Gopher/C4-style anti-spam step that
    bounds any one domain/source's contribution to the corpus: keep at
    most ``n`` rows per key, chosen by ``order_col`` (ties broken by
    ``tie_col`` for determinism; pass one whenever order_col can
    repeat). row_number over a per-key window — a key's rows sort
    within one partition, so the window is bounded by the hottest key,
    which is exactly the quantity this operator exists to bound
    downstream; for pathological pre-cap skew, salt-prefilter with an
    approximate per-key count first.

    Reference scope: beyond the reference (its nearest analog is the
    nth-largest cap, featurewiz.py:2023-2102, which caps VALUES not
    row quotas).
    """
    from pyspark.sql import Window

    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc()
    ]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= n
    )
    return out.withColumnRenamed("__rn", "cap_rank") if keep_rank else out.drop(
        "__rn"
    )


def cap_per_key_sql(
    src: str,
    keys: list[str],
    n: int,
    order_col: str,
    tie_col: str | None = None,
    ascending: bool = True,
    select_cols: str = "* EXCLUDE (__rn)",
) -> str:
    """DuckDB mirror: the same row_number window and tie-break; the
    default select drops the rank column like the Spark side."""
    direction = "ASC" if ascending else "DESC"
    order = f"{order_col} {direction}"
    if tie_col is not None:
        order += f", {tie_col} ASC"
    keylist = ", ".join(keys)
    return f"""
        SELECT {select_cols} FROM (
            SELECT *, row_number() OVER
                (PARTITION BY {keylist} ORDER BY {order}) AS __rn
            FROM {src}
        ) WHERE __rn <= {n}
    """
