"""Deduplication for web-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
join), SimHash, and n-gram Jaccard. All built from JVM hash functions
(xxhash64 / crc32 / md5) and array higher-order functions — no Python in
the hot path, so a 10^12-doc dedup is a scan + one shuffle per stage.

At scale: MinHash-LSH candidate generation shuffles on (band_id,
band_hash) buckets — bucket sizes are bounded by near-dup cluster size,
and AQE skew-join splitting handles pathological clusters (boilerplate
pages). The pairwise verify join is restricted to within-bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import WS_CLASS

from featurewiz_spark.cache import scoped_persist


def _spread(df: DataFrame, partitions: int | None) -> DataFrame:
    """Round-robin repartition for compute-bound text ops. Local parquet
    test files are single-row-group (1 scan task); the hash/regex work
    would run serially without this. On a cluster with properly-sized
    input splits pass partitions=0 to skip the extra shuffle."""
    if partitions == 0:
        return df
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    normalize: bool = True, partitions: int | None = None,
) -> DataFrame:
    """Exact dedup: group by (normalized) content hash, keep min-id doc.
    Returns (keeper_id, n_dups, content_hash) per distinct content."""
    df = _spread(df, partitions)
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(t, WS_CLASS, " "))
    return (
        df.withColumn("__h", F.md5(t))
        .groupBy(F.col("__h").alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _shingles(text_col: str, k: int = 3):
    """Word k-shingles as an array column (distinct)."""
    toks = F.split(F.lower(F.col(text_col)), WS_CLASS)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.array_distinct(sh)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 32, shingle_k: int = 3, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """MinHash signature per doc: for hash i, min over shingles of
    xxhash64(shingle, seed+i). Declarative: transform + array_min per
    hash function — stays in codegen, one pass over the text.

    Hash basis: each TOKEN is hashed once, and a shingle's base hash is
    xxhash64 over its k token hashes — never a concatenated shingle
    string (building w×k-char strings per doc dominated the signature
    stage; composing 8-byte token hashes measured ~2× faster at sf0.1).
    This is a different (equally uniform) hash family than hashing
    shingle strings: signature VALUES differ, MinHash/LSH semantics and
    every verified-output query (q31) do not — the exact-verify stage
    (jaccard_pairs) still measures the true string shingle sets. No
    array_distinct either: min over a multiset equals min over its set.
    The k minhash functions derive from the base hash by re-hashing
    with per-function seeds (cheap; avoids k passes over the text)."""
    df = _spread(df, partitions)
    toks = F.split(F.lower(F.col(text_col)), WS_CLASS)
    # separate projection: the token-hash array is evaluated ONCE per
    # row; referencing the transform expression inline inside the
    # shingle lambda would re-hash every token per shingle (O(w²·k))
    hashed = df.select(
        F.col(id_col),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("__th"),
    )
    # The per-hash/per-shingle expression loops are built as ONE parsed
    # SQL string each, not nested Column lambdas: every DSL Column op is
    # a py4j round-trip, and the k-hash loop alone was ~200 of them —
    # measured ~0.2s of driver-side PLAN CONSTRUCTION per call (paid per
    # bench rep, before any job runs). F.expr hands Catalyst one string
    # to parse JVM-side; the parsed expressions are identical.
    # get(), NOT element_at: a doc with < shingle_k tokens reads past
    # the array, and element_at THROWS under Spark 4's default ANSI
    # mode (one short doc would abort the whole corpus job). get()
    # returns NULL out of bounds and xxhash64 skips null inputs, so
    # short docs hash their real tokens.
    gets = ", ".join(f"get(__th, i + {j})" for j in range(shingle_k))
    base = hashed.select(
        F.col(id_col),
        F.expr(
            f"transform(sequence(0, greatest(size(__th) - {shingle_k}, 0)), "
            f"i -> xxhash64({gets}))"
        ).alias("__bh"),
    )
    sigs = F.expr(
        "array("
        + ", ".join(
            f"array_min(transform(__bh, h -> xxhash64(h, {seed + i})))"
            for i in range(num_hashes)
        )
        + ")"
    )
    return base.select(F.col(id_col), sigs.alias("minhash"))


def minhash_lsh_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 8, rows_per_band: int = 4,
    jaccard_threshold: float = 0.5, max_bucket_size: int = 500,
) -> DataFrame:
    """LSH banding: split each signature into `bands` bands of
    `rows_per_band` hashes; docs sharing any band bucket are candidates;
    candidates verified by estimated Jaccard = fraction of equal minhash
    components. Returns (a, b, jaccard_est) with a < b.

    Plan: explode bands (narrow) → shuffle on (band, band_hash) →
    within-bucket self-join → dedup pairs → verify (no second scan of
    the text; signatures carry everything).

    max_bucket_size guards the self-join against degenerate buckets
    (boilerplate corpora make band hashes collide for huge doc sets →
    O(bucket²) pair blowup). Buckets above the cap are DROPPED — at web
    scale such buckets are boilerplate clusters that exact-dedup or a
    dedicated pass should handle; this is an explicit coverage cap, not
    silent truncation."""
    n = bands * rows_per_band
    # persist: the self-join consumes the signatures twice; recomputing
    # the text → shingle → hash pipeline on both sides doubles the most
    # expensive stage. Signatures are small (id + k longs). Registered
    # with cache.py — callers release via release_caches()/cache_scope()
    # after materializing (lazy results make an in-function unpersist
    # impossible; see the module docstring of featurewiz_spark.cache).
    # lazy persist is SAFE here (unlike the pair/token caches below):
    # since the r6 single-exchange restructure, the first consumer —
    # the bucket-cap aggregate's exchange — scans sigs alone and
    # populates the cache before the semi-join stage re-reads it;
    # there are no parallel sibling scans left to race. (Pre-r6 the
    # left and right self-join exchanges raced it, computing the
    # signature pipeline 3x per action.)
    sigs = scoped_persist(sigs)
    # ONE parsed SQL string for the band-hash array (see the matching
    # note in minhash_signatures: the bands × rows_per_band Column loop
    # was pure py4j construction latency; the parsed expressions are
    # identical — minhash[i] is getItem, concat_ws casts the longs the
    # same way).
    band_arr = ", ".join(
        "xxhash64(concat_ws(',', "
        + ", ".join(
            f"minhash[{b * rows_per_band + r}]" for r in range(rows_per_band)
        )
        + "))"
        for b in range(bands)
    )
    banded = sigs.select(
        id_col,
        "minhash",
        F.expr(f"posexplode(array({band_arr}))").alias("band", "band_hash"),
    )
    del n
    # Bucket-size guard via hash aggregate + co-partitioned semi-join,
    # NOT count().over(partitionBy(band, band_hash)): a window would
    # buffer the whole hot bucket in ONE WindowExec task before the
    # filter could drop it — the exact boilerplate blowup the cap
    # exists to prevent. The aggregate collapses hot buckets map-side
    # (partial counts), and the join back reuses the same (band,
    # band_hash) hash partitioning, so no extra exchange appears; the
    # join streams rather than buffering per-key.
    keep = (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") <= max_bucket_size)
        .select("band", "band_hash")
    )
    banded = banded.join(keep, ["band", "band_hash"], "left_semi")
    # One exchange for the self-join, not two: hash-partition the kept
    # band rows ONCE and persist that layout — both join sides then
    # scan the same InMemoryRelation whose outputPartitioning already
    # satisfies the join's distribution, so neither side re-exchanges
    # (the old plan shuffled `banded` separately for the left and the
    # right side: 3 exchanges of band rows per run counting the
    # keep-aggregate, now 2). Skew safety is unchanged: over-cap
    # buckets are dropped by the semi-join BEFORE this exchange, so a
    # boilerplate mega-bucket never ships.
    # lazy persist is race-free here: the self-join consumes both
    # sides of this cache inside the SAME stage (no exchange between
    # the IMT scans and the join), so within each task the first
    # iterator materializes the partition and the second reads it —
    # there are no sibling stage futures to race (contrast the pair
    # and token caches in jaccard_pairs, which stay eager).
    banded = scoped_persist(banded.repartition("band", "band_hash"))
    left = banded.select(
        F.col(id_col).alias("a"), F.col("minhash").alias("mh_a"), "band", "band_hash"
    )
    right = banded.select(
        F.col(id_col).alias("b"), F.col("minhash").alias("mh_b"), "band", "band_hash"
    )
    est = F.expr(
        "size(filter(zip_with(mh_a, mh_b, (x, y) -> cast((x = y) as int)), "
        "v -> v = 1)) / size(mh_a)"
    )
    # jaccard_est is computed BEFORE the (a, b) dedup and the signature
    # arrays are dropped at the join output: carrying mh_a/mh_b through
    # dropDuplicates forces first(array) aggregate buffers, which cannot
    # use HashAggregate — the plan fell back to Sort + SortAggregate on
    # the pair exchange. A pair found in several bands computes est once
    # per band (≤ `bands` extra zip_with over k longs, trivially cheap);
    # the value is identical in every copy, so first() under
    # HashAggregate returns the same number the old plan did.
    cand = (
        left.join(right, on=["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", est.alias("jaccard_est"))
        .dropDuplicates(["a", "b"])
    )
    return cand.filter(F.col("jaccard_est") >= jaccard_threshold)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64,
    partitions: int | None = None, hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprint: per token, hash → for each bit position
    sum ±1; sign vector → fingerprint. Near-dups differ in few bits
    (hamming distance). Declarative aggregate over exploded tokens.

    hash_family: "xxhash64" (default, fastest — one JVM hash op) or
    "md5_60" (first 15 hex digits of md5 as a 60-bit int). md5_60 is
    engine-portable: DuckDB/Trino/Postgres can recompute the identical
    fingerprint, which is what the driver's SQL oracle does. Both are
    deterministic and cluster-size-independent.

    Plan: explode tokens → per-(doc, bit) contributions are computed as
    one aggregate of 64 sum expressions — single shuffle on doc id.
    """
    if hash_family == "md5_60" and bits > 60:
        raise ValueError("md5_60 provides 60 bits; use bits <= 60")
    df = _spread(df, partitions)
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), WS_CLASS))
    h = (
        F.xxhash64("tok")
        if hash_family == "xxhash64"
        else F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    )
    tok = df.select(id_col, F.explode(toks).alias("tok")).withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select(id_col, fp.alias("simhash"))


def hamming_distance(a, b):
    """Popcount of XOR via bit_count (Spark 3.3+)."""
    return F.bit_count(a.bitwiseXOR(b))


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    out_col: str = "jaccard", shingle_k: int | None = None,
    restrict_to_pairs: bool = True,
) -> DataFrame:
    """Exact n-gram (word) Jaccard for given candidate pairs (a, b):
    |set_a ∩ set_b| / |set_a ∪ set_b| over distinct tokens, or over
    word k-shingles when `shingle_k` is set (the exact-verify step of a
    MinHash-LSH pipeline measures the SAME shingle sets the signatures
    were built from). Two broadcast-able joins pull the arrays onto the
    pair rows — cost scales with candidate count, not corpus².

    restrict_to_pairs (default): semi-join the corpus to the ids that
    actually appear in `pairs` BEFORE computing token/shingle arrays —
    the candidate set out of an LSH stage is orders of magnitude
    smaller than the corpus, so tokenizing every document just to
    join 0.01% of them is wasted scan work at 100TB."""
    sets = (
        _shingles(text_col, shingle_k)
        if shingle_k is not None
        else F.array_distinct(F.split(F.lower(F.col(text_col)), WS_CLASS))
    )
    src = df
    if restrict_to_pairs:
        # persist: `pairs` is consumed three times (id-union + both
        # sides of the verify join); without it the upstream candidate
        # pipeline (e.g. the whole LSH explode/shuffle/self-join DAG)
        # re-executes per consumer — measured 3.8x on the q31 bench.
        # Registered for release_caches() (see featurewiz_spark.cache).
        # eager: the id-union below scans pairs through TWO sibling
        # branches inside one action. A lazy persist measured ~0.05s
        # faster locally (block locks serialize duplicate partition
        # computation within one BlockManager), but on a multi-executor
        # cluster cache blocks are executor-local and the two branch
        # tasks for the same partition can land on different executors
        # — each re-running the post-shuffle tail of the candidate DAG.
        # The house rule (scoped_persist docstring: eager iff 2+
        # sibling consumers in one action) stands; the local job-wave
        # saving does not justify cluster-mode duplicate work.
        pairs = scoped_persist(pairs, eager=True)
        # no .distinct() on the id union: a left-semi join needs no
        # unique build keys (the broadcast hash build collapses
        # duplicates itself), and each id appears in only a handful of
        # pairs — the distinct cost a full exchange + two HashAggregates
        # per run for at most a ~2x smaller build side.
        wanted = pairs.select(F.col("a").alias(id_col)).unionByName(
            pairs.select(F.col("b").alias(id_col))
        )
        src = df.join(wanted, on=id_col, how="leftsemi")
    toks = src.select(F.col(id_col), sets.alias("__t"))
    if restrict_to_pairs:
        # both verify joins consume `toks`; as concurrent broadcast-
        # build futures they each re-ran the corpus scan + semi-join +
        # shingle projection (two identical ~0.7s jobs in the q31 stage
        # metrics). Eager persist computes it once; the builds then
        # read InMemoryTableScan. Size-bounded: candidate ids only.
        toks = scoped_persist(toks, eager=True)
    j = (
        pairs.join(toks.withColumnRenamed("__t", "__ta"), pairs["a"] == toks[id_col])
        .drop(id_col)
        .join(
            toks.withColumnRenamed("__t", "__tb"), pairs["b"] == toks[id_col]
        )
        .drop(id_col)
    )
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    union = F.size(F.array_union(F.col("__ta"), F.col("__tb")))
    return j.withColumn(out_col, inter / union).drop("__ta", "__tb")
