"""Text extraction byte-identity + pages generator determinism +
minhash/simhash vs pure-python oracles."""

import numpy as np
import pytest

from featurewiz_spark.sources.pages import generate_pages
from featurewiz_spark.text.extract import extract_one, extract_text


def test_extractor_byte_identical_on_pages(spark):
    """North-rule per-row invariant: extracted text == ground-truth text,
    byte-for-byte, for every (url, warc_ts) — for BOTH the JVM regexp
    extractor (production path) and the pandas-UDF oracle."""
    from featurewiz_spark.text.extract import extract_text_udf

    pages = generate_pages(spark, 2000, seed=42)
    out = extract_text(pages, "html", "sql_text")
    out = extract_text_udf(out, "html", "py_text")
    assert out.filter("sql_text != text OR py_text != text").count() == 0


def test_extractor_malformed_utf8_no_abort(spark):
    """Real crawl payloads contain malformed UTF-8; Spark 4 ANSI
    decode() would abort the whole job on the first bad byte, so the
    JVM extractor uses the binary→string CAST (U+FFFD replacement —
    extract_one's errors='replace'). Both paths must survive, and stay
    byte-identical for every common malformed class. Known, documented
    deviation: CESU-8 surrogate triples (\\xed\\xa0\\x80) collapse to
    ONE U+FFFD in Java but THREE in Python — decoder granularity, both
    lenient."""
    from featurewiz_spark.text.extract import extract_one, extract_text

    samples = [
        b"\xff\xfe<html><p>x</p></html>",  # invalid lead bytes
        b"<html><title>t\xe2\x82</title><p>body</p></html>",  # truncated
        b"<p>a\xc3\x28b</p>",  # bad continuation
        b"<p>ok \xf0\x9f\x98\x80 emoji</p>",  # valid 4-byte passthrough
        b"\x80\x81\x82<div>tail</div>",  # orphan continuations
    ]
    df = spark.createDataFrame(
        [(bytearray(s),) for s in samples], "html binary"
    )
    out = [r["t"] for r in extract_text(df, "html", "t").collect()]
    for s, jvm in zip(samples, out):
        assert jvm == extract_one(s)
    # the documented CESU-8 divergence: same text modulo U+FFFD count
    sur = b"<p>\xed\xa0\x80 surrogate</p>"
    df2 = spark.createDataFrame([(bytearray(sur),)], "html binary")
    jvm = extract_text(df2, "html", "t").first()["t"]
    py = extract_one(sur)
    assert jvm.replace("�", "") == py.replace("�", "")


def test_extractor_drops_script_style_decodes_entities():
    html = (
        b"<html><head><title>T&amp;1</title><style>x{}</style></head>"
        b"<body><script>bad()</script><p>hello  world</p>"
        b"<div>a &lt;b&gt;</div></body></html>"
    )
    assert extract_one(html) == "T&1\nhello world\na <b>"


def test_pages_generator_deterministic(spark):
    a = generate_pages(spark, 500, seed=42).toPandas().sort_values(["url", "warc_ts"])
    b = generate_pages(spark, 500, seed=42).toPandas().sort_values(["url", "warc_ts"])
    assert (a["url"].to_numpy() == b["url"].to_numpy()).all()
    assert (a["text"].to_numpy() == b["text"].to_numpy()).all()


def test_pages_generator_skew(spark):
    pdf = generate_pages(spark, 5000, seed=42).toPandas()
    hot = pdf["url"].str.contains("hot.example.com").mean()
    assert 0.05 < hot < 0.15  # one hot domain ≈10% of rows


def test_minhash_matches_pure_python(spark):
    """MinHash signature must equal a pure-python xxhash-free oracle —
    we reuse Spark's own xxhash64 for tokens via a lookup table, and only
    verify the min-over-shingles + banding logic."""
    from featurewiz_spark.operators.dedup import minhash_signatures

    docs = [
        (0, "a b c d e"),
        (1, "a b c d e"),  # exact dup of 0
        (2, "a b c d x"),  # near dup
        (3, "p q r s t"),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = {
        r["doc_id"]: r["minhash"]
        for r in minhash_signatures(df, "text", "doc_id", num_hashes=16, shingle_k=2).collect()
    }
    assert sigs[0] == sigs[1]  # identical text → identical signature
    eq02 = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 16
    eq03 = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 16
    assert eq02 > eq03  # near-dup closer than unrelated
    assert eq03 == 0


def test_lsh_finds_near_dups(spark):
    from featurewiz_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    docs += [(i + 10, f"unrelated text number {i} with distinct words {i*7}") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, "text", "doc_id", num_hashes=16, shingle_k=2)
    pairs = minhash_lsh_pairs(sigs, "doc_id", bands=4, rows_per_band=4,
                              jaccard_threshold=0.9).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    # all 10 dup pairs among doc 0-4 found, no cross pairs with 10-14
    assert {(a, b) for a in range(5) for b in range(a + 1, 5)} <= found
    assert all(not (a < 10 <= b) for a, b in found)


def test_simhash_near_dup_distance(spark):
    from pyspark.sql import functions as F

    from featurewiz_spark.operators.dedup import simhash

    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),
        (2, "completely different words everywhere nothing shared"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}

    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((a ^ b) & mask).count("1")

    d01 = ham(fps[0], fps[1])
    d02 = ham(fps[0], fps[2])
    assert d01 < d02

    # exact parity with a pure-python simhash over the SAME token hashes
    toks = df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    hmap = {}
    for r in toks.collect():
        hmap.setdefault(r["doc_id"], []).append(r["h"] & mask)
    for d, hs in hmap.items():
        sums = [sum(1 if (h >> i) & 1 else -1 for h in hs) for i in range(64)]
        exp = sum(1 << i for i in range(64) if sums[i] > 0)
        assert (fps[d] & mask) == exp


def test_brute_force_topk_matches_numpy(spark):
    from featurewiz_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["nn_id"], r["cos_sim"])
        for r in brute_force_topk(df, k=1).collect()
    }
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(50):
        j = int(np.argmax(sims[i]))
        assert got[i][0] == j
        assert abs(got[i][1] - sims[i][j]) < 1e-9


def test_lsh_ann_recall(spark):
    from featurewiz_spark.operators.similarity import ann_topk_lsh, brute_force_topk

    rng = np.random.default_rng(5)
    # clustered data so LSH recall is meaningful
    centers = rng.normal(size=(5, 16)) * 5
    vecs = np.vstack([c + rng.normal(size=(20, 16)) * 0.1 for c in centers])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {r["vec_id"]: r["nn_id"] for r in brute_force_topk(df, k=1).collect()}
    approx = {r["vec_id"]: r["nn_id"] for r in ann_topk_lsh(df, k=1, n_planes=6).collect()}
    recall = sum(approx.get(i) == exact[i] for i in exact) / len(exact)
    assert recall > 0.7


def test_ivf_ann_recall(spark):
    from featurewiz_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(6)
    centers = rng.normal(size=(5, 16)) * 5
    vecs = np.vstack([c + rng.normal(size=(20, 16)) * 0.1 for c in centers])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {r["vec_id"]: r["nn_id"] for r in brute_force_topk(df, k=1).collect()}
    approx = {
        r["vec_id"]: r["nn_id"]
        for r in ivf_topk(df, k=1, n_cells=5, sample_rows=100).collect()
    }
    recall = sum(approx.get(i) == exact[i] for i in exact) / len(exact)
    # k-means cells align with the true clusters → near-perfect recall
    assert recall > 0.9


def test_cosine_near_dup_pairs_finds_planted_dup(spark):
    from featurewiz_spark.operators.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 12))
    vecs[25] = vecs[3] + rng.normal(size=12) * 1e-3  # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]) for r in
             cosine_near_dup_pairs(df, threshold=0.99, n_planes=6).collect()}
    assert (3, 25) in pairs
    # random gaussian vectors in 12-d almost never hit cos >= 0.99
    assert len(pairs) <= 3


def test_ivf_multiprobe_recovers_boundary_recall(spark):
    """n_probe>1 must dominate single-probe recall on UNIFORM vectors,
    where many true neighbors sit across k-means cell boundaries."""
    from featurewiz_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(150, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {r["vec_id"]: r["nn_id"] for r in brute_force_topk(df, k=1).collect()}

    def recall(n_probe):
        approx = {
            r["vec_id"]: r["nn_id"]
            for r in ivf_topk(df, k=1, n_cells=6, sample_rows=150,
                              n_probe=n_probe).collect()
        }
        return sum(approx.get(i) == exact[i] for i in exact) / len(exact)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1
    assert r3 > 0.85  # 3 of 6 cells probed catches boundary neighbors


def test_stopword_regexp_count_matches_token_membership(spark):
    """r5: q_stopword_ratio's numerator moved from the interpreted
    transform(lower)+filter+array_contains chain to ONE regexp_count
    with WS-boundary lookarounds. The two must be INTEGER-identical —
    token = maximal non-WS run, match iff lower(token) is a stopword —
    on the fixture corpus plus whitespace edge rows (leading/trailing
    WS, every WS_CLASS character as the delimiter, substring bait)."""
    from pyspark.sql import functions as F

    from featurewiz_spark.text._norm import WS_CLASS
    from featurewiz_spark.text.stats import _STOPWORDS, add_quality_features

    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    ref = F.size(
        F.filter(
            F.transform(F.split(F.col("text"), WS_CLASS), lambda w: F.lower(w)),
            lambda w: F.array_contains(sw, w),
        )
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [(" the and  of ",), ("THE  a cat",), ("",), ("a",), ("that",),
         ("xthe thex",), ("a\tin\nis\x0bit\ffor\rto",), ("for",), (" ",)],
        "text string",
    )
    from featurewiz_spark.text._norm import norm_tokens

    for d in (docs.select("text"), edge):
        got = add_quality_features(d, "text")
        # denominator = the SHARED tokenizer's word count (collapse+trim,
        # empty -> 0) since the r5 word-stats fix; the raw split counted
        # empty edge tokens
        n_words = F.size(norm_tokens("text", lower=False)[1])
        mism = got.where(
            F.col("q_stopword_ratio")
            != ref / F.greatest(n_words, F.lit(1))
        ).count()
        assert mism == 0


def test_extractor_edge_whitespace_cross_path_identity(spark):
    """r5: the JVM and Python paths must agree on the inputs where the
    engines' shorthands diverge — Java \\v matches \\n/NEL/LS/PS
    (Python's is \\x0B alone), Java trim strips all controls <= U+0020,
    Python bare strip() eats Unicode whitespace. The pinned contract is
    the explicit _WS_CHARS class + space-only edge strip; NULL html
    stays NULL on both paths."""
    from pyspark.sql import functions as F

    from featurewiz_spark.text.extract import extract_text_udf

    htmls = [
        "<title>A\nB</title><p>x y</p>",        # newline inside title
        "<p>a\x0Bb</p>",                          # vertical tab
        "<p>n\x85el</p>",                         # NEL
        "<p>l\u2028s\u2029p</p>",                 # LS / PS
        "<p>\xa0hi\xa0</p><p>\xa0</p>",           # NBSP edges + NBSP-only line
        "<p>\u3000wide\u3000</p>",                # ideographic space
        "<p>\x01ctl</p>",                         # control char is CONTENT
        None,                                      # NULL html -> NULL text
    ]
    df = spark.createDataFrame(
        [(i, h.encode() if h is not None else None) for i, h in enumerate(htmls)],
        "i long, html binary",
    )
    out = extract_text(df, "html", "sql_text")
    out = extract_text_udf(out, "html", "py_text")
    rows = {r["i"]: (r["sql_text"], r["py_text"]) for r in out.collect()}
    for i, (s, p) in rows.items():
        assert s == p, f"row {i}: JVM {s!r} != python {p!r}"
    assert rows[0][0] == "A B\nx y"
    assert rows[4][0] == "hi"
    assert rows[6][0] == "\x01ctl"
    assert rows[7] == (None, None)
