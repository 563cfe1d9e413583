"""ExactSubstr duplicated-span removal (text/exactsub.py): independent
pure-Python reference known answers, strict Spark<->DuckDB mirror
parity, edge cases (NULL/empty/fully-duplicated/within-doc repeats/
overlap merging/casing), and partition invariance."""

import hashlib
import re

import pytest

from featurewiz_spark.text.exactsub import (
    exact_substring_dedup,
    exact_substring_dedup_sql,
)

SCHEMA = "doc_id long, text string"

# Docs 1 and 2 share the 6-token licence fragment mid-sentence (not
# segment-aligned); doc 3 repeats a window within itself; doc 4 is a
# full copy of doc 1; doc 5/6/7 are unique/empty/NULL; doc 8 upper-cases
# the shared fragment (must still match under lower-hashing but keep
# its own casing in the output); doc 9 is shorter than the window.
FRAG = "licensed under the apache license version"
DOCS = [
    (1, f"alpha beta {FRAG} two gamma delta"),
    (2, f"epsilon {FRAG} two zeta"),
    (3, "x1 x2 r p q r p q r p q r s t u v w"),
    (4, f"alpha beta {FRAG} two gamma delta"),
    (5, "completely unique sentence with no repeats anywhere at all"),
    (6, "   "),
    (7, None),
    (8, f"ETA {FRAG.upper()} TWO THETA"),
    (9, "too short"),
]
N = 4  # window tokens
MC = 2  # min corpus-wide occurrences


def _pyref_one(texts, ngram=N, min_count=MC):
    """Independent reference: stdlib-only sliding-window mark + maximal
    span removal (no featurewiz_spark code)."""
    def toks(tx):
        if tx is None:
            return []
        t = re.sub(r"[ \t\n\x0B\f\r]+", " ", tx).strip()
        return t.split(" ") if t else []

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    tokd = {i: toks(tx) for i, tx in texts}
    freq = {}
    for w in tokd.values():
        for i in range(len(w) - ngram + 1):
            k = h(" ".join(w[i : i + ngram]).lower())
            freq[k] = freq.get(k, 0) + 1
    out = {}
    for did, w in tokd.items():
        covered = [False] * len(w)
        for i in range(len(w) - ngram + 1):
            k = h(" ".join(w[i : i + ngram]).lower())
            if freq[k] >= min_count:
                for j in range(i, i + ngram):
                    covered[j] = True
        kept = [t for t, c in zip(w, covered) if not c]
        out[did] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


def _register(duck):
    duck.execute("CREATE OR REPLACE TABLE docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def _spark_rows(docs_df, **kw):
    out = exact_substring_dedup(docs_df, **kw)
    return {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_dup_tokens"])
        for r in out.collect()
    }


def test_known_answers_vs_pyref(docs_df):
    got = _spark_rows(docs_df, ngram=N, min_count=MC)
    want = _pyref_one(DOCS)
    assert got == want
    # spot-check the semantics the fixture encodes:
    # full-copy pair 1/4 is erased entirely (ALL occurrences removed)
    assert got[1][0] == "" and got[4][0] == ""
    # shared fragment cut from doc 2, flanks survive
    assert got[2][0].startswith("epsilon") and "apache" not in got[2][0]
    # within-doc repeat (doc 3) is removed even though no other doc has it
    assert got[3][2] > 0 and "x1 x2" in got[3][0]
    # unique doc untouched
    assert got[5] == (DOCS[4][1], 9, 0)
    # empty / NULL -> ('', 0, 0)
    assert got[6] == ("", 0, 0) and got[7] == ("", 0, 0)
    # doc 8 matched via lower-hash but kept its own casing
    assert got[8][2] > 0 and got[8][0].split(" ")[0] == "ETA"
    # shorter than the window: untouched
    assert got[9] == ("too short", 2, 0)


def test_overlap_merging_is_maximal(spark):
    # one 6-token duplicated run -> three overlapping 4-windows merge
    # into ONE maximal span of exactly 6 tokens, flanks intact
    run = "m1 m2 m3 m4 m5 m6"
    df = spark.createDataFrame(
        [(1, f"a b {run} c d"), (2, f"e {run} f")], SCHEMA
    )
    got = _spark_rows(df, ngram=N, min_count=MC)
    assert got[1] == ("a b c d", 10, 6)
    assert got[2] == ("e f", 8, 6)


def test_duckdb_mirror_parity(spark, duck, docs_df):
    _register(duck)
    sql = exact_substring_dedup_sql("docs", ngram=N, min_count=MC)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(sql).fetchall()
    }
    got = _spark_rows(docs_df, ngram=N, min_count=MC)
    assert got == want


def test_partition_invariance(spark, docs_df):
    a = _spark_rows(docs_df.repartition(1), ngram=N, min_count=MC)
    b = _spark_rows(docs_df.repartition(7, "text"), ngram=N, min_count=MC)
    assert a == b


def test_guards(docs_df):
    with pytest.raises(ValueError, match="ngram must be >= 2"):
        exact_substring_dedup(docs_df, ngram=1)
    with pytest.raises(ValueError, match="collides"):
        exact_substring_dedup(docs_df, out_col="n_tokens")


def test_min_count_3_spares_pairs(spark):
    frag = "only two copies of this exist here"
    df = spark.createDataFrame(
        [(1, f"a {frag} b"), (2, f"c {frag} d"), (3, "nothing shared")],
        SCHEMA,
    )
    got = _spark_rows(df, ngram=N, min_count=3)
    assert got[1][2] == 0 and got[2][2] == 0  # pair survives at mc=3
    got2 = _spark_rows(df, ngram=N, min_count=2)
    assert got2[1][2] > 0 and got2[2][2] > 0


def test_randomized_differential_vs_pyref(spark):
    """Seeded random corpus from a 12-token alphabet (so duplicated
    n-grams arise organically, within AND across docs) — the Spark
    fold must agree with the independent pure-Python reference on
    every (doc, clean_text, n_tokens, n_dup_tokens). One Spark job."""
    import random

    rng = random.Random(20260820)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for did in range(1, 161):
        n = rng.randint(0, 30)
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(n))))
    for ngram, mc in ((3, 2), (4, 3)):
        got = _spark_rows(
            spark.createDataFrame(docs, SCHEMA), ngram=ngram, min_count=mc
        )
        want = _pyref_one(docs, ngram=ngram, min_count=mc)
        assert got == want
