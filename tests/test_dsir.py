"""DSIR importance resampling (text/dsir.py): independent-reference
known answers, strict Spark<->DuckDB mirror parity, partition
invariance, and the guard contracts."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from featurewiz_spark.text.dsir import (
    dsir_fit,
    dsir_resample,
    dsir_score,
    dsir_sql,
)

SCHEMA = "doc_id long, text string"

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "spark shuffles the big table"),
    (4, "the cat and the dog"),
    (5, "cat cat cat"),
    (6, ""),
    (7, None),
    (8, "solo"),
    (9, "  the \t cat\n sat  "),
    (10, "héllo wörld héllo"),
]
TARGET_IDS = {1, 4, 5, 9}  # cat-heavy docs: the "quality" corpus
M = 64


def _pyref_grams(text):
    """Independent reference: tokenizer + unigram/bigram bag, computed
    with stdlib re/hashlib only (no featurewiz_spark code)."""
    if text is None:
        return []
    t = re.sub(r"[ \t\n\x0B\f\r]+", " ", text).strip().lower()
    if not t:
        return []
    toks = t.split(" ")
    grams = list(toks)
    grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return grams


def _pyref_bucket(gram, m=M):
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16) % m


def _pyref_lam(target_texts, raw_texts, m=M):
    tc, rc = {}, {}
    for texts, acc in ((target_texts, tc), (raw_texts, rc)):
        for tx in texts:
            for g in _pyref_grams(tx):
                b = _pyref_bucket(g, m)
                acc[b] = acc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    return {
        b: math.log((tc.get(b, 0) + 1) / (tt + m))
        - math.log((rc.get(b, 0) + 1) / (rt + m))
        for b in range(m)
    }


def _pyref_logw(text, lam, m=M):
    return sum(lam[_pyref_bucket(g, m)] for g in _pyref_grams(text))


def _register(duck):
    duck.execute("CREATE OR REPLACE TABLE docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


@pytest.fixture()
def target_df(docs_df):
    return docs_df.filter(F.col("doc_id").isin(*TARGET_IDS))


def test_fit_matches_python_reference(docs_df, target_df):
    lam, stats = dsir_fit(target_df, docs_df, m=M)
    ref = _pyref_lam(
        [t for i, t in DOCS if i in TARGET_IDS], [t for _, t in DOCS], m=M
    )
    assert stats["m"] == M
    assert stats["t_grams"] == sum(
        len(_pyref_grams(t)) for i, t in DOCS if i in TARGET_IDS
    )
    assert stats["r_grams"] == sum(len(_pyref_grams(t)) for _, t in DOCS)
    for b in range(M):
        assert lam[b] == pytest.approx(ref[b], abs=1e-9)


def test_score_matches_python_reference(docs_df, target_df):
    lam, _ = dsir_fit(target_df, docs_df, m=M)
    ref = _pyref_lam(
        [t for i, t in DOCS if i in TARGET_IDS], [t for _, t in DOCS], m=M
    )
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_score(docs_df, lam, temperature=None).collect()
    }
    for i, t in DOCS:
        assert got[i] == pytest.approx(_pyref_logw(t, ref), abs=1e-5), i
    # cat-heavy raw docs must out-score the off-topic one
    assert got[5] > got[3]
    # empty / NULL text scores exactly 0.0
    assert got[6] == 0.0 and got[7] == 0.0


def test_sql_mirror_exact(docs_df, target_df, duck):
    _register(duck)
    lam, _ = dsir_fit(target_df, docs_df, m=M)
    got = {
        r["doc_id"]: (r["dsir_logw"], r["dsir_key"])
        for r in dsir_score(docs_df, lam).collect()
    }
    tgt = f"(SELECT * FROM docs WHERE doc_id IN ({','.join(map(str, sorted(TARGET_IDS)))}))"
    exp = {
        r[0]: (r[1], r[2])
        for r in duck.execute(dsir_sql("docs", tgt, m=M)).fetchall()
    }
    assert got == exp  # bit-exact doubles, both columns, all docs


def test_sql_mirror_topk_exact(docs_df, target_df, duck):
    _register(duck)
    got = [
        (r["doc_id"], r["dsir_logw"], r["dsir_key"])
        for r in dsir_resample(docs_df, target_df, k=4, m=M)
        .select("doc_id", "dsir_logw", "dsir_key")
        .collect()
    ]
    tgt = f"(SELECT * FROM docs WHERE doc_id IN ({','.join(map(str, sorted(TARGET_IDS)))}))"
    exp = [
        tuple(r)
        for r in duck.execute(dsir_sql("docs", tgt, m=M, k=4)).fetchall()
    ]
    assert sorted(got) == sorted(exp) and len(got) == 4


def test_partition_invariance(spark, docs_df, target_df):
    lam, _ = dsir_fit(target_df, docs_df, m=M)
    a = sorted(
        map(tuple, dsir_score(docs_df.repartition(1), lam).collect())
    )
    b = sorted(
        map(tuple, dsir_score(docs_df.repartition(7), lam).collect())
    )
    assert a == b


def test_guards(spark, docs_df, target_df):
    empty = docs_df.filter(F.lit(False))
    with pytest.raises(ValueError, match="target"):
        dsir_fit(empty, docs_df, m=M)
    with pytest.raises(ValueError, match="raw"):
        dsir_fit(target_df, empty, m=M)
    lam, _ = dsir_fit(target_df, docs_df, m=M)
    with pytest.raises(ValueError, match="columns exist"):
        dsir_score(docs_df.withColumn("dsir_logw", F.lit(0.0)), lam)


def test_gumbel_key_properties(docs_df, target_df):
    """Key = logw/T + noise: temperature scales the signal relative to
    the fixed per-doc noise, and the noise itself is id-deterministic."""
    lam, _ = dsir_fit(target_df, docs_df, m=M)
    k1 = {
        r["doc_id"]: r["dsir_key"]
        for r in dsir_score(docs_df, lam, temperature=1.0).collect()
    }
    k1b = {
        r["doc_id"]: r["dsir_key"]
        for r in dsir_score(docs_df, lam, temperature=1.0).collect()
    }
    assert k1 == k1b  # derandomized: identical across runs
    logw = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_score(docs_df, lam, temperature=None).collect()
    }
    k100 = {
        r["doc_id"]: r["dsir_key"]
        for r in dsir_score(docs_df, lam, temperature=100.0).collect()
    }
    for i in k1:
        noise1 = k1[i] - logw[i]
        noise100 = k100[i] - logw[i] / 100.0
        assert noise1 == pytest.approx(noise100, abs=2e-6), i
