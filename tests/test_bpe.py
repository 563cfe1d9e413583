"""BPE tokenizer (text/bpe.py): trainer known answers, the replace-fold
encode vs an independent iterative reference encoder, the DuckDB
mirror, distributed pair counts, and the scale guards."""

import re

import pytest
from pyspark.sql import functions as F

from featurewiz_spark.text.bpe import (
    DD,
    DELIM,
    EOW,
    _merge_syms,
    bpe_encode,
    bpe_encode_sql,
    bpe_encode_tokens_col,
    bpe_pair_counts,
    bpe_train,
    bpe_word_counts,
    bpe_word_counts_sql,
)

CORPUS = [
    "low lower lowest",
    "low low lowest newer",
    "wider new newer widest",
    "abab aaaa baba",
    "low",
    "",
    None,
    "   ",
    "a\x1fb low",  # delimiter in input is stripped by contract
    "LOW Lower",  # lower=True folds case
    "𝔘nicode astral 𝔘𝔘",  # astral plane: one symbol per CODE POINT
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


# -- independent reference encoder: iterative lowest-rank-first, the
#    classic formulation (NOT the fold) ---------------------------------


def _ref_word(w, merges, rank):
    syms = list(w) + [EOW]
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return syms
        syms = list(_merge_syms(tuple(syms), merges[best]))


def _ref_doc(t, merges):
    if t is None:
        return None
    rank = {m: i for i, m in enumerate(merges)}
    t = re.sub(r"[ \t\n\x0B\f\r]+", " ", t).strip().lower().replace(DELIM, "")
    if not t:
        return []
    out = []
    for w in t.split(" "):
        out.extend(_ref_word(w, merges, rank))
    return out


def test_train_known_answer(spark):
    # 'aa aa ab': pairs round 1: (a,a)=2 from 'aa', (a,EOW)... counts:
    # words: aa:2, ab:1. round1 pairs: (a,a):2 (a,</w>):2+0... compute:
    # aa -> a,a,</w>: (a,a)=2, (a,</w>)=2 ; ab -> a,b,</w>: (a,b)=1,
    # (b,</w>)=1. Tie (a,a) vs (a,</w>) at 2 -> lexicographic: '</w>'
    # < 'a', so (a,'</w>') wins round 1.
    df = spark.createDataFrame([("aa aa ab",)], "text string")
    wc = bpe_word_counts(df, "text")
    merges = bpe_train(wc, 2)
    assert merges[0] == ("a", EOW)
    # round 2: aa -> a, a</w> : (a, a</w>)=2 ; ab -> a,b,</w>:(a,b)=1,
    # (b,</w>)=1 -> best (a, 'a</w>')
    assert merges[1] == ("a", "a" + EOW)


def test_encode_matches_reference_encoder(spark):
    df = _df(spark)
    merges = bpe_train(bpe_word_counts(df, "text"), 12)
    assert len(merges) > 4
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges, "text").collect()
    }
    for i, t in enumerate(CORPUS):
        assert got[i] == _ref_doc(t, merges), (i, t)


def test_encode_matches_duckdb_mirror(spark, duck):
    import pandas as pd

    df = _df(spark)
    merges = bpe_train(bpe_word_counts(df, "text"), 10)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges, "text").collect()
    }
    duck.register(
        "docs",
        pd.DataFrame(
            {"doc_id": range(len(CORPUS)), "text": pd.Series(CORPUS, dtype=object)}
        ),
    )
    for i, toks in duck.execute(
        f'select doc_id, {bpe_encode_sql("text", merges)} from docs'
    ).fetchall():
        assert (list(toks) if toks is not None else None) == got[i], i


def test_word_counts_match_duckdb_mirror(spark, duck):
    import pandas as pd

    df = _df(spark)
    got = {
        (r["word"], r["cnt"])
        for r in bpe_word_counts(df, "text", min_count=2).collect()
    }
    duck.register(
        "docs",
        pd.DataFrame({"text": pd.Series(CORPUS, dtype=object)}),
    )
    exp = set(
        duck.execute(bpe_word_counts_sql("docs", "text", min_count=2)).fetchall()
    )
    assert got == exp


def test_adjacent_occurrences_merge_in_one_pass(spark):
    # 'abababa' with merge (a,b): non-overlapping left-to-right must
    # yield ab ab ab a</w> — the delimiter-doubling invariant at work.
    df = spark.createDataFrame([("abababa",)], "text string")
    toks = bpe_encode(df, [("a", "b")], "text").first()["bpe_tokens"]
    assert toks == ["ab", "ab", "ab", "a", EOW]


def test_merges_never_cross_word_boundary(spark):
    # merge (b, a) must not fire across 'ab ab' (b ends word 1, a
    # starts word 2) because </w> sits between them.
    df = spark.createDataFrame([("ab ab",)], "text string")
    toks = bpe_encode(df, [("b", "a")], "text").first()["bpe_tokens"]
    assert toks == ["a", "b", EOW, "a", "b", EOW]


def test_token_concat_reconstructs_text(spark):
    # lossless: concatenating the tokens reproduces the normalized
    # text with </w> closing every word — merges only regroup.
    df = _df(spark)
    merges = bpe_train(bpe_word_counts(df, "text"), 8)
    for r in bpe_encode(df, merges, "text").collect():
        t = CORPUS[r["doc_id"]]
        if t is None:
            assert r["bpe_tokens"] is None
            continue
        norm = (
            re.sub(r"[ \t\n\x0B\f\r]+", " ", t).strip().lower().replace(DELIM, "")
        )
        expect = "" if not norm else "".join(w + EOW for w in norm.split(" "))
        assert "".join(r["bpe_tokens"]) == expect


def test_null_empty_contract(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, " \t "), (3, "\x1f\x1f")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_n_tokens"])
        for r in bpe_encode(df, [("a", "b")], "text").collect()
    }
    assert rows[0][0] is None and rows[0][1] is None
    for i in (1, 2, 3):
        assert rows[i][0] == [] and rows[i][1] == 0


def test_pair_counts_match_driver_at_any_round(spark):
    df = _df(spark)
    wc = bpe_word_counts(df, "text")
    merges = bpe_train(wc, 6)
    for k in (0, 3, 6):
        got = {
            (r["left"], r["right"]): r["cnt"]
            for r in bpe_pair_counts(wc, merges[:k]).collect()
        }
        vocab = {}
        for r in wc.collect():
            s = tuple(r["word"]) + (EOW,)
            for m in merges[:k]:
                s = _merge_syms(s, m)
            vocab[s] = vocab.get(s, 0) + r["cnt"]
        exp = {}
        for s, c in vocab.items():
            for i in range(len(s) - 1):
                exp[(s[i], s[i + 1])] = exp.get((s[i], s[i + 1]), 0) + c
        assert got == exp, k


def test_train_cap_guard(spark):
    df = _df(spark)
    wc = bpe_word_counts(df, "text")
    with pytest.raises(ValueError, match="cap it first"):
        bpe_train(wc, 2, max_words=3)


def test_encode_plan_is_pure_projection(spark):
    # zero Exchange, zero Python eval: the fold rides the scan
    df = _df(spark)
    plan = bpe_encode(df, [("l", "o"), ("lo", "w")], "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no ArrowEvalPython / BatchEvalPython


def test_delimiter_in_merge_rejected(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="delimiter"):
        bpe_encode(df, [("a" + DELIM, "b")], "text").collect()
    # the SQL mirror enforces the same contract (r5 review fix)
    with pytest.raises(ValueError, match="delimiter"):
        bpe_encode_sql("text", [("a", DELIM + "b")])


def test_output_clash_guard(spark):
    df = _df(spark).withColumn("bpe_tokens", F.lit("x"))
    with pytest.raises(ValueError, match="already exists"):
        bpe_encode(df, [("a", "b")], "text")


# -- randomized differential: the one-pass-per-rank replace-fold vs the
#    iterative lowest-rank-first formulation, on merge lists actually
#    LEARNED by the trainer (the fold's correctness argument relies on
#    that structure). Pure Python: Python str.replace has the same
#    non-overlapping left-to-right semantics as Spark F.replace /
#    DuckDB replace, which the Spark/DuckDB tests above pin. -----------


def _fold_doc(t, merges):
    """Pure-Python replica of bpe_encode_tokens_col's replace chain."""
    if t is None:
        return None
    t = re.sub(r"[ \t\n\x0B\f\r]+", " ", t).strip().lower().replace(DELIM, "")
    if not t:
        return []
    seq = DD + "".join(ch + DD for ch in t) + EOW + DD
    seq = seq.replace(DELIM + " " + DELIM, DELIM + EOW + DELIM)
    for a, b in merges:
        seq = seq.replace(DELIM + a + DD + b + DELIM, DELIM + a + b + DELIM)
    return seq.strip(DELIM).split(DD)


def test_fold_equals_iterative_randomized():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from featurewiz_spark.text.bpe import train_from_counts

    word = st.text(alphabet="abcz", min_size=1, max_size=8)
    corpus = st.lists(word, min_size=1, max_size=30)
    extra = st.lists(word, min_size=0, max_size=5)  # unseen-word docs

    @settings(max_examples=300, deadline=None)
    @given(corpus=corpus, extra=extra, k=st.integers(0, 40))
    def run(corpus, extra, k):
        counts = {}
        for w in corpus:
            counts[w] = counts.get(w, 0) + 1
        merges = train_from_counts(counts, k)
        for doc in (" ".join(corpus), " ".join(extra)):
            assert _fold_doc(doc, merges) == _ref_doc(doc, merges), (
                doc,
                merges,
            )

    run()
