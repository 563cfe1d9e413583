"""Unit tests for the round-4 embedding-curation and quality-classifier
operators (operators/semantic.py, text/classifier.py) — planted-fixture
behavioral checks; cross-engine value parity is covered by the q86-q88
oracles (tests/oracle_check.py)."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ------------------------------------------------------------------


def _vec_rows():
    """12 vectors in 3 obvious directions + planted near-dup pairs.

    ids 0/1/2: near-identical along e0 (cos ≈ 1) -> keep only id 0.
    ids 10/11: near-identical along e1 -> keep only id 10.
    ids 20..26: well-separated (cos < 0.9 pairwise) -> all kept.
    """
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return (v / np.linalg.norm(v)).tolist()

    base0 = np.zeros(8)
    base0[0] = 1.0
    for i in (0, 1, 2):
        rows.append((i, unit(base0 + 0.01 * rng.randn(8))))
    base1 = np.zeros(8)
    base1[1] = 1.0
    for i in (10, 11):
        rows.append((i, unit(base1 + 0.01 * rng.randn(8))))
    for j, i in enumerate(range(20, 27)):
        v = rng.randn(8)
        rows.append((i, unit(v)))
    return rows


def test_semantic_dedup_keeps_one_per_near_dup_group(spark):
    from featurewiz_spark.operators.semantic import semantic_dedup

    df = spark.createDataFrame(
        _vec_rows(), "vec_id: long, embedding: array<double>"
    )
    out = semantic_dedup(
        df, id_col="vec_id", vec_col="embedding",
        n_clusters=3, threshold=0.95,
    )
    kept = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert len(kept) == 12
    # min id of each planted group survives; later dups drop — note this
    # holds regardless of WHICH Voronoi cell a group lands in, because
    # near-identical vectors always co-assign
    assert kept[0] is True and kept[1] is False and kept[2] is False
    assert kept[10] is True and kept[11] is False
    for i in range(20, 27):
        assert kept[i] is True, i


def test_semantic_dedup_partition_invariant(spark):
    from featurewiz_spark.operators.semantic import semantic_dedup

    df = spark.createDataFrame(
        _vec_rows(), "vec_id: long, embedding: array<double>"
    )
    a = sorted(
        map(tuple, semantic_dedup(df, "vec_id", "embedding", 3, 0.95).collect())
    )
    b = sorted(
        map(
            tuple,
            semantic_dedup(
                df.repartition(7), "vec_id", "embedding", 3, 0.95
            ).collect(),
        )
    )
    assert a == b


def test_semantic_dedup_max_cluster_cap_keeps_everything(spark):
    from featurewiz_spark.operators.semantic import semantic_dedup

    df = spark.createDataFrame(
        _vec_rows(), "vec_id: long, embedding: array<double>"
    )
    out = semantic_dedup(
        df, "vec_id", "embedding", n_clusters=1, threshold=0.95,
        max_cluster_size=5,
    )
    # single cluster of 12 > cap 5: pair search skipped, all members kept
    assert all(r["keep"] for r in out.collect())


def test_semantic_dedup_external_cluster_col(spark):
    from featurewiz_spark.operators.semantic import semantic_dedup

    rows = [(i, c, v) for (i, v), c in zip(_vec_rows(), [0] * 5 + [1] * 7)]
    df = spark.createDataFrame(
        rows, "vec_id: long, cell: int, embedding: array<double>"
    )
    out = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.95, cluster_col="cell"
    )
    kept = {r["vec_id"]: r["keep"] for r in out.collect()}
    # groups (0,1,2) and (10,11) both live inside cell 0
    assert kept[1] is False and kept[2] is False and kept[11] is False
    assert kept[0] is True and kept[10] is True


# ------------------------------------------------------------------
# JL random projection
# ------------------------------------------------------------------


def test_random_projection_shape_and_determinism(spark):
    from featurewiz_spark.operators.semantic import random_projection

    df = spark.createDataFrame(
        _vec_rows(), "vec_id: long, embedding: array<double>"
    )
    out = random_projection(df, "embedding", in_dim=8, out_dim=4, seed=1)
    cols = [f"proj_{d}" for d in range(4)]
    assert all(c in out.columns for c in cols)
    a = sorted(map(tuple, out.select("vec_id", *cols).collect()))
    b = sorted(
        map(
            tuple,
            random_projection(
                df.repartition(5), "embedding", in_dim=8, out_dim=4, seed=1
            )
            .select("vec_id", *cols)
            .collect(),
        )
    )
    assert a == b
    # a different seed must give a different projection
    c = sorted(
        map(
            tuple,
            random_projection(df, "embedding", in_dim=8, out_dim=4, seed=2)
            .select("vec_id", *cols)
            .collect(),
        )
    )
    assert a != c


def test_random_projection_preserves_scale(spark):
    """JL with ±1/sqrt(k) signs is an isometry in expectation:
    E[||y||²] = ||x||². With unit inputs the projected squared norms
    should land near 1 on average (loose tolerance, k=8)."""
    from featurewiz_spark.operators.semantic import random_projection

    df = spark.createDataFrame(
        _vec_rows(), "vec_id: long, embedding: array<double>"
    )
    out = random_projection(
        df, "embedding", in_dim=8, out_dim=8, seed=3, rounding=None
    )
    sq = sum(F.col(f"proj_{d}") ** 2 for d in range(8))
    mean_sq = out.agg(F.avg(sq)).collect()[0][0]
    assert 0.4 < mean_sq < 2.5, mean_sq


def test_random_projection_empty_requires_in_dim(spark):
    from featurewiz_spark.operators.semantic import random_projection

    empty = spark.createDataFrame([], "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="empty input"):
        random_projection(empty, "embedding", out_dim=2)
    # explicit in_dim works on empty input
    out = random_projection(empty, "embedding", in_dim=8, out_dim=2)
    assert out.count() == 0


# ------------------------------------------------------------------
# NB quality classifier
# ------------------------------------------------------------------


def _corpus(spark):
    rows = [
        (0, "the curated reference prose reads well", True),
        (1, "curated reference text with careful prose", True),
        (2, "careful curated well formed reference prose", True),
        (3, "click here buy now free spam spam", False),
        (4, "spam click free buy now now now", False),
        (5, "free free spam buy click here", False),
        (6, "", False),  # zero tokens -> NULL score
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, y: boolean")


def test_quality_classifier_separates_planted_classes(spark):
    from featurewiz_spark.text.classifier import (
        add_quality_score,
        train_quality_classifier,
    )

    docs = _corpus(spark)
    model, stats = train_quality_classifier(docs, "y")
    assert stats["n_pos_docs"] == 3 and stats["n_neg_docs"] == 4
    out = {
        r["doc_id"]: (r["quality_score"], r["quality_keep"])
        for r in add_quality_score(docs, model, stats).collect()
    }
    for i in (0, 1, 2):
        assert out[i][0] > 0 and out[i][1] is True, out[i]
    for i in (3, 4, 5):
        assert out[i][0] < 0 and out[i][1] is False, out[i]
    # empty doc: no token evidence -> NULL score AND NULL keep
    assert out[6] == (None, None)


def test_quality_classifier_scores_unseen_tokens_via_oov_floor(spark):
    from featurewiz_spark.text.classifier import (
        add_quality_score,
        train_quality_classifier,
    )

    train = _corpus(spark)
    model, stats = train_quality_classifier(train, "y")
    test = spark.createDataFrame(
        [(100, "entirely novel vocabulary everywhere")],
        "doc_id: long, text: string",
    )
    row = add_quality_score(test, model, stats).collect()[0]
    # all-OOV doc: every token gets the symmetric smoothing floor, so
    # the score collapses to ~prior + ln(neg_tok_mass/pos_tok_mass) —
    # finite and non-NULL, never an error
    assert row["quality_score"] is not None
    assert math.isfinite(row["quality_score"])


def test_quality_classifier_one_class_raises(spark):
    from featurewiz_spark.text.classifier import train_quality_classifier

    docs = spark.createDataFrame(
        [(0, "all the same label", True), (1, "again same", True)],
        "doc_id: long, text: string, y: boolean",
    )
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier(docs, "y")


def test_quality_classifier_train_score_split(spark):
    """Model fit on train must replay identically on a disjoint test
    frame (fit/transform leakage boundary, same discipline as the
    encoders)."""
    from featurewiz_spark.text.classifier import (
        add_quality_score,
        train_quality_classifier,
    )

    train = _corpus(spark)
    model, stats = train_quality_classifier(train, "y")
    test = spark.createDataFrame(
        [(7, "curated prose reads well"), (8, "buy spam now click")],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r["quality_keep"]
        for r in add_quality_score(test, model, stats).collect()
    }
    assert out[7] is True and out[8] is False


def test_semantic_dedup_duplicate_ids_keep_both(spark):
    """The keep rule is `strictly smaller id` (matching the SQL
    mirror's EXISTS), not `earlier position`: two rows sharing one id
    must BOTH survive, surfacing the upstream data error instead of
    silently masking it."""
    from featurewiz_spark.operators.semantic import semantic_dedup

    rows = [
        (5, [1.0, 0.0, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 1e-6]),   # near-identical, same id
        (9, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = semantic_dedup(df, "vec_id", "embedding", n_clusters=1,
                         threshold=0.95)
    kept = [r["keep"] for r in out.collect()]
    assert all(kept) and len(kept) == 3
