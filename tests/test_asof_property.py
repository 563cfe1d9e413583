"""Property-based (hypothesis) tests for the as-of join — the engine's
core custom operator (SURVEY.md §7.3). Randomized inputs catch boundary
cases a fixed-seed fixture cannot: empty sides, single-key histories,
all-ties, tolerance exactly on the gap, bucket edges landing on events.

Each hypothesis example spins Spark jobs, so example counts are kept
small; the pandas `merge_asof` oracle defines the semantics
(allow_exact_matches = not strict).
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from featurewiz_spark.operators.asof import asof_join, bucketed_asof_join

BASE = pd.Timestamp("2024-01-01")


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 4))
    left = [
        (f"k{draw(st.integers(0, n_keys - 1))}", draw(st.integers(0, 300)))
        for _ in range(draw(st.integers(1, 25)))
    ]
    right_pairs = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 300)),
            min_size=0,
            max_size=15,
            unique=True,  # unique (key, ts): keeps the oracle well-defined
        )
    )
    right = [(f"k{k}", t, float(i)) for i, (k, t) in enumerate(right_pairs)]
    direction = draw(st.sampled_from(["backward", "forward"]))
    strict = draw(st.booleans())
    tolerance_h = draw(st.sampled_from([None, 1, 24, 100]))
    return left, right, direction, strict, tolerance_h


def _frames(left, right):
    lpdf = pd.DataFrame(
        {
            "url": [k for k, _ in left],
            "warc_ts": [BASE + pd.Timedelta(hours=t) for _, t in left],
            "x": np.arange(len(left), dtype=float),
        }
    )
    rpdf = pd.DataFrame(
        {
            "url": [k for k, _, _ in right],
            "snap_ts": [BASE + pd.Timedelta(hours=t) for _, t, _ in right],
            "score": [v for _, _, v in right],
        }
    )
    return lpdf, rpdf


def _oracle(lpdf, rpdf, direction, strict, tolerance_h):
    if not len(rpdf):
        # merge_asof chokes on empty-frame dtype inference; semantics
        # are trivially "no match for anyone"
        out = lpdf.sort_values("x").reset_index(drop=True).copy()
        out["snap_ts"] = pd.NaT
        out["score_asof"] = np.nan
        return out
    return (
        pd.merge_asof(
            lpdf.sort_values(["warc_ts", "x"]),
            rpdf.sort_values("snap_ts").rename(columns={"score": "score_asof"}),
            left_on="warc_ts",
            right_on="snap_ts",
            by="url",
            direction=direction,
            allow_exact_matches=not strict,
            tolerance=pd.Timedelta(hours=tolerance_h) if tolerance_h else None,
        )
        .sort_values("x")
        .reset_index(drop=True)
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_asof_join_matches_merge_asof_property(spark, case):
    left, right, direction, strict, tolerance_h = case
    lpdf, rpdf = _frames(left, right)
    sl = spark.createDataFrame(lpdf)
    sr = spark.createDataFrame(
        rpdf if len(rpdf) else [],
        schema="url string, snap_ts timestamp, score double",
    )
    got = (
        asof_join(
            sl, sr, "url", "warc_ts", "snap_ts",
            direction=direction, strict=strict,
            tolerance=f"{tolerance_h} hours" if tolerance_h else None,
        )
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    exp = _oracle(lpdf, rpdf, direction, strict, tolerance_h)
    assert len(got) == len(lpdf)
    assert np.allclose(
        got["score_asof"].to_numpy(dtype=float),
        exp["score_asof"].to_numpy(dtype=float),
        equal_nan=True,
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case(), st.sampled_from(["7 hours", "50 hours", "1000 hours"]))
def test_bucketed_asof_equals_plain_property(spark, case, bucket):
    """Bucketed (skew-bounded) as-of ≡ plain as-of for ANY bucket width,
    including widths smaller than typical gaps (forcing carries) and
    wider than the whole span (degenerating to one bucket)."""
    left, right, direction, strict, tolerance_h = case
    lpdf, rpdf = _frames(left, right)
    if not len(rpdf):
        return  # bucketed path requires a non-empty right side schema-wise
    sl, sr = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    kwargs = dict(
        direction=direction, strict=strict,
        tolerance=f"{tolerance_h} hours" if tolerance_h else None,
    )
    plain = (
        asof_join(sl, sr, "url", "warc_ts", "snap_ts", **kwargs)
        .toPandas().sort_values("x").reset_index(drop=True)
    )
    bucketed = (
        bucketed_asof_join(sl, sr, "url", "warc_ts", "snap_ts",
                           bucket=bucket, **kwargs)
        .toPandas().sort_values("x").reset_index(drop=True)
    )
    assert np.allclose(
        plain["score_asof"].to_numpy(dtype=float),
        bucketed["score_asof"].to_numpy(dtype=float),
        equal_nan=True,
    )
