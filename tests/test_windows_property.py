"""Property-based (hypothesis) tests for the window/temporal operators
(W2 ffill, W4 rolling, W6 sessionize) against pandas oracles on
randomized per-key event sets — unique timestamps per key keep the
oracles order-unambiguous."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from featurewiz_spark.operators.windows import forward_fill, rolling_agg, sessionize

BASE = pd.Timestamp("2024-01-01")


@st.composite
def event_set(draw):
    n_keys = draw(st.integers(1, 3))
    rows = []
    for k in range(n_keys):
        ts = draw(
            st.lists(st.integers(0, 500), min_size=1, max_size=20, unique=True)
        )
        for t in ts:
            v = draw(st.one_of(st.none(), st.integers(-50, 50)))
            rows.append((f"k{k}", t, None if v is None else float(v)))
    return rows


def _pdf(rows):
    return pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "ts": [BASE + pd.Timedelta(minutes=r[1]) for r in rows],
            "v": [r[2] for r in rows],
        }
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(event_set())
def test_forward_fill_matches_pandas(spark, rows):
    pdf = _pdf(rows)
    got = (
        forward_fill(spark.createDataFrame(pdf), "url", "ts", ["v"])
        .toPandas()
        .sort_values(["url", "ts"])
        .reset_index(drop=True)
    )
    exp = pdf.sort_values(["url", "ts"]).reset_index(drop=True)
    exp["v"] = exp.groupby("url")["v"].ffill()
    assert np.allclose(
        got["v"].to_numpy(dtype=float), exp["v"].to_numpy(dtype=float),
        equal_nan=True,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(event_set(), st.integers(1, 5))
def test_rolling_avg_matches_pandas(spark, rows, k):
    pdf = _pdf(rows)
    got = (
        rolling_agg(spark.createDataFrame(pdf), "url", "ts", "v",
                    window_rows=k, aggs=["avg"])
        .toPandas()
        .sort_values(["url", "ts"])
        .reset_index(drop=True)
    )
    exp = pdf.sort_values(["url", "ts"]).reset_index(drop=True)
    exp["want"] = (
        exp.groupby("url")["v"].transform(
            lambda s: s.rolling(k, min_periods=1).mean()
        )
    )
    assert np.allclose(
        got[f"v_avg_{k}r"].to_numpy(dtype=float),
        exp["want"].to_numpy(dtype=float),
        equal_nan=True,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(event_set(), st.integers(5, 120))
def test_sessionize_matches_pandas(spark, rows, gap_minutes):
    pdf = _pdf(rows)
    got = (
        sessionize(spark.createDataFrame(pdf), "url", "ts",
                   gap=f"{gap_minutes} minutes")
        .toPandas()
        .sort_values(["url", "ts"])
        .reset_index(drop=True)
    )
    exp = pdf.sort_values(["url", "ts"]).reset_index(drop=True)

    def sessions(s):
        gaps = s.diff() > pd.Timedelta(minutes=gap_minutes)
        return gaps.cumsum()

    want = exp.groupby("url")["ts"].transform(sessions).to_numpy()
    g = got["session_id"].to_numpy()
    # session ids may differ by a constant offset per key (1- vs 0-based);
    # require identical PARTITIONING: same boundaries per key
    for key in exp["url"].unique():
        m = (exp["url"] == key).to_numpy()
        a, b = g[m], want[m]
        assert ((np.diff(a) != 0) == (np.diff(b) != 0)).all()
