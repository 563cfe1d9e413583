"""Window operator tests vs pandas oracles (reference semantics)."""

import numpy as np
import pandas as pd
import pytest

from featurewiz_spark.operators.windows import (
    backfill,
    duration_between_rows,
    forward_fill,
    lag_lead,
    rolling_agg,
    sessionize,
)


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "user": rng.integers(0, 15, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "v": rng.normal(size=n),
            "id": np.arange(n),
        }
    )
    pdf.loc[rng.random(n) < 0.1, "v"] = np.nan
    return pdf.drop_duplicates(subset=["user", "ts"])


def test_lag_lead_vs_pandas(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = (
        lag_lead(df, "user", "ts", "v", [1, 2], [1])
        .toPandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    g = events_pdf.sort_values(["user", "ts"]).groupby("user")["v"]
    exp_lag1 = g.shift(1).reset_index(drop=True)
    exp = events_pdf.sort_values(["user", "ts"]).reset_index(drop=True)
    assert np.allclose(got["v_lag1"], exp_lag1, equal_nan=True)
    assert np.allclose(
        got["v_lag2"],
        exp.groupby("user")["v"].shift(2).reset_index(drop=True),
        equal_nan=True,
    )
    assert np.allclose(
        got["v_lead1"],
        exp.groupby("user")["v"].shift(-1).reset_index(drop=True),
        equal_nan=True,
    )


def test_rolling_and_cumulative_vs_pandas(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = (
        rolling_agg(df, "user", "ts", "v", window_rows=5, aggs=["avg", "sum"])
        .toPandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    s = events_pdf.sort_values(["user", "ts"]).reset_index(drop=True)
    exp_avg = (
        s.groupby("user")["v"].rolling(5, min_periods=1).mean().reset_index(drop=True)
    )
    assert np.allclose(got["v_avg_5r"], exp_avg, equal_nan=True)

    got_cum = (
        rolling_agg(df, "user", "ts", "v", aggs=["cumsum"])
        .toPandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    # Spark sum over a window ignores nulls but yields NULL while the
    # running frame is all-null — pandas expanding().sum() matches.
    exp_cs = s.groupby("user")["v"].transform(
        lambda x: x.expanding(min_periods=1).sum()
    )
    got_vals = got_cum["v_cumsum_cum"].to_numpy(float)
    assert np.allclose(got_vals, exp_cs.to_numpy(float), equal_nan=True)


def test_ffill_bfill_vs_pandas(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = (
        forward_fill(df, "user", "ts", ["v"], flag=True)
        .toPandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    s = events_pdf.sort_values(["user", "ts"]).reset_index(drop=True)
    exp = s.groupby("user")["v"].ffill()
    assert np.allclose(got["v"], exp, equal_nan=True)
    assert (got["v_missing_flag"] == s["v"].isna().astype(int)).all()

    got_b = (
        backfill(df, "user", "ts", ["v"])
        .toPandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    exp_b = s.groupby("user")["v"].bfill()
    assert np.allclose(got_b["v"], exp_b, equal_nan=True)


def test_sessionize_vs_pandas(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = (
        sessionize(df, "user", "ts", "30 minutes")
        .toPandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    s = events_pdf.sort_values(["user", "ts"]).reset_index(drop=True)

    def sess(g):
        gap = g["ts"].diff().dt.total_seconds()
        return (gap.isna() | (gap > 1800)).cumsum()

    exp = s.groupby("user", group_keys=False).apply(sess).reset_index(drop=True)
    assert (got["session_id"].to_numpy() == exp.to_numpy()).all()


def test_duration_clamps_negative(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = duration_between_rows(df, "user", "ts").toPandas()
    assert (got["duration_sec"].dropna() >= 0).all()
