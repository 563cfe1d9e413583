"""As-of join unit tests vs a pandas merge_asof oracle + leakage probes."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from featurewiz_spark.operators.asof import asof_join, lag_join, latest_per_entity


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(42)
    n_left, n_right = 400, 120
    urls = [f"u{i}" for i in rng.integers(0, 20, n_left)]
    lts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 90 * 86400, n_left), unit="s"
    )
    left = pd.DataFrame({"url": urls, "warc_ts": lts, "x": rng.normal(size=n_left)})
    rurls = [f"u{i}" for i in rng.integers(0, 20, n_right)]
    rts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 90 * 86400, n_right), unit="s"
    )
    right = pd.DataFrame(
        {"url": rurls, "snap_ts": rts, "score": rng.normal(size=n_right)}
    )
    right = right.drop_duplicates(subset=["url", "snap_ts"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, "7 days"])
def test_asof_matches_pandas_merge_asof(spark, frames, direction, tolerance):
    left, right = frames
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = (
        asof_join(
            sl, sr, on="url", left_ts="warc_ts", right_ts="snap_ts",
            direction=direction, tolerance=tolerance,
        )
        .toPandas()
        .sort_values(["url", "warc_ts", "x"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("warc_ts"),
        right.sort_values("snap_ts").rename(columns={"score": "score_asof"}),
        left_on="warc_ts",
        right_on="snap_ts",
        by="url",
        direction=direction,
        tolerance=pd.Timedelta(tolerance) if tolerance else None,
    ).sort_values(["url", "warc_ts", "x"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(
        got["score_asof"].to_numpy(dtype=float),
        exp["score_asof"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-02 00:00"), 1.0)], "url string, warc_ts timestamp, x double"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-02 00:00"), 99.0),
            ("a", _ts("2024-01-01 00:00"), 10.0),
        ],
        "url string, snap_ts timestamp, score double",
    )
    strict = asof_join(
        left, right, "url", "warc_ts", "snap_ts", strict=True
    ).first()
    loose = asof_join(
        left, right, "url", "warc_ts", "snap_ts", strict=False
    ).first()
    assert strict["score_asof"] == 10.0  # equal-ts snapshot invisible
    assert loose["score_asof"] == 99.0


def test_asof_no_temporal_leakage(spark, frames):
    """Property: mutating any right row with snap_ts > max(left ts of its
    url) must not change the strict-backward join result."""
    left, right = frames
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    base = (
        asof_join(sl, sr, "url", "warc_ts", "snap_ts", strict=True)
        .toPandas()
        .sort_values(["url", "warc_ts", "x"])
        .reset_index(drop=True)
    )
    # shove future snapshots to absurd values
    maxes = left.groupby("url")["warc_ts"].max()
    fut = right.copy()
    is_future = fut.apply(
        lambda r: r["snap_ts"] > maxes.get(r["url"], pd.Timestamp.min), axis=1
    )
    fut.loc[is_future, "score"] = 1e12
    sr2 = spark.createDataFrame(fut)
    mutated = (
        asof_join(sl, sr2, "url", "warc_ts", "snap_ts", strict=True)
        .toPandas()
        .sort_values(["url", "warc_ts", "x"])
        .reset_index(drop=True)
    )
    assert np.allclose(
        base["score_asof"].to_numpy(float),
        mutated["score_asof"].to_numpy(float),
        equal_nan=True,
    )


def test_lag_join_semantics(spark):
    """Exact-key calendar lag (reference J2): value at ts − 1 day, else 0."""
    rows = [
        ("a", _ts("2024-01-01 00:00"), 5.0),
        ("a", _ts("2024-01-02 00:00"), 7.0),
        ("a", _ts("2024-01-03 00:00"), 9.0),
        ("b", _ts("2024-01-02 00:00"), 1.0),
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, v double")
    got = {
        (r["url"], r["ts"].isoformat()): r["v_lag_1_day"]
        for r in lag_join(df, ["url"], "ts", "v", "1 day").collect()
    }
    assert got[("a", "2024-01-01T00:00:00")] == 0.0
    assert got[("a", "2024-01-02T00:00:00")] == 5.0
    assert got[("a", "2024-01-03T00:00:00")] == 7.0
    assert got[("b", "2024-01-02T00:00:00")] == 0.0


def test_latest_per_entity_row_consistent(spark):
    rows = [
        ("a", _ts("2024-01-01 00:00"), 1, 10.0),
        ("a", _ts("2024-01-05 00:00"), 2, 5.0),
        ("a", _ts("2024-01-05 00:00"), 3, 2.0),  # tie on ts → max id wins
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, id int, v double")
    r = latest_per_entity(df, "url", "ts", ["id", "v"]).first()
    assert (r["id"], r["v"]) == (3, 2.0)  # consistent row, not per-col max


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, "7 days"])
@pytest.mark.parametrize("strict", [False, True])
def test_bucketed_asof_equals_plain(spark, frames, direction, tolerance, strict):
    """Skew-bounded bucketed as-of must be semantically IDENTICAL to the
    single-window as-of — including across-bucket carries (bucket width
    10 days ≪ 90-day span forces carries) and a hot entity (u0 gets 10%
    of all rows concentrated)."""
    from featurewiz_spark.operators.asof import bucketed_asof_join

    left, right = frames
    # skew: duplicate u0's history 3x with jittered timestamps
    hot = left[left.url == "u0"].copy()
    extra = pd.concat(
        [hot.assign(warc_ts=hot.warc_ts + pd.Timedelta(seconds=i + 1)) for i in range(3)]
    )
    left = pd.concat([left, extra], ignore_index=True)
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)

    plain = asof_join(
        sl, sr, "url", "warc_ts", "snap_ts",
        direction=direction, tolerance=tolerance, strict=strict,
    ).toPandas().sort_values(["url", "warc_ts", "x"]).reset_index(drop=True)
    bucketed = bucketed_asof_join(
        sl, sr, "url", "warc_ts", "snap_ts",
        direction=direction, tolerance=tolerance, strict=strict,
        bucket="10 days",
    ).toPandas().sort_values(["url", "warc_ts", "x"]).reset_index(drop=True)
    assert list(plain.columns) == [c for c in bucketed.columns]
    pd.testing.assert_frame_equal(
        plain[sorted(plain.columns)], bucketed[sorted(bucketed.columns)],
        check_like=True,
    )
