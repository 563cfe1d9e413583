"""Point-in-interval (range) join via time-bucket blow-up.

Joins a table of timestamped points to a table of [start, end)
intervals — "which promotion windows / sessions / outage periods was
this event inside?" — the range-join sibling of the as-of join in
operators/asof.py (reference analog: featurewiz's lag/merge time
alignment, my_encoders.py:1438-1480, which only supports exact-key
point lookups; intervals are a strict generalization Spark lacks as a
built-in).

Why not a plain conditional join: ``points JOIN intervals ON key AND
s <= ts AND ts < e`` makes Catalyst pick a sort-merge/hash join ON THE
KEY ONLY with the range as a residual filter — every point meets every
interval of its key (O(P_k × I_k) per key) — and with NO equality key
it degenerates to BroadcastNestedLoopJoin, the classic range-join
pathology. The public fix (Databricks range-join bins, Flink interval
join) is to quantize time into fixed buckets:

- each interval is exploded to the bucket indexes it overlaps
  (``ceil(len/bucket)+1`` rows — cost proportional to interval length,
  choose ``bucket`` near the median interval length);
- each point maps to exactly ONE bucket;
- the join becomes an EQUALITY join on (keys..., bucket) — hash
  partitioned, AQE-skew-splittable — with the exact containment
  predicate as a cheap post-filter;
- output pairs are unique by construction (a point has one bucket, an
  interval appears once per bucket), so no dedup pass is needed.

Bucket indexes are computed in exact integer microsecond arithmetic
(`(us - pmod(us, B)) / B` — exact for |us| < 2^53, i.e. to year
~2255), never double floor-division, so bucket boundaries can't drift
between the interval side and the point side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
}


def parse_bucket(bucket: str | int) -> int:
    """'90 minutes' / '6 hours' / '1 day' / raw microseconds -> µs."""
    if isinstance(bucket, int):
        if bucket <= 0:
            raise ValueError("bucket must be positive")
        return bucket
    m = re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", bucket.lower()
    )
    if not m:
        raise ValueError(f"can't parse bucket {bucket!r}")
    return int(m.group(1)) * _UNIT_US[m.group(2)]


def _us(col):
    """Exact microseconds since epoch; casts TIMESTAMP_NTZ through
    TIMESTAMP (exact under the UTC session timezone this engine pins)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _bucket_of(us_col, b: int):
    """Floor-division bucket index, exact integer arithmetic (see
    module docstring)."""
    return ((us_col - F.pmod(us_col, F.lit(b))) / F.lit(b)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | tuple[str, ...] = (),
    bucket: str | int = "1 day",
    closed: str = "left",
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with the point's timestamp inside
    the interval, equality-matched on ``keys`` first.

    ``closed='left'`` means [start, end) — the streaming/session
    convention; ``'both'`` means [start, end]. Intervals that are empty
    under the chosen convention are dropped. ``how='inner'`` returns
    matched pairs; ``'left'`` keeps unmatched points with NULL interval
    columns (a point inside k intervals still yields k rows).

    Output: every ``points`` column, then every ``intervals`` column
    except the join keys; an intervals column whose name clashes with a
    points column raises (rename before joining — silent overwrite is
    how range joins corrupt pipelines).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    b = parse_bucket(bucket)
    keys = list(keys)
    iv_out = [c for c in intervals.columns if c not in keys]
    clash = [c for c in iv_out if c in points.columns]
    if clash:
        raise ValueError(
            f"interval columns {clash} clash with point columns — rename"
        )
    # the internal bucket column would otherwise be silently overwritten
    # by withColumn — the exact corruption the clash guard exists for
    if "__ibucket" in points.columns or "__ibucket" in intervals.columns:
        raise ValueError("'__ibucket' is reserved by interval_join — rename")

    su, eu, pu = _us(start_col), _us(end_col), _us(point_ts)
    valid = (eu > su) if closed == "left" else (eu >= su)
    last_us = (eu - 1) if closed == "left" else eu
    iv = (
        intervals.where(valid)
        .withColumn(
            "__ibucket",
            F.explode(F.sequence(_bucket_of(su, b), _bucket_of(last_us, b))),
        )
        .alias("__iv")
    )
    pt = points.withColumn("__ibucket", _bucket_of(pu, b)).alias("__pt")

    # Aliased references keep self-joins (intervals derived from the
    # points table) unambiguous. The containment predicate lives IN the
    # join condition: each point carries exactly one bucket row, so a
    # left outer join emits k rows when k intervals contain the point
    # and one NULL-padded row when none does — no second pass needed.
    ppu = _us(f"__pt.{point_ts}")
    psu, peu = _us(f"__iv.{start_col}"), _us(f"__iv.{end_col}")
    contain = (ppu >= psu) & ((ppu < peu) if closed == "left" else (ppu <= peu))
    cond = F.col("__pt.__ibucket") == F.col("__iv.__ibucket")
    for k in keys:
        cond = cond & (F.col(f"__pt.{k}") == F.col(f"__iv.{k}"))
    joined = pt.join(iv, cond & contain, how)
    return joined.select(
        *[F.col(f"__pt.{c}") for c in points.columns],
        *[F.col(f"__iv.{c}") for c in iv_out],
    )
