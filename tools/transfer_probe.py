"""At-scale probe: J4 train→test feature-transfer join at 1M+500k rows
with an unseen-heavy test side (r2 verdict item 8: one ≥10×-pytest-scale
probe per round — partition coincidences mask pairing bugs that small
tests cannot see; the r2 cogroup probe caught a real one).

Checks, against independent Spark SQL aggregates (exact arithmetic):
  1. row preservation — the broadcast transfer join must neither drop
     nor duplicate any of the 500k test rows (hot key + 60% unseen mix);
  2. seen categories carry the TRAIN frequency (count/total, same IEEE
     division the folded-window encoder now computes);
  3. unseen categories fall back to their TEST-side frequency
     (reference encoders.py:103-118 semantics);
  4. no null encodings escape.

Run: python tools/transfer_probe.py  → one JSON line + exit 0/1.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from featurewiz_spark import get_spark  # noqa: E402
from featurewiz_spark.operators.encoders import (  # noqa: E402
    apply_frequency_encoding,
    frequency_encode,
)

N_TRAIN, N_TEST = 1_000_000, 500_000


def main() -> int:
    spark = get_spark("transfer_probe", cores=8, shuffle_partitions=16)

    # train: 1000 seen categories, skewed — cat_0 holds ~20% of rows
    train = spark.range(N_TRAIN).select(
        F.when(F.col("id") % 5 == 0, F.lit("cat_0"))
        .otherwise(F.concat(F.lit("cat_"), (F.xxhash64("id") % 999 + 999) % 999 + 1))
        .alias("cat")
    )
    # test: 40% seen ids (same family), 60% UNSEEN (new_ prefix, 2000 of
    # them) — the unseen-heavy regime the reference's fallback serves
    test = spark.range(N_TEST).select(
        F.when(
            F.col("id") % 10 < 4,
            F.concat(F.lit("cat_"), (F.xxhash64("id", F.lit(7)) % 999 + 999) % 999 + 1),
        )
        .otherwise(
            F.concat(F.lit("new_"), (F.xxhash64("id", F.lit(9)) % 2000 + 2000) % 2000)
        )
        .alias("cat")
    )
    train, test = train.persist(), test.persist()
    n_train, n_test = train.count(), test.count()

    t0 = time.time()
    _, enc = frequency_encode(train, "cat")
    out = apply_frequency_encoding(test, "cat", enc).persist()
    n_out = out.count()
    elapsed = time.time() - t0

    # independent oracle: exact SQL aggregates on both sides
    train.createOrReplaceTempView("tr")
    test.createOrReplaceTempView("te")
    out.createOrReplaceTempView("enc_out")
    expected = spark.sql(
        f"""
        WITH trf AS (SELECT cat, count(*) / {n_train} AS f FROM tr GROUP BY cat),
             tef AS (SELECT cat, count(*) / {n_test} AS f FROM te GROUP BY cat)
        SELECT te.cat, coalesce(trf.f, tef.f) AS want
        FROM te LEFT JOIN trf ON te.cat = trf.cat
                LEFT JOIN tef ON te.cat = tef.cat
        """
    )
    mismatches = (
        expected.groupBy("cat", "want").count()
        .join(
            out.groupBy("cat", "cat_freq").count()
            .withColumnRenamed("count", "got_n"),
            on="cat", how="full",
        )
        .filter(
            (F.col("want") != F.col("cat_freq"))
            | F.col("want").isNull() | F.col("cat_freq").isNull()
            | (F.col("count") != F.col("got_n"))
        )
        .count()
    )
    nulls = out.filter(F.col("cat_freq").isNull()).count()
    n_unseen = test.join(train.distinct(), on="cat", how="left_anti").count()

    ok = (n_out == n_test) and mismatches == 0 and nulls == 0
    print(json.dumps({
        "rows_train": n_train, "rows_test": n_test, "rows_out": n_out,
        "unseen_test_rows": n_unseen, "value_mismatch_groups": mismatches,
        "null_encodings": nulls, "transfer_sec": round(elapsed, 2),
        "ok": ok,
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
