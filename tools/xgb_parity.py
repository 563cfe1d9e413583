"""Real-XGBoost parity harness for the recursive feature-ranking engine
(r4 VERDICT "What's missing" #2).

The reference's selection behavior is DEFINED by xgboost's own split
heuristics (featurewiz/featurewiz.py:1279-1519, get_score
importance_type='total_gain' :1473-1479). This repo's default stand-in
is NumpyGBT (deterministic hist GBT with total_gain semantics,
selection/gbt.py), with the real-xgboost branch taken automatically
when the package is importable (selection/ranker.py::_train_importances).

This harness records the evidence that the two branches agree where it
matters — the SELECTED FEATURE SETS of the driver's two model-based
queries (q35 single-target, q65 multi-label), plus the per-slice
importance ORDERINGS:

    python tools/xgb_parity.py [sf_dir]      # full parity (needs xgboost)
    python tools/xgb_parity.py --self-test   # harness plumbing, no xgboost

Without xgboost installed the full mode exits 3 with the gate message —
the sandbox this repo is built in cannot pip-install, so the committed
BENCH/XGB_PARITY.md records the self-test + the exact command to run on
any host that has xgboost. Appends results to BENCH/XGB_PARITY.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

BENCH_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "XGB_PARITY.md",
)


def _fixtures(spark, sf):
    """The driver's two model-based ranking fixtures, exactly as
    __spark_entry__.py builds them (q35 / q65)."""
    from __spark_entry__ import _t

    li = _t(spark, sf, "lineitem")
    ev = (
        _t(spark, sf, "events")
        .withColumn("value2", F.col("value") * 2 + (F.col("user_id") % 7))
        .withColumn("hour", F.hour("ts"))
        .withColumn("dow", F.dayofweek("ts"))
        .withColumn("uid_mod", F.col("user_id") % 100)
    )
    return {
        "q35_recursive_ranking": (
            li, ["l_quantity", "l_discount", "l_tax", "l_linenumber"],
            "l_extendedprice", "Regression",
        ),
        "q65_multilabel_ranking": (
            ev, ["hour", "dow", "uid_mod", "event_id"], ["value", "value2"],
            "Regression",
        ),
    }


def _run_branch(use_xgb: bool, spark, sf):
    """Run both fixtures with ranker.HAS_XGBOOST forced to `use_xgb`;
    also capture the raw slice-1 importance ORDER per fixture."""
    import featurewiz_spark.selection.ranker as R
    from featurewiz_spark.selection.ranker import (
        _train_importances,
        deterministic_sample,
        recursive_feature_ranking,
    )

    prev = R.HAS_XGBOOST
    R.HAS_XGBOOST = use_xgb
    try:
        out = {}
        for name, (df, feats, target, ptype) in _fixtures(spark, sf).items():
            sel = recursive_feature_ranking(
                df, list(feats), target, ptype, sample_rows=4000
            )
            t0 = target[0] if isinstance(target, list) else target
            pdf = deterministic_sample(df, list(feats) + [t0], 4000)
            imp = _train_importances(
                pdf[feats].to_numpy(dtype=np.float64),
                pdf[t0].to_numpy(dtype=np.float64),
                ptype, 100,
            )
            order = [feats[i] for i in np.argsort(-imp, kind="stable")]
            out[name] = {"selected": sel, "importance_order": order}
        return out
    finally:
        R.HAS_XGBOOST = prev


def main() -> int:
    self_test = "--self-test" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"

    try:
        import xgboost  # noqa: F401

        has_xgb = True
        xgb_ver = xgboost.__version__
    except ImportError:
        has_xgb = False
        xgb_ver = None

    if not has_xgb and not self_test:
        print(
            "xgboost is not importable in this environment (and the build "
            "sandbox cannot pip-install). Run on a host with xgboost:\n"
            "    python tools/xgb_parity.py /path/to/sf0.01\n"
            "or validate the harness plumbing with --self-test."
        )
        return 3

    from featurewiz_spark import get_spark

    spark = get_spark("xgb_parity")
    a = _run_branch(False, spark, sf)  # NumpyGBT stand-in
    b = _run_branch(has_xgb and not self_test, spark, sf)
    label_b = "xgboost " + str(xgb_ver) if (has_xgb and not self_test) \
        else "NumpyGBT (self-test rerun)"

    lines = [
        "",
        f"## Parity run — NumpyGBT vs {label_b} "
        f"({time.strftime('%Y-%m-%d')}, sf={sf})",
        "",
        "| fixture | selected (NumpyGBT) | selected (branch B) | sets equal "
        "| importance order equal |",
        "|---|---|---|---|---|",
    ]
    all_sel_eq = True
    for name in a:
        sa, sb = a[name]["selected"], b[name]["selected"]
        oa, ob = a[name]["importance_order"], b[name]["importance_order"]
        sel_eq = set(sa) == set(sb)
        all_sel_eq &= sel_eq
        lines.append(
            f"| {name} | {', '.join(sa)} | {', '.join(sb)} | "
            f"{'YES' if sel_eq else 'NO'} | {'YES' if oa == ob else 'NO'} |"
        )
    lines += [
        "",
        "Selected-set equality is the parity criterion (the reference's "
        "output is the survivor list, not raw gains; gain VALUES differ "
        "by construction across implementations). Importance order is "
        "reported as the stricter diagnostic.",
        "",
    ]
    out = "\n".join(lines)
    print(out)
    with open(BENCH_MD, "a") as f:
        f.write(out)
    spark.stop()
    return 0 if all_sel_eq else 1


if __name__ == "__main__":
    raise SystemExit(main())
