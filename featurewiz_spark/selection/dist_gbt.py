"""Distributed histogram gradient-boosted trees — the full-data ranking
path (r3 verdict item 6).

`recursive_feature_ranking` trains, by default, on a deterministic
10k-row driver sample — faithful to the reference's own row cap
(featurewiz/featurewiz.py:1372-1375) but at 100 TB selection quality is
pinned to 10k rows. This module trains the SAME ranking model over the
entire DataFrame without ever collecting rows:

* one pass bins every feature to ``n_bins`` quantile buckets
  (edges from a single ``approx_percentile`` aggregate job), persisted
  as a compact ``array<int>`` + label frame;
* per tree level, ONE mapInPandas pass re-derives each row's gradient
  pair from the broadcast ensemble (vectorized numpy tree apply on the
  binned codes — no per-row Python), assigns the row to its frontier
  node, and emits per-(node, feature, bin) partial histogram rows;
* partials aggregate with a tiny ``groupBy().sum()`` (map-side combine;
  result ≤ nodes×features×bins rows) and collect to the driver, which
  picks best splits exactly as :class:`NumpyGBT` does.

Determinism at any parallelism: gradients are quantized to int64
(scale 2**24) BEFORE summation, so histogram aggregation is exact
integer arithmetic — associative and commutative — and the chosen
splits are bit-identical across partition counts and cluster sizes
(float partial sums would tie-flip). Precision 2**-24 ≈ 6e-8 per row is
far below any split-gain decision margin; the overflow budget is
2**63/2**24 ≈ 5.5e11 row-gradient-units per (node, feature, bin) cell.

Spark-job budget: rounds × max_depth histogram passes over the cached
binned frame (the standard price of distributed GBT — Spark MLlib's own
GBT does the same); each pass is scan + small shuffle, no wide state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_QSCALE = float(2**24)


def _grad_hess(y: np.ndarray, pred: np.ndarray, objective: str):
    if objective == "reg:squarederror":
        return pred - y, np.ones_like(y)
    if objective in ("binary:logistic", "multi:softmax"):
        p = 1.0 / (1.0 + np.exp(-pred))
        return p - y, np.maximum(p * (1 - p), 1e-6)
    raise ValueError(objective)


def _apply_trees(Xb: np.ndarray, trees: list, base: float, lr: float):
    """Vectorized ensemble apply on binned codes. Each tree is a dict
    node_id -> (feat, bin) for internal nodes or ('leaf', value);
    children of i are 2i+1 (<= bin) / 2i+2 (> bin)."""
    pred = np.full(Xb.shape[0], base)
    for tree in trees:
        node = np.zeros(Xb.shape[0], dtype=np.int64)
        active = np.ones(Xb.shape[0], dtype=bool)
        while active.any():
            done = np.zeros_like(active)
            for nid in np.unique(node[active]):
                kind, a, b = tree[int(nid)]
                mask = active & (node == nid)
                if kind == "leaf":
                    pred[mask] += lr * b
                    done |= mask
                else:
                    go_left = mask & (Xb[:, a] <= b)
                    node[go_left] = 2 * nid + 1
                    node[mask & ~go_left] = 2 * nid + 2
            active &= ~done
    return pred


def _assign_nodes(Xb: np.ndarray, tree: dict):
    """Route rows through a PARTIAL tree; rows reaching an internal node
    with no children yet stop there (the frontier)."""
    node = np.zeros(Xb.shape[0], dtype=np.int64)
    moved = True
    while moved:
        moved = False
        for nid in np.unique(node):
            entry = tree.get(int(nid))
            if entry is None or entry[0] != "split":
                continue
            _, feat, b = entry
            mask = node == nid
            go_left = mask & (Xb[:, feat] <= b)
            node[go_left] = 2 * nid + 1
            node[mask & ~go_left] = 2 * nid + 2
            moved = True
    return node


class SparkGBT:
    """Distributed twin of :class:`NumpyGBT` (same objectives, same
    split rule, same total_gain importance semantics)."""

    def __init__(
        self,
        objective: str = "reg:squarederror",
        n_rounds: int = 20,
        max_depth: int = 6,
        learning_rate: float = 0.3,
        min_child_weight: float = 1.0,
        reg_lambda: float = 1.0,
        n_bins: int = 64,
    ):
        self.objective = objective
        self.n_rounds = n_rounds
        self.max_depth = max_depth
        self.lr = learning_rate
        self.min_child_weight = min_child_weight
        self.reg_lambda = reg_lambda
        self.n_bins = n_bins
        self.total_gain_: np.ndarray | None = None
        self.trees_: list = []
        self.base_: float = 0.0

    # ------------------------------------------------------------------
    def _edge_sample(
        self, df: DataFrame, cols: list[str], target: str
    ) -> pd.DataFrame:
        """Deterministic hash-ordered sample (the xgboost/lightgbm
        design: edges — and here also the target's affine scaling — from
        a sketch/sample, gradient statistics from EVERY row). NOT
        approx_percentile / avg(): sketch-merge and float-sum order vary
        with partitioning, so edges and the y-scale — and therefore
        split gains — would drift across cluster sizes. Delegates to
        ranker.deterministic_sample (ONE copy of the hash-ordered-top-n
        invariance argument to keep correct)."""
        from featurewiz_spark.selection.ranker import deterministic_sample

        sel = cols + [target]
        return deterministic_sample(
            df.select(*[F.col(c).cast("double").alias(c) for c in sel]),
            sel,
            65536,
        )

    def _bin_edges(
        self, sample: pd.DataFrame, cols: list[str]
    ) -> list[np.ndarray]:
        probs = np.linspace(0, 1, self.n_bins + 1)[1:-1]
        edges = []
        for c in cols:
            x = sample[c].to_numpy(dtype=np.float64)
            x = x[~np.isnan(x)]
            edges.append(
                np.unique(np.quantile(x, probs)) if len(x) else np.array([])
            )
        return edges

    def _binned(
        self, df: DataFrame, cols: list[str], target: str,
        edges: list[np.ndarray],
    ) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField("b", T.ArrayType(T.IntegerType()), False),
                T.StructField("y", T.DoubleType(), True),
            ]
        )
        n_feat = len(cols)

        def binit(batches):
            for pdf in batches:
                n = len(pdf)
                Xb = np.zeros((n, n_feat), dtype=np.int32)
                for j, c in enumerate(cols):
                    x = pdf[c].to_numpy(dtype=np.float64, na_value=0.0)
                    if len(edges[j]):
                        Xb[:, j] = np.searchsorted(edges[j], x, side="left")
                yield pd.DataFrame(
                    {
                        "b": list(Xb),
                        "y": pdf[target].to_numpy(dtype=np.float64),
                    }
                )

        src = df.select(
            *[F.col(c).cast("double").alias(c) for c in cols],
            F.col(target).cast("double").alias(target),
        ).na.drop(subset=[target])
        return src.mapInPandas(binit, schema=schema)

    # ------------------------------------------------------------------
    def _hist_level(self, binned, tree, frontier, n_feat):
        """One histogram pass: per-(node, feature, bin) int64 gradient
        sums for every frontier node. Map-side emits only non-zero
        cells; groupBy().sum() is exact integer aggregation."""
        trees = self.trees_
        base, lr, objective = self.base_, self.lr, self.objective
        tree_bc = dict(tree)
        frontier_set = set(frontier)
        schema = T.StructType(
            [
                T.StructField("node", T.LongType(), False),
                T.StructField("feat", T.IntegerType(), False),
                T.StructField("bin", T.IntegerType(), False),
                T.StructField("g", T.LongType(), False),
                T.StructField("h", T.LongType(), False),
                T.StructField("cnt", T.LongType(), False),
            ]
        )

        def part(batches):
            acc: dict = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                Xb = np.stack(pdf["b"].to_numpy())
                y = pdf["y"].to_numpy(dtype=np.float64)
                pred = _apply_trees(Xb, trees, base, lr)
                g, h = _grad_hess(y, pred, objective)
                gq = np.rint(g * _QSCALE).astype(np.int64)
                hq = np.rint(h * _QSCALE).astype(np.int64)
                node = _assign_nodes(Xb, tree_bc)
                for nid in np.unique(node):
                    if int(nid) not in frontier_set:
                        continue
                    m = node == nid
                    sub, gs, hs = Xb[m], gq[m], hq[m]
                    for j in range(n_feat):
                        bj = sub[:, j]
                        nb = int(bj.max()) + 1 if len(bj) else 1
                        # np.add.at on int64 buffers, NOT bincount
                        # weights= — bincount casts weights to float64,
                        # which is exact only to 2^53 and would quietly
                        # void the whole int64-determinism invariant at
                        # ~5e8 row-gradient-units per partition cell
                        gh = np.zeros(nb, dtype=np.int64)
                        hh = np.zeros(nb, dtype=np.int64)
                        np.add.at(gh, bj, gs)
                        np.add.at(hh, bj, hs)
                        cc = np.bincount(bj, minlength=nb)
                        for b in np.nonzero(cc)[0]:
                            key = (int(nid), j, int(b))
                            cur = acc.get(key)
                            if cur is None:
                                acc[key] = [int(gh[b]), int(hh[b]), int(cc[b])]
                            else:
                                cur[0] += int(gh[b])
                                cur[1] += int(hh[b])
                                cur[2] += int(cc[b])
            if acc:
                keys = list(acc.keys())
                yield pd.DataFrame(
                    {
                        "node": [k[0] for k in keys],
                        "feat": [k[1] for k in keys],
                        "bin": [k[2] for k in keys],
                        "g": [acc[k][0] for k in keys],
                        "h": [acc[k][1] for k in keys],
                        "cnt": [acc[k][2] for k in keys],
                    }
                )

        out = (
            binned.mapInPandas(part, schema=schema)
            .groupBy("node", "feat", "bin")
            .agg(
                F.sum("g").alias("g"),
                F.sum("h").alias("h"),
                F.sum("cnt").alias("cnt"),
            )
            .collect()
        )
        # keep QUANTIZED INT sums all the way into the split search:
        # collect() row order is nondeterministic, and float re-sums of
        # the per-bin values in dict order would drift across runs. Ints
        # sum exactly in any order; _best_split converts each exact sum
        # to float once, at the point of use.
        hists: dict = {}
        for r in out:
            hists.setdefault(int(r["node"]), {}).setdefault(int(r["feat"]), {})[
                int(r["bin"])
            ] = (int(r["g"]), int(r["h"]))
        return hists

    # ------------------------------------------------------------------
    def _best_split(self, feat_hists: dict, n_feat: int):
        """Same rule + tie-break as NumpyGBT._build_tree: max gain, ties
        to lower (feature, bin)."""
        lam, mcw = self.reg_lambda, self.min_child_weight
        any_f = next(iter(feat_hists.values()))
        # exact int64 totals (order-free), converted to float ONCE
        Gi = sum(g for g, _ in any_f.values())
        Hi = sum(h for _, h in any_f.values())
        G, H = Gi / _QSCALE, Hi / _QSCALE
        parent = G * G / (H + lam)
        best = (0.0, -1, -1, 0.0, 0.0)
        for j in range(n_feat):
            bins = feat_hists.get(j)
            if not bins or len(bins) <= 1:
                continue
            order = sorted(bins)
            gli = hli = 0
            for b in order[:-1]:
                gli += bins[b][0]
                hli += bins[b][1]
                gl, hl = gli / _QSCALE, hli / _QSCALE
                hr = H - hl
                if hl < mcw or hr < mcw:
                    continue
                gr = G - gl
                gain = gl * gl / (hl + lam) + gr * gr / (hr + lam) - parent
                if gain > best[0] + 1e-12:
                    best = (gain, j, b, gl, hl)
        return G, H, best

    def fit(self, df: DataFrame, feature_cols: list[str], target: str):
        n_feat = len(feature_cols)
        self.total_gain_ = np.zeros(n_feat)
        sample = self._edge_sample(df, feature_cols, target)
        ys = sample[target].to_numpy(dtype=np.float64)
        ys = ys[~np.isnan(ys)]
        if not len(ys):
            raise ValueError("no rows with a non-null target")
        edges = self._bin_edges(sample, feature_cols)
        src = self._binned(df, feature_cols, target, edges)
        if self.objective == "reg:squarederror":
            # Standardize y internally (affine transform from the SAME
            # deterministic sample as the edges — exact aggregates would
            # re-import float-sum partition-order noise): raw-magnitude
            # targets make |g| ~ |y|, and int64-quantized histogram
            # cells budget rows_per_cell × |g| × 2^24 < 2^63 — a
            # billion-row node on a 5-digit target would overflow. Gains
            # scale by s² UNIFORMLY (G²/(H+λ): H is y-invariant), so
            # split choices, tree structure, and the importance ORDERING
            # the ranking consumes are unchanged; total_gain_ is
            # reported in standardized units.
            m = float(ys.mean())
            s = float(ys.std()) or 1.0
            src = src.withColumn("y", (F.col("y") - F.lit(m)) / F.lit(s))
            self.base_ = 0.0
        else:
            p = min(max(float(ys.mean()), 1e-6), 1 - 1e-6)
            self.base_ = math.log(p / (1 - p))
        binned = src.persist()
        try:
            self.trees_ = []
            for _ in range(self.n_rounds):
                tree: dict = {}
                frontier = [0]
                node_gh: dict = {}
                for depth in range(self.max_depth):
                    if not frontier:
                        break
                    hists = self._hist_level(binned, tree, frontier, n_feat)
                    nxt = []
                    for nid in frontier:
                        fh = hists.get(nid)
                        if fh is None:  # no rows reached this node
                            tree[nid] = ("leaf", None, 0.0)
                            continue
                        G, H, (gain, j, b, gl, hl) = self._best_split(
                            fh, n_feat
                        )
                        node_gh[nid] = (G, H)
                        if j < 0 or gain <= 0 or H < 2 * self.min_child_weight:
                            tree[nid] = (
                                "leaf",
                                None,
                                -G / (H + self.reg_lambda),
                            )
                            continue
                        self.total_gain_[j] += gain
                        tree[nid] = ("split", j, b)
                        node_gh[2 * nid + 1] = (gl, hl)
                        node_gh[2 * nid + 2] = (G - gl, H - hl)
                        nxt += [2 * nid + 1, 2 * nid + 2]
                    frontier = nxt
                for nid in frontier:  # depth-capped nodes become leaves
                    G, H = node_gh[nid]
                    tree[nid] = ("leaf", None, -G / (H + self.reg_lambda))
                self.trees_.append(tree)
        finally:
            binned.unpersist()
        return self

    def feature_importances(self) -> np.ndarray:
        return self.total_gain_.copy()
