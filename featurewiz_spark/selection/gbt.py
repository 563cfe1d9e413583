"""Minimal deterministic histogram gradient-boosted trees in pure numpy.

Stand-in for XGBoost (not installed in this container) inside the
recursive feature-ranking loop (reference FE_perform_recursive_xgboost,
featurewiz/featurewiz.py:1279-1519). Mirrors the parts that matter for
ranking semantics: 'hist' tree growth, total_gain feature importance
(get_score(importance_type='total_gain'), featurewiz.py:1473-1479),
squared-error / logistic objectives, deterministic ties.

Not a general ML library: depth-limited exact greedy over 256-bin
histograms, no regularization schedule, no early stopping.
"""

from __future__ import annotations

import numpy as np

try:  # prefer real XGBoost when available
    import xgboost  # noqa: F401

    HAS_XGBOOST = True
except ImportError:
    HAS_XGBOOST = False


class NumpyGBT:
    def __init__(
        self,
        objective: str = "reg:squarederror",
        n_rounds: int = 100,
        max_depth: int = 6,
        learning_rate: float = 0.3,
        min_child_weight: float = 1.0,
        reg_lambda: float = 1.0,
        n_bins: int = 256,
    ):
        self.objective = objective
        self.n_rounds = n_rounds
        self.max_depth = max_depth
        self.lr = learning_rate
        self.min_child_weight = min_child_weight
        self.reg_lambda = reg_lambda
        self.n_bins = n_bins
        self.total_gain_: np.ndarray | None = None

    # --- gradients -------------------------------------------------------
    def _grad_hess(self, y: np.ndarray, pred: np.ndarray):
        if self.objective == "reg:squarederror":
            return pred - y, np.ones_like(y)
        if self.objective in ("binary:logistic", "multi:softmax"):
            p = 1.0 / (1.0 + np.exp(-pred))
            return p - y, np.maximum(p * (1 - p), 1e-6)
        raise ValueError(self.objective)

    # --- binning ----------------------------------------------------------
    def _bin(self, X: np.ndarray):
        nb = self.n_bins
        edges = []
        Xb = np.empty(X.shape, dtype=np.int32)
        for j in range(X.shape[1]):
            qs = np.quantile(X[:, j], np.linspace(0, 1, nb + 1)[1:-1])
            e = np.unique(qs)
            edges.append(e)
            Xb[:, j] = np.searchsorted(e, X[:, j], side="left")
        return Xb, edges

    def _build_tree(self, Xb, g, h, depth, node_idx, gain_acc):
        """Greedy best-split on binned features; returns leaf assignment
        deltas. Deterministic: ties broken by (feature idx, bin idx)."""
        n, k = Xb.shape
        G, H = g[node_idx].sum(), h[node_idx].sum()
        if depth >= self.max_depth or H < 2 * self.min_child_weight:
            return [(node_idx, -G / (H + self.reg_lambda))]
        parent_score = G * G / (H + self.reg_lambda)
        best = (0.0, -1, -1)
        sub = Xb[node_idx]
        gs, hs = g[node_idx], h[node_idx]
        for j in range(k):
            nb = sub[:, j].max() + 1
            if nb <= 1:
                continue
            gh = np.zeros(nb)
            hh = np.zeros(nb)
            np.add.at(gh, sub[:, j], gs)
            np.add.at(hh, sub[:, j], hs)
            gl = np.cumsum(gh)[:-1]
            hl = np.cumsum(hh)[:-1]
            gr, hr = G - gl, H - hl
            ok = (hl >= self.min_child_weight) & (hr >= self.min_child_weight)
            if not ok.any():
                continue
            gains = np.where(
                ok,
                gl**2 / (hl + self.reg_lambda)
                + gr**2 / (hr + self.reg_lambda)
                - parent_score,
                -np.inf,
            )
            b = int(np.argmax(gains))
            if gains[b] > best[0] + 1e-12:
                best = (float(gains[b]), j, b)
        gain, j, b = best
        if j < 0 or gain <= 0:
            return [(node_idx, -G / (H + self.reg_lambda))]
        gain_acc[j] += gain
        mask = sub[:, j] <= b
        left = node_idx[mask]
        right = node_idx[~mask]
        return self._build_tree(Xb, g, h, depth + 1, left, gain_acc) + self._build_tree(
            Xb, g, h, depth + 1, right, gain_acc
        )

    def fit(self, X: np.ndarray, y: np.ndarray):
        X = np.asarray(X, dtype=np.float64)
        X = np.nan_to_num(X, nan=0.0)
        y = np.asarray(y, dtype=np.float64)
        Xb, _ = self._bin(X)
        n, k = X.shape
        self.total_gain_ = np.zeros(k)
        if self.objective == "reg:squarederror":
            base = y.mean()
        else:
            p = np.clip(y.mean(), 1e-6, 1 - 1e-6)
            base = np.log(p / (1 - p))
        pred = np.full(n, base)
        all_idx = np.arange(n)
        for _ in range(self.n_rounds):
            g, h = self._grad_hess(y, pred)
            leaves = self._build_tree(Xb, g, h, 0, all_idx, self.total_gain_)
            for idx, val in leaves:
                pred[idx] += self.lr * val
        return self

    def feature_importances(self) -> np.ndarray:
        """total_gain per feature (xgboost get_score semantics)."""
        return self.total_gain_.copy()
