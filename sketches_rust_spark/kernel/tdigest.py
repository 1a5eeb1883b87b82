"""t-digest quantile sketch (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", arXiv 1902.04023) — the merging-digest variant.

Centroids (mean, weight) kept sorted; a merge pass bounds each centroid's
quantile span with the k1 scale function k(q) = (delta/2pi) asin(2q-1),
giving ~delta centroids and rank error that shrinks toward the tails
(where training-data pipelines care: p99/p999 latency/length cutoffs).

Fully deterministic given input order (no randomness); mergeable: merging
digests = concatenating centroid sets + one merge pass. Exact min/max are
tracked for exact q=0/q=1.

Wire format: b"TDG1" + float64 delta + uint32 n_centroids + float64 min +
float64 max + n x (mean f64, weight f64) LE.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"TDG1"


class TDigest:
    __slots__ = ("delta", "means", "weights", "_min", "_max", "buffer")

    def __init__(self, delta: float = 200.0):
        if not (delta >= 10):  # NaN fails this form; `delta < 10` would not
            raise ValueError("delta >= 10 required")
        self.delta = float(delta)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self._min = math.inf
        self._max = -math.inf
        self.buffer: list[np.ndarray] = []

    # -- build -----------------------------------------------------------------

    def accept_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.buffer.append(v)
        if sum(b.shape[0] for b in self.buffer) >= 8192:
            self._flush()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2.0 * math.pi) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1.0)

    def _flush(self) -> None:
        if not self.buffer and self.means.size:
            return
        new = np.concatenate(self.buffer) if self.buffer else np.zeros(0)
        self.buffer = []
        means = np.concatenate([self.means, new])
        weights = np.concatenate([self.weights, np.ones(new.shape[0])])
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()

        # single merge pass: greedily absorb while the k-span stays <= 1
        out_means: list[float] = []
        out_weights: list[float] = []
        cum = 0.0  # weight fully to the left of the current centroid
        cur_mean, cur_w = float(means[0]), float(weights[0])
        k_left = float(self._k(np.array([0.0]))[0])
        for i in range(1, means.shape[0]):
            proposed = cur_w + float(weights[i])
            q_right = (cum + proposed) / total
            if float(self._k(np.array([q_right]))[0]) - k_left <= 1.0:
                cur_mean += (float(means[i]) - cur_mean) * float(weights[i]) / proposed
                cur_w = proposed
            else:
                out_means.append(cur_mean)
                out_weights.append(cur_w)
                cum += cur_w
                k_left = float(self._k(np.array([cum / total]))[0])
                cur_mean, cur_w = float(means[i]), float(weights[i])
        out_means.append(cur_mean)
        out_weights.append(cur_w)
        self.means = np.array(out_means)
        self.weights = np.array(out_weights)

    # -- query -------------------------------------------------------------------

    def total_weight(self) -> float:
        self._flush()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float | None:
        self._flush()
        n = self.weights.sum()
        if n <= 0:
            return None
        if q <= 0:
            return self._min
        if q >= 1:
            return self._max
        target = q * n
        cum = np.cumsum(self.weights) - self.weights / 2.0  # centroid centers
        i = int(np.searchsorted(cum, target))
        if i == 0:
            lo_x, lo_c = self._min, 0.0
            hi_x, hi_c = float(self.means[0]), float(cum[0])
        elif i >= self.means.shape[0]:
            lo_x, lo_c = float(self.means[-1]), float(cum[-1])
            hi_x, hi_c = self._max, float(n)
        else:
            lo_x, lo_c = float(self.means[i - 1]), float(cum[i - 1])
            hi_x, hi_c = float(self.means[i]), float(cum[i])
        if hi_c == lo_c:
            return lo_x
        return lo_x + (hi_x - lo_x) * (target - lo_c) / (hi_c - lo_c)

    def cdf(self, x: float) -> float:
        self._flush()
        n = self.weights.sum()
        if n <= 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum / n, left=0.0, right=1.0))

    # -- merge / serde --------------------------------------------------------------

    def merge_with(self, other: "TDigest") -> None:
        if self.delta != other.delta:
            raise ValueError("Unmatched t-digest compression")
        other._flush()
        self._flush()
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(self.means, kind="stable")
        self.means, self.weights = self.means[order], self.weights[order]
        self.buffer = []
        self._reflush_centroids()

    def _reflush_centroids(self) -> None:
        means, weights = self.means, self.weights
        self.means = np.zeros(0)
        self.weights = np.zeros(0)
        self.buffer = []
        # re-run the merge pass over weighted centroids
        self.means, self.weights = means, weights
        saved_min, saved_max = self._min, self._max
        self._flush()
        self._min, self._max = saved_min, saved_max

    def encode(self) -> bytes:
        self._flush()
        head = _MAGIC + struct.pack("<dIdd", self.delta, self.means.shape[0],
                                    self._min, self._max)
        body = np.column_stack([self.means, self.weights]).astype("<f8").tobytes()
        return head + body

    @staticmethod
    def decode(data: bytes) -> "TDigest":
        if data[:4] != _MAGIC:
            raise ValueError("not a TDG1 blob")
        delta, n, mn, mx = struct.unpack_from("<dIdd", data, 4)
        td = TDigest(delta)
        arr = np.frombuffer(data[4 + 28:], dtype="<f8").reshape(n, 2)
        td.means = arr[:, 0].copy()
        td.weights = arr[:, 1].copy()
        td._min, td._max = mn, mx
        return td

    def decode_and_merge_with(self, data: bytes) -> None:
        self.merge_with(TDigest.decode(data))
