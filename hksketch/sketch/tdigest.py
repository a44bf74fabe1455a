"""t-digest — mergeable quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", 2019; merging-digest form).

Not in the reference repo (SURVEY.md §2.7); adopts its contracts
(param-checked merge, serialization, mem accounting).  Deterministic: no RNG —
compression is a greedy sorted merge bounded by the scale-function weight
limit ``4·W·q(1−q)/δ`` (the widely used k1-equivalent bound).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import (
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)


@register_sketch("tdigest")
class TDigest:
    def __init__(self, compression: float = 100.0):
        if not isinstance(compression, (int, float)) or compression < 10:
            raise BuilderError(f"compression must be >= 10, got {compression!r}")
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buffered = 0

    def add_batch(self, values: Any, weights: Any | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        if weights is None:
            w = np.ones(len(v), dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)[: len(v)]
        self._buf_v.append(v)
        self._buf_w.append(w)
        self._buffered += len(v)
        if self._buffered > 10 * self.compression:
            self._compress()

    def add(self, value: float, weight: float = 1.0) -> None:
        self.add_batch([value], [weight])

    def _compress(self) -> None:
        if self._buffered == 0 and len(self.means) <= self.compression * 2:
            return
        vs = [self.means] + self._buf_v
        ws = [self.weights] + self._buf_w
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        self._buf_v, self._buf_w, self._buffered = [], [], 0
        if len(v) == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        W = float(w.sum())
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(v[0]), float(w[0])
        w_so_far = 0.0
        c = self.compression
        for i in range(1, len(v)):
            q = (w_so_far + (cur_w + float(w[i])) / 2.0) / W
            limit = 4.0 * W * q * (1.0 - q) / c
            if cur_w + float(w[i]) <= limit:
                tot = cur_w + float(w[i])
                cur_m += (float(v[i]) - cur_m) * float(w[i]) / tot
                cur_w = tot
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = float(v[i]), float(w[i])
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m, dtype=np.float64)
        self.weights = np.array(out_w, dtype=np.float64)

    def quantile(self, q: float) -> float:
        """Estimate the q-quantile (0 ≤ q ≤ 1) by centroid interpolation."""
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        W = float(self.weights.sum())
        target = q * W
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) + sum(float(w.sum()) for w in self._buf_w)

    def _check_compatible(self, other: "TDigest") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.compression != other.compression:
            raise IncompatibleSketchError(
                f"incompatible compression: {self.compression} vs {other.compression}"
            )

    def merge(self, other: "TDigest") -> "TDigest":
        self._check_compatible(other)
        other._compress()
        if len(other.means):
            self._buf_v.append(other.means.copy())
            self._buf_w.append(other.weights.copy())
            self._buffered += len(other.means)
        self._compress()
        return self

    def mem_bytes(self) -> int:
        return int(
            self.means.nbytes
            + self.weights.nbytes
            + sum(a.nbytes for a in self._buf_v)
            + sum(a.nbytes for a in self._buf_w)
        )

    def to_bytes(self) -> bytes:
        self._compress()
        return pack_sketch(
            {"kind": self.KIND, "compression": self.compression},
            {"means": self.means, "weights": self.weights},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "TDigest":
        self = cls(meta["compression"])
        self.means = arrays["means"]
        self.weights = arrays["weights"]
        return self

    def state_equal(self, other: "TDigest") -> bool:
        self._compress()
        other._compress()
        return np.array_equal(self.means, other.means) and np.array_equal(
            self.weights, other.weights
        )
