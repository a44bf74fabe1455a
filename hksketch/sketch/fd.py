"""Frequent Directions — deterministic, mergeable matrix sketch.

The matrix analog of Misra-Gries (``sketch/mg.py``): an ``ell``-row summary
``B`` of a tall row-stream matrix ``A`` (here: an embedding column) with the
two-sided covariance guarantee

    0  ⪯  AᵀA − BᵀB  ⪯  shrink_total · I,      shrink_total ≤ ‖A‖F² / ell

so any direction's captured energy is under-estimated by at most
``shrink_total`` — queryable per sketch via ``error_bound()`` and verified
in ``tests/`` against dense AᵀA.

Published basis (not in the reference, which is HeavyKeeper-only — SURVEY
§7.6 contract: non-reference sketches adopt its param-checked-merge /
serialization / error-bound-test conventions):

- Liberty, "Simple and Deterministic Matrix Sketching", KDD 2013 (the
  shrink step: SVD, subtract the ell-th squared singular value);
- Ghashami, Liberty, Phillips, Woodruff, "Frequent Directions: Simple and
  Deterministic Matrix Sketching", SICOMP 2016 (the doubled 2·ell buffer
  for amortized O(d·ell) per row, and §3: two FD sketches MERGE by
  stacking their rows and shrinking once — bounds add).  This is the UDAF
  combine step, so the sketch rides ``global_sketch``'s no-shuffle
  partial + tree-merge plan unchanged.

Determinism: no RNG anywhere; SVD is deterministic for fixed input, and
``B`` is stored as ``diag(s)·Vᵀ`` whose Gram matrix is sign-invariant.
Exact regime: while total rows ingested ≤ buffer capacity the shrink never
fires — singular values equal dense SVD's bit-for-bit and
``error_bound() == 0`` (the regime the recompute-equality test checks).
As with MG, merge GROUPING can change the post-truncation state once
shrinks fire; the error bound is order-invariant.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .base import (
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)


def _row_matrix(values: Any) -> tuple[np.ndarray, np.ndarray | None, int]:
    """Arrow list<float> column (Array/ChunkedArray) | ndarray | nested
    lists → ``(matrix, valid_idx, n_orig)``: (n, dim) float64 matrix with
    null rows dropped, the kept rows' indices into the ORIGINAL column
    (``None`` when nothing was dropped), and the original row count — so
    callers can align per-row weights with the surviving rows."""
    if isinstance(values, np.ndarray):
        m = np.atleast_2d(np.asarray(values, dtype=np.float64))
        return m, None, len(m)
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = (
            values.combine_chunks()
            if isinstance(values, pa.ChunkedArray)
            else values
        )
        n_orig = len(arr)
        valid = None
        if arr.null_count:
            valid = np.flatnonzero(
                arr.is_valid().to_numpy(zero_copy_only=False)
            )
            arr = arr.drop_null()
        if len(arr) == 0:
            return np.empty((0, 0)), valid, n_orig
        if not pa.types.is_list(arr.type) and not pa.types.is_fixed_size_list(
            arr.type
        ):
            raise BuilderError(
                f"FrequentDirections needs a list<float> column, got {arr.type}"
            )
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(arr), -1), valid, n_orig
    m = np.atleast_2d(np.asarray(list(values), dtype=np.float64))
    return m, None, len(m)


@register_sketch("frequent_directions")
class FrequentDirections:
    """ell-direction sketch of a row-stream matrix (embedding column)."""

    def __init__(self, ell: int, dim: int | None = None):
        if not isinstance(ell, (int, np.integer)) or ell < 2:
            raise BuilderError(f"ell must be >= 2, got {ell!r}")
        if dim is not None and (not isinstance(dim, (int, np.integer)) or dim < 1):
            raise BuilderError(f"dim must be >= 1, got {dim!r}")
        self.ell = int(ell)
        self.dim = None if dim is None else int(dim)
        self.cap = 2 * self.ell  # Ghashami et al. doubled buffer
        self.B: np.ndarray | None = None  # (cap, dim), rows [0, nrows) live
        self.nrows = 0
        self.n_total = 0  # rows ingested
        self.frob_sq = 0.0  # ‖A‖F² seen
        self.shrink_total = 0.0  # Σ δ — the spectral error bound

    # -- core ------------------------------------------------------------

    def _ensure_dim(self, dim: int) -> None:
        if self.dim is None:
            self.dim = int(dim)
        elif self.dim != dim:
            raise BuilderError(f"row dim {dim} != sketch dim {self.dim}")
        if self.B is None:
            self.B = np.zeros((self.cap, self.dim), dtype=np.float64)

    def add_batch(self, vectors: Any, weights: Any | None = None) -> None:
        """Append row vectors; ``weights`` scales each row's energy (a row
        with weight w enters as √w·row, the standard weighted-row form)."""
        m, valid, n_orig = _row_matrix(vectors)
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            if len(w) != n_orig:
                raise BuilderError(
                    f"weights length {len(w)} != row count {n_orig}"
                )
            if (w < 0).any():
                raise BuilderError("row weights must be >= 0")
            if valid is not None:  # null rows dropped — keep weights aligned
                w = w[valid]
        if m.size == 0:
            return
        if weights is not None:
            m = m * np.sqrt(w)[:, None]
        self._ensure_dim(m.shape[1])
        self.n_total += len(m)
        self.frob_sq += float(np.einsum("ij,ij->", m, m))
        pos = 0
        while pos < len(m):
            take = min(self.cap - self.nrows, len(m) - pos)
            self.B[self.nrows : self.nrows + take] = m[pos : pos + take]
            self.nrows += take
            pos += take
            if self.nrows == self.cap:
                self._shrink()

    def add(self, vector: Any, weight: float = 1.0) -> None:
        self.add_batch(np.asarray(vector, dtype=np.float64)[None, :], [weight])

    def _shrink(self) -> None:
        """Liberty'13 shrink: SVD the live rows, subtract the ell-th squared
        singular value from every direction, keep ≤ ell nonzero rows."""
        if self.nrows <= self.ell:
            return
        s, Vt = np.linalg.svd(self.B[: self.nrows], full_matrices=False)[1:]
        if len(s) > self.ell:
            delta = float(s[self.ell] ** 2)
        else:
            delta = 0.0
        s2 = np.maximum(s**2 - delta, 0.0)
        keep = int(np.count_nonzero(s2[: self.ell]))
        self.B[:keep] = np.sqrt(s2[:keep, None]) * Vt[:keep]
        self.B[keep : self.nrows] = 0.0
        self.nrows = keep
        self.shrink_total += delta

    # -- queries ---------------------------------------------------------

    def singular_values(self) -> np.ndarray:
        """Descending singular values of the sketch B (≤ those of A,
        each squared value low by at most ``error_bound()``)."""
        if self.nrows == 0:
            return np.empty(0)
        return np.linalg.svd(self.B[: self.nrows], compute_uv=False)

    def directions(self, r: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Top-r (singular_values, right singular vectors (r, dim)) — the
        principal directions of the embedding stream."""
        if self.nrows == 0:
            return np.empty(0), np.empty((0, self.dim or 0))
        s, Vt = np.linalg.svd(self.B[: self.nrows], full_matrices=False)[1:]
        r = len(s) if r is None else min(int(r), len(s))
        return s[:r], Vt[:r]

    def cov_quadform(self, x: np.ndarray) -> float:
        """xᵀBᵀBx — underestimates xᵀAᵀAx by ≤ error_bound()·‖x‖²."""
        y = self.B[: self.nrows] @ np.asarray(x, dtype=np.float64)
        return float(y @ y)

    def error_bound(self) -> float:
        """Σδ: ‖AᵀA − BᵀB‖₂ ≤ this ≤ ‖A‖F²/ell (0 in the exact regime)."""
        return self.shrink_total

    def mem_bytes(self) -> int:
        return 0 if self.B is None else self.B.nbytes

    def debug(self) -> str:
        s = self.singular_values()
        return (
            f"FrequentDirections(ell={self.ell}, dim={self.dim}, "
            f"rows={self.nrows}/{self.cap}, n_total={self.n_total}, "
            f"frob_sq={self.frob_sq:.4g}, err<={self.shrink_total:.4g})\n"
            f"  top singular values: {np.round(s[:8], 4).tolist()}"
        )

    # -- merge -----------------------------------------------------------

    def _check_compatible(self, other: "FrequentDirections") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError(
                f"cannot merge {type(other).__name__} into FrequentDirections"
            )
        if self.ell != other.ell:
            raise IncompatibleSketchError(
                f"incompatible ell: {self.ell} vs {other.ell}"
            )
        if (
            self.dim is not None
            and other.dim is not None
            and self.dim != other.dim
        ):
            raise IncompatibleSketchError(
                f"incompatible dim: {self.dim} vs {other.dim}"
            )

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """SICOMP'16 §3: stack rows, shrink as the buffer refills; the
        resulting sketch satisfies the summed error bound."""
        self._check_compatible(other)
        self.n_total += other.n_total
        self.frob_sq += other.frob_sq
        self.shrink_total += other.shrink_total
        if other.nrows:
            self._ensure_dim(other.dim)
            rows = other.B[: other.nrows]
            pos = 0
            while pos < len(rows):
                take = min(self.cap - self.nrows, len(rows) - pos)
                self.B[self.nrows : self.nrows + take] = rows[pos : pos + take]
                self.nrows += take
                pos += take
                if self.nrows == self.cap:
                    self._shrink()
        return self

    # -- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        live = (
            np.empty((0,), dtype=np.float64)
            if self.B is None
            else self.B[: self.nrows].reshape(-1)
        )
        return pack_sketch(
            {
                "kind": self.KIND,
                "ell": self.ell,
                "dim": -1 if self.dim is None else self.dim,
                "nrows": self.nrows,
                "n_total": self.n_total,
                "frob_sq": self.frob_sq,
                "shrink_total": self.shrink_total,
            },
            {"rows": live},
            {},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FrequentDirections":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "FrequentDirections":
        dim = None if meta["dim"] < 0 else meta["dim"]
        self = cls(meta["ell"], dim)
        self.n_total = meta["n_total"]
        self.frob_sq = meta["frob_sq"]
        self.shrink_total = meta["shrink_total"]
        if dim is not None:
            self._ensure_dim(dim)
            n = meta["nrows"]
            if n:
                self.B[:n] = (
                    arrays["rows"].astype(np.float64).reshape(n, dim)
                )
            self.nrows = n
        return self

    def state_equal(self, other: "FrequentDirections") -> bool:
        a = None if self.B is None else self.B[: self.nrows]
        b = None if other.B is None else other.B[: other.nrows]
        return (
            self.ell == other.ell
            and self.dim == other.dim
            and self.nrows == other.nrows
            and self.shrink_total == other.shrink_total
            and (
                (a is None and b is None)
                or (a is not None and b is not None and np.array_equal(a, b))
            )
        )
