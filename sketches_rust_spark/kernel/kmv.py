"""KMV (k-minimum-values) / bottom-k theta sketch.

Keeps the k smallest distinct 64-bit hash values of a set. Supports:

* distinct-count estimate: exact below k; above, the classic KMV estimator
  ``(k - 1) * 2^64 / h_(k)`` where ``h_(k)`` is the k-th smallest hash
  (relative standard error ~ 1/sqrt(k - 2));
* lossless union (merge): the bottom-k of a union is contained in the
  union of the two bottom-k sets, so merge = union + trim — associative,
  commutative, idempotent;
* SET INTERSECTION estimate (the capability HLL lacks): with
  theta = min(theta_A, theta_B) (theta_X = h_(k) of X, or 2^64 when X holds
  fewer than k values), the stored hashes below theta are a uniform sample
  of each set restricted to [0, theta), so
  ``|A ∩ B| ≈ |{h in stored(A) ∩ stored(B) : h < theta}| * 2^64 / theta``
  (the theta-sketch estimator).

Everything is a deterministic function of the distinct hash set, so sketches
built with the SplitMix64 portable hash admit EXACT DuckDB oracles (bottom-k
= ORDER BY hash LIMIT k).

Wire format: b"KMV1" + varint k + varint n + n raw little-endian u64
(ascending). Mergeable across engines that share the hash.
"""

from __future__ import annotations

import numpy as np

from .serde import Input, decode_unsigned_var_long, encode_unsigned_var_long

_MAGIC = b"KMV1"
_TWO64 = 2.0 ** 64


class KMV:
    __slots__ = ("k", "hashes")

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        # ascending, distinct uint64 values; at most k of them
        self.hashes = np.empty(0, dtype=np.uint64)

    # -- build -----------------------------------------------------------------

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        if h.size == 0:
            return
        merged = np.union1d(self.hashes, h)  # sorted + distinct
        self.hashes = merged[: self.k]

    # -- queries ---------------------------------------------------------------

    def theta(self) -> int:
        """Exclusive sampling bound: stored hashes < theta are a uniform
        sample of the set restricted to [0, theta). 2^64 when not full."""
        if self.hashes.shape[0] < self.k:
            return 1 << 64
        return int(self.hashes[self.k - 1])

    def estimate(self) -> float:
        n = self.hashes.shape[0]
        if n < self.k:
            return float(n)  # exact: every distinct hash is retained
        hk = float(self.hashes[self.k - 1])
        return (self.k - 1) * _TWO64 / hk

    def relative_standard_error(self) -> float:
        return 1.0 / float(np.sqrt(self.k - 2))

    def intersection_estimate(self, other: "KMV") -> float:
        """Theta-sketch intersection: count common retained hashes below the
        smaller theta, scale by 2^64/theta. Exact when both sides are below
        capacity (theta = 2^64 -> scale 1, count is the true intersection of
        the full hash sets)."""
        theta = min(self.theta(), other.theta())
        if theta < (1 << 64):
            t = np.uint64(theta)
            a = self.hashes[self.hashes < t]
            b = other.hashes[other.hashes < t]
        else:  # neither side full: both retain their complete hash sets
            a, b = self.hashes, other.hashes
        common = int(np.intersect1d(a, b).shape[0])
        return common * _TWO64 / float(theta)

    def difference_estimate(self, other: "KMV") -> float:
        """Theta-sketch set difference |self ∖ other|: count retained hashes
        below the common theta that are in self but NOT in other, scale by
        2^64/theta (both retained sets are uniform samples of their sets
        restricted to [0, theta), so the set difference of the samples is a
        uniform sample of the set difference). Exact when both sides are
        below capacity. Completes the theta algebra: union (merge_with),
        intersection, difference."""
        theta = min(self.theta(), other.theta())
        if theta < (1 << 64):
            t = np.uint64(theta)
            a = self.hashes[self.hashes < t]
            b = other.hashes[other.hashes < t]
        else:
            a, b = self.hashes, other.hashes
        only = int(np.setdiff1d(a, b).shape[0])
        return only * _TWO64 / float(theta)

    # -- merge -----------------------------------------------------------------

    def merge_with(self, other: "KMV") -> None:
        if self.k != other.k:
            raise ValueError("Unmatched KMV k")
        merged = np.union1d(self.hashes, other.hashes)
        self.hashes = merged[: self.k]

    # -- serde -----------------------------------------------------------------

    def encode(self) -> bytes:
        buf = bytearray(_MAGIC)
        encode_unsigned_var_long(buf, self.k)
        encode_unsigned_var_long(buf, int(self.hashes.shape[0]))
        buf += self.hashes.astype("<u8").tobytes()
        return bytes(buf)

    @staticmethod
    def decode(data: bytes) -> "KMV":
        if data[:4] != _MAGIC:
            raise ValueError("not a KMV1 blob")
        inp = Input(data[4:])
        k = decode_unsigned_var_long(inp)
        n = decode_unsigned_var_long(inp)
        sk = KMV(k)
        raw = inp.buffer()[inp.tell():inp.tell() + 8 * n]
        if len(raw) != 8 * n:
            raise ValueError("corrupt KMV blob")
        if n > k:
            raise ValueError(f"corrupt KMV blob: {n} hashes exceed k={k}")
        hashes = np.frombuffer(raw, dtype="<u8").astype(np.uint64)
        # theta()/estimate() index hashes[k-1] assuming ascending distinct
        # order; a foreign blob violating it would give silently wrong
        # estimates after decode_and_merge_with
        if n > 1 and not (hashes[:-1] < hashes[1:]).all():
            raise ValueError("corrupt KMV blob: hashes not strictly ascending")
        sk.hashes = hashes
        return sk

    def decode_and_merge_with(self, data: bytes) -> None:
        self.merge_with(KMV.decode(data))
