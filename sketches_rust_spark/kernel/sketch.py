"""DDSketch: relative-error quantile sketch (DDSketch, VLDB 2019, arXiv
1908.10693).

From-scratch Python/numpy implementation with the same observable behavior and
byte-identical wire format as the reference library (behavioral spec:
/root/reference/src/sketch.rs). It is a pure in-memory kernel with zero Spark
imports — the Spark integration in ``sketches_rust_spark.functions`` wraps it
in pandas/Arrow UDAFs.

Structure: a two-sided sketch — negative values indexed by magnitude into a
separate store, an exact zero bucket for |v| <= min_indexed_value, a positive
store for the rest (spec sketch.rs:12-19,34-56).

Reference quirks handled deliberately (SURVEY.md §8):
* Q1: the reference's ``accept_with_count`` ignores its count argument; we
  implement true weighted insert (``accept_many`` with weights), which the
  reference's own merge path (``add_bin``) also does.
* Q4: ``decode`` materializes unbounded stores regardless of the encoder's
  store type; ``decode_and_merge_with`` preserves the receiver's store type.
* Q5: foreign COUNT/SUM/MIN/MAX feature blocks are parsed and skipped for
  sketches-java stream compatibility (spec serde.rs:99-109).
"""

from __future__ import annotations

import numpy as np

from . import serde
from .mapping import LOG, LOG_CUBIC, IndexMapping
from .serde import Input
from .store import (
    COLLAPSING_HIGHEST,
    COLLAPSING_LOWEST,
    FLAG_TYPE_NEGATIVE_STORE,
    FLAG_TYPE_POSITIVE_STORE,
    UNBOUNDED,
    DenseStore,
    bin_encoding_mode_of_flag,
)

# Feature flags (spec sketch.rs:416-421): marker = type | (sub_flag << 2).
FLAG_ZERO_COUNT = 0b00 | (1 << 2)        # 0x04
FLAG_COUNT = 0b00 | (0x28 << 2) & 0xFF   # 0xA0
FLAG_SUM = 0b00 | (0x21 << 2) & 0xFF     # 0x84
FLAG_MIN = 0b00 | (0x22 << 2) & 0xFF     # 0x88
FLAG_MAX = 0b00 | (0x23 << 2) & 0xFF     # 0x8C


class DDSketch:
    __slots__ = (
        "index_mapping",
        "min_indexed_value",
        "max_indexed_value",
        "negative_value_store",
        "positive_value_store",
        "zero_count",
    )

    def __init__(self, index_mapping: IndexMapping, negative_store: DenseStore,
                 positive_store: DenseStore, zero_count: float = 0.0):
        self.index_mapping = index_mapping
        self.min_indexed_value = max(0.0, index_mapping.min_indexable_value())
        self.max_indexed_value = index_mapping.max_indexable_value()
        self.negative_value_store = negative_store
        self.positive_value_store = positive_store
        self.zero_count = zero_count

    # -- factories (spec sketch.rs:297-414) ----------------------------------

    @staticmethod
    def collapsing_lowest_dense(relative_accuracy: float, max_num_bins: int) -> "DDSketch":
        m = IndexMapping.with_relative_accuracy(LOG_CUBIC, relative_accuracy)
        return DDSketch(m, DenseStore(COLLAPSING_LOWEST, max_num_bins),
                        DenseStore(COLLAPSING_LOWEST, max_num_bins))

    @staticmethod
    def collapsing_highest_dense(relative_accuracy: float, max_num_bins: int) -> "DDSketch":
        m = IndexMapping.with_relative_accuracy(LOG_CUBIC, relative_accuracy)
        return DDSketch(m, DenseStore(COLLAPSING_HIGHEST, max_num_bins),
                        DenseStore(COLLAPSING_HIGHEST, max_num_bins))

    @staticmethod
    def unbounded_dense(relative_accuracy: float) -> "DDSketch":
        m = IndexMapping.with_relative_accuracy(LOG_CUBIC, relative_accuracy)
        return DDSketch(m, DenseStore(UNBOUNDED), DenseStore(UNBOUNDED))

    @staticmethod
    def logarithmic_collapsing_lowest_dense(relative_accuracy: float, max_num_bins: int) -> "DDSketch":
        m = IndexMapping.with_relative_accuracy(LOG, relative_accuracy)
        return DDSketch(m, DenseStore(COLLAPSING_LOWEST, max_num_bins),
                        DenseStore(COLLAPSING_LOWEST, max_num_bins))

    @staticmethod
    def logarithmic_collapsing_highest_dense(relative_accuracy: float, max_num_bins: int) -> "DDSketch":
        m = IndexMapping.with_relative_accuracy(LOG, relative_accuracy)
        return DDSketch(m, DenseStore(COLLAPSING_HIGHEST, max_num_bins),
                        DenseStore(COLLAPSING_HIGHEST, max_num_bins))

    @staticmethod
    def logarithmic_unbounded_size_dense_store(relative_accuracy: float) -> "DDSketch":
        m = IndexMapping.with_relative_accuracy(LOG, relative_accuracy)
        return DDSketch(m, DenseStore(UNBOUNDED), DenseStore(UNBOUNDED))

    PRESETS = (
        "collapsing_lowest_dense",
        "collapsing_highest_dense",
        "unbounded_dense",
        "logarithmic_collapsing_lowest_dense",
        "logarithmic_collapsing_highest_dense",
        "logarithmic_unbounded_size_dense_store",
    )

    @staticmethod
    def preset(name: str, relative_accuracy: float, max_num_bins: int = 0) -> "DDSketch":
        factory = getattr(DDSketch, name)
        if name in ("unbounded_dense", "logarithmic_unbounded_size_dense_store"):
            return factory(relative_accuracy)
        return factory(relative_accuracy, max_num_bins)

    # -- build ----------------------------------------------------------------

    def accept(self, value: float, count: float = 1.0) -> None:
        self.accept_many(np.array([value], dtype=np.float64),
                         np.array([count], dtype=np.float64))

    def accept_many(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Vectorized build: route a whole array of values in one pass.

        Semantics preserved from the reference accept (spec sketch.rs:38-56):
        out-of-range magnitudes silently dropped; near-zero values land in the
        exact zero bucket; non-positive weights dropped. Unlike the reference
        (quirk Q1) the weight is honored.
        """
        v = np.asarray(values, dtype=np.float64)
        if weights is None:
            w = np.ones(v.shape[0], dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)

        # Non-finite values are dropped along with out-of-range magnitudes.
        # (Deviation from the reference, which keeps +-inf because its
        # `inf > max_indexed_value` guard compares inf > inf: under the LOG
        # mapping that is pathological — ln(inf) has no bucket — so we extend
        # the documented "out-of-range values are silently dropped" rule,
        # spec sketch.rs:43-45, to non-finite input.)
        keep = (w > 0.0) & np.isfinite(v) & (np.abs(v) <= self.max_indexed_value)
        v = v[keep]
        w = w[keep]
        if v.size == 0:
            return

        pos = v > self.min_indexed_value
        neg = v < -self.min_indexed_value
        zero = ~(pos | neg)

        if pos.any():
            idx = self.index_mapping.index_of(v[pos])
            self.positive_value_store.add_many(idx, w[pos])
        if neg.any():
            idx = self.index_mapping.index_of(-v[neg])
            self.negative_value_store.add_many(idx, w[neg])
        zc = w[zero].sum()
        if zc > 0.0:
            self.zero_count += float(zc)

    def route_batch(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized routing for deferred builds: returns (side, idx) where
        side is +1/-1/0 for positive-store/negative-store/zero-bucket and -2
        for dropped values; idx is the bucket index (valid where side=+-1).

        One log pass per batch; callers can slice the result per group and
        apply it later with ``apply_routed`` — the aggregation hot path.
        """
        v = np.asarray(values, dtype=np.float64)
        side = np.full(v.shape[0], -2, dtype=np.int8)
        ok = np.isfinite(v) & (np.abs(v) <= self.max_indexed_value)
        side[ok & (v > self.min_indexed_value)] = 1
        side[ok & (v < -self.min_indexed_value)] = -1
        side[ok & (np.abs(v) <= self.min_indexed_value)] = 0
        idx = np.zeros(v.shape[0], dtype=np.int64)
        nz = (side == 1) | (side == -1)
        if nz.any():
            idx[nz] = self.index_mapping.index_of(np.abs(v[nz]))
        return side, idx

    def apply_routed(self, side: np.ndarray, idx: np.ndarray) -> None:
        """Insert pre-routed (side, idx) pairs (weight 1 each)."""
        pos = side == 1
        if pos.any():
            self.positive_value_store.add_many(idx[pos])
        neg = side == -1
        if neg.any():
            self.negative_value_store.add_many(idx[neg])
        zc = int((side == 0).sum())
        if zc:
            self.zero_count += float(zc)

    # -- queries (spec sketch.rs:58-171) ---------------------------------------

    def is_empty(self) -> bool:
        return (self.zero_count == 0.0
                and self.negative_value_store.is_empty()
                and self.positive_value_store.is_empty())

    def clear(self) -> None:
        self.negative_value_store.clear()
        self.positive_value_store.clear()
        self.zero_count = 0.0

    def get_count(self) -> float:
        return (self.zero_count
                + self.negative_value_store.get_total_count()
                + self.positive_value_store.get_total_count())

    def get_sum(self) -> float | None:
        if self.get_count() <= 0.0:
            return None
        return (self.positive_value_store.get_sum(self.index_mapping)
                - self.negative_value_store.get_sum(self.index_mapping))

    def get_max(self) -> float | None:
        if not self.positive_value_store.is_empty():
            return self.index_mapping.value(self.positive_value_store.get_max_index())
        if self.zero_count > 0.0:
            return 0.0
        if not self.negative_value_store.is_empty():
            return -self.index_mapping.value(self.negative_value_store.get_min_index())
        return None

    def get_min(self) -> float | None:
        if not self.negative_value_store.is_empty():
            return -self.index_mapping.value(self.negative_value_store.get_max_index())
        if self.zero_count > 0.0:
            return 0.0
        if not self.positive_value_store.is_empty():
            return self.index_mapping.value(self.positive_value_store.get_min_index())
        return None

    def get_average(self) -> float | None:
        count = self.get_count()
        if count <= 0.0:
            return None
        s = self.get_sum()
        return None if s is None else s / count

    def get_value_at_quantile(self, quantile: float) -> float | None:
        """rank = q*(count-1); walk negatives (descending index = most negative
        first), then the zero bucket, then positives ascending; return the
        first bucket where cumulative count exceeds the rank (strict >).
        Vectorized via cumsum + searchsorted per store."""
        if not (0.0 <= quantile <= 1.0):
            return None
        count = self.get_count()
        if count <= 0.0:
            return None
        rank = quantile * (count - 1.0)

        n = 0.0
        neg_idx, neg_cnt = self.negative_value_store.nonzero_bins(descending=True)
        if neg_idx.size:
            cum = np.cumsum(neg_cnt)
            pos_in = int(np.searchsorted(cum, rank, side="right"))
            if pos_in < cum.shape[0]:
                return -self.index_mapping.value(int(neg_idx[pos_in]))
            n = float(cum[-1])

        n += self.zero_count
        if n > rank:
            return 0.0

        pos_idx, pos_cnt = self.positive_value_store.nonzero_bins()
        if pos_idx.size:
            cum = n + np.cumsum(pos_cnt)
            pos_in = int(np.searchsorted(cum, rank, side="right"))
            if pos_in < cum.shape[0]:
                return self.index_mapping.value(int(pos_idx[pos_in]))
        return None

    def get_values_at_quantiles(self, quantiles) -> list[float | None]:
        return [self.get_value_at_quantile(q) for q in quantiles]

    # -- merge (spec sketch.rs:211-221) -----------------------------------------

    def merge_with(self, other: "DDSketch") -> None:
        if self.index_mapping != other.index_mapping:
            raise ValueError("Unmatched indexMapping.")
        self.negative_value_store.merge_with(other.negative_value_store)
        self.positive_value_store.merge_with(other.positive_value_store)
        self.zero_count += other.zero_count

    # -- serde (spec sketch.rs:223-293) ------------------------------------------

    def encode(self) -> bytes:
        buf = bytearray()
        self.index_mapping.encode(buf)
        if self.zero_count != 0.0:
            buf.append(FLAG_ZERO_COUNT)
            serde.encode_var_double(buf, self.zero_count)
        self.positive_value_store.encode(buf, FLAG_TYPE_POSITIVE_STORE)
        self.negative_value_store.encode(buf, FLAG_TYPE_NEGATIVE_STORE)
        return bytes(buf)

    def decode_and_merge_with(self, data: bytes) -> None:
        inp = Input(bytes(data))
        while inp.has_remaining():
            marker = inp.read_byte()
            flag_type = marker & 3
            if flag_type == FLAG_TYPE_POSITIVE_STORE:
                mode = bin_encoding_mode_of_flag(marker)
                self.positive_value_store.decode_and_merge_with(inp, mode)
            elif flag_type == FLAG_TYPE_NEGATIVE_STORE:
                mode = bin_encoding_mode_of_flag(marker)
                self.negative_value_store.decode_and_merge_with(inp, mode)
            elif flag_type == 0b10:  # IndexMapping
                layout = _layout_of_marker(marker)
                gamma = inp.read_double_le()
                index_offset = inp.read_double_le()
                decoded = IndexMapping.with_gamma_offset(layout, gamma, index_offset)
                if self.index_mapping != decoded:
                    raise ValueError("Unmatched IndexMapping")
            else:  # SketchFeatures
                if marker == FLAG_ZERO_COUNT:
                    self.zero_count += serde.decode_var_double(inp)
                else:
                    _ignore_exact_summary_statistic_flags(inp, marker)

    @staticmethod
    def decode(data: bytes) -> "DDSketch":
        inp = Input(bytes(data))
        positive = DenseStore(UNBOUNDED)
        negative = DenseStore(UNBOUNDED)
        index_mapping = None
        zero_count = 0.0
        while inp.has_remaining():
            marker = inp.read_byte()
            flag_type = marker & 3
            if flag_type == FLAG_TYPE_POSITIVE_STORE:
                positive.decode_and_merge_with(inp, bin_encoding_mode_of_flag(marker))
            elif flag_type == FLAG_TYPE_NEGATIVE_STORE:
                negative.decode_and_merge_with(inp, bin_encoding_mode_of_flag(marker))
            elif flag_type == 0b10:
                layout = _layout_of_marker(marker)
                gamma = inp.read_double_le()
                index_offset = inp.read_double_le()
                index_mapping = IndexMapping.with_gamma_offset(layout, gamma, index_offset)
            else:
                if marker == FLAG_ZERO_COUNT:
                    zero_count += serde.decode_var_double(inp)
                else:
                    _ignore_exact_summary_statistic_flags(inp, marker)
        if index_mapping is None:
            raise ValueError("No IndexMapping decoded")
        return DDSketch(index_mapping, negative, positive, zero_count)

    def copy(self) -> "DDSketch":
        return DDSketch(self.index_mapping,
                        self.negative_value_store.copy(),
                        self.positive_value_store.copy(),
                        self.zero_count)


def _layout_of_marker(marker: int) -> int:
    layout = marker >> 2
    if layout not in (LOG, LOG_CUBIC):
        raise ValueError("Unknown Index Flag.")
    return layout


def _ignore_exact_summary_statistic_flags(inp: Input, marker: int) -> None:
    """Skip COUNT/SUM/MIN/MAX feature blocks (sketches-java compatibility);
    unknown feature flags are an error (spec serde.rs:99-109)."""
    if marker == FLAG_COUNT:
        serde.decode_var_double(inp)
    elif marker in (FLAG_SUM, FLAG_MIN, FLAG_MAX):
        inp.read_double_le()
    else:
        raise ValueError("Unknown Flag.")
