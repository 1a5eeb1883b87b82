"""DDSketch end-to-end kernel tests.

Mirrors the reference integration suite (/root/reference/tests/test_sketch.rs)
including the golden serialized sketches, plus merge associativity /
commutativity properties required for distributed aggregation.
"""

import numpy as np
import pytest

from sketches_rust_spark.kernel.sketch import DDSketch

# Golden blobs from /root/reference/tests/test_sketch.rs:158-204.
GOLDEN_BLOB_CUBIC_4538 = bytes([
    14, 100, 244, 7, 173, 131, 165, 240, 63, 0, 0, 0, 0, 0, 0, 0, 0, 5, 21, 0, 140, 48, 34,
    150, 241, 16, 20, 148, 191, 96, 14, 142, 62, 12, 139, 16, 10, 134, 96, 8, 3, 6, 2, 6, 2, 6,
    2, 4, 2, 42, 2, 26, 2, 6, 2, 20, 2, 6, 2, 2, 2, 10, 2, 20, 2, 14, 2, 10, 2,
])
GOLDEN_BLOB_CUBIC_100 = bytes([
    14, 100, 244, 7, 173, 131, 165, 240, 63, 0, 0, 0, 0, 0, 0, 0, 0, 5, 10, 7, 2, 18, 2, 38, 2,
    2, 4, 4, 2, 4, 2, 12, 3, 6, 2, 2, 2, 12, 140, 100,
])
GOLDEN_BLOB_LOG_100 = bytes([
    2, 42, 120, 57, 5, 47, 167, 240, 63, 0, 0, 0, 0, 0, 0, 0, 0, 13, 50, 130, 1, 2, 136, 32, 0,
    3, 0, 0, 0, 3, 0, 2, 0, 0, 3, 3, 2, 2, 3, 3, 2, 0, 0, 0, 0, 2, 0, 2, 2, 2, 4, 4, 132, 64,
    0, 4, 2, 0, 2, 2, 3, 132, 64, 4, 132, 64, 4, 2, 2, 0, 6, 4, 6, 132, 64, 2, 6,
])


def test_constructor_validation():
    with pytest.raises(ValueError):
        DDSketch.collapsing_lowest_dense(0.00, 100)
    with pytest.raises(ValueError):
        DDSketch.collapsing_lowest_dense(1.00, 100)
    with pytest.raises(ValueError):
        DDSketch.collapsing_lowest_dense(0.02, 2147483648)


@pytest.mark.parametrize("preset", [
    ("collapsing_lowest_dense", (0.02, 100)),
    ("collapsing_highest_dense", (0.02, 100)),
    ("unbounded_dense", (0.02,)),
    ("logarithmic_collapsing_lowest_dense", (0.02, 100)),
    ("logarithmic_collapsing_highest_dense", (0.02, 100)),
])
def test_quantile_accuracy_1_to_5(preset):
    name, args = preset
    sketch = getattr(DDSketch, name)(*args)
    for v in (1.0, 2.0, 3.0, 4.0, 5.0):
        sketch.accept(v)
    for q, exact in ((0.0, 1.0), (0.5, 3.0), (1.0, 5.0)):
        est = sketch.get_value_at_quantile(q)
        assert abs(est - exact) / exact < 0.021


def test_summary_stats_signed_range():
    accuracy = 2e-2
    sketch = DDSketch.collapsing_lowest_dense(accuracy, 50)
    sketch.accept_many(np.arange(-99, 101, dtype=np.float64))
    assert sketch.get_count() == 200.0
    assert abs(sketch.get_min() - -99.0) / 99.0 <= accuracy
    assert abs(sketch.get_max() - 100.0) / 100.0 <= accuracy
    assert abs(sketch.get_average() - 0.5) / 0.5 <= accuracy
    assert abs(sketch.get_sum() - 100.0) / 100.0 <= accuracy


def test_merge_same_store_type():
    s1 = DDSketch.collapsing_lowest_dense(2e-2, 50)
    s1.accept_many(np.arange(-99, 101, dtype=np.float64))
    s2 = DDSketch.collapsing_lowest_dense(2e-2, 50)
    s2.accept_many(np.arange(100, 200, dtype=np.float64))
    s1.merge_with(s2)
    assert s1.get_count() == 300.0


def test_merge_mixed_store_types():
    s1 = DDSketch.collapsing_lowest_dense(2e-2, 50)
    s1.accept_many(np.arange(-99, 101, dtype=np.float64))
    s2 = DDSketch.unbounded_dense(2e-2)
    s2.accept_many(np.arange(100, 200, dtype=np.float64))
    s1.merge_with(s2)
    assert s1.get_count() == 300.0


def test_merge_rejects_mismatched_accuracy():
    s1 = DDSketch.collapsing_lowest_dense(1e-2, 50)
    s1.accept(1.0)
    s2 = DDSketch.collapsing_lowest_dense(2e-2, 50)
    s2.accept(1.0)
    with pytest.raises(ValueError):
        s1.merge_with(s2)


def test_golden_decode_cubic_4538():
    sketch = DDSketch.collapsing_lowest_dense(2e-2, 50)
    sketch.decode_and_merge_with(GOLDEN_BLOB_CUBIC_4538)
    assert sketch.get_count() == 4538.0


def test_golden_decode_cubic_100_collapsing_highest():
    sketch = DDSketch.collapsing_highest_dense(2e-2, 50)
    sketch.decode_and_merge_with(GOLDEN_BLOB_CUBIC_100)
    assert sketch.get_count() == 100.0


def test_golden_decode_log_100():
    sketch = DDSketch.logarithmic_collapsing_lowest_dense(2e-2, 50)
    sketch.decode_and_merge_with(GOLDEN_BLOB_LOG_100)
    assert sketch.get_count() == 100.0


def test_golden_decode_standalone():
    sketch = DDSketch.decode(GOLDEN_BLOB_LOG_100)
    assert sketch.get_count() == 100.0


def test_golden_decode_rejects_wrong_mapping():
    with pytest.raises(ValueError):
        s = DDSketch.collapsing_lowest_dense(1e-2, 50)
        s.decode_and_merge_with(GOLDEN_BLOB_CUBIC_4538)
    with pytest.raises(ValueError):
        s = DDSketch.collapsing_highest_dense(2e-2, 50)
        s.decode_and_merge_with(GOLDEN_BLOB_LOG_100)


def test_encode_decode_roundtrip():
    s1 = DDSketch.unbounded_dense(2e-2)
    for v in (1.0, 2.0, 3.0, 4.0, 5.0):
        s1.accept(v)
    s2 = DDSketch.unbounded_dense(2e-2)
    s2.decode_and_merge_with(s1.encode())
    assert s2.get_count() == 5.0


def test_encode_byte_stable_roundtrip():
    """encode -> decode -> encode must be byte-identical for unbounded stores
    (the shuffle-safe intermediate representation property)."""
    s1 = DDSketch.logarithmic_unbounded_size_dense_store(2e-2)
    rng = np.random.default_rng(3)
    s1.accept_many(rng.lognormal(6, 1.2, size=5000))
    blob1 = s1.encode()
    s2 = DDSketch.logarithmic_unbounded_size_dense_store(2e-2)
    s2.decode_and_merge_with(blob1)
    assert s2.encode() == blob1


def test_all_factories_construct():
    for name in DDSketch.PRESETS:
        s = DDSketch.preset(name, 2e-2, 100)
        s.accept(1.0)
        assert s.get_count() == 1.0


def test_merge_associative_commutative():
    rng = np.random.default_rng(11)
    values = rng.lognormal(6, 1.2, size=9000)
    chunks = np.array_split(values, 7)

    def build(chunk):
        s = DDSketch.logarithmic_unbounded_size_dense_store(2e-2)
        s.accept_many(chunk)
        return s

    whole = build(values)
    # left fold in order
    a = build(chunks[0])
    for c in chunks[1:]:
        a.merge_with(build(c))
    # fold in reversed order
    b = build(chunks[-1])
    for c in reversed(chunks[:-1]):
        b.merge_with(build(c))
    # tree fold
    parts = [build(c) for c in chunks]
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            parts[i].merge_with(parts[i + 1])
            nxt.append(parts[i])
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt

    assert a.encode() == b.encode() == parts[0].encode() == whole.encode()


def test_quantile_error_bound_lognormal():
    """Every estimated quantile within the effective relative accuracy of the
    exact rank value (the DDSketch paper guarantee)."""
    rng = np.random.default_rng(5)
    values = rng.lognormal(6, 1.2, size=100_000)
    sketch = DDSketch.logarithmic_unbounded_size_dense_store(2e-2)
    sketch.accept_many(values)
    alpha = sketch.index_mapping.relative_accuracy
    srt = np.sort(values)
    for q in (0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999):
        est = sketch.get_value_at_quantile(q)
        exact = srt[int(q * (len(srt) - 1))]
        assert abs(est - exact) / exact <= alpha * 1.0000001


def test_quantile_edge_cases():
    s = DDSketch.unbounded_dense(2e-2)
    assert s.get_value_at_quantile(0.5) is None  # empty
    s.accept(42.0)
    assert abs(s.get_value_at_quantile(0.0) - 42.0) / 42.0 < 0.021
    assert abs(s.get_value_at_quantile(1.0) - 42.0) / 42.0 < 0.021
    assert s.get_value_at_quantile(-0.1) is None
    assert s.get_value_at_quantile(1.1) is None


def test_zero_and_negative_routing():
    s = DDSketch.unbounded_dense(2e-2)
    s.accept_many(np.array([0.0, 0.0, -5.0, 5.0]))
    assert s.zero_count == 2.0
    assert s.get_count() == 4.0
    assert abs(s.get_value_at_quantile(0.0) - -5.0) / 5.0 < 0.021
    assert s.get_value_at_quantile(0.5) == 0.0
    assert abs(s.get_value_at_quantile(1.0) - 5.0) / 5.0 < 0.021


def test_weighted_accept():
    s = DDSketch.unbounded_dense(2e-2)
    s.accept_many(np.array([10.0, 20.0]), np.array([3.0, 1.0]))
    assert s.get_count() == 4.0
    assert abs(s.get_value_at_quantile(0.5) - 10.0) / 10.0 < 0.021
