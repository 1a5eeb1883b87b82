"""Store behavior tests.

Insert sequences and expectations replayed verbatim from the reference's own
store tests (/root/reference/src/store/mod.rs:264-304), plus order-insensitivity
properties that underpin distributed merging.
"""

import numpy as np
import pytest

from sketches_rust_spark.kernel.store import (
    COLLAPSING_HIGHEST,
    COLLAPSING_LOWEST,
    UNBOUNDED,
    DenseStore,
)


def test_collapsing_lowest_dense_store_add():
    store = DenseStore(COLLAPSING_LOWEST, 10)
    for i in [66, 14, 95, 71, 63, 28, 80, 54, 67, 41, 4, 24, 93, 73, 37, 37, 51, 49, 22, 90]:
        store.add(i)
    assert store.get_max_index() == 95
    assert store.get_min_index() == 86
    assert store.get_total_count() == 20.0


def test_collapsing_highest_dense_store_add():
    store = DenseStore(COLLAPSING_HIGHEST, 10)
    for i in [40, 22, 42, 79, 33, 62, 14, 79, 98, 76, 83, 31, 3, 92, 79, 6, 76, 56, 79, 6]:
        store.add(i)
    assert store.get_max_index() == 12
    assert store.get_min_index() == 3
    assert store.get_total_count() == 20.0


def test_unbounded_size_dense_store_add():
    store = DenseStore(UNBOUNDED)
    for i in [17, 32, 6, 42, 24, 75, 56, 58, 28, 10, 76, 43, 90, 59, 17, 17, 34, 47, 56, 32]:
        store.add(i)
    assert store.get_max_index() == 90
    assert store.get_min_index() == 6
    assert store.get_total_count() == 20.0


@pytest.mark.parametrize(
    "kind,cap,indexes",
    [
        (COLLAPSING_LOWEST, 10, [66, 14, 95, 71, 63, 28, 80, 54, 67, 41, 4, 24, 93, 73, 37, 37, 51, 49, 22, 90]),
        (COLLAPSING_HIGHEST, 10, [40, 22, 42, 79, 33, 62, 14, 79, 98, 76, 83, 31, 3, 92, 79, 6, 76, 56, 79, 6]),
        (UNBOUNDED, 0, [17, 32, 6, 42, 24, 75, 56, 58, 28, 10, 76, 43, 90, 59, 17, 17, 34, 47, 56, 32]),
    ],
)
def test_batch_add_equals_sequential_add(kind, cap, indexes):
    """The vectorized hot path must produce the same final histogram as
    one-at-a-time inserts (this is what makes the Spark partial aggregate
    correct regardless of Arrow batch boundaries)."""
    seq = DenseStore(kind, cap)
    for i in indexes:
        seq.add(i)
    batch = DenseStore(kind, cap)
    batch.add_many(np.array(indexes))
    assert seq.get_min_index() == batch.get_min_index()
    assert seq.get_max_index() == batch.get_max_index()
    np.testing.assert_array_equal(seq.counts, batch.counts)


@pytest.mark.parametrize("kind,cap", [(COLLAPSING_LOWEST, 10), (COLLAPSING_HIGHEST, 10), (UNBOUNDED, 0)])
def test_insert_order_insensitive(kind, cap):
    rng = np.random.default_rng(42)
    indexes = rng.integers(-50, 150, size=500)
    a = DenseStore(kind, cap)
    a.add_many(indexes)
    b = DenseStore(kind, cap)
    shuffled = indexes.copy()
    rng.shuffle(shuffled)
    # split into uneven batches to simulate partition boundaries
    for chunk in np.array_split(shuffled, [7, 30, 100, 101, 400]):
        b.add_many(chunk)
    assert a.get_min_index() == b.get_min_index()
    assert a.get_max_index() == b.get_max_index()
    np.testing.assert_array_equal(a.counts, b.counts)


@pytest.mark.parametrize("kind,cap", [(COLLAPSING_LOWEST, 10), (COLLAPSING_HIGHEST, 10), (UNBOUNDED, 0)])
def test_merge_matches_single_build(kind, cap):
    rng = np.random.default_rng(7)
    indexes = rng.integers(-20, 200, size=1000)
    whole = DenseStore(kind, cap)
    whole.add_many(indexes)
    parts = []
    for chunk in np.array_split(indexes, 8):
        s = DenseStore(kind, cap)
        s.add_many(chunk)
        parts.append(s)
    merged = DenseStore(kind, cap)
    for p in parts:
        merged.merge_with(p)
    assert merged.get_total_count() == whole.get_total_count()
    assert merged.get_min_index() == whole.get_min_index()
    assert merged.get_max_index() == whole.get_max_index()
    np.testing.assert_array_equal(merged.counts, whole.counts)


def test_negative_and_zero_weights_dropped():
    store = DenseStore(UNBOUNDED)
    store.add_many(np.array([1, 2, 3]), np.array([1.0, 0.0, -5.0]))
    assert store.get_total_count() == 1.0
    assert store.get_min_index() == 1
    assert store.get_max_index() == 1


def test_capacity_validation():
    with pytest.raises(ValueError):
        DenseStore(COLLAPSING_LOWEST, 0)
    with pytest.raises(ValueError):
        DenseStore(COLLAPSING_HIGHEST, 0)
    with pytest.raises(ValueError):
        DenseStore(COLLAPSING_LOWEST, 2147483648)
