"""Property-based kernel tests (hypothesis): the DDSketch contracts hold for
ARBITRARY inputs, not just the fixture distributions.

Kernel-only (no Spark) so the whole file runs in seconds.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sketches_rust_spark.kernel.fingerprint import (
    document_fingerprints,
    fingerprint_jaccard,
)
from sketches_rust_spark.kernel.sketch import DDSketch

finite_positive = st.floats(min_value=1e-100, max_value=1e100,
                            allow_nan=False, allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_positive, min_size=1, max_size=300),
       st.sampled_from([0.01, 0.02, 0.05]),
       st.sampled_from(["logarithmic_unbounded_size_dense_store",
                        "unbounded_dense"]))
def test_quantile_within_alpha_for_arbitrary_values(vals, alpha, preset):
    """The published contract: every estimated quantile within the effective
    relative accuracy of the exact rank value — for any input whatsoever."""
    sk = DDSketch.preset(preset, alpha, 0)
    arr = np.array(vals, dtype=np.float64)
    sk.accept_many(arr)
    srt = np.sort(arr)
    ra = sk.index_mapping.relative_accuracy
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        exact = srt[int(q * (len(srt) - 1))]
        est = sk.get_value_at_quantile(q)
        assert abs(est - exact) <= ra * abs(exact) * (1 + 1e-9), (q, est, exact)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=-1e50, max_value=1e50,
                          allow_nan=False, allow_infinity=False),
                min_size=0, max_size=200))
def test_serde_round_trip_byte_stable(vals):
    """encode(decode(encode(x))) == encode(x) for arbitrary inserts,
    including negatives and zeros."""
    sk = DDSketch.logarithmic_unbounded_size_dense_store(0.01)
    sk.accept_many(np.array(vals, dtype=np.float64))
    blob = sk.encode()
    again = DDSketch.decode(blob).encode()
    assert blob == again
    assert DDSketch.decode(again).get_count() == sk.get_count()


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_positive, min_size=2, max_size=200),
       st.integers(min_value=1, max_value=7))
def test_merge_order_invariance(vals, split):
    """Merging partial sketches gives the same bytes regardless of how the
    input was partitioned (the property that makes the two-level Spark
    aggregation exact)."""
    arr = np.array(vals, dtype=np.float64)
    whole = DDSketch.logarithmic_unbounded_size_dense_store(0.02)
    whole.accept_many(arr)

    merged = DDSketch.logarithmic_unbounded_size_dense_store(0.02)
    for chunk in np.array_split(arr, split):
        part = DDSketch.logarithmic_unbounded_size_dense_store(0.02)
        part.accept_many(chunk)
        merged.decode_and_merge_with(part.encode())
    assert merged.encode() == whole.encode()


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=60),
       st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=60),
       st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=30, max_size=120))
def test_winnowing_shared_substring_guarantee(prefix_a, prefix_b, shared):
    """SIGMOD'03 theorem: documents sharing any substring of length
    >= w + k - 1 share at least one fingerprint (k=8, w=16 -> 23 chars)."""
    k, w = 8, 16
    a = prefix_a + shared
    b = prefix_b + shared
    if len(shared) < w + k - 1:
        return
    fa = document_fingerprints(a, k=k, w=w)
    fb = document_fingerprints(b, k=k, w=w)
    assert fingerprint_jaccard(fa, fb) > 0
