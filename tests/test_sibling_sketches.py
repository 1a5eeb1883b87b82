"""Kernel tests for the sibling sketches: HLL, CMS, Bloom, t-digest, KLL.

Each sketch is tested against its published error bound, for merge
associativity (partition-split == whole-build within bound), and for
serde round-trips.
"""

import numpy as np
import pytest

from sketches_rust_spark.kernel.bits import clz64, popcount64, splitmix64
from sketches_rust_spark.kernel.bloom import BloomFilter
from sketches_rust_spark.kernel.cms import CountMinSketch
from sketches_rust_spark.kernel.hll import HyperLogLog
from sketches_rust_spark.kernel.kll import KLL
from sketches_rust_spark.kernel.tdigest import TDigest


# -- bit helpers ------------------------------------------------------------

def test_popcount_and_clz():
    x = np.array([0, 1, 2, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 1, 2, 64, 1]
    assert clz64(x).tolist() == [64, 63, 62, 62, 0, 0]


def test_splitmix64_reference_vector():
    # published SplitMix64 output for state 1234567 (Vigna's reference impl)
    got = splitmix64(np.array([1234567], dtype=np.uint64))[0]
    assert got == 6457827717110365317
    # avalanche sanity: consecutive inputs decorrelate
    a = splitmix64(np.arange(1000, dtype=np.uint64))
    assert len(np.unique(a)) == 1000
    assert popcount64(a).mean() == pytest.approx(32, abs=1.0)


# -- HyperLogLog -------------------------------------------------------------

def test_hll_error_bound():
    rng = np.random.default_rng(1)
    for true_n in (100, 10_000, 1_000_000):
        h = HyperLogLog(p=14)
        ids = rng.integers(0, 1 << 62, size=true_n, dtype=np.uint64)
        h.add_hashes(splitmix64(ids))
        est = h.estimate()
        rse = h.relative_standard_error()
        assert abs(est - true_n) / true_n <= 4 * rse, (true_n, est)


def test_hll_merge_equals_whole():
    ids = splitmix64(np.arange(500_000, dtype=np.uint64))
    whole = HyperLogLog(12)
    whole.add_hashes(ids)
    parts = []
    for chunk in np.array_split(ids, 7):
        p = HyperLogLog(12)
        p.add_hashes(chunk)
        parts.append(p)
    merged = HyperLogLog(12)
    for p in parts:
        merged.decode_and_merge_with(p.encode())
    assert merged.encode() == whole.encode()  # register-max is exact


def test_hll_duplicates_dont_inflate():
    h = HyperLogLog(12)
    hashes = splitmix64(np.arange(1000, dtype=np.uint64))
    for _ in range(50):
        h.add_hashes(hashes)
    assert abs(h.estimate() - 1000) / 1000 <= 4 * h.relative_standard_error()


def test_hll_precision_mismatch_rejected():
    a, b = HyperLogLog(12), HyperLogLog(13)
    with pytest.raises(ValueError):
        a.merge_with(b)


# -- Count-Min ---------------------------------------------------------------

def test_cms_point_query_bound():
    rng = np.random.default_rng(2)
    cms = CountMinSketch.from_error_bounds(eps=0.005, delta=0.01)
    # zipfian stream of 200k events over 10k items
    items = rng.zipf(1.3, size=200_000) % 10_000
    hashes = splitmix64(items.astype(np.uint64))
    cms.add_hashes(hashes)
    n = cms.total()
    assert n == 200_000
    true_counts = np.bincount(items, minlength=10_000)
    probe = np.arange(10_000, dtype=np.uint64)
    est = cms.estimate_hashes(splitmix64(probe))
    over = est - true_counts
    assert (over >= 0).all()  # never undercounts
    # eps*N bound should hold for ~1-delta of items
    assert (over <= cms.epsilon() * n).mean() >= 1 - cms.delta()


def test_cms_merge_equals_whole():
    hashes = splitmix64(np.arange(100_000, dtype=np.uint64) % 997)
    whole = CountMinSketch(4, 1024)
    whole.add_hashes(hashes)
    merged = CountMinSketch(4, 1024)
    for chunk in np.array_split(hashes, 5):
        part = CountMinSketch(4, 1024)
        part.add_hashes(chunk)
        merged.decode_and_merge_with(part.encode())
    assert merged.encode() == whole.encode()


def test_cms_weighted_add():
    cms = CountMinSketch(4, 512)
    h = splitmix64(np.array([7], dtype=np.uint64))
    cms.add_hashes(h, np.array([42]))
    assert cms.estimate_hashes(h)[0] >= 42


# -- Bloom --------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(3)
    n = 50_000
    bf = BloomFilter.from_capacity(n, fpr=0.01)
    members = splitmix64(np.arange(n, dtype=np.uint64))
    bf.add_hashes(members)
    assert bf.might_contain_hashes(members).all()  # zero false negatives
    probes = splitmix64(rng.integers(1 << 40, 1 << 62, size=100_000, dtype=np.uint64))
    fpr = bf.might_contain_hashes(probes).mean()
    assert fpr <= 0.02, fpr


def test_bloom_merge_is_union():
    a, b = BloomFilter(1 << 16, 5), BloomFilter(1 << 16, 5)
    ha = splitmix64(np.arange(0, 1000, dtype=np.uint64))
    hb = splitmix64(np.arange(1000, 2000, dtype=np.uint64))
    a.add_hashes(ha)
    b.add_hashes(hb)
    a.decode_and_merge_with(b.encode())
    assert a.might_contain_hashes(ha).all()
    assert a.might_contain_hashes(hb).all()


# -- t-digest -------------------------------------------------------------------

def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(4)
    values = rng.lognormal(6, 1.2, size=200_000)
    td = TDigest(200)
    for chunk in np.array_split(values, 20):
        td.accept_many(chunk)
    srt = np.sort(values)
    assert td.quantile(0.0) == srt[0]
    assert td.quantile(1.0) == srt[-1]
    for q, tol in ((0.01, 0.005), (0.5, 0.01), (0.9, 0.005), (0.99, 0.002), (0.999, 0.001)):
        est = td.quantile(q)
        # rank error: fraction of data below the estimate vs q
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) <= tol, (q, rank)


def test_tdigest_merge_bounded_error():
    rng = np.random.default_rng(5)
    values = rng.normal(100, 15, size=100_000)
    parts = []
    for chunk in np.array_split(values, 8):
        td = TDigest(200)
        td.accept_many(chunk)
        parts.append(td.encode())
    merged = TDigest(200)
    for blob in parts:
        merged.decode_and_merge_with(blob)
    assert merged.total_weight() == 100_000
    srt = np.sort(values)
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(srt, merged.quantile(q)) / len(srt)
        assert abs(rank - q) <= 0.02


def test_tdigest_serde_roundtrip():
    td = TDigest(100)
    td.accept_many(np.arange(1000, dtype=np.float64))
    blob = td.encode()
    back = TDigest.decode(blob)
    assert back.encode() == blob
    assert back.quantile(0.5) == td.quantile(0.5)


def test_tdigest_compression_mismatch_rejected():
    a, b = TDigest(100), TDigest(200)
    a.accept_many(np.ones(10))
    b.accept_many(np.ones(10))
    with pytest.raises(ValueError):
        a.merge_with(b)


# -- KLL --------------------------------------------------------------------------

def test_kll_rank_error_bound():
    rng = np.random.default_rng(6)
    values = rng.lognormal(6, 1.2, size=100_000)
    k = KLL(200)
    for chunk in np.array_split(values, 16):
        k.accept_many(chunk)
    assert k.total_weight() == pytest.approx(100_000, rel=0.02)
    srt = np.sort(values)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = k.quantile(q)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) <= 0.025, (q, rank)


def test_kll_merge_bounded_error():
    rng = np.random.default_rng(7)
    values = rng.uniform(0, 1000, size=120_000)
    merged = KLL(200)
    for chunk in np.array_split(values, 10):
        part = KLL(200)
        part.accept_many(chunk)
        merged.decode_and_merge_with(part.encode())
    srt = np.sort(values)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(srt, merged.quantile(q)) / len(srt)
        assert abs(rank - q) <= 0.03


def test_kll_serde_roundtrip():
    k = KLL(64)
    k.accept_many(np.arange(5000, dtype=np.float64))
    blob = k.encode()
    back = KLL.decode(blob)
    assert back.encode() == blob
    assert back.quantile(0.5) == k.quantile(0.5)


def test_kmv_exact_below_k_and_error_bound():
    import numpy as np
    from sketches_rust_spark.kernel.bits import splitmix64
    from sketches_rust_spark.kernel.kmv import KMV

    small = KMV(256)
    small.add_hashes(splitmix64(np.arange(100, dtype=np.uint64)))
    assert small.estimate() == 100.0  # exact below capacity

    big = KMV(256)
    big.add_hashes(splitmix64(np.arange(100_000, dtype=np.uint64)))
    est = big.estimate()
    # 5 sigma of the ~1/sqrt(k-2) relative standard error
    assert abs(est - 100_000) / 100_000 < 5 * big.relative_standard_error()


def test_kmv_merge_equals_whole_and_roundtrip():
    import numpy as np
    from sketches_rust_spark.kernel.bits import splitmix64
    from sketches_rust_spark.kernel.kmv import KMV

    h = splitmix64(np.arange(50_000, dtype=np.uint64))
    a, b, whole = KMV(64), KMV(64), KMV(64)
    a.add_hashes(h[:30_000])
    b.add_hashes(h[20_000:])  # overlapping halves
    whole.add_hashes(h)
    a.merge_with(b)
    assert a.encode() == whole.encode()  # bottom-k union is lossless
    assert KMV.decode(whole.encode()).encode() == whole.encode()
    import pytest
    with pytest.raises(ValueError, match="Unmatched"):
        KMV(64).merge_with(KMV(128))


def test_kmv_decode_rejects_malformed_blobs():
    import numpy as np
    import pytest
    from sketches_rust_spark.kernel.bits import splitmix64
    from sketches_rust_spark.kernel.kmv import KMV
    from sketches_rust_spark.kernel.serde import encode_unsigned_var_long

    def blob(k: int, hashes: np.ndarray) -> bytes:
        buf = bytearray(b"KMV1")
        encode_unsigned_var_long(buf, k)
        encode_unsigned_var_long(buf, int(hashes.shape[0]))
        buf += hashes.astype("<u8").tobytes()
        return bytes(buf)

    h = np.sort(splitmix64(np.arange(8, dtype=np.uint64)))
    # n > k: theta()/estimate() would index hashes[k-1] while extras stay
    # retained — silently inconsistent after decode_and_merge_with
    with pytest.raises(ValueError, match="exceed"):
        KMV.decode(blob(4, h))
    # non-ascending order breaks the bottom-k invariant
    with pytest.raises(ValueError, match="ascending"):
        KMV.decode(blob(16, h[::-1].copy()))
    # duplicate hashes break distinctness (strictly ascending required)
    dup = np.concatenate([h[:1], h[:1], h[1:7]])
    with pytest.raises(ValueError, match="ascending"):
        KMV.decode(blob(16, dup))
    # well-formed round-trip still works
    assert KMV.decode(blob(16, h)).encode() == blob(16, h)


def test_kmv_difference_estimate():
    import numpy as np
    from sketches_rust_spark.kernel.bits import splitmix64
    from sketches_rust_spark.kernel.kmv import KMV

    # exact when both sides are below capacity
    a, b = KMV(512), KMV(512)
    a.add_hashes(splitmix64(np.arange(300, dtype=np.uint64)))
    b.add_hashes(splitmix64(np.arange(200, 500, dtype=np.uint64)))
    assert a.difference_estimate(b) == 200.0
    assert b.difference_estimate(a) == 200.0

    # sampled regime: |A|=60k, |B|=60k, |A ∖ B|=40k
    A, B = KMV(1024), KMV(1024)
    A.add_hashes(splitmix64(np.arange(60_000, dtype=np.uint64)))
    B.add_hashes(splitmix64(np.arange(40_000, 100_000, dtype=np.uint64)))
    est = A.difference_estimate(B)
    assert abs(est - 40_000) / 40_000 < 0.15
    # identity on the common-theta sample (in retained-hash counts, which
    # are exact): #(A∖B sample) + #(A∩B sample) == #(A sample)
    theta = min(A.theta(), B.theta())
    t = np.uint64(theta)
    a_s, b_s = A.hashes[A.hashes < t], B.hashes[B.hashes < t]
    scale = 2.0**64 / theta
    n_common = np.intersect1d(a_s, b_s).shape[0]
    assert est == (a_s.shape[0] - n_common) * scale
    assert A.intersection_estimate(B) == n_common * scale


def test_kmv_intersection_estimate():
    import numpy as np
    from sketches_rust_spark.kernel.bits import splitmix64
    from sketches_rust_spark.kernel.kmv import KMV

    # exact when both sides are below capacity
    a, b = KMV(512), KMV(512)
    a.add_hashes(splitmix64(np.arange(300, dtype=np.uint64)))
    b.add_hashes(splitmix64(np.arange(200, 500, dtype=np.uint64)))
    assert a.intersection_estimate(b) == 100.0

    # sampled regime: |A|=60k, |B|=60k, |A ∩ B|=20k
    A, B = KMV(1024), KMV(1024)
    A.add_hashes(splitmix64(np.arange(60_000, dtype=np.uint64)))
    B.add_hashes(splitmix64(np.arange(40_000, 100_000, dtype=np.uint64)))
    est = A.intersection_estimate(B)
    # theta-sketch intersection error grows with |union|/|intersection|
    # (=7x here); 25% is a loose determinism-free sanity band
    assert abs(est - 20_000) / 20_000 < 0.25
    # symmetric
    assert est == B.intersection_estimate(A)
