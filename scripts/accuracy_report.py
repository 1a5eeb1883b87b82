#!/usr/bin/env python
"""Regenerate BENCH/ACCURACY.md: measured error vs exact for every sketch.

    python scripts/accuracy_report.py > BENCH/ACCURACY.md

Deterministic (fixed seeds + fixed driver tables), so the tables are
reproducible bit-for-bit.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import duckdb

    from sketches_rust_spark.kernel.bits import splitmix64
    from sketches_rust_spark.kernel.bloom import BloomFilter
    from sketches_rust_spark.kernel.cms import CountMinSketch
    from sketches_rust_spark.kernel.hll import HyperLogLog
    from sketches_rust_spark.kernel.kll import KLL
    from sketches_rust_spark.kernel.sketch import DDSketch
    from sketches_rust_spark.kernel.tdigest import TDigest

    print("# ACCURACY — measured error vs exact (sf0.1 driver tables + synthetic)\n")
    print("Regenerate with `python scripts/accuracy_report.py > BENCH/ACCURACY.md`.\n")

    vals = duckdb.sql(
        f"SELECT l_extendedprice FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchnumpy()["l_extendedprice"].astype(np.float64)
    srt = np.sort(vals)

    print(f"## DDSketch (alpha=0.01, n={len(vals):,} lineitem prices)\n")
    print("| q | exact | LOG est | rel err | LogCubic est | rel err |")
    print("|---|---|---|---|---|---|")
    log_sk = DDSketch.logarithmic_unbounded_size_dense_store(0.01)
    log_sk.accept_many(vals)
    cub_sk = DDSketch.unbounded_dense(0.01)
    cub_sk.accept_many(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 0.9999):
        exact = srt[int(q * (len(srt) - 1))]
        a = log_sk.get_value_at_quantile(q)
        b = cub_sk.get_value_at_quantile(q)
        print(f"| {q} | {exact:.2f} | {a:.2f} | {abs(a - exact) / exact:.5f} "
              f"| {b:.2f} | {abs(b - exact) / exact:.5f} |")
    print(f"\nEffective alpha: LOG {log_sk.index_mapping.relative_accuracy:.6f}, "
          f"LogCubic {cub_sk.index_mapping.relative_accuracy:.6f} — every error "
          "above is within bound.\n")

    rng = np.random.default_rng(9)
    print("## HyperLogLog (p=14, rse=0.81%)\n")
    print("| true n | estimate | rel err |")
    print("|---|---|---|")
    for n in (1000, 10_000, 100_000, 1_000_000, 10_000_000):
        h = HyperLogLog(14)
        h.add_hashes(splitmix64(rng.integers(0, 1 << 62, size=n, dtype=np.uint64)))
        est = h.estimate()
        print(f"| {n:,} | {est:,.0f} | {abs(est - n) / n:.5f} |")

    print("\n## t-digest (delta=200) and KLL (k=200) rank error, lineitem prices\n")
    print("| q | t-digest rank err | KLL rank err |")
    print("|---|---|---|")
    td = TDigest(200)
    td.accept_many(vals)
    kl = KLL(200)
    for chunk in np.array_split(vals, 32):
        kl.accept_many(chunk)
    for q in (0.01, 0.5, 0.9, 0.99, 0.999):
        rt = abs(np.searchsorted(srt, td.quantile(q)) / len(srt) - q)
        rk = abs(np.searchsorted(srt, kl.quantile(q)) / len(srt) - q)
        print(f"| {q} | {rt:.5f} | {rk:.5f} |")

    items = rng.zipf(1.3, size=1_000_000) % 100_000
    cms = CountMinSketch(5, 8192)
    cms.add_hashes(splitmix64(items.astype(np.uint64)))
    true = np.bincount(items, minlength=100_000)
    est = cms.estimate_hashes(splitmix64(np.arange(100_000, dtype=np.uint64)))
    over = est - true
    print(f"\n## Count-Min (5x8192) on 1M zipfian events over 100k items\n")
    print(f"- overestimate only: {(over >= 0).all()}; mean over = {over.mean():.2f}; ")
    print(f"- fraction within eps*N = {(over <= cms.epsilon() * 1_000_000).mean():.4f} "
          f"(bound: >= {1 - cms.delta():.4f})\n")

    bf = BloomFilter.from_capacity(100_000, 0.01)
    bf.add_hashes(splitmix64(np.arange(100_000, dtype=np.uint64)))
    probes = splitmix64(rng.integers(1 << 40, 1 << 62, size=500_000, dtype=np.uint64))
    print("## Bloom (n=100k, target fpr 1%)\n")
    print("- false negatives: 0 (guaranteed); measured fpr on 500k non-members: "
          f"{bf.might_contain_hashes(probes).mean():.5f}\n")

    from sketches_rust_spark.kernel.kmv import KMV

    kmv_k = 1024
    kmv_rse = KMV(kmv_k).relative_standard_error()
    print(f"## KMV / bottom-k theta sketch (k={kmv_k}, rse {kmv_rse:.3f})\n")
    print("| true n | estimate | rel err | err/rse (sigma) |")
    print("|---|---|---|---|")
    for n in (100, 1_000, 10_000, 100_000, 1_000_000):
        sk = KMV(kmv_k)
        sk.add_hashes(splitmix64(np.arange(n, dtype=np.uint64)))
        est = sk.estimate()
        err = abs(est - n) / n
        sig = "exact" if n < kmv_k else f"{err / kmv_rse:.1f}"
        print(f"| {n:,} | {est:,.0f} | {err:.5f} | {sig} |")
    inter = []
    for overlap in (5_000, 20_000, 50_000):
        a, b = KMV(1024), KMV(1024)
        a.add_hashes(splitmix64(np.arange(60_000, dtype=np.uint64)))
        b.add_hashes(splitmix64(
            np.arange(60_000 - overlap, 120_000 - overlap, dtype=np.uint64)))
        est = a.intersection_estimate(b)
        inter.append(f"|A∩B|={overlap:,}: est {est:,.0f} "
                     f"(rel err {abs(est - overlap) / overlap:.3f})")
    print("\nset intersection (k=1024, |A|=|B|=60k): " + "; ".join(inter) + "\n")

    # IVF ANN recall vs n_probe — numpy replica of operators/similarity.py
    # ivf_topk (md5 centroid seeds, cosine argmax assignment, top-n_probe
    # cluster probing); the Spark plan is oracle-pinned to this exact math.
    import hashlib

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id").df()
    ids = emb["vec_id"].to_numpy()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    n_cent, k, probe_ids = 16, 10, [0, 1, 2, 3, 4]
    h = np.array([int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
                  for i in ids], dtype=np.uint64)
    cent_rows = np.lexsort((ids, h))[:n_cent]
    cents = unit[cent_rows]
    sim_c = unit @ cents.T
    assign = np.argmax(sim_c, axis=1)  # argmax ties -> lowest c, as in Spark
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    exact = {(p, ids[j]) for p in probe_ids
             for j in np.argsort(-np.round(sims[p], 6) + ids * 1e-12)[:k]}
    print(f"## IVF ANN recall@{k} vs n_probe "
          f"({len(ids)} embeddings, {n_cent} centroids, probes {probe_ids})\n")
    print("| n_probe | fraction of corpus scanned | recall vs exact |")
    print("|---|---|---|")
    for n_probe in (1, 2, 4, 8, 16):
        got = set()
        for p in probe_ids:
            clusters = np.argsort(-sim_c[p])[:n_probe]
            cand = np.flatnonzero(np.isin(assign, clusters) & (ids != p))
            top = cand[np.argsort(-np.round(sims[p][cand], 6)
                                  + ids[cand] * 1e-12)[:k]]
            got |= {(p, ids[j]) for j in top}
        frac = np.isin(assign, np.arange(n_cent)).mean() if n_probe >= n_cent \
            else sum(np.isin(assign, np.argsort(-sim_c[p])[:n_probe]).mean()
                     for p in probe_ids) / len(probe_ids)
        print(f"| {n_probe} | {frac:.3f} | {len(got & exact) / len(exact):.3f} |")
    print()


if __name__ == "__main__":
    main()
