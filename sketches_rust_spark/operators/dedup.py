"""Deduplication operators for web-scale training-data pipelines.

Five flavors, each with a scale story:

* exact        — md5-fingerprint groupBy, keep min id. One shuffle keyed by
                 the fingerprint; skew-free (hashes are uniform).
* ngram-jaccard— exact token-set Jaccard >= threshold via explode + shared-
                 token join (blocked). Exact but quadratic in worst case;
                 kept as the verifier for the approximate methods.
* MinHash+LSH  — shingle -> base hash -> K permutation min-hashes -> banded
                 bucket join. Shuffles are keyed by (band, band values): a
                 near-dup cluster of size c costs c^2 only within its bucket.
* SimHash      — 64-bit signature from token-hash bit votes; near-dups have
                 small Hamming distance.
* embedding cosine near-dup lives in operators/similarity.py.

Cross-engine reproducibility: the base shingle/token hash is the first 15
hex chars of md5 parsed as int (identical in Spark and DuckDB); MinHash
permutations apply SplitMix64(base XOR seed_i) — integer-exact in both
engines (see functions/sibling_oracle.splitmix64_sql), so LSH buckets and
candidate pairs admit exact oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..functions.sibling_oracle import splitmix64_sql
from ..kernel.bits import splitmix64

# deterministic permutation seeds (SplitMix64 stream of 1..K)
def _perm_seeds(k: int) -> np.ndarray:
    return splitmix64(np.arange(1, k + 1, dtype=np.uint64))


# -- exact dedup ------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct text; one hash-keyed shuffle."""
    fp = F.md5(F.col(text_col)).alias("_fp")
    keep = (df.select(F.col(id_col), fp)
            .groupBy("_fp").agg(F.min(id_col).alias(id_col)))
    return df.join(keep, id_col, "leftsemi")


def exact_dup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_rows, n_distinct, n_dup_rows) — the dedup dashboard numbers."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col(text_col)))).alias("n_dup_rows"),
    )


# -- shingling + base hash ----------------------------------------------------------

def _shingles(text: Column, k: int) -> Column:
    """Word k-shingles as an array<string> (JVM-side, no UDF)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k,
                  F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
                  ).otherwise(F.array(F.concat_ws(" ", toks)))


def _base_hash(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5, as bigint.
    Bit-identical in DuckDB: CAST(concat('0x', substr(md5(x),1,15)) AS UBIGINT).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, h): distinct shingle base-hashes per document."""
    return (df.select(F.col(id_col).alias("_id"),
                      F.explode(_shingles(F.col(text_col), k)).alias("_sh"))
            .select("_id", _base_hash(F.col("_sh")).alias("h"))
            .distinct())


# -- MinHash + LSH --------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_perm: int = 16,
                       shingle_k: int = 3) -> DataFrame:
    """(id, sig array<long>): K permutation min-hashes per document.

    Permutation hashing runs as one vectorized numpy pass per partition
    (mapInPandas partial min per doc, then an exact groupBy-min final) — the
    same partial/final shape as the sketch aggregations, so a hot document
    never concentrates on one reducer.
    """
    seeds = _perm_seeds(num_perm)
    sh = shingle_hashes(df, id_col, text_col, shingle_k)

    out_schema = StructType([
        StructField("_id", sh.schema["_id"].dataType, False),
        StructField("sig", ArrayType(LongType()), False),
    ])

    def partial(batches):
        mins: dict[object, np.ndarray] = {}
        for pdf in batches:
            ids = pdf["_id"].to_numpy()
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            # K x n permuted hashes, then per-doc min
            order = np.argsort(ids, kind="stable")
            ids_s, h_s = ids[order], h[order]
            bounds = np.flatnonzero(ids_s[1:] != ids_s[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(ids_s)]))
            for s, e in zip(starts, ends):
                hv = h_s[s:e]
                perm = splitmix64(hv[None, :] ^ seeds[:, None])
                doc_min = perm.min(axis=1)
                key = ids_s[s]
                prev = mins.get(key)
                mins[key] = doc_min if prev is None else np.minimum(prev, doc_min)
        if mins:
            # flip the sign bit so int64 ordering == uint64 ordering: the
            # JVM-side final F.min then selects the same element the
            # unsigned numpy/DuckDB min would
            yield pd.DataFrame({
                "_id": list(mins.keys()),
                "sig": [(m ^ np.uint64(1 << 63)).view(np.int64).tolist()
                        for m in mins.values()],
            })

    partials = sh.mapInPandas(partial, schema=out_schema)
    # exact final min per permutation position
    return (partials
            .select("_id", F.posexplode("sig").alias("perm", "mh"))
            .groupBy("_id", "perm").agg(F.min("mh").alias("mh"))
            .groupBy("_id")
            .agg(F.array_sort(F.collect_list(F.struct("perm", "mh"))).alias("_s"))
            .select("_id", F.transform("_s", lambda s: s["mh"]).alias("sig")))


def lsh_candidate_pairs(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any full band of the
    signature. Join keyed on (band, r minhash values) — bucket-local
    quadratic cost only."""
    r = rows_per_band
    banded = signatures.select(
        "_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(b.alias("band"), F.slice("sig", b * r + 1, r).alias("vals")),
        )).alias("bv"),
    ).select("_id", F.col("bv.band").alias("band"), F.col("bv.vals").alias("vals"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.vals") == F.col("b.vals"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct())


def minhash_jaccard_estimate(signatures: DataFrame, pairs: DataFrame) -> DataFrame:
    """(id_a, id_b, est): fraction of matching signature positions."""
    sa = signatures.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    matches = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        lambda v: v == 1))
    return joined.select(
        "id_a", "id_b",
        F.round(matches / F.size("sig_a"), 6).alias("est"))


# -- exact n-gram Jaccard ---------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_k: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact shingle-set Jaccard >= threshold via shared-shingle join.

    max_shingle_df: doc-frequency cap — shingles appearing in more than this
    many documents are dropped from every document's set BEFORE sizing and
    joining (Jaccard is then computed over the capped sets, consistently on
    both sides of the ratio). The shared-shingle self-join is quadratic in
    per-shingle doc frequency, so one stop-phrase shingle shared by 10^6
    docs means 10^12 join rows without the cap; a shingle shared by more
    than N documents carries no near-dup signal anyway. None = exact
    (the verification configuration for the approximate methods — test
    scale only)."""
    sh = shingle_hashes(df, id_col, text_col, shingle_k)
    if max_shingle_df is not None:
        # annotate each (doc, shingle) row with the shingle's doc frequency
        # via a window over h: ONE shuffle keyed by h (which the self-join
        # needs anyway) and one pass — no second shingle explosion or
        # anti-join scan
        from pyspark.sql import Window
        dfreq = F.count(F.lit(1)).over(Window.partitionBy("h"))
        sh = (sh.withColumn("_df", dfreq)
              .where(F.col("_df") <= max_shingle_df)
              .drop("_df"))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a._id") < F.col("b._id")))
             .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# -- SimHash -------------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 64) -> DataFrame:
    """(id, simhash long): sign of per-bit votes over distinct token hashes.

    Bit-vote counting is a vectorized numpy pass (unpack token hashes to a
    bit matrix, sum, sign) inside a mapInPandas partial; partial bit-vote
    vectors are summed exactly in the final aggregate, so the result is
    partition-invariant.
    """
    toks = (df.select(F.col(id_col).alias("_id"),
                      F.explode(F.split(F.col(text_col), " ")).alias("_t"))
            .select("_id", _base_hash(F.col("_t")).alias("h"))
            .distinct())

    out_schema = StructType([
        StructField("_id", toks.schema["_id"].dataType, False),
        StructField("votes", ArrayType(LongType()), False),
    ])

    def partial(batches):
        votes: dict[object, np.ndarray] = {}
        for pdf in batches:
            ids = pdf["_id"].to_numpy()
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            bits_m = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :])
                      & np.uint64(1)).astype(np.int64)
            contrib = 2 * bits_m - 1  # +1 / -1 votes
            order = np.argsort(ids, kind="stable")
            ids_s = ids[order]
            contrib = contrib[order]
            bounds = np.flatnonzero(ids_s[1:] != ids_s[:-1]) + 1
            for s, e in zip(np.concatenate(([0], bounds)),
                            np.concatenate((bounds, [len(ids_s)]))):
                key = ids_s[s]
                v = contrib[s:e].sum(axis=0)
                prev = votes.get(key)
                votes[key] = v if prev is None else prev + v
        if votes:
            yield pd.DataFrame({"_id": list(votes.keys()),
                                "votes": [v.tolist() for v in votes.values()]})

    partials = toks.mapInPandas(partial, schema=out_schema)
    summed = (partials.select("_id", F.posexplode("votes").alias("bit", "v"))
              .groupBy("_id", "bit").agg(F.sum("v").alias("v")))
    # simhash = sum over bits with positive vote of 2^bit (as signed int64)
    signed_bit = (
        F.when(F.col("v") <= 0, F.lit(0).cast("long"))
        .when(F.col("bit") < 63, F.expr("shiftleft(1L, CAST(bit AS INT))"))
        .otherwise(F.lit(-9223372036854775808).cast("long"))
    )
    return (summed.select("_id", signed_bit.alias("b"))
            .groupBy("_id").agg(F.sum("b").cast("long").alias("simhash")))


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3,
                       n_blocks: int | None = None) -> DataFrame:
    """Candidate pairs with Hamming distance <= max_hamming, blocked by
    combinations of contiguous bit spans (the multi-block scheme of Manku,
    Jain & Das Sarma, WWW'07).

    With the signature split into n_blocks spans, a pair within distance d
    differs in at most d blocks, so at least (n_blocks - d) blocks agree —
    therefore SOME combination of (n_blocks - d) blocks agrees exactly
    (pigeonhole), and joining on every such combination finds every
    qualifying pair. n_blocks = d + 1 (the default) joins on single blocks
    (cheapest key fan-out: d+1 rows/doc); LARGER n_blocks widens the join
    key (e.g. n_blocks=6, d=3 -> C(6,3)=20 keys/doc of ~32 bits instead of
    4 keys of 16 bits), cutting per-bucket collisions by ~2^16 — the knob to
    turn at 10^9+ documents where 16-bit buckets go quadratic."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if not max_hamming + 1 <= n_blocks <= 64:
        raise ValueError(
            f"n_blocks must be in [max_hamming + 1, 64], got {n_blocks}")
    import itertools

    widths = [64 // n_blocks + (1 if i < 64 % n_blocks else 0)
              for i in range(n_blocks)]
    offs = [sum(widths[:i]) for i in range(n_blocks)]

    def block_val(q: int) -> Column:
        shifted = F.shiftrightunsigned("simhash", offs[q])
        if widths[q] >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << widths[q]) - 1))

    blocks = [block_val(q) for q in range(n_blocks)]
    agree = n_blocks - max_hamming
    combos = list(itertools.combinations(range(n_blocks), agree))

    def combo_key(combo) -> Column:
        if agree == 1:  # scalar long key joins faster than a 1-array
            return blocks[combo[0]]
        return F.array(*[blocks[b] for b in combo])

    keyed = signatures.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(ci).alias("q"), combo_key(combo).alias("v"))
            for ci, combo in enumerate(combos)
        ])).alias("qv"),
    ).select("_id", "simhash", F.col("qv.q").alias("q"), F.col("qv.v").alias("v"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (a.join(b, (F.col("a.q") == F.col("b.q")) & (F.col("a.v") == F.col("b.v"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
            .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# -- near-dup clustering + canonical selection ------------------------------------------------

def near_dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs via iterative min-label
    propagation: (_id, cluster) where cluster = min doc id in the component.

    Each iteration is two broadcast-free joins; convergence takes
    O(component diameter) rounds — near-dup clusters are shallow (dup
    clusters link through shared content), so a small cap suffices and the
    loop stops early at fixpoint. This is the standard scalable CC shape
    (no driver-side union-find). Every iteration localCheckpoints the label
    table: without lineage truncation the nested self-join plan grows
    exponentially with rounds (driver OOM just *printing* it by ~iteration
    15, and unbounded recompute on failure at scale)."""
    edges = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))))
    labels = (edges.select(F.col("src").alias("_id")).distinct()
              .withColumn("cluster", F.col("_id")))
    edges = edges.cache()
    labels = labels.cache()
    try:
        changed = -1
        for _ in range(max_iters):
            neighbor_min = (edges.join(labels, edges.dst == labels._id)
                            .groupBy("src").agg(F.min("cluster").alias("nmin")))
            # fold the convergence flag into the same projection: one join
            # per iteration instead of two (no new-vs-old compare join)
            new_labels = (labels.join(neighbor_min,
                                      labels._id == neighbor_min.src, "left")
                          .select(labels._id,
                                  F.least("cluster", "nmin").alias("cluster"),
                                  (F.col("nmin") < F.col("cluster")).alias("_chg"))
                          ).localCheckpoint()
            changed = new_labels.where(F.col("_chg")).count()
            labels.unpersist()
            labels = new_labels.drop("_chg")
            if changed == 0:
                break
        if changed != 0:
            # returning unconverged labels would silently split components
            # (dedup_keep_canonical would then retain duplicates)
            raise RuntimeError(
                f"near_dup_clusters did not converge within max_iters="
                f"{max_iters} (labels still changing); the component "
                f"diameter exceeds the cap — raise max_iters")
        return labels.select("_id", "cluster")
    finally:
        edges.unpersist()


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Drop every near-dup except the canonical (minimum-id) member of each
    cluster; rows in no cluster are kept unchanged."""
    clusters = near_dup_clusters(pairs)
    drop = (clusters.where(F.col("_id") != F.col("cluster"))
            .select(F.col("_id").alias(id_col)))
    return df.join(drop, id_col, "left_anti")


# -- oracles ----------------------------------------------------------------------------------

def exact_dup_stats_oracle_sql(table: str, text_col: str = "text") -> str:
    return f"""
SELECT count(*) AS n_rows,
       count(DISTINCT md5({text_col})) AS n_distinct,
       count(*) - count(DISTINCT md5({text_col})) AS n_dup_rows
FROM {table}
"""


def _duck_shingle_hashes(table: str, id_col: str, text_col: str, k: int) -> str:
    """DuckDB CTE text for per-doc distinct shingle base-hashes."""
    return f"""
toks AS (SELECT {id_col} AS _id, string_split({text_col}, ' ') AS t FROM {table}),
sh AS (
  SELECT _id,
         unnest(CASE WHEN len(t) >= {k}
                THEN list_transform(range(1, len(t) - {k} + 2),
                                    i -> array_to_string(t[i:i+{k - 1}], ' '))
                ELSE [array_to_string(t, ' ')] END) AS s
  FROM toks
),
shh AS (
  SELECT DISTINCT _id,
         CAST(concat('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS h
  FROM sh
)"""


def ngram_jaccard_oracle_sql(table: str, id_col: str, text_col: str,
                             shingle_k: int, threshold: float,
                             max_shingle_df: int | None = None) -> str:
    if max_shingle_df is not None:
        capped = f""",
capped AS (
  SELECT _id, h FROM shh
  WHERE h IN (SELECT h FROM shh GROUP BY h HAVING count(*) <= {max_shingle_df})
)"""
        src = "capped"
    else:
        capped = ""
        src = "shh"
    return f"""
WITH {_duck_shingle_hashes(table, id_col, text_col, shingle_k)}{capped},
sizes AS (SELECT _id, count(*) AS n FROM {src} GROUP BY _id),
inter AS (
  SELECT a._id AS id_a, b._id AS id_b, count(*) AS i
  FROM {src} a JOIN {src} b ON a.h = b.h AND a._id < b._id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i::DOUBLE / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na._id = id_a
JOIN sizes nb ON nb._id = id_b
WHERE i::DOUBLE / (na.n + nb.n - i) >= {threshold!r}
"""


def _duck_simhash_sig(table: str, id_col: str, text_col: str) -> str:
    """DuckDB CTE text computing the exact simhash signature per document
    (distinct-token md5 base hashes, per-bit +-1 votes, positive-vote bits).
    The base hash is 60-bit, so bits 60..63 always vote negative and the
    signed BIGINT signature never wraps."""
    return f"""
thh AS (
  SELECT DISTINCT {id_col} AS _id,
         CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) AS h
  FROM (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t FROM {table})
),
votes AS (
  SELECT _id, bb.bit AS bit,
         sum(CASE WHEN (h >> bb.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM thh, (SELECT unnest(range(0, 64)) AS bit) bb
  GROUP BY _id, bb.bit
),
sig AS (
  SELECT _id,
         CAST(sum(CASE WHEN v > 0 AND bit < 63
                       THEN CAST(1 AS BIGINT) << CAST(bit AS INT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY _id
)"""


def simhash_pairs_oracle_sql(table: str, id_col: str, text_col: str,
                             max_hamming: int) -> str:
    """All-pairs Hamming filter — exactly what the blocked join computes
    (pigeonhole makes blocking lossless for d <= max_hamming)."""
    return f"""
WITH {_duck_simhash_sig(table, id_col, text_col)}
SELECT a._id AS id_a, b._id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a._id < b._id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def keep_canonical_oracle_sql(table: str, id_col: str, text_col: str,
                              max_hamming: int) -> str:
    """End-to-end near-dup removal oracle: simhash pairs -> connected
    components via a recursive transitive closure -> keep the min-id member
    of each component (plus every unpaired row)."""
    return f"""
WITH RECURSIVE {_duck_simhash_sig(table, id_col, text_col)},
pairs AS (
  SELECT a._id AS id_a, b._id AS id_b
  FROM sig a JOIN sig b ON a._id < b._id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
clusters AS (
  SELECT s AS _id, least(s, min(d)) AS cluster FROM reach GROUP BY s
)
SELECT {id_col} FROM {table}
WHERE {id_col} NOT IN (SELECT _id FROM clusters WHERE _id <> cluster)
"""


def minhash_lsh_oracle_sql(table: str, id_col: str, text_col: str,
                           num_perm: int, shingle_k: int,
                           bands: int, rows_per_band: int) -> str:
    """Exact oracle for LSH candidate pairs + signature-match estimate."""
    seeds = _perm_seeds(num_perm)
    seed_rows = ", ".join(
        f"({i}, CAST({int(s)} AS UBIGINT))" for i, s in enumerate(seeds))
    sm = splitmix64_sql("xor(h, seed)")
    r = rows_per_band
    return f"""
WITH {_duck_shingle_hashes(table, id_col, text_col, shingle_k)},
seeds(perm, seed) AS (VALUES {seed_rows}),
mh AS (
  SELECT _id, perm, min({sm}) AS mh
  FROM shh, seeds
  GROUP BY _id, perm
),
banded AS (
  SELECT _id, perm // {r} AS band,
         list(mh ORDER BY perm) AS vals
  FROM mh
  GROUP BY _id, perm // {r}
),
cand AS (
  SELECT DISTINCT a._id AS id_a, b._id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.vals = b.vals AND a._id < b._id
),
sigs AS (SELECT _id, list(mh ORDER BY perm) AS sig FROM mh GROUP BY _id)
SELECT c.id_a, c.id_b,
       round(len(list_filter(range(1, {num_perm} + 1),
                             i -> sa.sig[i] = sb.sig[i]))::DOUBLE / {num_perm}, 6) AS est
FROM cand c
JOIN sigs sa ON sa._id = c.id_a
JOIN sigs sb ON sb._id = c.id_b
"""
