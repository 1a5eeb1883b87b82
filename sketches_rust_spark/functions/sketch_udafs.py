"""Spark aggregation layer for the sibling sketches (HLL, CMS, Bloom,
t-digest, KLL).

Same two-level shape as the DDSketch pandas path: mapInPandas partial per
(scan partition x group) — no raw-row shuffle — then applyInPandas blob merge
per group. Hashing happens JVM-side where possible (xxhash64) or as
vectorized numpy (splitmix64, when the query needs a cross-engine-
reproducible hash for its DuckDB oracle).

Each kernel plugs in via a small adapter: new() / update(sketch, pdf) /
encode / decode_and_merge. Blobs are the engines' own wire formats
(kernel/{hll,cms,bloom,tdigest,kll}.py) — mergeable in SQL via
``<name>_merge`` GROUPED_AGG UDFs registered by register_sibling_sql.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.bits import splitmix64
from ..kernel.bloom import BloomFilter
from ..kernel.cms import CountMinSketch
from ..kernel.hll import HyperLogLog
from ..kernel.kll import KLL
from ..kernel.kmv import KMV
from ..kernel.tdigest import TDigest
from .ddsketch_spark import ROWS_COL, SKETCH_COL, _factorize_keys, _key_fields


@dataclass(frozen=True)
class SketchAdapter:
    name: str
    new: Callable[[], object]
    update: Callable[[object, pd.DataFrame], None]  # consumes pdf["_in"]
    decode_and_merge: Callable[[object, bytes], None]


def _to_u64(series: pd.Series) -> np.ndarray:
    return series.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)


def hll_adapter(p: int = 14, hash_mode: str = "pre") -> SketchAdapter:
    """hash_mode='pre': input column already holds 64-bit hashes (e.g. JVM
    xxhash64). 'splitmix': input is a numeric id, hashed with splitmix64 in
    numpy (cross-engine reproducible for oracles)."""
    def update(sk, pdf):
        h = _to_u64(pdf["_in"])
        if hash_mode == "splitmix":
            h = splitmix64(h)
        sk.add_hashes(h)
    return SketchAdapter(
        "hll", lambda: HyperLogLog(p), update,
        lambda sk, b: sk.decode_and_merge_with(b))


def cms_adapter(depth: int = 5, width: int = 2048, hash_mode: str = "pre") -> SketchAdapter:
    def update(sk, pdf):
        h = _to_u64(pdf["_in"])
        if hash_mode == "splitmix":
            h = splitmix64(h)
        sk.add_hashes(h)
    return SketchAdapter(
        "cms", lambda: CountMinSketch(depth, width), update,
        lambda sk, b: sk.decode_and_merge_with(b))


def bloom_adapter(m_bits: int = 1 << 20, k: int = 7, hash_mode: str = "pre") -> SketchAdapter:
    def update(sk, pdf):
        h = _to_u64(pdf["_in"])
        if hash_mode == "splitmix":
            h = splitmix64(h)
        sk.add_hashes(h)
    return SketchAdapter(
        "bloom", lambda: BloomFilter(m_bits, k), update,
        lambda sk, b: sk.decode_and_merge_with(b))


def kmv_adapter(k: int = 256, hash_mode: str = "pre") -> SketchAdapter:
    """KMV / bottom-k theta sketch: distinct counts that also support
    set-intersection estimates (kernel/kmv.py). 'splitmix' hashing keeps
    the retained hash set — and therefore every estimate — exactly
    reproducible in the DuckDB oracle (bottom-k = ORDER BY hash LIMIT k)."""
    def update(sk, pdf):
        h = _to_u64(pdf["_in"])
        if hash_mode == "splitmix":
            h = splitmix64(h)
        sk.add_hashes(h)
    return SketchAdapter(
        "kmv", lambda: KMV(k), update,
        lambda sk, b: sk.decode_and_merge_with(b))


def tdigest_adapter(delta: float = 200.0) -> SketchAdapter:
    return SketchAdapter(
        "tdigest", lambda: TDigest(delta),
        lambda sk, pdf: sk.accept_many(pdf["_in"].to_numpy(np.float64, na_value=np.nan)),
        lambda sk, b: sk.decode_and_merge_with(b))


def kll_adapter(k: int = 200) -> SketchAdapter:
    return SketchAdapter(
        "kll", lambda: KLL(k),
        lambda sk, pdf: sk.accept_many(pdf["_in"].to_numpy(np.float64, na_value=np.nan)),
        lambda sk, b: sk.decode_and_merge_with(b))


def sketch_aggregate(
    df: DataFrame,
    input_col,
    keys: Sequence[str],
    adapter: SketchAdapter,
) -> DataFrame:
    """Generic two-level mergeable aggregation -> (keys..., sketch, rows_in).

    input_col: column name or Column expression fed to the kernel as "_in".
    """
    keys = list(keys)
    col = F.col(input_col) if isinstance(input_col, str) else input_col
    narrow = df.select(*keys, col.alias("_in")).where(F.col("_in").isNotNull())
    out_schema = StructType(
        _key_fields(narrow, keys)
        + [StructField(SKETCH_COL, BinaryType(), False),
           StructField(ROWS_COL, LongType(), False)]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[tuple, object] = {}
        rows: dict[tuple, int] = {}
        for pdf in batches:
            if not keys:
                sk = sketches.setdefault((), adapter.new())
                adapter.update(sk, pdf)
                rows[()] = rows.get((), 0) + len(pdf)
                continue
            codes, uniques = _factorize_keys(pdf, keys)
            order = np.argsort(codes, kind="stable")
            pdf = pdf.iloc[order]
            sorted_codes = codes[order]
            bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(sorted_codes)]))
            for s, e in zip(starts, ends):
                key = uniques[sorted_codes[s]]
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = adapter.new()
                    rows[key] = 0
                adapter.update(sk, pdf.iloc[s:e])
                rows[key] += e - s
        if sketches:
            records = [
                dict(zip(keys, key)) | {SKETCH_COL: sk.encode(), ROWS_COL: rows[key]}
                for key, sk in sketches.items()
            ]
            yield pd.DataFrame(records, columns=keys + [SKETCH_COL, ROWS_COL])

    partials = narrow.mapInPandas(partial, schema=out_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = adapter.new()
        for blob in pdf[SKETCH_COL]:
            adapter.decode_and_merge(sk, bytes(blob))
        head = {k: pdf[k].iloc[0] for k in keys}
        head[SKETCH_COL] = sk.encode()
        head[ROWS_COL] = int(pdf[ROWS_COL].sum())
        return pd.DataFrame([head], columns=keys + [SKETCH_COL, ROWS_COL])

    if keys:
        return partials.groupBy(*keys).applyInPandas(merge, schema=out_schema)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(merge, schema=out_schema)


def multi_family_aggregate(
    df: DataFrame,
    input_col,
    keys: Sequence[str],
    families: dict,
) -> DataFrame:
    """One-pass build of SEVERAL sketch families over the SAME scan.

    ``families``: {name: (SketchAdapter, row_mask_Column_or_None)} — each
    family sketches the rows its mask selects (None = all rows). Output:
    (family, keys..., sketch, rows_in), one row per (family, group).

    Shape rationale: N separate ``sketch_aggregate`` calls over one table
    cost N scans and N Python partial stages; at 100 TB that is N passes
    over the corpus for sketches that could share every batch. Here the
    partial stage updates every family from each Arrow batch (masked
    per-family), and the single blob-merge stage dispatches on the family
    column. All supported kernels (HLL register-max, KMV bottom-k, CMS
    counter adds, Bloom bit-OR, histogram adds) are order-insensitive, so
    the per-family blobs equal the single-family build's byte-for-byte
    (tested in tests/test_sibling_spark.py)."""
    keys = list(keys)
    col = F.col(input_col) if isinstance(input_col, str) else input_col
    sel = [*keys, col.alias("_in")]
    for name, (_ad, mask) in families.items():
        sel.append((F.lit(True) if mask is None else mask).alias(f"_m_{name}"))
    narrow = df.select(*sel).where(F.col("_in").isNotNull())
    out_schema = StructType(
        [StructField("family", StringType(), False)]
        + _key_fields(narrow, keys)
        + [StructField(SKETCH_COL, BinaryType(), False),
           StructField(ROWS_COL, LongType(), False)]
    )

    # the partial closure must not capture `families` itself: the mask
    # Columns are py4j objects and unpicklable — ship only the adapters
    adapters = {name: ad for name, (ad, _mask) in families.items()}

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[tuple, object] = {}
        rows: dict[tuple, int] = {}

        def update(key: tuple, sub: pd.DataFrame) -> None:
            for name, adapter in adapters.items():
                m = sub[f"_m_{name}"].to_numpy(dtype=bool)
                if not m.any():
                    continue
                fsub = sub if m.all() else sub[m]
                k2 = (name, key)
                sk = sketches.get(k2)
                if sk is None:
                    sk = sketches[k2] = adapter.new()
                    rows[k2] = 0
                adapter.update(sk, fsub)
                rows[k2] += len(fsub)

        for pdf in batches:
            if not len(pdf):
                continue
            if not keys:
                update((), pdf)
                continue
            codes, uniques = _factorize_keys(pdf, keys)
            order = np.argsort(codes, kind="stable")
            pdf = pdf.iloc[order]
            sorted_codes = codes[order]
            bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(sorted_codes)]))
            for s, e in zip(starts, ends):
                update(uniques[sorted_codes[s]], pdf.iloc[s:e])
        if sketches:
            records = [
                {"family": name} | dict(zip(keys, key))
                | {SKETCH_COL: sk.encode(), ROWS_COL: rows[(name, key)]}
                for (name, key), sk in sketches.items()
            ]
            yield pd.DataFrame(
                records, columns=["family"] + keys + [SKETCH_COL, ROWS_COL])

    partials = narrow.mapInPandas(partial, schema=out_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["family"].iloc[0]
        adapter = adapters[name]
        sk = adapter.new()
        for blob in pdf[SKETCH_COL]:
            adapter.decode_and_merge(sk, bytes(blob))
        head = {"family": name} | {k: pdf[k].iloc[0] for k in keys}
        head[SKETCH_COL] = sk.encode()
        head[ROWS_COL] = int(pdf[ROWS_COL].sum())
        return pd.DataFrame(
            [head], columns=["family"] + keys + [SKETCH_COL, ROWS_COL])

    return partials.groupBy("family", *keys).applyInPandas(
        merge, schema=out_schema)


# -- extraction UDFs ----------------------------------------------------------

@pandas_udf(DoubleType())
def hll_estimate(blobs: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else HyperLogLog.decode(bytes(b)).estimate() for b in blobs],
        dtype="float64")


@pandas_udf(DoubleType())
def kmv_estimate(blobs: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else KMV.decode(bytes(b)).estimate() for b in blobs],
        dtype="float64")


@pandas_udf(DoubleType())
def kmv_intersection(blobs_a: pd.Series, blobs_b: pd.Series) -> pd.Series:
    out = []
    for a, b in zip(blobs_a, blobs_b):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(KMV.decode(bytes(a)).intersection_estimate(
            KMV.decode(bytes(b))))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def kmv_difference(blobs_a: pd.Series, blobs_b: pd.Series) -> pd.Series:
    """|A ∖ B| on the common-theta sample (kernel/kmv.py
    difference_estimate) — with estimate and intersection this completes
    the theta-sketch set algebra."""
    out = []
    for a, b in zip(blobs_a, blobs_b):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(KMV.decode(bytes(a)).difference_estimate(
            KMV.decode(bytes(b))))
    return pd.Series(out, dtype="float64")


@pandas_udf(LongType())
def cms_total(blobs: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else CountMinSketch.decode(bytes(b)).total() for b in blobs])


@pandas_udf(LongType())
def cms_point_estimate(blobs: pd.Series, hashes: pd.Series) -> pd.Series:
    out = []
    for b, h in zip(blobs, hashes):
        if b is None:
            out.append(None)
            continue
        cms = CountMinSketch.decode(bytes(b))
        hv = np.array([np.int64(h)]).view(np.uint64)
        out.append(int(cms.estimate_hashes(hv)[0]))
    return pd.Series(out)


@pandas_udf(BooleanType())
def bloom_might_contain(blobs: pd.Series, hashes: pd.Series) -> pd.Series:
    out = []
    for b, h in zip(blobs, hashes):
        if b is None:
            out.append(None)
            continue
        bf = BloomFilter.decode(bytes(b))
        hv = np.array([np.int64(h)]).view(np.uint64)
        out.append(bool(bf.might_contain_hashes(hv)[0]))
    return pd.Series(out)


@pandas_udf(DoubleType())
def tdigest_quantile(blobs: pd.Series, quantiles: pd.Series) -> pd.Series:
    out = []
    for b, q in zip(blobs, quantiles):
        out.append(None if b is None else TDigest.decode(bytes(b)).quantile(float(q)))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def kll_quantile(blobs: pd.Series, quantiles: pd.Series) -> pd.Series:
    out = []
    for b, q in zip(blobs, quantiles):
        out.append(None if b is None else KLL.decode(bytes(b)).quantile(float(q)))
    return pd.Series(out, dtype="float64")


def _merge_udaf(decode_merge, new):
    def merge_blobs(blobs: pd.Series) -> bytes:
        sk = new()
        for b in blobs:
            if b is not None:
                decode_merge(sk, bytes(b))
        return sk.encode()
    return pandas_udf(merge_blobs, "binary", PandasUDFType.GROUPED_AGG)


def register_sibling_sql(spark: SparkSession,
                         hll_p: int = 14,
                         cms_depth: int = 5, cms_width: int = 2048,
                         bloom_m: int = 1 << 20, bloom_k: int = 7,
                         tdigest_delta: float = 200.0,
                         kll_k: int = 200,
                         kmv_k: int = 256) -> None:
    """Register extraction + merge functions for SQL composition, e.g.
    SELECT lang, hll_estimate(hll_merge(sketch)) FROM partials GROUP BY lang.
    """
    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("kmv_estimate", kmv_estimate)
    spark.udf.register("kmv_intersection", kmv_intersection)
    spark.udf.register("kmv_difference", kmv_difference)
    spark.udf.register("kmv_merge", _merge_udaf(
        lambda sk, b: sk.decode_and_merge_with(b), lambda: KMV(kmv_k)))
    spark.udf.register("cms_total", cms_total)
    spark.udf.register("cms_point_estimate", cms_point_estimate)
    spark.udf.register("bloom_might_contain", bloom_might_contain)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("kll_quantile", kll_quantile)
    spark.udf.register("hll_merge", _merge_udaf(
        lambda sk, b: sk.decode_and_merge_with(b), lambda: HyperLogLog(hll_p)))
    spark.udf.register("cms_merge", _merge_udaf(
        lambda sk, b: sk.decode_and_merge_with(b),
        lambda: CountMinSketch(cms_depth, cms_width)))
    spark.udf.register("bloom_merge", _merge_udaf(
        lambda sk, b: sk.decode_and_merge_with(b),
        lambda: BloomFilter(bloom_m, bloom_k)))
    spark.udf.register("tdigest_merge", _merge_udaf(
        lambda sk, b: sk.decode_and_merge_with(b), lambda: TDigest(tdigest_delta)))
    spark.udf.register("kll_merge", _merge_udaf(
        lambda sk, b: sk.decode_and_merge_with(b), lambda: KLL(kll_k)))
