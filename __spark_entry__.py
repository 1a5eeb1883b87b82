"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-lang DDSketch text-length
quantiles) on sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB-checkable oracles where the semantics
are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sketches_rust_spark.operators.queries import (  # noqa: E402
    DDSKETCH_ORACLES,
    DDSKETCH_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return DDSKETCH_QUERIES["ddsketch_textlen_by_lang"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DDSKETCH_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DDSKETCH_ORACLES)
