"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in search_engine_spark/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark import driver_queries as dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 #SUM top-100 over the sf0.001 documents table."""
    return dq.all_queries()["bm25_sum_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dq.all_queries()


def oracle_sql() -> dict[str, str]:
    return dq.all_oracles()
