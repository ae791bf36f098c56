"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: the full SCD2 pipeline (M1 merge → CDC
  stream → M2 SCD2 merge) over a supplier-change feed derived from
  sf0.001, returning the history table.
- ``queries()``      — one entry per implemented operator (SURVEY.md §2).
- ``oracle_sql()``   — DuckDB-equivalent SQL per query.

Implementations live in ``slowly_changing_dimensions_data_engineering_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from slowly_changing_dimensions_data_engineering_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.scd2_supplier_history(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
