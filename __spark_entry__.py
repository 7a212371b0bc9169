"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction round-trip on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (registry in pdf_extract_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extract_spark.queries import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = _REGISTRY["extract_roundtrip"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _REGISTRY.items()
            if q.oracle is not None}
