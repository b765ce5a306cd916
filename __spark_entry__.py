"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implemented operators are inventoried in SURVEY.md section 2; the queries /
oracles themselves live in ``miru_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from miru_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index on sf0.001, run a block-max WAND
    BM25 top-k search; driver checks rows>0."""
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL oracle per query (omitted for non-SQL-expressible ops)."""
    return registry.oracle_sql()
