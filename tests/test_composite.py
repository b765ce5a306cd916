"""Tagged-union composite registry entries (plans/composite.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from miru_spark.plans.composite import composite_oracle, composite_query


def _mk(cols_rows_schema):
    cols, rows, schema = cols_rows_schema

    def fn(spark, sf_dir):
        return spark.createDataFrame(rows, schema)

    return fn


def test_composite_union_and_oracle(spark):
    members = [
        ("a", _mk((None, [(1, 2.5)], "x long, y double")), "SELECT 1 AS x, 2.5 AS y",
         ("x", "y")),
        ("b", _mk((None, [("k", 7)], "z string, n long")),
         "SELECT 'k' AS z, CAST(7 AS BIGINT) AS n", ("z", "n")),
    ]
    df = composite_query(members)(spark, "")
    assert df.columns == ["case_tag", "x", "y", "z", "n"]
    got = sorted(tuple(r) for r in df.collect())
    sql = composite_oracle(members)
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want  # NULL padding identical on both sides


def test_composite_rejects_mixed_oracle():
    members = [
        ("a", None, "SELECT 1 AS x", ("x",)),
        ("b", None, None, ("y",)),
    ]
    with pytest.raises(ValueError, match="mixes oracled and rows-only"):
        composite_oracle(members)


def test_composite_all_rows_only_is_rows_only():
    members = [("a", None, None, ("x",)), ("b", None, None, ("y",))]
    assert composite_oracle(members) is None


def test_composite_detects_column_drift(spark):
    members = [("a", _mk((None, [(1,)], "x long")), None, ("WRONG",))]
    with pytest.raises(AssertionError, match="declared columns"):
        composite_query(members)(spark, "")


def test_registry_is_at_most_50_entries():
    """The driver records only the first 50 registered entries; the whole
    suite must fit so the correctness scoreboard is complete."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry"] = mod
    spec.loader.exec_module(mod)
    qs = mod.queries()
    assert len(qs) <= 50
    assert set(mod.oracle_sql()) <= set(qs)
