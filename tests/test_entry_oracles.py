"""Mirror of the driver's correctness gate: run each __spark_entry__
query at sf0.001 and compare against its DuckDB oracle (row count, column
names, order-insensitive values)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Type-sensitive normalization: int vs float vs Decimal must MATCH in
    kind, not just value — the driver's hash gate treats DuckDB HUGEINT
    rendered as float ('1533.0') as different from Spark's bigint ('1533'),
    so the local mirror must too (round-1 lesson)."""
    import decimal

    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v:.6f}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def _frame_rows(pdf):
    """pandas frame -> (lowercase cols, python-native row tuples). Both
    sides go through pandas because the driver does — DuckDB's HUGEINT
    becomes float64 only on the pandas path, which fetchall() hides."""
    cols = [c.lower() for c in pdf.columns]
    rows = [
        tuple(v.item() if hasattr(v, "item") else v for v in t)
        for t in pdf.itertuples(index=False, name=None)
    ]
    return cols, rows


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["n_mismatch"] == 0 for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_cols, spark_rows = _frame_rows(QUERIES[name](spark, SF_DIR).toPandas())
    duck_cols, duck_rows = _frame_rows(duck.sql(ORACLES[name]).df())

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (name, len(spark_rows), len(duck_rows))
    assert _rowset(spark_cols, spark_rows) == _rowset(duck_cols, duck_rows)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
