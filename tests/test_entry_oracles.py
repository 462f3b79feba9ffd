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
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    try:  # Decimal / numpy scalars
        if hasattr(v, "is_integer") or type(v).__name__ in ("Decimal",):
            return f"{float(v):.6f}"
    except Exception:
        pass
    if isinstance(v, int):
        return f"{float(v):.6f}"
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["n_mismatch"] == 0 for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in qdf.columns]
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = duck.sql(ORACLES[name])
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (name, len(spark_rows), len(duck_rows))
    assert _rowset(spark_cols, spark_rows) == _rowset(duck_cols, duck_rows)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
