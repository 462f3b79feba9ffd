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


def test_c6_codec_selection_deterministic_and_optimal(spark):
    """Real verification for the c6 gate row (no SQL oracle can see codec
    internals): over EVERY chunk of the gate fixture table, (a) re-running
    selection on the decoded values reproduces the stored blob
    byte-identically — determinism, the property resume correctness
    hangs on; (b) the chosen blob is within the documented 2% forbp
    tie-break of the best full-size candidate encoding and never larger
    than plain — optimality (the plain ceiling also covers the delta
    decisive-win rule: a narrowly-best delta is deliberately declined
    because its high-entropy output loses the post-storage byte war);
    (c) the manifest's recorded codec equals the blob header's."""
    from eggopress.codecs import core as codecs
    from eggopress.codecs import intcodecs, strcodecs
    from eggopress.tablefmt import Table

    path = entrymod._roundtrip_table(spark, SF_DIR)
    tbl = Table(path)
    chunks = spark.read.parquet(tbl.data_dir).select(
        "partition_id", "chunk_id",
        "doc_id_blob", "source_blob", "n_tok_blob", "tokens_blob").collect()
    man = {(r["partition_id"], r["chunk_id"], r["column"]): r["codec"]
           for r in spark.read.parquet(tbl.manifest_dir).collect()}
    assert chunks
    checked = 0
    for r in chunks:
        for col, blob in (("n_tok", bytes(r["n_tok_blob"])),
                          ("tokens", bytes(r["tokens_blob"]))):
            vals = intcodecs.decode_ints(blob)
            assert intcodecs.encode_ints(vals) == blob, (col, "nondeterministic")
            sizes = {}
            for name, enc in intcodecs._ENCODERS.items():
                try:
                    sizes[name] = len(enc(vals))
                except OverflowError:
                    pass
            best = min(sizes.values())
            assert len(blob) <= max(1.02 * best, sizes["plain"]), (
                col, len(blob), sizes)
            assert man[(r["partition_id"], r["chunk_id"], col)] == codecs.codec_of(blob)
            checked += 1
        for col, blob in (("doc_id", bytes(r["doc_id_blob"])),
                          ("source", bytes(r["source_blob"]))):
            lengths, buf = strcodecs.decode_strs(blob)
            assert strcodecs.encode_strs(lengths, buf) == blob, (col, "nondeterministic")
            sizes = {name: len(enc(lengths, buf))
                     for name, enc in strcodecs._ENCODERS.items()}
            best = min(sizes.values())
            assert len(blob) <= max(1.02 * best, sizes["str_plain"]), (
                col, len(blob), sizes)
            assert man[(r["partition_id"], r["chunk_id"], col)] == codecs.codec_of(blob)
            checked += 1
    assert checked >= 4 * len(chunks)


def test_v1_lineage_invariants(spark):
    """Real verification for the v1 gate row: the lineage checkpoint must
    be a complete, non-duplicated account of the encode — exactly one
    'done' encode row per PLANNED partition (the resume anti-join's
    correctness condition), and the lineage row/byte totals must equal
    the snapshot's committed totals."""
    from collections import Counter

    from eggopress import lineage
    from eggopress.tablefmt import Table

    path = entrymod._roundtrip_table(spark, SF_DIR)
    tbl = Table(path)
    snap = tbl.snapshot()
    planned = {f"source={s}/salt={k}"
               for s, n in snap["salts"].items() for k in range(int(n))}
    rows = lineage.read(spark, Table(path)).collect()
    done = [r for r in rows if r["stage"] == "encode" and r["status"] == "done"]
    per_pid = Counter(r["partition_id"] for r in done)
    assert set(per_pid) == planned
    assert all(v == 1 for v in per_pid.values()), per_pid
    assert sum(r["row_count"] or 0 for r in done) == snap["totals"]["rows"]
    assert sum(r["output_bytes"] or 0 for r in done) == snap["totals"]["encoded_bytes"]
    # no failed rows on the clean fixture; attempts all 1
    assert all((r["attempt"] or 1) == 1 for r in done)
