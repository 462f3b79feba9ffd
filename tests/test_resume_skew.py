"""Resume (failure-injection) + skew/salting tests. SURVEY.md §5 items 5-6."""

import pytest
from pyspark.sql import functions as F

from eggopress import decode, encode, lineage, synth, verify
from eggopress.encode import partition_ids, plan_salts
from eggopress.tablefmt import Table

N_DOCS = 2000


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth.corpus_df(spark, N_DOCS)
    df.cache().count()
    return df


def test_plan_salts_proportional():
    salts = plan_salts({"web": 7000, "books": 750, "code": 750, "wiki": 750, "forums": 750}, 16)
    assert salts["web"] >= 10  # hot source gets most partitions
    assert all(v >= 1 for v in salts.values())
    assert salts == plan_salts({"web": 7000, "books": 750, "code": 750, "wiki": 750, "forums": 750}, 16)


def test_salting_bounds_partition_size(spark, corpus, tmp_path):
    path = str(tmp_path / "tbl_skew")
    encode.encode_table(spark, corpus, path, n_partitions=16)
    tbl = Table(path)
    lin = lineage.read(spark, tbl).filter(F.col("status") == "done")
    rows = {r["partition_id"]: r["row_count"] for r in lin.collect()}
    web_parts = [v for k, v in rows.items() if k.startswith("source=web/")]
    assert len(web_parts) >= 8, "web should be salted into many partitions"
    # no single web partition dominates: max ≤ 3× mean over web partitions
    assert max(web_parts) <= 3 * (sum(web_parts) / len(web_parts))


def test_failure_injection_then_resume(spark, corpus, tmp_path):
    path = str(tmp_path / "tbl_resume")
    # wave-per-partition so completed waves commit before the poisoned one
    snap_salts = plan_salts(
        {r["source"]: r["c"] for r in corpus.groupBy("source").agg(F.count("*").alias("c")).collect()},
        8,
    )
    pids = partition_ids(snap_salts)
    poison = pids[-1]
    with pytest.raises(Exception):
        encode.encode_table(
            spark, corpus, path, n_partitions=8,
            waves=len(pids), fail_partitions=frozenset([poison]),
        )
    tbl = Table(path)
    done_before = set(lineage.done_partitions(spark, tbl))
    assert done_before, "some partitions should have committed before the failure"
    assert poison not in done_before

    # resume: only remaining partitions re-encode
    summary = encode.encode_table(spark, corpus, path, resume=True)
    assert summary["skipped"] == len(done_before)
    assert summary["partitions"] == len(pids) - len(done_before)

    # attempts incremented only for re-run partitions; the failed first
    # attempt is now itself recorded in lineage (status='failed'), so the
    # successful resume run is attempt 2
    attempts = lineage.attempt_counts(spark, tbl)
    assert attempts[poison] == 2
    failed = lineage.read(spark, tbl).filter(
        (F.col("status") == "failed") & (F.col("partition_id") == poison)
    )
    assert failed.count() >= 1
    # final output identical to a clean encode
    decoded = decode.decode_table(spark, path)
    assert decoded.count() == N_DOCS
    assert verify.roundtrip_ok(corpus, decoded)


def test_resume_noop_when_complete(spark, corpus, tmp_path):
    path = str(tmp_path / "tbl_noop")
    encode.encode_table(spark, corpus, path, n_partitions=8)
    summary = encode.encode_table(spark, corpus, path, resume=True)
    assert summary["partitions"] == 0
    assert summary["skipped"] > 0


def test_fresh_reencode_is_non_destructive(spark, corpus, tmp_path):
    """A fresh (non-resume) re-encode must not destroy the previous good
    table before the replacement commits: the old data is retired ASIDE,
    the snapshot is demoted (so stage-gated readers never see 'encoded'
    over dirs in flux), and only a successful final commit purges it."""
    import os

    path = str(tmp_path / "tbl_nondestructive")
    encode.encode_table(spark, corpus, path, n_partitions=4)
    tbl = Table(path)
    assert tbl.snapshot()["stage"] == "encoded"

    # poisoned fresh re-encode dies before anything commits
    pids = partition_ids(tbl.snapshot()["salts"])
    with pytest.raises(Exception):
        encode.encode_table(
            spark, corpus, path, n_partitions=4,
            fail_partitions=frozenset(pids),
        )
    snap = tbl.snapshot()
    assert snap["stage"] != "encoded", "readers must not see a valid snapshot"
    retired = [e for e in os.listdir(path) if e.startswith("_retired_")]
    assert retired, "previous table contents must survive the failed encode"
    retired_data = os.path.join(path, retired[0], "data")
    assert os.path.isdir(retired_data) and os.listdir(retired_data)

    # a clean re-encode replaces the table and purges the retired copy
    encode.encode_table(spark, corpus, path, n_partitions=4)
    assert tbl.snapshot()["stage"] == "encoded"
    assert not [e for e in os.listdir(path) if e.startswith("_retired_")]
    assert decode.decode_table(spark, path).count() == N_DOCS


def test_deterministic_reencode(spark, corpus, tmp_path):
    """Codec choice + chunking depend only on content: re-encoding a
    partition reproduces identical blobs (resume determinism)."""
    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    encode.encode_table(spark, corpus, p1, n_partitions=8)
    encode.encode_table(spark, corpus, p2, n_partitions=8)
    a = spark.read.parquet(Table(p1).data_dir)
    b = spark.read.parquet(Table(p2).data_dir)
    cols = ["partition_id", "n_rows", "n_values", "encoded_bytes",
            "tokens_codec", "doc_id_codec"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
