"""Edition materializations (reference docs/spec.md:62-74:
basic/flat/locuspart/flat_locuspart)."""

import os

import pytest
from pyspark.sql import functions as F

from eggopress import editions, encode, synth
from eggopress.tablefmt import Table


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ed") / "tbl")
    corpus = synth.corpus_df(spark, 400)
    encode.encode_table(spark, corpus, path, n_partitions=4)
    return path


def test_flat_edition_is_token_level(spark, table):
    out = editions.materialize(spark, table, "flat")
    flat = spark.read.parquet(out)
    assert set(flat.columns) == {"doc_id", "source", "pos", "token"}
    from eggopress import decode

    base = decode.decode_table(spark, table)
    n_tok_total = base.agg(F.sum("n_tok")).collect()[0][0]
    assert flat.count() == n_tok_total
    # per-doc position streams are dense 0..n-1
    bad = (
        flat.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn"))
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
    )
    assert bad.count() == 0


def test_locuspart_edition_partitions_by_source(spark, table):
    out = editions.materialize(spark, table, "locuspart")
    dirs = [d for d in os.listdir(out) if d.startswith("source=")]
    assert len(dirs) >= 2
    df = spark.read.parquet(out)
    assert df.count() == 400


def test_edition_catalog_in_snapshot(spark, table):
    editions.materialize(spark, table, "flat")
    editions.materialize(spark, table, "basic")
    eds = editions.list_editions(table)
    assert set(eds) >= {"flat", "basic"}
    snap = Table(table).snapshot()
    assert snap["editions"] == eds
    assert snap["stage"] == "encoded"  # snapshot carries forward, not reset


def test_packed_edition_materializes_training_sequences(spark, table):
    """packed:<ctx> writes the concat-then-chunk product partitioned by
    source: token totals preserved, every pack but the last per source
    exactly ctx, and the edition lands in the snapshot catalog."""
    from pyspark.sql import functions as F

    out = editions.materialize(spark, table, "packed:128")
    assert any(d.startswith("source=") for d in os.listdir(out))
    packs = spark.read.parquet(out)
    assert set(packs.columns) == {"source", "pack_id", "tokens", "n_tok"}

    from eggopress import decode

    corpus_tok = decode.decode_table(spark, table).agg(
        F.sum(F.col("n_tok").cast("long"))).first()[0]
    assert packs.agg(F.sum(F.col("n_tok").cast("long"))).first()[0] == corpus_tok
    # all but the per-source max pack are exactly full
    short = (
        packs.withColumn("_max", F.max("pack_id").over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("source")))
        .filter((F.col("pack_id") < F.col("_max")) & (F.col("n_tok") != 128))
    )
    assert short.count() == 0
    assert "packed:128" in editions.list_editions(table)


def test_unknown_edition_rejected(spark, table):
    with pytest.raises(ValueError):
        editions.edition_df(spark, table, "nope")
