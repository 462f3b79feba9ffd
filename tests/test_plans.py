"""Physical-plan assertions: the scale story must survive refactors.

Checks that Catalyst actually delivers what the design claims: partition
pruning on the source= layout, column pruning past blob columns, broadcast
for the dimension join, and single evaluation of expensive projection
expressions (no CollapseProject duplication of md5 arrays).
"""

import pytest
from pyspark.sql import functions as F

from eggopress import encode, synth


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "tbl")
    df = synth.corpus_df(spark, 1000)
    encode.encode_table(spark, df, path, n_partitions=4)
    return path


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_decode_scan_prunes_partitions_and_columns(spark, table):
    from eggopress import decode

    df = decode.read_encoded(spark, table, sources=["web"]).select("doc_id_blob")
    plan = _formatted(df)
    assert "PartitionFilters" in plan and "source" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id_blob" in read_schema
    assert "tokens_blob" not in read_schema, "unreferenced blob must be pruned"


def test_projected_decode_never_reads_token_blobs(spark, table):
    """decode_table(columns=) must push blob-level projection to the scan:
    a doc_id/n_tok/source decode reads zero token-payload bytes."""
    from eggopress import decode

    df = decode.decode_table(spark, table, columns=["doc_id", "n_tok", "source"])
    read_schema = [l for l in _formatted(df).splitlines() if "ReadSchema" in l][0]
    assert "tokens_blob" not in read_schema, "token payload must be pruned"
    for needed in ("doc_id_blob", "n_tok_blob", "source_blob"):
        assert needed in read_schema


def test_stats_rollup_is_metadata_only(spark, table):
    """stats_rollup answers per-source totals from chunk stats columns;
    its scan must read zero blob bytes, and the totals must equal a full
    decode's."""
    from eggopress import decode

    df = decode.stats_rollup(spark, table)
    read_schema = [l for l in _formatted(df).splitlines() if "ReadSchema" in l][0]
    assert "blob" not in read_schema
    got = {r["source"]: (r["n_docs"], r["n_tok_sum"]) for r in df.collect()}
    full = {
        r["source"]: (r["n_docs"], r["n_tok_sum"])
        for r in decode.decode_table(spark, table, columns=["n_tok", "source"])
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tok_sum"),
        )
        .collect()
    }
    assert got == full


def test_stats_scan_never_reads_blobs(spark, table):
    from eggopress.tablefmt import Table

    df = (
        spark.read.parquet(Table(table).data_dir)
        .groupBy("partition_id")
        .agg(F.sum("encoded_bytes").alias("b"))
    )
    read_schema = [l for l in _formatted(df).splitlines() if "ReadSchema" in l][0]
    assert "blob" not in read_schema


def test_dimension_join_broadcasts(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["join_segment_rollup"](spark, "/root/testdata/sf0.001")
    assert "BroadcastHashJoin" in _formatted(q)


def test_minhash_hashes_once(spark):
    from eggopress.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(dedup.minhash_signatures(docs))
    assert plan.count("md5") <= 2, "md5 array must not be inlined per permutation"


def test_simhash_hashes_once_and_band_join_is_key_equi(spark):
    """The 64-bit simhash must compute ONE md5 per word (staged _m array
    feeding both hash halves), and the 16-bit band self-join must be a key
    equi-join, never a cartesian."""
    from eggopress.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(dedup.simhash(docs))
    assert plan.count("md5") <= 2, "md5 must not be inlined per bit (64x blowup)"

    pplan = _formatted(dedup.simhash_pairs(docs, 3))
    assert "CartesianProduct" not in pplan and "BroadcastNestedLoop" not in pplan
    assert "bucket" in pplan


def test_ngram_prefix_path_has_no_cartesian(spark):
    from eggopress.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # materialize=False exposes the lazy end-to-end plan (the default
    # returns a scratch-parquet reader whose plan is just a scan)
    plan = _formatted(dedup.ngram_jaccard_pairs(docs, 0.6, materialize=False))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # candidate generation joins on the shingle key, verification on ids
    assert "xxhash64" in plan


def test_neardup_banded_join_is_key_equi(spark):
    from eggopress.pipeline import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _formatted(simsearch.cosine_neardup(emb, 0.45, dim=64))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "bucket" in plan


def test_ivf_assignment_is_shuffle_free(spark):
    """IVF cell assignment inlines the collected centroid vectors as
    literals, making the quantizer a pure narrow projection: the final
    plan has NO join, NO window, and NO exchange — the only 'gather' is
    the TakeOrdered top-k. (The previous plan broadcast-joined the
    centroid table and ranked with a row_number window, shuffling every
    (vector, centroid) score pair.)"""
    from eggopress.pipeline import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [0.1] * 64
    plan = _formatted(simsearch.ivf_topk(emb, q, 5))
    assert "Join" not in plan, "assignment must not join"
    assert "Window" not in plan, "assignment must not rank via window"
    assert "Exchange" not in plan, "assignment must not shuffle"
    assert "TakeOrderedAndProject" in plan


def test_predicate_decode_pushes_stats_filter(spark, table):
    from eggopress import decode

    plan = _formatted(decode.read_encoded(spark, table, n_tok_range=(50, 120)))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "n_tok_max" in pushed and "n_tok_min" in pushed


def test_edition_locuspart_scan_prunes_partitions(spark, table, tmp_path_factory):
    """A locuspart edition is hive-partitioned by source; a filtered read
    must prune at the directory level (PartitionFilters carries the
    source predicate, and the scan lists only the matching partition)."""
    from eggopress import editions

    out = editions.materialize(
        spark, table, "locuspart",
        str(tmp_path_factory.mktemp("ed") / "locuspart"))
    df = (spark.read.parquet(out)
          .filter(F.col("source") == "web").select("doc_id", "n_tok"))
    plan = _formatted(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "source" in pf and "web" in pf
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "tokens" not in read_schema, "projection must prune the token column"


def test_knn_join_bucketed_has_no_cartesian(spark):
    """The bucketed k-NN join must be bucket-key equi-joins end to end —
    no broadcast of the query side, no cartesian/NLJ anywhere."""
    from eggopress.pipeline import simsearch

    emb = spark.range(64).selectExpr(
        "id as vec_id",
        "transform(sequence(1, 64), i -> cast(pmod(id * i, 97) as float) / 97.0) as embedding",
    )
    q = emb.limit(4).selectExpr("vec_id as q_id", "embedding")
    plan = _formatted(simsearch.knn_join_bucketed(emb, q, 5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_predicate_pushes_value_stats_filter(spark, table):
    """token_range chunk skipping: the tok_min/tok_max predicates must
    reach the parquet scan (PushedFilters), and the decode must agree
    with a post-hoc exists() filter over a full decode."""
    from eggopress import decode

    df = decode.decode_table(spark, table, token_range=(40000, 40200),
                             columns=["doc_id", "source"])
    plan = _formatted(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "tok_max" in pushed and "tok_min" in pushed
    assert df.columns == ["doc_id", "source"]

    full = (decode.decode_table(spark, table)
            .filter(F.expr("exists(tokens, t -> t >= 40000 and t <= 40200)"))
            .select("doc_id", "source"))
    assert df.exceptAll(full).count() == 0
    assert full.exceptAll(df).count() == 0
    assert df.count() > 0

    # boundless tuples are truthy but must be a no-op, not a malformed
    # empty exists() lambda (parse error)
    base = decode.decode_table(spark, table).count()
    assert decode.decode_table(spark, table, token_range=(None, None),
                               n_tok_range=(None, None)).count() == base


def test_decontaminate_broadcasts_benchmark_side(spark):
    """Scale contract: the benchmark gram set broadcasts (it is tiny by
    nature); the corpus side must never shuffle into a sort-merge join."""
    from eggopress.pipeline import textstats

    docs = spark.createDataFrame(
        [(f"d{i}", f"some words {i} for the corpus side {i * 3}")
         for i in range(50)], "doc_id string, text string")
    bench = spark.createDataFrame([("held out words here",)], "text string")
    plan = _formatted(textstats.decontaminate(docs, bench, n=3))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fan_out_gates(spark):
    """fan_out (r06): repartitions narrow low-partition inputs to
    2x parallelism, no-ops when the input is already wide, and the
    min_bytes gate skips the shuffle for small file scans."""
    from eggopress.pipeline.textstats import fan_out

    target = spark.sparkContext.defaultParallelism * 2
    narrow = spark.range(1000).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target)
    assert fan_out(wide) is wide
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # tiny scan + high byte floor -> untouched; floor 0 -> fanned
    assert fan_out(docs, min_bytes=1 << 30) is docs
    assert fan_out(docs).rdd.getNumPartitions() == target


def test_minhash_pairs_computes_signatures_once(spark):
    """The banded frame materializes to scratch before the self-join
    (r06): the returned plan must scan the materialized keys, never
    re-run the signature pipeline per join branch (the r05 plan carried
    two full MapInArrow signature subtrees)."""
    from eggopress.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(dedup.minhash_lsh_pairs(docs))
    assert "MapInArrow" not in plan and "md5" not in plan
    assert "CartesianProduct" not in plan
