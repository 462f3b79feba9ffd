"""The decode pass: encoded chunk blobs -> bit-identical corpus rows.

A single narrow mapInArrow stage (no shuffle): each chunk row is
self-describing (codec + params in blob headers), so decode needs only the
data files. Partition pruning comes free from the source=/salt= directory
layout — a sources= filter prunes at the parquet scan.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from eggopress import chunk as chunklib
from eggopress.schema import CORPUS_SCHEMA
from eggopress.tablefmt import Table


def read_encoded(spark: SparkSession, table_path: str,
                 sources: list[str] | None = None,
                 n_tok_range: tuple[int | None, int | None] | None = None,
                 version: int | None = None) -> DataFrame:
    tbl = Table(table_path)
    if version is not None:
        # time travel: exactly the chunk files snapshot <version> recorded
        # (append-mode tables keep earlier batches' files in place, so any
        # committed version stays readable until a rewrite)
        files = tbl.files_at_version(version)
        df = spark.read.option("basePath", tbl.data_dir).parquet(*files)
    else:
        df = spark.read.parquet(tbl.data_dir)
    if sources:
        df = df.filter(df.source.isin(sources))  # partition-pruned scan
    if n_tok_range:
        # chunk skipping on manifest-grade min/max stats: these are plain
        # int columns in the chunk parquet, so the predicate pushes down
        # to the scan and skipped chunks' blobs are never materialized
        lo, hi = n_tok_range
        if lo is not None:
            df = df.filter(df.n_tok_max >= lo)
        if hi is not None:
            df = df.filter(df.n_tok_min <= hi)
    return df


def _decode_fn(batches):
    for batch in batches:
        cols = {
            name: batch.column(name)
            for name in ("doc_id_blob", "source_blob", "n_tok_blob", "tokens_blob")
        }
        for i in range(batch.num_rows):  # per-CHUNK loop (thousands of rows each)
            yield pa.RecordBatch.from_arrays(
                chunklib.decode_chunk_row(
                    cols["doc_id_blob"][i].as_py(),
                    cols["source_blob"][i].as_py(),
                    cols["n_tok_blob"][i].as_py(),
                    cols["tokens_blob"][i].as_py(),
                ).columns,
                schema=chunklib.CORPUS_ARROW_SCHEMA,
            )


def decode_changes(spark: SparkSession, table_path: str,
                   since_version: int, version: int | None = None) -> DataFrame:
    """Incremental read: decode only the chunk files ADDED after snapshot
    since_version (up to `version`, default the current snapshot) — the
    consume-only-new-batches feed a training pipeline tails an append
    table with. Pure file-set difference of the two snapshots' recorded
    listings; no data is scanned to compute the diff.

    The since-side listing is used by NAME only (its files may already be
    gone — that's fine, they aren't read). Caveat: a compaction rewrites
    file names, so the first changes-read after one returns the whole
    compacted set; checkpoint consumers against post-compaction versions.
    """
    tbl = Table(table_path)
    to_version = version if version is not None else tbl.current_version()
    old = set(tbl.listing_at_version(since_version))
    new = [p for p in tbl.files_at_version(to_version) if p not in old]
    if not new:
        return spark.createDataFrame([], CORPUS_SCHEMA)
    enc = spark.read.option("basePath", tbl.data_dir).parquet(*new).select(
        "doc_id_blob", "source_blob", "n_tok_blob", "tokens_blob"
    )
    return enc.mapInArrow(_decode_fn, CORPUS_SCHEMA)


def decode_table(spark: SparkSession, table_path: str,
                 sources: list[str] | None = None,
                 n_tok_range: tuple[int | None, int | None] | None = None,
                 version: int | None = None) -> DataFrame:
    """Decode a table; `n_tok_range=(lo, hi)` is the predicate path (P2):
    chunk-level min/max skipping at the scan, then an exact row filter on
    the decoded output (chunk stats only bound, rows inside a surviving
    chunk may still miss the range). `version=N` time-travels to snapshot
    N's recorded file set."""
    enc = read_encoded(spark, table_path, sources, n_tok_range, version).select(
        "doc_id_blob", "source_blob", "n_tok_blob", "tokens_blob"
    )
    out = enc.mapInArrow(_decode_fn, CORPUS_SCHEMA)
    if n_tok_range:
        lo, hi = n_tok_range
        if lo is not None:
            out = out.filter(out.n_tok >= lo)
        if hi is not None:
            out = out.filter(out.n_tok <= hi)
    return out
