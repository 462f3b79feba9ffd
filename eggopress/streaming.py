"""Structured Streaming ingest: a continuously-arriving corpus becomes a
continuously-growing encoded table.

The reference's pipeline is batch-only (eggo toast runs once per dataset,
docs/spec.md:219-224), but a training-data pipeline at 100 TB ingests
crawl output as it lands. Spark-first translation:

  readStream (file source over a landing dir)
    -> the same normalize/tokenize plan the batch path uses
    -> foreachBatch: encode_append (one lineage-tracked, snapshot-
       committed wave per micro-batch, MERGE-promoted into the shared
       source=/salt= layout)

plus a watermarked windowed arrival rollup (stream_stats) for late-data-
tolerant monitoring. Exactly-once across restarts comes from the
Structured Streaming checkpoint: a replayed batch id maps to a run_id
whose lineage wave already exists, and encode_append skips it wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_STREAM_SCHEMA = "doc_id string, text string, source string, ts timestamp"


def _normalize(docs: DataFrame, default_source: str | None,
               drop_dups: bool = True) -> DataFrame:
    """Same normalization contract as batch ingest: fill missing sources,
    content-address missing doc_ids, dedup exact copies within the batch.

    drop_dups=False skips the dropDuplicates — the streaming path must
    NOT apply it on the unbounded stream, where Structured Streaming
    turns it into a stateful operator whose doc_id state grows forever
    in the checkpoint; it dedups per micro-batch inside the sink instead
    (bounded state: none)."""
    out = docs
    if default_source is not None:
        out = out.withColumn("source", F.coalesce("source", F.lit(default_source)))
    out = out.withColumn(
        "doc_id",
        F.coalesce("doc_id", F.md5(F.concat_ws("\x1f", "source", "text"))),
    )
    out = out.select("doc_id", "text", "source")
    return out.dropDuplicates(["doc_id"]) if drop_dups else out


def stream_ingest(spark: SparkSession, input_dir: str, table_path: str, *,
                  checkpoint: str, default_source: str | None = "stream",
                  max_files_per_trigger: int | None = None,
                  available_now: bool = True,
                  dedup_across_batches: bool = False,
                  neardup: str | None = None,
                  max_hamming: int = 3):
    """Start the streaming ingest query. available_now=True drains the
    landing dir and stops (the testable trigger); False runs continuously.
    Returns the StreamingQuery — callers awaitTermination() as needed.

    Dedup posture (bounded state by design): exact copies within one
    micro-batch always collapse (batch-local dropDuplicates in the sink
    — applying it on the unbounded stream instead would make Structured
    Streaming keep every doc_id ever seen in checkpoint state).
    dedup_across_batches=True additionally anti-joins each micro-batch
    against the doc_ids already IN THE TABLE (via the per-batch doc_id
    sidecars encode_append maintains — O(table ids) of skinny parquet,
    never a blob decode; content-addressed ids make exact copies collide),
    so a re-crawled document never lands twice — across batches, across
    stream restarts with a fresh checkpoint, and across multiple landing
    dirs feeding one table. Replay-safe: a batch already recorded in
    lineage is skipped wholesale BEFORE the filter (its rows are in the
    table — filtering it would drop everything and desync the
    exactly-once path), and the seen-set excludes the current run's own
    files so a crashed-mid-promote replay re-encodes the SAME subset the
    first attempt did.

    neardup='simhash' additionally drops batch docs whose 64-bit SimHash
    lands within max_hamming bits of ANY document already in the table —
    the incremental near-duplicate index a 100 TB pipeline needs (a
    re-crawl is rarely byte-identical; boilerplate drift survives exact
    ids). Signatures persist as per-run sidecars (index/sigs/, the
    doc_id-sidecar pattern) so each batch band-joins against skinny
    fingerprints, never re-reads the corpus. The snapshot's
    sigs_cover_table marker must be True on a pre-existing table (i.e.
    every prior append also wrote signatures) — enabling neardup on a
    partially covered table raises instead of silently under-dropping.
    Within-batch near-dups are NOT collapsed (only exact ids are) — the
    batch is one micro-batch, run toast --dedup for corpus-wide
    curation.
    """
    from eggopress import decode, encode
    from eggopress.pipeline import dedup as dedupl
    from eggopress.pipeline import textstats
    from eggopress.tablefmt import Table

    if neardup not in (None, "simhash"):
        raise ValueError(f"unknown neardup method: {neardup!r}")

    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # the stream carries RAW docs; tokenize happens per micro-batch in
    # the sink, after the dedup filters (the near-dup fingerprint needs
    # the text, which the corpus shape no longer carries)
    docs = _normalize(reader.json(input_dir), default_source, drop_dups=False)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        run_id = f"stream-{batch_id:08d}"
        df = batch_df.dropDuplicates(["doc_id"])
        tbl = Table(table_path)
        snap = tbl.snapshot()
        replayed = snap is not None and encode._run_recorded(s, tbl, run_id)
        if dedup_across_batches and snap is not None and not replayed:
            seen = decode.seen_doc_ids(s, table_path, exclude_run=run_id)
            df = df.join(seen, "doc_id", "left_anti")
        sig = None
        if neardup == "simhash":
            # the coverage raise fires even for a replayed batch ON
            # PURPOSE (r06 revisited the advisory to skip it): a stream
            # with broken signature coverage is wedged at its next REAL
            # batch anyway, and a fresh-checkpoint ingest over an
            # uncovered table re-numbers batches onto recorded run_ids —
            # skipping would turn that misconfiguration into a silent
            # no-op that looks like a successful neardup ingest
            # (behavior pinned by test_stream_neardup_*). Only the
            # signature computation and the index join are skipped for
            # replays, below.
            if snap is not None and snap.get("sigs_cover_table") is not True:
                raise RuntimeError(
                    "neardup requires full signature coverage: this "
                    "table has appends without signature sidecars "
                    "(sigs_cover_table is not True)")
            sig = dedupl.simhash(df).select("doc_id", "simhash")
            if snap is not None and not replayed:
                seen_sigs = decode.seen_signatures(
                    s, table_path, exclude_run=run_id)
                drop = dedupl.simhash_near_matches(
                    sig, seen_sigs, max_hamming=max_hamming)
                df = df.join(drop, "doc_id", "left_anti")
                sig = sig.join(drop, "doc_id", "left_anti")
        corpus = textstats.tokenize(df, make_ids=False)
        encode.encode_append(s, corpus, table_path, run_id=run_id,
                             signatures=sig)

    writer = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    writer = writer.trigger(availableNow=True) if available_now \
        else writer.trigger(processingTime="10 seconds")
    return writer.start()


def stream_running_totals(spark: SparkSession, input_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-source RUNNING ingest counter — cumulative docs/chars emitted
    every micro-batch, state carried across batches in an explicit
    GroupState.

    This is the engine's template for operators Structured Streaming's
    built-ins can't express (running totals, sessionization, per-key
    ratcheting): state is a fixed-width tuple PER KEY (two ints per
    source here), never per-row — checkpoint state size is O(sources)
    regardless of stream lifetime, the bounded-state discipline the rest
    of the streaming path follows. Arrow-batched like every other UDF
    surface in the engine (no per-row Python)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    raw = spark.readStream.schema(DOCS_STREAM_SCHEMA).json(input_dir)

    def fn(key, pdfs, state):
        import pandas as pd

        n, chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            chars += int(pdf["text"].str.len().sum())
        state.update((n, chars))
        yield pd.DataFrame({
            "source": [key[0]],
            "n_docs_total": [n],
            "n_chars_total": [chars],
        })

    return raw.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType="source string, n_docs_total long, n_chars_total long",
        stateStructType="n long, chars long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stats(spark: SparkSession, input_dir: str, *,
                 window: str = "1 minute",
                 watermark: str = "2 minutes") -> DataFrame:
    """Watermarked windowed per-source arrival rollup (docs + chars per
    event-time window). Late rows inside the watermark still land in
    their window; older ones are dropped instead of growing state forever
    — the standard bounded-state posture for a perpetual ingest monitor."""
    raw = spark.readStream.schema(DOCS_STREAM_SCHEMA).json(input_dir)
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "source", "n_docs", "n_chars",
        )
    )
