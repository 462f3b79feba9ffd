"""`toast` — the one-call full pipeline (reference: `eggo toast DATASET`
"runs the full pipeline", docs/spec.md:219-224; datasets/dbsnp/toast.sh
chains download -> convert -> flatten -> partition -> publish as five OS
processes). Here the chain is ingest -> encode -> verify -> register ->
editions, each stage committing a lineage row (stage='toast'), and the
whole pipeline is RESUMABLE: a re-run skips stages whose lineage row says
done, and the encode stage additionally resumes partition-by-partition
through encode_table's own lineage (a kill mid-encode re-encodes only the
missing partitions; a kill after encode re-enters at verify without
re-encoding anything).
"""

from __future__ import annotations

import json
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from eggopress import lineage as lineagelib
from eggopress.tablefmt import Table

STAGES = ("encode", "verify", "register", "editions")


def _done_stages(spark: SparkSession, tbl: Table) -> set[str]:
    return set(lineagelib.done_partitions(spark, tbl, stage="toast"))


def toast(
    spark: SparkSession,
    table_path: str,
    *,
    input_path: str | None = None,
    fmt: str = "jsonl",
    source: str | None = None,
    manifest: str | None = None,
    register_name: str | None = None,
    editions: tuple[str, ...] = (),
    n_partitions: int | None = None,
    fail_after: str | None = None,
    dedup: str | None = None,
    max_bucket_rows: int | None = 10_000,
    min_words: int | None = None,
    decontaminate_path: str | None = None,
    decontaminate_ngram: int = 13,
    sample: dict[str, float] | None = None,
    sample_default: float = 1.0,
) -> dict:
    """Run (or resume) the full pipeline. Exactly one of input_path /
    manifest selects the corpus. fail_after injects a crash after the named
    stage commits (resume tests).

    dedup='simhash' | 'minhash' inserts a near-duplicate curation pass
    between ingest and encode: exact pre-collapse (one doc per md5(text)
    digest, min doc_id kept — a no-op when ingest already
    content-addressed the ids, but the guarantee the LSH stage's scale
    posture depends on) -> candidate pairs (banded LSH, over-cap buckets
    shed at max_bucket_rows; default 10k, None disables) ->
    resolve_clusters (connected components) -> keep one representative
    per cluster (the min doc_id). The exact pre-collapse is what keeps a
    boilerplate-heavy crawl out of the m^2/2 candidate blowup: an m-copy
    group shares every band bucket, so it must cost one groupBy shuffle,
    not m^2 pairs; max_bucket_rows bounds whatever near-identical mass
    remains. Shed metrics land in result['dedup']. The same curated
    frame feeds the verify stage, and the pass is deterministic, so a
    resumed toast re-derives the identical survivor set.

    min_words drops documents shorter than the threshold (the basic
    quality gate every training pipeline runs); sample={source: frac}
    applies deterministic per-source downsampling (domain mixing, see
    textstats.sample_corpus) to whatever survives dedup and the quality
    gate. decontaminate_path points at a benchmark jsonl ({"text": ...}
    per line); docs sharing any decontaminate_ngram-word n-gram with it
    are dropped before encode (eval-overlap removal, see
    textstats.decontaminate). All curation steps are pure functions of
    content, so resume (and the verify stage's re-derivation) see the
    identical corpus."""
    from eggopress import catalog, decode, ingest, verify
    from eggopress import editions as editionslib
    from eggopress.pipeline import textstats

    if (input_path is None) == (manifest is None):
        raise ValueError("toast needs exactly one of input_path / manifest")

    tbl = Table(table_path)
    t0 = time.time()
    done = _done_stages(spark, tbl)
    result: dict = {"stages": {}, "table": table_path}

    def docs_df():
        if manifest:
            docs = ingest.load_manifest_documents(spark, manifest)
        else:
            docs = ingest.load_documents(spark, input_path, fmt, source)
        if dedup:
            from eggopress.pipeline import dedup as dedupl

            if dedup not in ("simhash", "minhash"):
                raise ValueError(f"unknown dedup method: {dedup!r}")
            # exact pre-collapse: one representative per md5(text) digest.
            # A semi join against min-doc_id reps, deterministic by
            # content, so resume/verify re-derive the same survivors.
            reps = (
                docs.groupBy(F.md5("text").alias("_digest"))
                .agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id")
            )
            docs = docs.join(reps, "doc_id", "semi")
            metrics: dict = {}
            if dedup == "simhash":
                pairs = dedupl.simhash_pairs(
                    docs, 3, max_bucket_rows=max_bucket_rows, metrics=metrics)
            else:
                pairs = dedupl.minhash_lsh_pairs(
                    docs, max_bucket_rows=max_bucket_rows, metrics=metrics)
            non_rep = (
                dedupl.resolve_clusters(pairs)
                .filter(F.col("doc_id") != F.col("cluster_id"))
                .select("doc_id")
            )
            docs = docs.join(non_rep, "doc_id", "left_anti")
            result.setdefault("dedup", {}).update(metrics)
        if min_words is not None:
            docs = docs.filter(
                F.expr(f"size({textstats.WORDS_SPARK})") >= min_words)
        if decontaminate_path is not None:
            bench = spark.read.json(decontaminate_path).select("text")
            hits = textstats.decontaminate(
                docs, bench, n=decontaminate_ngram).select("doc_id")
            docs = docs.join(hits, "doc_id", "left_anti")
        if sample:
            docs = textstats.sample_corpus(docs, sample, default=sample_default)
        return docs

    def commit(stage: str, **info) -> None:
        lineagelib.append(spark, tbl, [
            (result.get("run_id", ""), stage, "toast", "done", 1,
             json.dumps(info, default=str)[:2000] or None,
             None, None, None, int((time.time() - t0) * 1000))
        ])
        result["stages"][stage] = {"status": "done", **info}
        if fail_after == stage:
            raise RuntimeError(f"toast: injected failure after stage {stage!r}")

    # ---- encode (ingest + tokenize + encode; self-resuming) ----
    if "encode" in done:
        result["stages"]["encode"] = {"status": "skipped"}
        snap = tbl.snapshot() or {}
        result["run_id"] = snap.get("run_id", "")
    else:
        # resume partition-wise iff a previous toast attempt left lineage
        # behind; a pristine table dir gets a fresh encode
        resume = bool(lineagelib.done_partitions(spark, tbl))
        summary = ingest.ingest_table(
            spark, docs_df(), table_path,
            n_partitions=n_partitions, resume=resume,
        )
        result["run_id"] = summary["run_id"]
        commit("encode", rows=summary["rows"], partitions=summary["partitions"],
               skipped=summary["skipped"], encoded_bytes=summary["encoded_bytes"])

    # ---- verify (round trip + compression vs reference parquet) ----
    if "verify" in done:
        result["stages"]["verify"] = {"status": "skipped"}
    else:
        expected = textstats.tokenize(docs_df(), make_ids=False)
        decoded = decode.decode_table(spark, table_path)
        ok = verify.roundtrip_ok(expected, decoded)
        with tempfile.TemporaryDirectory() as scratch:
            report = verify.compression_report(spark, table_path, expected, scratch)
        if not ok:
            raise RuntimeError("toast: verify failed — decoded rows differ from input")
        commit("verify", roundtrip_ok=ok,
               ratio_vs_reference=report["ratio_vs_reference"])

    # ---- register ----
    if register_name:
        if "register" in done:
            result["stages"]["register"] = {"status": "skipped"}
        else:
            info = catalog.register(spark, table_path, register_name)
            commit("register", surfaces=info["surfaces"])

    # ---- editions ----
    for ed in editions:
        key = f"edition:{ed}"
        if key in done:
            result["stages"][key] = {"status": "skipped"}
        else:
            out = editionslib.materialize(spark, table_path, ed)
            commit(key, path=out)

    result["wall_s"] = round(time.time() - t0, 3)
    return result
