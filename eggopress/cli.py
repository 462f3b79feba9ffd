"""spark-submit entrypoint: plan / encode / decode / verify / bench.

Run on a cluster:
    zip -r eggopress.zip eggopress
    spark-submit --py-files eggopress.zip -m eggopress.cli encode \
        --input <corpus parquet or synth:N> --table <table dir>

(the eggo-data CLI analog, eggo/cli/datasets.py; executor sizing per
conf.plan_submit = eggo/operations.py:124-137)
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def _load_input(spark, spec: str):
    from eggopress import synth

    if spec.startswith("synth:"):
        return synth.corpus_df(spark, int(spec.split(":", 1)[1]))
    return spark.read.parquet(spec)


def main(argv: list[str] | None = None, spark=None) -> int:
    """CLI entry. `spark` injects an existing session (tests); when None a
    session is created and stopped here (spark-submit path)."""
    p = argparse.ArgumentParser(prog="eggopress")
    sub = p.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="encode a corpus into an eggopress table")
    enc.add_argument("--input", required=True, help="parquet path or synth:N")
    enc.add_argument("--table", required=True)
    enc.add_argument("--partitions", type=int, default=None)
    enc.add_argument("--resume", action="store_true")
    enc.add_argument("--waves", type=int, default=1)
    enc.add_argument("--retries", type=int, default=0)
    enc.add_argument("--no-cluster", action="store_true",
                     help="skip the content-clustering sort (max encode "
                          "throughput; larger encoded size)")

    ing = sub.add_parser(
        "ingest", help="raw corpus (jsonl/text/parquet docs) -> tokenize -> encoded table"
    )
    ing.add_argument("--input", default=None, help="one resource path (or use --manifest)")
    ing.add_argument("--manifest", default=None,
                     help="datapackage-style JSON listing resources "
                          "({name, path, format, compression} each)")
    ing.add_argument("--format", choices=["jsonl", "text", "parquet"], default="jsonl")
    ing.add_argument("--source", default=None, help="source label (default: input basename)")
    ing.add_argument("--table", required=True)
    ing.add_argument("--partitions", type=int, default=None)

    tst = sub.add_parser(
        "toast", help="full pipeline: ingest -> encode -> verify -> register -> editions "
                      "(resumable; the eggo `toast DATASET` analog)"
    )
    tst.add_argument("--input", default=None)
    tst.add_argument("--manifest", default=None)
    tst.add_argument("--format", choices=["jsonl", "text", "parquet"], default="jsonl")
    tst.add_argument("--source", default=None)
    tst.add_argument("--table", required=True)
    tst.add_argument("--name", default=None, help="catalog name to register (optional)")
    tst.add_argument("--editions", default=None, help="comma-separated edition list")
    tst.add_argument("--partitions", type=int, default=None)
    tst.add_argument("--dedup", choices=["simhash", "minhash"], default=None,
                     help="near-duplicate curation pass before encode "
                          "(LSH pairs -> connected components -> one "
                          "representative per cluster)")
    tst.add_argument("--max-bucket-rows", type=int, default=10_000,
                     help="shed LSH buckets larger than this during "
                          "--dedup candidate generation (0 disables); "
                          "exact copies are pre-collapsed regardless")
    tst.add_argument("--min-words", type=int, default=None,
                     help="quality gate: drop docs with fewer words")
    tst.add_argument("--decontaminate", default=None, metavar="BENCH_JSONL",
                     help="drop docs sharing any n-gram with this "
                          "benchmark jsonl (eval-overlap removal)")
    tst.add_argument("--decontaminate-ngram", type=int, default=13)
    tst.add_argument("--sample", default=None,
                     help="per-source keep fractions, e.g. 'web=0.1,wiki=1.0' "
                          "(deterministic hash-threshold domain mixing)")
    tst.add_argument("--sample-default", type=float, default=1.0,
                     help="keep fraction for sources not named in --sample")

    reg = sub.add_parser("register", help="register a table in the Spark catalog")
    reg.add_argument("--table", required=True)
    reg.add_argument("--name", required=True)
    reg.add_argument("--query", default=None, help="optional SQL to run after registration")

    edi = sub.add_parser("edition", help="materialize an edition (basic/flat/locuspart/...)")
    edi.add_argument("--table", required=True)
    edi.add_argument("--edition", required=True)
    edi.add_argument("--output", default=None)

    cpt = sub.add_parser("compact", help="rewrite small chunk files (streaming "
                                         "appends) into one file per partition")
    cpt.add_argument("--table", required=True)
    cpt.add_argument("--min-files", type=int, default=2)

    dsc = sub.add_parser("describe", help="table summary + integrity checks "
                                          "(manifest vs data, snapshot totals)")
    dsc.add_argument("--table", required=True)

    rbk = sub.add_parser("rollback", help="roll an append table back to snapshot N "
                                          "(newer batches retired aside)")
    rbk.add_argument("--table", required=True)
    rbk.add_argument("--version", type=int, required=True)

    hst = sub.add_parser("history", help="snapshot log (version/stage/rows/run)")
    hst.add_argument("--table", required=True)

    vac = sub.add_parser("vacuum", help="delete retired dirs + expire old snapshots")
    vac.add_argument("--table", required=True)
    vac.add_argument("--keep-snapshots", type=int, default=10)

    dec = sub.add_parser("decode", help="decode a table back to corpus parquet")
    dec.add_argument("--table", required=True)
    dec.add_argument("--output", required=True)
    dec.add_argument("--sources", default=None, help="comma-separated source filter")
    dec.add_argument("--n-tok-min", type=int, default=None,
                     help="predicate decode: skip chunks/rows below this n_tok")
    dec.add_argument("--n-tok-max", type=int, default=None,
                     help="predicate decode: skip chunks/rows above this n_tok")
    dec.add_argument("--token-min", type=int, default=None,
                     help="keep docs containing a token value >= this "
                          "(chunk skip on tok_min/tok_max stats)")
    dec.add_argument("--token-max", type=int, default=None,
                     help="keep docs containing a token value <= this")
    dec.add_argument("--version", type=int, default=None,
                     help="time travel: decode the file set recorded by "
                          "snapshot N (append tables keep history)")
    dec.add_argument("--columns", default=None,
                     help="comma-separated projection (doc_id,tokens,n_tok,"
                          "source): only these columns' blob streams are "
                          "read and decoded")

    chg = sub.add_parser("changes", help="decode only the rows ADDED after "
                                         "snapshot N (incremental feed for "
                                         "tailing an append table)")
    chg.add_argument("--table", required=True)
    chg.add_argument("--since-version", type=int, required=True)
    chg.add_argument("--version", type=int, default=None,
                     help="upper snapshot (default: current)")
    chg.add_argument("--columns", default=None,
                     help="comma-separated projection (doc_id,tokens,n_tok,source)")
    chg.add_argument("--output", required=True)

    ver = sub.add_parser("verify", help="round-trip + ratio verification")
    ver.add_argument("--input", required=True)
    ver.add_argument("--table", required=True)

    gen = sub.add_parser(
        "generic-encode",
        help="encode ANY flat-schema parquet through the codec stack "
             "(ints/floats/strings/timestamps/dates/int-arrays)")
    gen.add_argument("--input", required=True, help="parquet path")
    gen.add_argument("--table", required=True)
    gen.add_argument("--partitions", type=int, default=None)
    gen.add_argument("--cluster-by", default=None,
                     help="comma-separated columns to range-sort by "
                          "before encode (the clustering-for-ratio trade)")
    gen.add_argument("--cluster-mode", choices=["range", "zorder"],
                     default="range",
                     help="zorder = Morton key over the cluster columns "
                          "(multi-dimensional chunk pruning)")

    gdc = sub.add_parser("generic-decode",
                         help="decode a generic table back to parquet")
    gdc.add_argument("--table", required=True)
    gdc.add_argument("--output", required=True)
    gdc.add_argument("--columns", default=None,
                     help="comma-separated projection (blob-level pruning)")

    idx = sub.add_parser("index", help="build the doc_id random-access "
                                       "index (index/docmap/)")
    idx.add_argument("--table", required=True)

    lku = sub.add_parser("lookup", help="fetch documents by doc_id through "
                                        "the docmap index")
    lku.add_argument("--table", required=True)
    lku.add_argument("--ids", required=True,
                     help="comma-separated doc_ids")
    lku.add_argument("--output", default=None,
                     help="parquet destination (default: print count only)")

    pln = sub.add_parser("plan", help="print submit settings for a cluster shape")
    pln.add_argument("--workers", type=int, required=True)
    pln.add_argument("--node-cores", type=int, required=True)
    pln.add_argument("--node-mem-mb", type=int, required=True)

    args = p.parse_args(argv)

    from eggopress import conf

    if args.cmd == "plan":
        print(json.dumps(conf.plan_submit(args.workers, args.node_cores, args.node_mem_mb), indent=1))
        return 0

    owns_session = spark is None
    if owns_session:
        spark = conf.session_builder(f"eggopress-{args.cmd}").getOrCreate()
    try:
        if args.cmd == "encode":
            from eggopress import encode

            df = _load_input(spark, args.input)
            summary = encode.encode_table(
                spark, df, args.table, n_partitions=args.partitions,
                resume=args.resume, waves=args.waves, retries=args.retries,
                cluster=not args.no_cluster,
            )
            print(json.dumps(summary))
        elif args.cmd == "ingest":
            from eggopress import ingest

            if (args.input is None) == (args.manifest is None):
                p.error("ingest needs exactly one of --input / --manifest")
            docs = (
                ingest.load_manifest_documents(spark, args.manifest)
                if args.manifest
                else ingest.load_documents(spark, args.input, args.format, args.source)
            )
            summary = ingest.ingest_table(
                spark, docs, args.table, n_partitions=args.partitions
            )
            print(json.dumps(summary))
        elif args.cmd == "toast":
            from eggopress import toast as toastlib

            sample = None
            if args.sample:
                sample = {}
                for part in args.sample.split(","):
                    src, _, frac = part.partition("=")
                    if not frac:
                        p.error(f"--sample needs src=frac entries, got {part!r}")
                    sample[src.strip()] = float(frac)
            result = toastlib.toast(
                spark, args.table,
                input_path=args.input, fmt=args.format, source=args.source,
                manifest=args.manifest, register_name=args.name,
                editions=tuple(args.editions.split(",")) if args.editions else (),
                n_partitions=args.partitions,
                dedup=args.dedup,
                max_bucket_rows=args.max_bucket_rows or None,
                min_words=args.min_words,
                decontaminate_path=args.decontaminate,
                decontaminate_ngram=args.decontaminate_ngram,
                sample=sample, sample_default=args.sample_default,
            )
            print(json.dumps(result, default=str))
        elif args.cmd == "register":
            from eggopress import catalog

            info = catalog.register(spark, args.table, args.name)
            if args.query:
                for row in spark.sql(args.query).collect():
                    print(json.dumps(row.asDict(), default=str))
            print(json.dumps(info))
        elif args.cmd == "edition":
            from eggopress import editions

            out = editions.materialize(spark, args.table, args.edition, args.output)
            print(json.dumps({"edition": args.edition, "path": out}))
        elif args.cmd == "compact":
            from eggopress import maintenance

            print(json.dumps(maintenance.compact_table(
                spark, args.table, min_files=args.min_files)))
        elif args.cmd == "describe":
            from eggopress import maintenance

            report = maintenance.table_report(spark, args.table)
            print(json.dumps(report))
            return 0 if report["healthy"] else 1
        elif args.cmd == "rollback":
            from eggopress import maintenance

            print(json.dumps(maintenance.rollback_table(
                spark, args.table, args.version)))
        elif args.cmd == "history":
            from eggopress import maintenance

            for snap in maintenance.snapshot_history(args.table):
                print(json.dumps(snap))
        elif args.cmd == "vacuum":
            from eggopress import maintenance

            print(json.dumps(maintenance.vacuum_table(
                args.table, keep_snapshots=args.keep_snapshots)))
        elif args.cmd == "decode":
            from eggopress import decode

            sources = args.sources.split(",") if args.sources else None
            rng = None
            if args.n_tok_min is not None or args.n_tok_max is not None:
                rng = (args.n_tok_min, args.n_tok_max)
            trng = None
            if args.token_min is not None or args.token_max is not None:
                trng = (args.token_min, args.token_max)
            cols = args.columns.split(",") if args.columns else None
            decode.decode_table(
                spark, args.table, sources, n_tok_range=rng,
                version=args.version, columns=cols, token_range=trng,
            ).write.mode("overwrite").parquet(args.output)
            print(json.dumps({"output": args.output}))
        elif args.cmd == "changes":
            from eggopress import decode

            cols = args.columns.split(",") if args.columns else None
            df = decode.decode_changes(
                spark, args.table, since_version=args.since_version,
                version=args.version, columns=cols,
            )
            df.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"output": args.output,
                              "since_version": args.since_version}))
        elif args.cmd == "verify":
            from eggopress import decode, verify

            df = _load_input(spark, args.input)
            decoded = decode.decode_table(spark, args.table)
            ok = verify.roundtrip_ok(df, decoded)
            with tempfile.TemporaryDirectory() as scratch:
                report = verify.compression_report(spark, args.table, df, scratch)
            report["roundtrip_ok"] = ok
            print(json.dumps(report))
            return 0 if ok and report["beats_reference"] else 1
        elif args.cmd == "generic-encode":
            from eggopress import generic

            cluster_by = tuple(
                c.strip() for c in args.cluster_by.split(",")
            ) if args.cluster_by else None
            totals = generic.encode_generic(
                spark, spark.read.parquet(args.input), args.table,
                n_partitions=args.partitions, cluster_by=cluster_by,
                cluster_mode=args.cluster_mode)
            print(json.dumps(totals))
        elif args.cmd == "generic-decode":
            from eggopress import generic

            cols = ([c.strip() for c in args.columns.split(",")]
                    if args.columns else None)
            df = generic.decode_generic(spark, args.table, columns=cols)
            df.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"output": args.output,
                              "rows": spark.read.parquet(args.output).count()}))
        elif args.cmd == "index":
            from eggopress import decode

            print(json.dumps(decode.build_doc_index(spark, args.table)))
        elif args.cmd == "lookup":
            from eggopress import decode

            ids = [i.strip() for i in args.ids.split(",") if i.strip()]
            df = decode.lookup_docs(spark, args.table, ids)
            if args.output:
                df.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"requested": len(ids), "found": df.count(),
                              "output": args.output}))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
