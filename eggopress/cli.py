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


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="eggopress")
    sub = p.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="encode a corpus into an eggopress table")
    enc.add_argument("--input", required=True, help="parquet path or synth:N")
    enc.add_argument("--table", required=True)
    enc.add_argument("--partitions", type=int, default=None)
    enc.add_argument("--resume", action="store_true")
    enc.add_argument("--waves", type=int, default=1)

    dec = sub.add_parser("decode", help="decode a table back to corpus parquet")
    dec.add_argument("--table", required=True)
    dec.add_argument("--output", required=True)
    dec.add_argument("--sources", default=None, help="comma-separated source filter")

    ver = sub.add_parser("verify", help="round-trip + ratio verification")
    ver.add_argument("--input", required=True)
    ver.add_argument("--table", required=True)

    pln = sub.add_parser("plan", help="print submit settings for a cluster shape")
    pln.add_argument("--workers", type=int, required=True)
    pln.add_argument("--node-cores", type=int, required=True)
    pln.add_argument("--node-mem-mb", type=int, required=True)

    args = p.parse_args(argv)

    from eggopress import conf

    if args.cmd == "plan":
        print(json.dumps(conf.plan_submit(args.workers, args.node_cores, args.node_mem_mb), indent=1))
        return 0

    spark = conf.session_builder(f"eggopress-{args.cmd}").getOrCreate()
    try:
        if args.cmd == "encode":
            from eggopress import encode

            df = _load_input(spark, args.input)
            summary = encode.encode_table(
                spark, df, args.table, n_partitions=args.partitions,
                resume=args.resume, waves=args.waves,
            )
            print(json.dumps(summary))
        elif args.cmd == "decode":
            from eggopress import decode

            sources = args.sources.split(",") if args.sources else None
            decode.decode_table(spark, args.table, sources).write.mode(
                "overwrite"
            ).parquet(args.output)
            print(json.dumps({"output": args.output}))
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
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
