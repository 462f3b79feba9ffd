"""Benchmark harness.

Default mode (what the driver runs): one JSON line with per-query wall
times for the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

--scaling: runs the SAME encode job at multiple parallelism levels
(default local[1,4,8,16,32]) on the SAME pre-materialized input, reports
throughput at each plus scaling efficiency = thr@4N / (4 x thr@N) for
BOTH the repo-protocol pair (8 -> 32, BASELINE.md:30) and the
cluster-analog pair (1 -> 4), and writes BENCH/BASELINE.md. (Sandbox
substitute for the N- vs 4N-executor cluster criterion, per the driver
instruction; see the bandwidth-ceiling analysis in that file.)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, "_scratch", "bench")
BENCH_DOCS = int(os.environ.get("EGGOPRESS_BENCH_DOCS", "60000"))


def _session(cpus: int):
    from eggopress.conf import session_builder

    # the bench is single-host by definition, so it opts into the tmpfs
    # scratch override the engine documents for local mode (the DEFAULT
    # scratch root is the shared warehouse dir — cluster-safe, but a
    # spinning-disk detour this box doesn't need)
    os.environ.setdefault("EGGOPRESS_SCRATCH_DIR", "/dev/shm/eggopress-scratch")

    spark = (
        session_builder("eggopress-bench", cores=cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _materialize_corpus(spark, n_docs: int, seed: int = 42) -> str:
    """Deterministic synth corpus written once to parquet (fixed layout so
    every parallelism level reads identical input). seed != 42 gives a
    DISJOINT corpus (concurrency experiments need independent inputs)."""
    from eggopress import synth

    suffix = "" if seed == 42 else f"_s{seed}"
    path = os.path.join(SCRATCH, f"corpus_{n_docs}{suffix}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        synth.corpus_df(spark, n_docs, seed=seed).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_suite(cpus: int, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod
    from eggopress import decode, encode, verify

    spark = _session(cpus)
    times: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    try:
        corpus_path = _materialize_corpus(spark, BENCH_DOCS)
        corpus = spark.read.parquet(corpus_path)
        table = os.path.join(SCRATCH, f"tbl_{cpus}")
        shutil.rmtree(table, ignore_errors=True)

        summary = timed("corpus_encode", lambda: encode.encode_table(spark, corpus, table))
        extras["tokens"] = summary["values"]
        extras["tokens_per_sec_encode"] = round(summary["values"] / times["corpus_encode"])
        extras["encoded_bytes"] = summary["encoded_bytes"]
        extras["raw_bytes"] = summary["raw_bytes"]

        # the clustering trade, measured as a PAIR on identical input:
        # cluster=False skips the content-signature sort (max encode
        # throughput), cluster=True (the default arm above) buys ratio
        # with that sort — both tokens/sec and bytes published side by
        # side so the trade is a number, not a narrative. Honesty note:
        # this arm runs SECOND, so it reads a warm page cache and warm
        # JVM/Python workers while the clustered arm paid the cold
        # start — read the pair as an upper bound on the clustering
        # cost, not an exact ratio
        table_nc = os.path.join(SCRATCH, f"tbl_nc_{cpus}")
        shutil.rmtree(table_nc, ignore_errors=True)
        nc = timed(
            "corpus_encode_nocluster",
            lambda: encode.encode_table(spark, corpus, table_nc, cluster=False),
        )
        extras["tokens_per_sec_encode_nocluster"] = round(
            nc["values"] / times["corpus_encode_nocluster"])
        extras["encoded_bytes_nocluster"] = nc["encoded_bytes"]

        n_dec = timed("corpus_decode", lambda: decode.decode_table(spark, table).count())
        assert n_dec == summary["rows"], (n_dec, summary["rows"])
        extras["tokens_per_sec_decode"] = round(summary["values"] / times["corpus_decode"])

        # projected decode: doc_id/n_tok/source only — token blobs are
        # column-pruned at the scan, so this prices the metadata-query
        # path (the one a 100 TB stats job takes) vs the full decode above
        from pyspark.sql import functions as F

        n_proj = timed(
            "corpus_stats_decode",
            lambda: decode.decode_table(spark, table, columns=["n_tok", "source"])
            .groupBy("source").agg(F.sum("n_tok")).count(),
        )
        assert n_proj > 0

        ok = timed(
            "corpus_verify",
            lambda: verify.roundtrip_ok(corpus, decode.decode_table(spark, table)),
        )
        extras["roundtrip_ok"] = bool(ok)
        ref = timed(
            "reference_parquet_write",
            lambda: verify.parquet_reference_bytes(corpus, os.path.join(SCRATCH, f"ref_{cpus}")),
        )
        # like-for-like storage-codec arm: the engine stores its chunk
        # files with zstd (conf.data_codec), so publish the ratio against
        # a zstd reference too, not just the snappy-era default
        ref_z = timed(
            "reference_parquet_write_zstd",
            lambda: verify.parquet_reference_bytes(
                corpus, os.path.join(SCRATCH, f"ref_{cpus}"), "zstd"),
        )
        from eggopress.tablefmt import Table

        extras["on_disk_bytes"] = Table(table).tree_bytes("data")
        extras["reference_parquet_bytes"] = ref
        extras["ratio_vs_reference"] = round(ref / max(extras["on_disk_bytes"], 1), 4)
        extras["reference_parquet_zstd_bytes"] = ref_z
        extras["ratio_vs_reference_zstd"] = round(
            ref_z / max(extras["on_disk_bytes"], 1), 4)
        extras["on_disk_bytes_nocluster"] = Table(table_nc).tree_bytes("data")
        extras["ratio_vs_reference_nocluster"] = round(
            ref / max(extras["on_disk_bytes_nocluster"], 1), 4)
        shutil.rmtree(table_nc, ignore_errors=True)

        # generic-schema codec path: lineitem (ints/doubles/strings/
        # timestamps) through the same codec stack — rows/sec + ratio vs
        # the reference snappy parquet it was read from
        from eggopress import generic

        gli = os.path.join(SCRATCH, f"gli_bench_{cpus}")
        shutil.rmtree(gli, ignore_errors=True)
        li_path = os.path.join(sf_dir, "lineitem.parquet")
        li = spark.read.parquet(li_path)
        # n_partitions sized to the data, not the core count: the bench
        # tables are small enough that a 64-way fan-out pays more in
        # parquet per-file overhead than it gains in parallelism
        gtot = timed(
            "generic_encode_lineitem",
            lambda: generic.encode_generic(
                spark, li, gli, cluster_by=("l_shipdate", "l_orderkey"),
                n_partitions=8),
        )
        extras["lineitem_rows"] = gtot["rows"]
        extras["lineitem_rows_per_sec_encode"] = round(
            gtot["rows"] / times["generic_encode_lineitem"])
        n_gdec = timed(
            "generic_decode_lineitem",
            lambda: generic.decode_generic(spark, gli).count(),
        )
        assert n_gdec == gtot["rows"], (n_gdec, gtot["rows"])
        gdisk = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(gli, "data")) for f in fs)
        extras["lineitem_on_disk_bytes"] = gdisk
        extras["lineitem_ratio_vs_reference"] = round(
            os.path.getsize(li_path) / max(gdisk, 1), 4)
        shutil.rmtree(gli, ignore_errors=True)

        qs = entrymod.queries()
        for name in (
            "dedup_exact",
            "dedup_minhash_lsh",
            "dedup_ngram_jaccard",
            "ann_brute_topk",
            "ann_ivf_topk",
            "ann_knn_join",
            "ann_knn_join_bucketed",
            "text_pack_sequences",
            "multimodal_resize",
            "text_token_counts",
            "text_token_histogram",
            "text_fingerprint",
            "multimodal_features",
            "agg_pricing_summary",
            "events_rollup",
        ):
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())
    finally:
        spark.stop()

    return {
        "metric": "e2e_suite_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
        "cpus": cpus,
        "bench_docs": BENCH_DOCS,
        **extras,
    }


def run_scaling() -> dict:
    """Same encode job at multiple parallelism levels on identical input;
    efficiency reported for every 4x pair present in the level list. The
    repo-protocol pair is 8 -> 32 (BASELINE.md:30); 1 -> 4 is the
    cluster-analog pair (below the single-host memory-bandwidth ceiling —
    see BENCH/BASELINE.md)."""
    levels = [int(x) for x in os.environ.get("EGGOPRESS_SCALING_LEVELS", "1,4,8,16,32").split(",")]
    repeats = int(os.environ.get("EGGOPRESS_SCALING_REPEATS", "3"))
    cooldown = int(os.environ.get("EGGOPRESS_SCALING_COOLDOWN", "20"))
    # CPU pinning (taskset -c 0-(k-1)): without it, "local[k]" is NOT a
    # k-CPU measurement on this 32-core host — the JVM's helper threads
    # (shuffle IO, GC, parquet) and the Python codec workers land on
    # out-of-slot host cores, inflating small-k throughput ~20-25%
    # (measured: local[1] 5.92M tok/s unpinned vs 4.74M pinned) and
    # deflating every efficiency ratio. Pinning makes level k a true
    # k-CPU run — which is what "N executors vs 4N executors" means.
    pin = os.environ.get("EGGOPRESS_SCALING_PIN", "1") != "0" and shutil.which("taskset")
    results: dict[int, dict] = {}
    first = True
    for cpus in levels:
        runs = []
        for _ in range(repeats):
            if not first:
                time.sleep(cooldown)  # back-to-back runs degrade successors
            first = False
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--encode-only"]
            if pin and cpus <= (os.cpu_count() or cpus):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True,
            )
            runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        # median, not best-of: run-to-run host contention on this shared VM
        # swings single-level throughput >2x, and the efficiency ratio is
        # only as stable as its noisiest endpoint
        runs.sort(key=lambda r: r["tokens_per_sec_encode"])
        med = runs[len(runs) // 2]
        med["all_runs_tokens_per_sec"] = [r["tokens_per_sec_encode"] for r in runs]
        results[cpus] = med

    def eff(a: int, b: int) -> float:
        return round(
            results[b]["tokens_per_sec_encode"]
            / ((b / a) * results[a]["tokens_per_sec_encode"]),
            3,
        )

    pairs = {f"{a}->{b}": eff(a, b) for a, b in
             [(a, 4 * a) for a in levels if 4 * a in results]}
    proto = pairs.get("8->32")
    analog = pairs.get("1->4")
    report = {
        # repo-protocol pair (BASELINE.md:30): local[8] -> local[32]
        "protocol_pair": "8->32",
        "scaling_efficiency": proto if proto is not None else analog,
        "meets_0.8_target": (proto if proto is not None else analog or 0) >= 0.8,
        # cluster-analog pair: below the shared-bus bandwidth ceiling
        "cluster_analog_pair": "1->4",
        "cluster_analog_efficiency": analog,
        "cpu_pinned": bool(pin),
        "pairs": pairs,
        "bench_docs": int(os.environ.get("EGGOPRESS_SCALING_DOCS", "800000")),
        "tokens": results[levels[-1]]["tokens"],
        "curve": {str(c): results[c]["tokens_per_sec_encode"] for c in levels},
        "curve_all_runs": {str(c): results[c]["all_runs_tokens_per_sec"] for c in levels},
    }
    _write_baseline_md(results, report)
    return report


def run_encode_only(cpus: int) -> dict:
    import duckdb

    from eggopress import encode
    from eggopress.encode import plan_salts

    n_docs = int(os.environ.get("EGGOPRESS_SCALING_DOCS", "800000"))
    seed = int(os.environ.get("EGGOPRESS_SCALING_SEED", "42"))
    tag = os.environ.get("EGGOPRESS_SCALING_TAG", "")
    spark = _session(cpus)
    try:
        corpus_path = _materialize_corpus(spark, n_docs, seed)
        corpus = spark.read.parquet(corpus_path)

        # salt plan computed outside Spark (duckdb scan) — partition count
        # scales with cores, per the conf sizing design
        counts = dict(
            duckdb.sql(
                f"SELECT source, count(*) FROM read_parquet('{corpus_path}/*.parquet') GROUP BY source"
            ).fetchall()
        )
        salts = plan_salts({k: int(v) for k, v in counts.items()}, 2 * cpus)

        # warm the Python workers / codegen outside the timed region
        warm = os.path.join(SCRATCH, f"tbl_warm_{cpus}{tag}")
        shutil.rmtree(warm, ignore_errors=True)
        encode.encode_table(spark, corpus.limit(2000), warm, n_partitions=4)

        # concurrency experiments: all peer processes must start their
        # TIMED encode together (JVM/warmup durations differ) — signal
        # readiness, then spin until every peer has
        barrier = os.environ.get("EGGOPRESS_START_BARRIER")
        if barrier:
            import glob

            n_peers = int(os.environ.get("EGGOPRESS_BARRIER_N", "2"))
            open(f"{barrier}.{os.getpid()}", "w").close()
            while len(glob.glob(barrier + ".*")) < n_peers:
                time.sleep(0.2)

        table = os.path.join(SCRATCH, f"tbl_scale_{cpus}{tag}")
        shutil.rmtree(table, ignore_errors=True)
        t0 = time.time()
        summary = encode.encode_table(spark, corpus, table, salts=salts)
        wall = time.time() - t0
    finally:
        spark.stop()
    return {
        "cpus": cpus,
        "wall_sec": round(wall, 3),
        "t_start": round(t0, 3),
        "t_end": round(t0 + wall, 3),
        "tokens": summary["values"],
        "tokens_per_sec_encode": round(summary["values"] / wall),
        "encoded_bytes": summary["encoded_bytes"],
    }


def _write_baseline_md(results: dict, report: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    rows = "\n".join(
        f"| local[{c}] | {r['wall_sec']} | {r['tokens_per_sec_encode']:,} | "
        f"{min(r['all_runs_tokens_per_sec']):,} – {max(r['all_runs_tokens_per_sec']):,} |"
        for c, r in sorted(results.items())
    )
    pair_rows = "\n".join(
        f"| {p} | {e} | {'MET' if e >= 0.8 else 'NOT MET'} |"
        for p, e in sorted(report["pairs"].items(), key=lambda kv: int(kv[0].split('->')[0]))
    )
    proto = report["pairs"].get("8->32")
    proto_line = (
        f"**Protocol pair (BASELINE.md:30, local[8] -> local[32]): efficiency = {proto}"
        f"** (target >= 0.8: {'MET' if (proto or 0) >= 0.8 else 'NOT MET on shared-bus hardware'})"
        if proto is not None else
        "Protocol pair 8->32 not in the level list for this run."
    )
    body = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Same encode job (deterministic synth corpus, identical pre-materialized
parquet input: {report['bench_docs']} docs / {report['tokens']:,} tokens) run at
multiple parallelism levels on local[k] — the sandbox substitute for the
N- vs 4N-executor cluster criterion (no real cluster available here).
Warmup encode excluded from timing.

CPU pinning: {'each level k runs under `taskset -c 0-(k-1)`, so level k is a TRUE k-CPU measurement' if report.get('cpu_pinned') else 'UNPINNED (taskset unavailable)'}.
Without pinning, "local[k]" only bounds task slots: the JVM's helper
threads (shuffle IO, GC, parquet) and the Python codec workers run on
out-of-slot host cores, which inflates small-k throughput ~20-25%
(measured: local[1] 5.92M tok/s unpinned vs 4.74M pinned) and deflates
every efficiency ratio below what N- vs 4N-executor clusters — whole
machines per executor — would show.

Median of {os.environ.get('EGGOPRESS_SCALING_REPEATS', '3')} runs per level (run-to-run spread shown: this
shared VM's host contention swings single-level throughput up to 2x,
so medians, not best-of, feed the efficiency ratios).

| parallelism | wall (s) | tokens/sec (median) | spread (min – max) |
|---|---|---|---|
{rows}

| 4x pair | efficiency = thr@4N / (4 x thr@N) | >= 0.8 |
|---|---|---|
{pair_rows}

{proto_line}

Cluster-analog pair (local[1] -> local[4], below the bandwidth ceiling):
efficiency = {report['pairs'].get('1->4')}.

## Reading the pairs: the single-host ceiling, now MEASURED

All local[k] workers share ONE memory system. The full pipeline (parquet
scan -> salted range shuffle -> Arrow -> vectorized codecs -> parquet
write) saturates this VM at roughly 28-38M tokens/sec regardless of added
cores past ~16. This is no longer an inference: the discriminating
experiment in BENCH/CONCURRENCY.md ran TWO concurrent local[16] encodes
on disjoint inputs (separate JVMs, Python worker pools, shuffle dirs) and
their barrier-aligned aggregate was only ~1.15x one local[16] process —
so no in-process change can make one 32-thread process do what two whole
processes cannot. The 8->32 pair therefore measures host saturation, not
the engine's plan: both ends sit at the ceiling. Per-core scaling is
near-linear while BELOW the ceiling — the 1->4 pair — and that is the
regime that models a real multi-executor cluster, where each executor
brings its OWN memory bus, so N->4N executors multiplies bandwidth by 4,
unlike N->4N threads on one host. Both pairs are published; neither is
substituted for the other.

Engine knobs that implement cluster-proportional scaling:
`conf.plan_submit` sizes shuffle partitions and encode partitions from
total cores (eggo/operations.py:124-137 analog); chunk size stays
constant so executor memory is bounded at any scale.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(body)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return 0
    if "--encode-only" in sys.argv:
        print(json.dumps(run_encode_only(cpus)))
        return 0
    print(json.dumps(run_suite(cpus, sf_dir)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
