"""Bus-saturation falsification experiment (round-3 VERDICT item 1).

Question: is the local[16] -> local[32] throughput cliff caused by the
HOST (one shared memory bus / kernel-side contention — nothing the engine
can fix) or by something IN-PROCESS (fixable: Python worker
oversubscription, JVM lock/GC contention, driver-side serialization)?

Discriminating experiment: run the same encode job
  (a) as ONE local[16] process, and
  (b) as TWO concurrent local[16] processes on DISJOINT inputs
      (different synth seeds, separate table dirs, start barrier so the
      timed regions coincide),
interleaved a->b->a->b... so multi-minute host-weather windows hit both
arms equally.

  aggregate(b) ~= single(a)      -> the host is the ceiling: two
                                    independent JVMs cannot move more
                                    bytes than one, so neither can one
                                    JVM with twice the threads. The 8->32
                                    pair measures the host, not the plan.
  aggregate(b) ~= 2 x single(a)  -> the ceiling is in-process; the 16->32
                                    cliff is an engine bug worth chasing.

Writes BENCH/CONCURRENCY.md + prints one JSON line.

Usage:  python BENCH/concurrency_probe.py   [EGGOPRESS_SCALING_DOCS=800000]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
ROUNDS = int(os.environ.get("EGGOPRESS_PROBE_ROUNDS", "3"))
COOLDOWN = int(os.environ.get("EGGOPRESS_PROBE_COOLDOWN", "20"))
CPUS = int(os.environ.get("EGGOPRESS_PROBE_CPUS", "16"))


def _run(seed: int, tag: str, barrier: str | None = None) -> subprocess.Popen:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(CPUS),
        EGGOPRESS_SCALING_SEED=str(seed),
        EGGOPRESS_SCALING_TAG=tag,
    )
    if barrier:
        env["EGGOPRESS_START_BARRIER"] = barrier
        env["EGGOPRESS_BARRIER_N"] = "2"
    else:
        env.pop("EGGOPRESS_START_BARRIER", None)
    return subprocess.Popen(
        [sys.executable, BENCH, "--encode-only"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def _result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    if p.returncode != 0:
        raise RuntimeError(f"encode subprocess failed rc={p.returncode}")
    return json.loads(out.strip().splitlines()[-1])


def single_run() -> dict:
    return _result(_run(seed=42, tag="_solo"))


def dual_run() -> dict:
    barrier = os.path.join(tempfile.mkdtemp(prefix="eggopress-barrier-"), "go")
    a = _run(seed=42, tag="_dualA", barrier=barrier)
    b = _run(seed=43, tag="_dualB", barrier=barrier)
    ra, rb = _result(a), _result(b)
    for f in glob.glob(barrier + ".*"):
        os.unlink(f)
    t0 = min(ra["t_start"], rb["t_start"])
    t1 = max(ra["t_end"], rb["t_end"])
    overlap = max(0.0, min(ra["t_end"], rb["t_end"]) - max(ra["t_start"], rb["t_start"]))
    return {
        "aggregate_tokens_per_sec": round((ra["tokens"] + rb["tokens"]) / (t1 - t0)),
        "per_process": [ra["tokens_per_sec_encode"], rb["tokens_per_sec_encode"]],
        "overlap_frac": round(overlap / max(ra["wall_sec"], rb["wall_sec"]), 3),
        "walls": [ra["wall_sec"], rb["wall_sec"]],
        "tokens": ra["tokens"] + rb["tokens"],
    }


def main() -> int:
    singles, duals = [], []
    for i in range(ROUNDS):
        if i:
            time.sleep(COOLDOWN)
        s = single_run()
        singles.append(s)
        print(f"round {i}: single local[{CPUS}] -> "
              f"{s['tokens_per_sec_encode']:,} tok/s", file=sys.stderr)
        time.sleep(COOLDOWN)
        d = dual_run()
        duals.append(d)
        print(f"round {i}: dual   local[{CPUS}] -> agg "
              f"{d['aggregate_tokens_per_sec']:,} tok/s "
              f"(overlap {d['overlap_frac']})", file=sys.stderr)

    med_single = statistics.median(r["tokens_per_sec_encode"] for r in singles)
    med_dual = statistics.median(r["aggregate_tokens_per_sec"] for r in duals)
    ratio = round(med_dual / med_single, 3)
    verdict = (
        "host-ceiling" if ratio < 1.3
        else "in-process" if ratio > 1.7
        else "inconclusive"
    )
    report = {
        "cpus_each": CPUS,
        "rounds": ROUNDS,
        "single_median_tok_s": round(med_single),
        "single_all": [r["tokens_per_sec_encode"] for r in singles],
        "dual_aggregate_median_tok_s": round(med_dual),
        "dual_all": [r["aggregate_tokens_per_sec"] for r in duals],
        "dual_overlap_fracs": [r["overlap_frac"] for r in duals],
        "aggregate_over_single": ratio,
        "verdict": verdict,
    }
    _write_md(report)
    print(json.dumps(report))
    return 0


def _write_md(r: dict) -> None:
    explain = {
        "host-ceiling": (
            "Two independent 16-thread JVMs on disjoint inputs move barely more "
            "tokens than one: the shared host (memory bus + kernel scheduling), "
            "not the engine's plan, is the ceiling above ~16 threads. A single "
            "local[32] process cannot beat the sum of two whole processes, so "
            "the 8->32 efficiency number measures the host, not the engine."
        ),
        "in-process": (
            "Two concurrent 16-thread JVMs nearly double aggregate throughput: "
            "the host still has headroom, so the local[32] shortfall is an "
            "IN-PROCESS bottleneck (Python worker oversubscription, JVM "
            "lock/GC, or driver-side serialization) and is fixable."
        ),
        "inconclusive": (
            "Aggregate sits between 1.3x and 1.7x of a single process: partial "
            "host saturation. The host ceiling explains part of the 16->32 "
            "cliff; in-process contention may account for the rest."
        ),
    }[r["verdict"]]
    body = f"""# BENCH/CONCURRENCY — bus-saturation falsification

Same encode job, {r['rounds']} interleaved rounds (single vs dual, 20 s
cooldowns, start-barrier-aligned timed regions, disjoint synth corpora):

| arm | median tokens/s | all runs |
|---|---|---|
| 1 x local[{r['cpus_each']}] | {r['single_median_tok_s']:,} | {', '.join(f"{x:,}" for x in r['single_all'])} |
| 2 x local[{r['cpus_each']}] (aggregate) | {r['dual_aggregate_median_tok_s']:,} | {', '.join(f"{x:,}" for x in r['dual_all'])} |

aggregate / single = **{r['aggregate_over_single']}** (timed-region overlap
fractions: {r['dual_overlap_fracs']}).

**Verdict: {r['verdict']}.** {explain}

All probe runs (including windows this file was regenerated over) are
recorded in BENCH/SCALING_RUNS.md.
"""
    with open(os.path.join(REPO, "BENCH", "CONCURRENCY.md"), "w") as f:
        f.write(body)


if __name__ == "__main__":
    sys.exit(main())
