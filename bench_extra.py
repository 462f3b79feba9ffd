"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement; this file holds the noop-sink isolation runs, plan capture,
and phase decompositions cited in OPTIMIZATION_r06.md — guide §1.4/§1.5).

Usage:
  python bench_extra.py time <query> [<query>...] [--repeats N]
  python bench_extra.py plans <query> [<query>...] [--tag before|after]
  python bench_extra.py encode            # corpus encode phase breakdown
  python bench_extra.py jaccard           # stepwise ngram-jaccard timing
  python bench_extra.py minhash           # stepwise minhash timing

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from eggopress.conf import session_builder

    os.environ.setdefault("EGGOPRESS_SCRATCH_DIR", "/dev/shm/eggopress-scratch")
    spark = (
        session_builder("eggopress-bench-extra", cores=CPUS)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def cmd_time(names: list[str], repeats: int) -> None:
    import __spark_entry__ as entrymod

    spark = _session()
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        out[name] = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()  # bench.py methodology
            out[name].append(round(time.time() - t0, 3))
        print(json.dumps({"q": name, "rows": n, "times": out[name]}))
    spark.stop()


def cmd_plans(names: list[str], tag: str) -> None:
    import __spark_entry__ as entrymod

    spark = _session()
    qs = entrymod.queries()
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(_explain_formatted(df))
        print("wrote", p)
    spark.stop()


def cmd_encode() -> None:
    from eggopress import encode, synth

    spark = _session()
    n_docs = int(os.environ.get("EGGOPRESS_BENCH_DOCS", "60000"))
    path = os.path.join(REPO, "_scratch", "bench", f"corpus_{n_docs}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth.corpus_df(spark, n_docs).repartition(32).write.mode(
            "overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    for arm, cluster in (("cluster", True), ("nocluster", False)):
        table = os.path.join(REPO, "_scratch", "bench", f"tbl_prof_{arm}")
        shutil.rmtree(table, ignore_errors=True)
        t0 = time.time()
        s = encode.encode_table(spark, corpus, table, cluster=cluster)
        wall = time.time() - t0
        print(json.dumps({"arm": arm, "wall": round(wall, 3),
                          "phases": s.get("phase_sec"),
                          "partitions": s["partitions"],
                          "chunks": s["chunks"],
                          "encoded_bytes": s["encoded_bytes"]}))
        shutil.rmtree(table, ignore_errors=True)
    spark.stop()


def _timed_count(label, df):
    t0 = time.time()
    n = df.count()
    print(f"{label:34s} {time.time() - t0:7.3f}s rows={n}")
    return n


def cmd_jaccard() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from eggopress.pipeline import dedup

    spark = _session()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    t0 = time.time()
    sh_docs = dedup.shingle_frame(docs)
    _timed_count("shingle_frame", sh_docs)
    hs_docs = sh_docs.select(
        "doc_id", F.expr("transform(shingles, s -> xxhash64(s))").alias("hsh"),
        "n_sh").persist()
    _timed_count("hash_docs(persist)", hs_docs)
    ex = hs_docs.select("doc_id", "n_sh", F.explode("hsh").alias("sh"))
    _timed_count("explode", ex)
    dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
    _timed_count("dfreq", dfreq)
    t_eff = 0.6 - 5e-7
    _w = Window.partitionBy("doc_id").orderBy("df", "sh")
    pre = (
        ex.join(dfreq, "sh")
        .withColumn("p", F.row_number().over(_w) - 1)
        .filter(F.col("p") < (F.floor((1 - t_eff) * F.col("n_sh")) + 1).cast("int"))
        .select("doc_id", "n_sh", "p", "sh")
    )
    _timed_count("prefix(join+window)", pre)
    a, b = pre.alias("a"), pre.alias("b")
    alpha = (t_eff / (1.0 + t_eff) * (F.col("a.n_sh") + F.col("b.n_sh")) - 1e-9)
    cand = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               & (F.least(F.col("a.n_sh") - F.col("a.p"),
                          F.col("b.n_sh") - F.col("b.p")) >= alpha))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    _timed_count("candidates", cand)
    full = hs_docs
    res = (
        cand.join(full.select(F.col("doc_id").alias("id_a"),
                              F.col("hsh").alias("h_a"), F.col("n_sh").alias("na")), "id_a")
        .join(full.select(F.col("doc_id").alias("id_b"),
                          F.col("hsh").alias("h_b"), F.col("n_sh").alias("nb")), "id_b")
        .withColumn("common", F.size(F.array_intersect("h_a", "h_b")))
        .withColumn("jaccard", F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6))
        .filter(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b", "jaccard")
    )
    _timed_count("verify", res)
    print(f"total (incl recompute overlap)   {time.time() - t0:7.3f}s")
    t0 = time.time()
    out = dedup.ngram_jaccard_pairs(docs, 0.6)
    _timed_count("full ngram_jaccard_pairs", out)
    print(f"e2e {time.time() - t0:7.3f}s")
    spark.stop()


def cmd_minhash() -> None:
    from pyspark.sql import functions as F

    from eggopress.pipeline import dedup, textstats

    spark = _session()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sh_docs = dedup.shingle_frame(docs)
    _timed_count("shingle_frame", sh_docs)
    hashed = sh_docs.select(
        "doc_id",
        F.expr(f"transform(shingles, s -> {textstats.h32_spark('s')})").alias("hs"),
    )
    _timed_count("md5-hashed shingles", hashed)
    sig = dedup.minhash_signatures(docs)
    _timed_count("signatures", sig)
    t0 = time.time()
    out = dedup.minhash_lsh_pairs(docs)
    _timed_count("full minhash_lsh_pairs", out)
    print(f"e2e {time.time() - t0:7.3f}s")
    spark.stop()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if not args:
        print(__doc__)
        return 1
    cmd = args.pop(0)
    repeats = 1
    tag = "before"
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    if cmd == "time":
        cmd_time(args, repeats)
    elif cmd == "plans":
        cmd_plans(args, tag)
    elif cmd == "encode":
        cmd_encode()
    elif cmd == "jaccard":
        cmd_jaccard()
    elif cmd == "minhash":
        cmd_minhash()
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
