"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the 100 TB story):
  - exact: hash-groupBy — one shuffle on a 128-bit digest, no skew (hash
    keys are uniform), map-side partial agg.
  - ngram-Jaccard: df-ordered prefix filtering (default) — each doc
    indexes only its rarest floor((1-t)*|d|)+1 shingles, so candidate
    volume is independent of hot-shingle frequency; exact verification
    via array_intersect. The plain inverted-index join survives as an
    explicitly-requested cross-check (quadratic on hot shingles).
  - minhash-LSH: signatures per doc (narrow), explode to (band, key)
    buckets, pairs within buckets — the classic shuffle-light candidate
    generation; banding parameters tune recall.
  - simhash: 64-bit majority-vote fingerprint; simhash_pairs generates
    hamming-ball candidates from 4x16-bit band buckets (pigeonhole: any
    pair within hamming distance 3 matches at least one band exactly, so
    recall is 100%, not approximate; 65,536 buckets per band keeps the
    band self-join sub-quadratic) and verifies with popcount(xor).
  - banded joins (minhash / simhash / cosine) accept max_bucket_rows:
    mega-duplicate groups otherwise make m^2/2 candidates per band.
  - embedding cosine: see simsearch.py for the bucketed ANN path.

All hash arithmetic uses the md5-prefix h32 so the DuckDB oracle can
replicate results exactly.
"""

from __future__ import annotations

import logging
import os

import numpy as np
from pyspark.sql import DataFrame, functions as F

from eggopress.pipeline.textstats import (
    WORDS_DUCK,
    WORDS_SPARK,
    fan_out,
    h32_duck,
    h32_spark,
    h32b_duck,
)

MINHASH_K = 16
MINHASH_BANDS = 8  # 2 hashes per band
MH_P = 2_147_483_647
_rng = np.random.default_rng(7)
MH_A = [int(a) for a in _rng.integers(1, MH_P, MINHASH_K)]
MH_B = [int(b) for b in _rng.integers(0, MH_P, MINHASH_K)]

SHINGLES_SPARK = (
    f"array_distinct(transform(sequence(1, greatest(size({WORDS_SPARK}) - 2, 1)), "
    f"i -> concat_ws(' ', slice({WORDS_SPARK}, i, 3))))"
)
# Same semantics over a pre-materialized words COLUMN: inlining WORDS_SPARK
# inside the lambda re-runs split+filter per shingle position (O(words^2)
# per doc — measured 2 ms/doc); slicing a computed array is O(words).
# The _w alias is referenced 3x, so CollapseProject keeps the projection.
SHINGLES_FROM_WORDS = (
    "array_distinct(transform(sequence(1, greatest(size(_w) - 2, 1)), "
    "i -> concat_ws(' ', slice(_w, i, 3))))"
)
SHINGLES_DUCK = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({WORDS_DUCK}) - 2, 1)), "
    f"i -> array_to_string(({WORDS_DUCK})[i:i+2], ' ')))"
)


log = logging.getLogger("eggopress.dedup")


def shed_big_buckets(banded: DataFrame, max_bucket_rows: int | None,
                     what: str, bucket_col: str = "bucket",
                     metrics: dict | None = None) -> DataFrame:
    """Bucket-size guard for banded LSH joins: a mega-duplicate group of m
    docs (ubiquitous boilerplate in web crawls) shares every band and would
    yield m^2/2 candidate pairs per band. With a cap, buckets holding more
    than max_bucket_rows rows are SHED (dropped from candidate generation,
    with the shed bucket/row counts logged) — the scale-safe posture is to
    route such groups through exact_dedup first, which collapses them for
    one shuffle instead of m^2 candidate pairs.

    Only the shed SUMMARY (two numbers) comes to the driver; the over-cap
    keys themselves stay distributed and filter back through a left-anti
    join — their count is bounded by n_rows / max_bucket_rows, but at web
    scale that bound can still be millions of keys, which a collected
    NOT-IN literal list would choke on. The join carries NO broadcast
    hint on purpose: the over-cap key set is a scratch-parquet read with
    known file sizes, so the planner (plus AQE) broadcasts it while it
    fits and falls back to a shuffled anti join past the threshold — an
    explicit F.broadcast() would instead FORCE a broadcast up to the hard
    8 GB driver limit and error there rather than degrade.
    """
    if max_bucket_rows is None:
        return banded
    big = _materialize_scratch(
        banded.groupBy(bucket_col)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_bucket_rows)
    )
    n_big, shed_rows = (big.agg(
        F.count("*"), F.coalesce(F.sum("_n"), F.lit(0))).first() or (0, 0))
    if metrics is not None:
        metrics["shed_buckets"] = int(n_big)
        metrics["shed_rows"] = int(shed_rows)
    if not n_big:
        return banded
    log.warning(
        "%s: shedding %d over-cap buckets (>%d rows, %d rows total) from "
        "candidate generation", what, n_big, max_bucket_rows, shed_rows,
    )
    return banded.join(big.select(bucket_col), bucket_col, "left_anti")


def scratch_root(spark) -> str:
    """Shared-filesystem scratch root for intermediate materializations.

    Resolution order:
      1. EGGOPRESS_SCRATCH_DIR — explicit override; point it at tmpfs
         (/dev/shm) in local mode for speed, at NVMe-backed shared scratch
         on a cluster with one.
      2. <spark.sql.warehouse.dir>/_eggopress_scratch — the default. The
         warehouse dir is the one location every Spark deployment already
         agrees is on the SHARED filesystem (managed tables live there),
         so executors writing scratch partitions and the follow-up
         spark.read on other executors all see the same files. A per-host
         local default (tmpfs/tempfile) would silently lose partitions the
         moment the job runs on more than one machine — which is why the
         fast-local medium is opt-in, never the default.
    """
    base = os.environ.get("EGGOPRESS_SCRATCH_DIR")
    if base:
        return base
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
        while wh.startswith("//"):  # file:///x and file://x -> /x
            wh = wh[1:]
    return os.path.join(wh, "_eggopress_scratch")


def _materialize_scratch(df: DataFrame) -> DataFrame:
    """Write a DataFrame once to scratch parquet and return a reader over
    it. Used where a plan feeds multiple DAG branches: unlike .persist(),
    nothing is left registered in executor storage memory after the
    consuming action (repeated pipeline calls in a long-lived session must
    not accumulate cached DataFrames). The scratch dir lives under
    scratch_root() — shared-filesystem by default, see above — and local
    dirs are removed at process exit."""
    import atexit
    import shutil
    import uuid

    spark = df.sparkSession
    base = scratch_root(spark)
    # plain join, not os.path.join: base may be a URI (hdfs://, s3a://)
    d = f"{base.rstrip('/')}/mat-{uuid.uuid4().hex[:12]}"
    if "://" not in d:
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    df.write.mode("overwrite").parquet(d)
    return spark.read.parquet(d)


# ------------------------------------------------------------- exact

def exact_dedup(df: DataFrame) -> DataFrame:
    """Keep one representative doc per exact text digest; report per-source
    kept/dropped counts."""
    return (
        df.select("source", F.md5("text").alias("digest"), "doc_id")
        .groupBy("source", "digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("copies"))
        .groupBy("source")
        .agg(
            F.count("*").alias("kept"),
            F.sum(F.col("copies") - 1).alias("dropped"),
        )
    )


EXACT_DEDUP_ORACLE = """
SELECT source, count(*) AS kept, cast(sum(copies - 1) as bigint) AS dropped
FROM (
  SELECT source, md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS copies
  FROM documents GROUP BY source, md5(text)
) GROUP BY source
"""


# --------------------------------------------------- n-gram Jaccard

def shingle_frame(df: DataFrame) -> DataFrame:
    """(doc_id, shingles, n_sh) with the words array staged in its own
    projection so split/filter runs once per doc, not once per shingle.
    The input fans out first (one cheap raw-row shuffle, no-op on
    already-split inputs): shingling + downstream hashing is the heavy
    narrow work, and a single-row-group parquet input would otherwise
    serialize it on one scan task (guide §2.5)."""
    df = fan_out(df)
    return (
        df.select("doc_id", F.expr(WORDS_SPARK).alias("_w"))
        .select("doc_id", F.expr(SHINGLES_FROM_WORDS).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.6,
                        method: str = "prefix", *,
                        materialize: bool = True) -> DataFrame:
    """Exact 3-word-shingle Jaccard >= threshold. Both methods return
    identical results (parity-tested).

    method='prefix' (default, the 100TB path): df-ordered prefix
    filtering from the set-similarity-join literature — each doc indexes
    only its floor((1-t)*|d|)+1 RAREST shingles (global document-frequency
    order), which provably covers every pair with Jaccard >= t; candidates
    are then verified exactly with array_intersect. Hot shingles land
    outside prefixes, so the candidate join's cardinality carries no
    shingle-frequency term and never explodes on them.

    method='inverted': plain inverted-index join (explode -> join on
    shingle -> count common). Same results; quadratic on hot shingles, so
    it is only a small-scale cross-check, never the default.
    """
    sh_docs = shingle_frame(df)

    if method == "inverted":
        sh = sh_docs.select("doc_id", "n_sh", F.explode("shingles").alias("sh"))
        a, b = sh.alias("a"), sh.alias("b")
        return (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.col("a.n_sh").alias("na"),
                F.col("b.n_sh").alias("nb"),
            )
            .agg(F.count("*").alias("common"))
            .withColumn(
                "jaccard",
                F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # ---- prefix filtering ----
    # the whole pipeline runs on 64-bit shingle hashes: strings never
    # shuffle (4-25x fewer key bytes through df-count, prefix join, and
    # verification). The hash table feeds three DAG branches, so it is
    # materialized ONCE to scratch parquet (not .persist(): scratch leaves
    # zero cached storage behind, the planner sees REAL file sizes for the
    # verify-join strategy below, and repeated pipeline calls in a
    # long-lived session accumulate nothing).
    # the FINAL filter compares round(J, 6) >= threshold (6dp rounding
    # keeps the oracle hash stable), which admits pairs whose true J is
    # up to 5e-7 BELOW threshold — so all candidate-pruning machinery
    # (prefix length, positional filter) must guarantee coverage at the
    # slackened threshold or boundary pairs silently vanish
    t_eff = threshold - 5e-7
    hs_docs = sh_docs.select(
        "doc_id",
        F.expr("transform(shingles, s -> xxhash64(s))").alias("hsh"),
        "n_sh",
    )
    # materialize=False returns the LAZY end-to-end plan (no scratch
    # write) — for plan inspection/tests; executing it recomputes the
    # hash table per branch, so production callers keep the default
    hs_bytes = None
    if materialize:
        hs_docs = _materialize_scratch(hs_docs)
        hs_bytes = _scratch_bytes(hs_docs)
    # "small" = the whole problem fits a couple of tasks (hash table
    # under ~8 MB, i.e. low tens of thousands of docs): the two
    # stage-adding optimizations below (prefix-row materialization and
    # the pair-stream fan) exist to parallelize millions of candidate
    # verifications, and at small scale their extra jobs cost more than
    # the serial work they parallelize (measured: +2.4 s at the 5k-doc
    # sf0.1 bench, -4 s at the 50k-doc sf1.0 bench)
    small = hs_bytes is not None and hs_bytes < (
        int(os.environ.get("EGGOPRESS_JACCARD_SMALL_MB", "8")) << 20)
    ex = hs_docs.select("doc_id", "n_sh", F.explode("hsh").alias("sh"))
    dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
    pre = None
    if materialize and not small:
        # big path: materialize the document-frequency table (the one
        # unavoidable full aggregation) and, while it fits the broadcast
        # cap, derive the prefix rows in ONE Arrow pass over the hash
        # table with the df map broadcast — replacing the explode ->
        # dfreq join -> window rank chain and its two exchanges + sort
        # (guide §2.4: remove shuffles outright). Identical rows by
        # construction: the kernel ranks each doc's hashes by the same
        # (df, sh) order the window used (no ties possible — hashes are
        # distinct within a doc). Past the cap (billions of distinct
        # shingles) the join+window plan below stands, reusing the
        # materialized dfreq.
        dfreq = _materialize_scratch(dfreq)
        if _scratch_bytes(dfreq) <= _broadcast_cap_bytes():
            pre = _materialize_scratch(
                _prefix_rows_broadcast(hs_docs, dfreq, t_eff))
    if pre is None:
        # prefix rows straight from a per-doc window rank over the global
        # (df, sh) order — the previous plan materialized a sorted per-doc
        # ARRAY (collect_list + sort_array) only to posexplode the first
        # plen entries back into rows; rank <= plen is the same set with
        # no array build/teardown. p stays 0-based to keep the positional
        # arithmetic below identical.
        from pyspark.sql.window import Window

        _w = Window.partitionBy("doc_id").orderBy("df", "sh")
        pre = (
            ex.join(dfreq, "sh")
            .withColumn("p", F.row_number().over(_w) - 1)
            .filter(F.col("p") < (F.floor((1 - t_eff) * F.col("n_sh")) + 1).cast("int"))
            .select("doc_id", "n_sh", "p", "sh")
        )
        # the prefix rows feed BOTH sides of the candidate self-join;
        # without this the join+window subtree executes twice (no
        # ReusedExchange across a broadcast boundary — verified in the
        # r06 before-plan). The frame is skinny, so the scratch write is
        # cheap at any scale; skipped when small (the double compute is
        # then cheaper than another job).
        if materialize and not small:
            pre = _materialize_scratch(pre)
    # positional filter (ppjoin): a pair with Jaccard >= t has overlap
    # o >= alpha = ceil(t*(na+nb)/(1+t)); its FIRST common shingle in the
    # global order sits in both prefixes at positions (pa, pb), and all o
    # common shingles lie in the suffixes from there, so
    # min(na-pa, nb-pb) >= alpha must hold for that match — candidates
    # matched only late in a prefix are cut before the distinct/verify
    a, b = pre.alias("a"), pre.alias("b")
    if (materialize and not small
            and _scratch_bytes(pre) <= _broadcast_cap_bytes()):
        # the prefix frame is ~0.4 skinny rows per shingle occurrence;
        # while its materialized size fits the cap, broadcasting one side
        # of the self-join removes both sort-merge exchanges + sorts from
        # the candidate stage (guide §3.1). Past the cap the planner's
        # shuffled self-join stands.
        b = F.broadcast(b)
    # the suffix bound is an integer, so min >= ceil(q) <=> min >= q; the
    # 1e-9 slack absorbs float rounding (0.9/1.9*38 lands a hair ABOVE 18,
    # and a ceil would over-filter exact-boundary pairs)
    alpha = (
        t_eff / (1.0 + t_eff) * (F.col("a.n_sh") + F.col("b.n_sh")) - 1e-9
    )
    cand = a.join(
        b,
        (F.col("a.sh") == F.col("b.sh"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.least(F.col("a.n_sh") - F.col("a.p"), F.col("b.n_sh") - F.col("b.p")) >= alpha),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    if materialize and not small:
        # dedup + verify-parallelism in ONE exchange: an explicit hash
        # repartition on the pair key satisfies the following
        # dropDuplicates' required distribution (no second exchange) and,
        # unlike a bare distinct(), is not AQE-coalesced to 2-3
        # partitions — which would run the CPU-bound verification below
        # nearly serially. (A bare distinct + round-robin fan was the
        # previous plan: two full exchanges of the ~16 B/row pair
        # stream.)
        cand = cand.repartition(
            cand.sparkSession.sparkContext.defaultParallelism * 2,
            "id_a", "id_b",
        ).dropDuplicates()
    else:
        cand = cand.distinct()
    full = hs_docs
    fa = full.select(F.col("doc_id").alias("id_a"),
                     F.col("hsh").alias("h_a"), F.col("n_sh").alias("na"))
    fb = full.select(F.col("doc_id").alias("id_b"),
                     F.col("hsh").alias("h_b"), F.col("n_sh").alias("nb"))
    if materialize and hs_bytes <= _broadcast_cap_bytes():
        # verify-join strategy (guide §3.1): the candidate side is the BIG
        # side (11M near-miss pairs for 2.5k true dups on the sf1.0
        # bench), and a shuffled join would move each candidate row TWICE
        # carrying a ~0.5 KB hash array after the first attach — measured
        # as the dominant cost of the whole operator. When the
        # materialized hash table's ACTUAL on-disk size fits the
        # broadcast cap, broadcast it on both attaches so candidate rows
        # never shuffle; past the cap (the 100 TB corpus) the planner's
        # shuffled join stands, exactly as before. (Verification
        # parallelism comes from the explicit pair-key repartition fused
        # into the dedup above.)
        fa, fb = F.broadcast(fa), F.broadcast(fb)
    result_plan = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("common", F.size(F.array_intersect("h_a", "h_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not materialize:
        return result_plan
    # run the whole job now (the pair set is the small side — the deduped
    # output any pipeline materializes anyway); the scratch intermediates
    # above are cleaned at process exit like every _materialize_scratch dir
    return _materialize_scratch(result_plan)


def _prefix_rows_broadcast(hs_docs: DataFrame, dfreq: DataFrame,
                           t_eff: float) -> DataFrame:
    """(doc_id, n_sh, p, sh) prefix rows via one Arrow pass with the
    document-frequency map broadcast (the under-cap path of
    ngram_jaccard_pairs — see the call site for when it applies, and for
    the join+window plan that stands past the cap).

    Per batch: flatten the per-doc hash arrays, attach df by binary
    search into the broadcast (sh -> df) map, rank within each doc by
    np.lexsort((sh, df, doc)) — doc-major, then (df, sh), the exact
    ordering of the window path's row_number() OVER (PARTITION BY doc_id
    ORDER BY df, sh), with no ties possible (hashes are distinct within
    a doc) — and keep ranks below the same plen = floor((1-t)*n_sh)+1
    bound (identical double arithmetic)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    spark = hs_docs.sparkSession
    pdf = dfreq.select("sh", "df").toPandas()
    sh_vals = pdf["sh"].to_numpy(dtype=np.int64)
    order0 = np.argsort(sh_vals)
    sh_sorted = sh_vals[order0]
    df_sorted = pdf["df"].to_numpy(dtype=np.int64)[order0]
    bc = spark.sparkContext.broadcast((sh_sorted, df_sorted))

    def fn(batches):
        sh_s, df_s = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            hsh = batch.column("hsh")
            lens = np.asarray(
                pc.list_value_length(hsh).to_numpy(zero_copy_only=False),
                dtype=np.int64)
            flat = hsh.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            nsh = batch.column("n_sh").to_numpy(
                zero_copy_only=False).astype(np.int64)
            total = len(flat)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            pos = np.searchsorted(sh_s, flat)
            if len(sh_s) == 0 or (pos >= len(sh_s)).any() or \
                    (sh_s[np.minimum(pos, len(sh_s) - 1)] != flat).any():
                raise RuntimeError(
                    "prefix df map does not cover the hash table "
                    "(inconsistent scratch state)")
            dfv = df_s[pos]
            order = np.lexsort((flat, dfv, doc_idx))
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sorted_doc = doc_idx[order]
            p = np.arange(total, dtype=np.int64) - starts[sorted_doc]
            plen = (np.floor((1 - t_eff) * nsh) + 1).astype(np.int64)
            keep = p < plen[sorted_doc]
            sel_doc = sorted_doc[keep]
            idx = pa.array(sel_doc)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(idx),
                    pa.array(nsh[sel_doc].astype(np.int32)),
                    pa.array(p[keep].astype(np.int32)),
                    pa.array(flat[order][keep]),
                ],
                names=["doc_id", "n_sh", "p", "sh"],
            )

    idt = dict(hs_docs.dtypes)["doc_id"]
    return hs_docs.select("doc_id", "hsh", "n_sh").mapInArrow(
        fn, f"doc_id {idt}, n_sh int, p int, sh long")


def _scratch_bytes(df: DataFrame) -> int:
    """Actual on-disk bytes behind a scratch-parquet-backed DataFrame —
    the real (not estimated) size the broadcast decision needs. Returns
    a huge sentinel (never broadcast) when the files are not local."""
    total = 0
    try:
        for f in df.inputFiles():
            p = f[len("file:"):] if f.startswith("file:") else f
            if "://" in p:
                return 1 << 62
            total += os.path.getsize(p)
    except Exception:
        return 1 << 62
    return total


def _broadcast_cap_bytes() -> int:
    """Cap for explicit broadcasts of materialized intermediates
    (EGGOPRESS_BROADCAST_CAP_MB, default 256): comfortably inside the
    driver/executor memory budget here, far under Spark's 8 GB hard
    broadcast limit, and overridable per deployment."""
    return int(os.environ.get("EGGOPRESS_BROADCAST_CAP_MB", "256")) * (1 << 20)


def ngram_jaccard_oracle(threshold: float = 0.6) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh
  FROM (SELECT doc_id, {SHINGLES_DUCK} AS shingles FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(count(*) / cast(a.n_sh + b.n_sh - count(*) as double), 6) AS jaccard
FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
HAVING round(count(*) / cast(a.n_sh + b.n_sh - count(*) as double), 6) >= {threshold}
"""


# ------------------------------------------------------ MinHash LSH

def minhash_signatures(df: DataFrame, engine: str = "arrow") -> DataFrame:
    """(doc_id, mh0..mh{K-1}) MinHash signatures.

    The shingle-hash array is materialized ONCE (md5 is the expensive
    part); each of the k permutations is then integer arithmetic over
    it. engine='arrow' (default) runs the k permutations as one
    vectorized pass — per permutation, (a*h + b) % p over the flat
    shingle-hash buffer and a segmented min via np.minimum.reduceat —
    where the SQL path evaluates k interpreted array_min(transform())
    lambdas per doc. Integer arithmetic is exact in both (products stay
    under 2^63), so the engines agree bit-for-bit — parity-pinned by
    test_minhash_arrow_matches_sql; engine='sql' is kept as the
    cross-check and oracle-shaped variant."""
    hashed = shingle_frame(df).select(
        "doc_id",
        F.expr(f"transform(shingles, s -> {h32_spark('s')})").alias("hs"),
    )
    if engine == "sql":
        return hashed.select(
            "doc_id",
            *[
                F.expr(
                    f"array_min(transform(hs, h -> pmod({MH_A[i]}L * h + {MH_B[i]}L, {MH_P}L)))"
                ).alias(f"mh{i}")
                for i in range(MINHASH_K)
            ],
        )

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            lst = batch.column("hs")
            lens = np.asarray(
                pc.list_value_length(lst).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            if (lens == 0).any():
                raise ValueError("minhash: empty shingle array (no words?)")
            vals = lst.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            cols = [batch.column("doc_id")]
            for i in range(MINHASH_K):
                perm = (MH_A[i] * vals + MH_B[i]) % MH_P
                cols.append(pa.array(np.minimum.reduceat(perm, starts)))
            yield pa.RecordBatch.from_arrays(
                cols, names=["doc_id"] + [f"mh{i}" for i in range(MINHASH_K)]
            )

    id_type = dict(hashed.dtypes)["doc_id"]
    schema = f"doc_id {id_type}, " + ", ".join(f"mh{i} long" for i in range(MINHASH_K))
    return hashed.mapInArrow(fn, schema)


def minhash_lsh_pairs(df: DataFrame, max_bucket_rows: int | None = None,
                      metrics: dict | None = None) -> DataFrame:
    """Candidate pairs sharing at least one LSH band bucket.

    max_bucket_rows (the 100 TB guard): mega-duplicate groups share all
    bands, so one m-doc boilerplate cluster makes m^2/2 candidates per
    band; over-cap buckets are shed (logged) — see shed_big_buckets."""
    sig = minhash_signatures(df)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    band_cols = [
        F.concat_ws(
            ":",
            F.lit(j),
            *[F.col(f"mh{j * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{j}")
        for j in range(MINHASH_BANDS)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bucket"))
    # materialize the banded keys once: the self-join otherwise evaluates
    # the whole signature pipeline (shingle + md5 + k permutations) in
    # BOTH join branches — the r06 before-plan shows two separate
    # MapInArrow subtrees, one under a BroadcastExchange — and the
    # skinny (doc_id, bucket) frame is ~1% of that work's cost to write.
    # The scratch read also gives the planner real file sizes for the
    # join-strategy choice (broadcast while it fits, shuffle past it).
    banded = _materialize_scratch(banded)
    banded = shed_big_buckets(banded, max_bucket_rows, "minhash_lsh_pairs",
                              metrics=metrics)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_oracle() -> str:
    h = h32_duck("s")
    mh = ", ".join(
        f"list_min(list_transform(shingles, s -> ({MH_A[i]} * {h} + {MH_B[i]}) % {MH_P})) AS mh{i}"
        for i in range(MINHASH_K)
    )
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = ", ".join(
        "concat_ws(':', "
        + ", ".join([str(j)] + [f"mh{j * rows_per_band + r}" for r in range(rows_per_band)])
        + f") AS band{j}"
        for j in range(MINHASH_BANDS)
    )
    band_list = ", ".join(f"band{j}" for j in range(MINHASH_BANDS))
    return f"""
WITH sigs AS (
  SELECT doc_id, {mh}
  FROM (SELECT doc_id, {SHINGLES_DUCK} AS shingles FROM documents)
), banded AS (
  SELECT doc_id, unnest([{band_list}]) AS bucket
  FROM (SELECT doc_id, {bands} FROM sigs)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------- SimHash

def simhash(df: DataFrame, engine: str = "arrow") -> DataFrame:
    """64-bit SimHash over word hashes (majority vote per bit).

    64 bits (not 32): the band self-join in simhash_pairs buckets on
    16-bit bands, and 16-bit bands only exist on a 64-bit fingerprint —
    with 8-bit bands (the 32-bit variant) every band has just 256 buckets,
    so the candidate join is Theta(n^2/256) per band at ANY corpus size.

    One md5 per word, staged as _m and referenced by two hash-extraction
    projections (_h1 = hex chars 1-8 -> bits 0..31, _h2 = chars 9-16 ->
    bits 32..63), each referenced by 32 per-bit aggregates: inlining md5
    inside a per-bit lambda would recompute every word hash 64x per doc
    (CollapseProject keeps multi-referenced non-cheap projections staged —
    same fix as minhash).

    Bit 63's value is shiftleft(1L, 63) == min-long; bit values are
    disjoint powers of two, so their sum never overflows (the positive
    part is <= 2^63-1 and the single negative term only brings it down) —
    identical two's-complement arithmetic in Spark and the DuckDB oracle.

    engine='arrow' (default) runs the 64 per-bit majority votes as one
    vectorized pass over the flat word-hash buffers (a segmented
    popcount per bit via np.add.reduceat), where the SQL path evaluates
    64 interpreted aggregate() lambdas per doc; the fingerprint
    accumulates in uint64 and reinterprets to int64, the same
    two's-complement value as the SQL bit sum (exact-integer parity,
    pinned by test_simhash_arrow_matches_sql). engine='sql' is the
    cross-check and oracle-shaped variant.
    """
    staged = (
        fan_out(df).select("doc_id", "source",
                           F.expr(f"transform({WORDS_SPARK}, w -> md5(w))").alias("_m"))
        .select(
            "doc_id", "source",
            F.expr("transform(_m, m -> cast(conv(substring(m, 1, 8), 16, 10) as bigint))").alias("_h1"),
            F.expr("transform(_m, m -> cast(conv(substring(m, 9, 8), 16, 10) as bigint))").alias("_h2"),
        )
    )
    if engine == "sql":
        bits = []
        for j in range(64):
            arr, b = ("_h1", j) if j < 32 else ("_h2", j - 32)
            val = "shiftleft(1L, 63)" if j == 63 else f"{1 << j}L"
            bits.append(
                f"(case when aggregate({arr}, 0L, "
                f"(acc, h) -> acc + (shiftright(h, {b}) & 1) * 2 - 1) > 0 "
                f"then {val} else 0L end)"
            )
        return staged.select("doc_id", F.expr(" + ".join(bits)).alias("simhash"), "source")

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            lens = np.asarray(
                pc.list_value_length(batch.column("_h1"))
                .to_numpy(zero_copy_only=False), dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            empty = lens == 0
            fp = np.zeros(n, dtype=np.uint64)
            for col, base in (("_h1", 0), ("_h2", 32)):
                vals = (batch.column(col).flatten()
                        .to_numpy(zero_copy_only=False).astype(np.int64))
                # sentinel element keeps reduceat's start indices valid
                # when a trailing doc has zero words; empty segments then
                # zero out via the mask (reduceat yields a neighbor value
                # for zero-width segments)
                vals = np.append(vals, np.int64(0))
                for b in range(32):
                    ones = np.add.reduceat((vals >> b) & 1, starts)
                    ones[empty] = 0
                    vote = (2 * ones - lens) > 0
                    fp |= vote.astype(np.uint64) << np.uint64(base + b)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"),
                 pa.array(fp.view(np.int64)),
                 batch.column("source")],
                names=["doc_id", "simhash", "source"],
            )

    id_type = dict(staged.dtypes)["doc_id"]
    return staged.mapInArrow(fn, f"doc_id {id_type}, simhash long, source string")


SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16


def simhash_band_exprs() -> list[str]:
    """The 4x16-bit band-bucket key expressions over a `simhash` column."""
    return [
        f"concat('{j}:', cast(shiftright(simhash, {SIMHASH_BAND_BITS * j})"
        f" & {(1 << SIMHASH_BAND_BITS) - 1} as string))"
        for j in range(SIMHASH_BANDS)
    ]


def _simhash_banded(sigs: DataFrame) -> DataFrame:
    """(doc_id, simhash) -> one row per band bucket."""
    return sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[F.expr(e) for e in simhash_band_exprs()]))
        .alias("bucket"),
    )


def simhash_near_matches(new_sigs: DataFrame, seen_sigs: DataFrame,
                         max_hamming: int = 3,
                         max_bucket_rows: int | None = None,
                         metrics: dict | None = None) -> DataFrame:
    """doc_ids from new_sigs whose SimHash is within max_hamming bits of
    ANY seen_sigs fingerprint — the incremental cross-batch near-dup
    probe. EXACT by the same pigeonhole as simhash_pairs (a pair within
    hamming < n_bands agrees on at least one full band), but asymmetric:
    only (new x seen) candidates are generated, never seen x seen, so a
    micro-batch costs |batch| x bucket-collision work no matter how
    large the accumulated index is. One shuffle keyed on the 2^16-bucket
    band keys; popcount verifies.

    max_bucket_rows (opt-in, same guard as simhash_pairs): a boilerplate
    mega-cluster accumulated in the seen-signature index shares a band
    bucket with every future near-copy, growing each micro-batch's band
    join with that bucket for the stream's lifetime; over-cap SEEN-side
    buckets are shed (logged + metrics) — matches against them are then
    forgone, the documented trade of every shed_big_buckets caller."""
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError(
            f"max_hamming must stay < {SIMHASH_BANDS} for the pigeonhole "
            f"guarantee: {max_hamming}")
    a = _simhash_banded(new_sigs.select("doc_id", "simhash"))
    b = _simhash_banded(seen_sigs.select("doc_id", "simhash"))
    b = shed_big_buckets(b, max_bucket_rows, "simhash_near_matches",
                         metrics=metrics)
    b = b.select(
        F.col("doc_id").alias("seen_id"), F.col("simhash").alias("seen_sh"),
        "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.expr(f"bit_count(simhash ^ seen_sh) <= {max_hamming}"))
        .select("doc_id")
        .distinct()
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 3,
                  max_bucket_rows: int | None = None,
                  metrics: dict | None = None) -> DataFrame:
    """Near-duplicate pairs whose 64-bit SimHashes differ in <= max_hamming
    bits. Candidates come from 4x16-bit band buckets — by pigeonhole a pair
    within hamming distance 3 (< n_bands) agrees exactly on at least one
    band, so this is an EXACT hamming-ball join, not an approximation —
    then popcount(xor) verifies.

    Scale math: one shuffle on the band key; each band has 2^16 = 65,536
    buckets over a majority-vote fingerprint (near-uniform on non-dup
    corpora), so expected candidate volume is ~ 4 * n^2 / 2^17 — 256x less
    than the 8-bit-band variant at the same n. Residual mega-buckets
    (giant exact-dup groups hash to one fingerprint) are bounded by
    max_bucket_rows — see shed_big_buckets.

    max_hamming must stay < SIMHASH_BANDS for the pigeonhole guarantee.
    """
    sh = simhash(df).select("doc_id", "simhash")
    banded = _simhash_banded(sh)
    # same double-branch dedup as minhash_lsh_pairs: the fingerprint
    # pipeline (one md5 per word + 64 bit votes) must not run once per
    # self-join branch; the banded frame is skinny
    banded = _materialize_scratch(banded)
    banded = shed_big_buckets(banded, max_bucket_rows, "simhash_pairs",
                              metrics=metrics)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as int)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_oracle(max_hamming: int = 3) -> str:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = ", ".join(
        f"concat('{j}:', cast((simhash >> {SIMHASH_BAND_BITS * j}) & {mask} as varchar))"
        for j in range(SIMHASH_BANDS)
    )
    return f"""
WITH sh AS ({SIMHASH_ORACLE_BODY}),
banded AS (SELECT doc_id, simhash, unnest([{bands}]) AS bucket FROM sh)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       cast(bit_count(xor(a.simhash, b.simhash)) as int) AS hamming
FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# DuckDB errors on 1::BIGINT << 63 (overflow-checked shift), so bit 63's
# value is the min-long literal; the per-word md5 halves are hoisted into
# the wh CTE so the 64 per-bit passes reuse them (the same staging the
# Spark side does with _h1/_h2)
_SIMHASH_BODY_CORE = f"""
SELECT doc_id,
       cast(list_sum(list_transform(generate_series(0, 63), j ->
         CASE WHEN list_sum(list_transform(
                 CASE WHEN j < 32 THEN h1 ELSE h2 END,
                 h -> ((h >> (j % 32)) & 1) * 2 - 1)) > 0
         THEN (CASE WHEN j = 63 THEN (-9223372036854775808)::BIGINT
               ELSE (1::BIGINT << j) END)
         ELSE 0 END)) as bigint) AS simhash,
       source
FROM (SELECT doc_id, source,
             list_transform({WORDS_DUCK}, w -> {h32_duck('w')}) AS h1,
             list_transform({WORDS_DUCK}, w -> {h32b_duck('w')}) AS h2
      FROM documents)
"""

SIMHASH_ORACLE_BODY = f"SELECT doc_id, simhash FROM ({_SIMHASH_BODY_CORE})"

SIMHASH_ORACLE = _SIMHASH_BODY_CORE


# ------------------------------------------------- cluster resolution

def resolve_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over candidate duplicate pairs -> one row per
    involved doc: (doc_id, cluster_id), cluster_id = the lexicographic min
    doc_id reachable through the pair graph. This is the step a real
    dedup pipeline runs AFTER pair generation: transitive chains (A~B,
    B~C, no direct A~C edge) must collapse into ONE keep-group, which no
    per-pair filter can do.

    Algorithm: min-label propagation. labels start as self; each round
    every node takes min(own, neighbors' labels); stop when a round
    changes nothing. Rounds needed = graph diameter — LSH/banded dup
    clusters are near-cliques (diameter <= ~3), so 3-5 rounds in
    practice; the cap guards adversarial chains (for which the
    large-star/small-star alternation with its O(log n) round bound is
    the published alternative — not needed at observed diameters).

    Scale shape: every round is ONE shuffle (groupBy x) over the
    pair-involved docs only — a small slice of the corpus — plus a small
    broadcast-size join; labels are re-materialized to scratch parquet
    each round so no lineage chain or persisted-RDD storage accumulates
    across iterations.
    """
    e = pairs.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
    edges = _materialize_scratch(
        e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct()
    )
    lab = _materialize_scratch(
        edges.select(F.col("x").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neigh_min = (
            edges.join(
                lab.select(F.col("node").alias("y"), F.col("label").alias("ylab")), "y"
            )
            .groupBy("x").agg(F.min("ylab").alias("nmin"))
            .withColumnRenamed("x", "node")
        )
        new = _materialize_scratch(
            lab.join(neigh_min, "node", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
        )
        changed = (
            new.alias("n").join(lab.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label")).count()
        )
        lab = new
        if changed == 0:
            return lab.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"resolve_clusters did not converge in {max_iter} rounds "
        "(graph diameter exceeds the cap; raise max_iter)"
    )


def resolve_clusters_oracle(pairs_sql: str) -> str:
    """DuckDB equivalent: transitive closure by recursive CTE, then the
    min reachable id per node. `pairs_sql` must select (id_a, id_b)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
    SELECT id_a AS x, id_b AS y FROM pairs
    UNION
    SELECT id_b AS x, id_a AS y FROM pairs
),
reach(x, y) AS (
    SELECT x, x AS y FROM edges
    UNION
    SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
)
SELECT x AS doc_id, min(y) AS cluster_id FROM reach GROUP BY x
"""
