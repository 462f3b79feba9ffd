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
  - simhash: 32-bit majority-vote fingerprint; simhash_pairs generates
    hamming-ball candidates from 4x8-bit band buckets (pigeonhole: any
    pair within hamming distance 3 matches at least one band exactly, so
    recall is 100%, not approximate) and verifies with popcount(xor).
  - embedding cosine: see simsearch.py for the bucketed ANN path.

All hash arithmetic uses the md5-prefix h32 so the DuckDB oracle can
replicate results exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from eggopress.pipeline.textstats import (
    WORDS_DUCK,
    WORDS_SPARK,
    h32_duck,
    h32_spark,
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
    projection so split/filter runs once per doc, not once per shingle."""
    return (
        df.select("doc_id", F.expr(WORDS_SPARK).alias("_w"))
        .select("doc_id", F.expr(SHINGLES_FROM_WORDS).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.6,
                        method: str = "prefix") -> DataFrame:
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
    # verification), and the hash table feeds three DAG branches, so it is
    # persisted once — at 100 TB this is the materialized shingle-hash
    # table any set-similarity-join pipeline writes before joining
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
    ).persist()
    ex = hs_docs.select("doc_id", "n_sh", F.explode("hsh").alias("sh"))
    dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
    ordered = (
        ex.join(dfreq, "sh")
        .groupBy("doc_id", "n_sh")
        .agg(F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("osh"))
        .withColumn("plen", (F.floor((1 - t_eff) * F.col("n_sh")) + 1).cast("int"))
        .withColumn("prefix", F.expr("slice(transform(osh, x -> x.sh), 1, plen)"))
    )
    # positional filter (ppjoin): a pair with Jaccard >= t has overlap
    # o >= alpha = ceil(t*(na+nb)/(1+t)); its FIRST common shingle in the
    # global order sits in both prefixes at positions (pa, pb), and all o
    # common shingles lie in the suffixes from there, so
    # min(na-pa, nb-pb) >= alpha must hold for that match — candidates
    # matched only late in a prefix are cut before the distinct/verify
    pre = ordered.select("doc_id", "n_sh", F.posexplode("prefix").alias("p", "sh"))
    a, b = pre.alias("a"), pre.alias("b")
    # the suffix bound is an integer, so min >= ceil(q) <=> min >= q; the
    # 1e-9 slack absorbs float rounding (0.9/1.9*38 lands a hair ABOVE 18,
    # and a ceil would over-filter exact-boundary pairs)
    alpha = (
        t_eff / (1.0 + t_eff) * (F.col("a.n_sh") + F.col("b.n_sh")) - 1e-9
    )
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least(F.col("a.n_sh") - F.col("a.p"), F.col("b.n_sh") - F.col("b.p")) >= alpha),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    full = hs_docs
    return (
        cand.join(full.select(F.col("doc_id").alias("id_a"),
                              F.col("hsh").alias("h_a"),
                              F.col("n_sh").alias("na")), "id_a")
        .join(full.select(F.col("doc_id").alias("id_b"),
                          F.col("hsh").alias("h_b"),
                          F.col("n_sh").alias("nb")), "id_b")
        .withColumn("common", F.size(F.array_intersect("h_a", "h_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


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

def minhash_signatures(df: DataFrame) -> DataFrame:
    # materialize the shingle-hash array ONCE (md5 is the expensive part),
    # then each of the k permutations is cheap integer arithmetic over it
    hashed = shingle_frame(df).select(
        "doc_id",
        F.expr(f"transform(shingles, s -> {h32_spark('s')})").alias("hs"),
    )
    return hashed.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(hs, h -> pmod({MH_A[i]}L * h + {MH_B[i]}L, {MH_P}L)))"
            ).alias(f"mh{i}")
            for i in range(MINHASH_K)
        ],
    )


def minhash_lsh_pairs(df: DataFrame) -> DataFrame:
    """Candidate pairs sharing at least one LSH band bucket."""
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

def simhash(df: DataFrame) -> DataFrame:
    """32-bit SimHash over word hashes (majority vote per bit).

    The word-hash array is staged in its own projection and referenced by
    32 per-bit aggregates: inlining md5 inside a per-bit lambda would
    recompute every word hash 32x per doc (the multi-reference keeps
    CollapseProject from re-inlining it — same fix as minhash)."""
    h = h32_spark("w")
    bits = [
        (
            f"(case when aggregate(_hw, 0L, "
            f"(acc, h) -> acc + (shiftright(h, {j}) & 1) * 2 - 1) > 0 "
            f"then {1 << j}L else 0L end)"
        )
        for j in range(32)
    ]
    return (
        df.select("doc_id", "source", F.expr(f"transform({WORDS_SPARK}, w -> {h})").alias("_hw"))
        .select("doc_id", F.expr(" + ".join(bits)).alias("simhash"), "source")
    )


SIMHASH_BANDS = 4


def simhash_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs whose 32-bit SimHashes differ in <= max_hamming
    bits. Candidates come from 4x8-bit band buckets — by pigeonhole a pair
    within hamming distance 3 (< n_bands) agrees exactly on at least one
    band, so this is an EXACT hamming-ball join, not an approximation —
    then popcount(xor) verifies. One shuffle on the band key; per-bucket
    cardinality is bounded by the fingerprint distribution (256 buckets
    per band over a majority-vote hash, near-uniform on non-dup corpora).

    max_hamming must stay < SIMHASH_BANDS for the pigeonhole guarantee.
    """
    sh = simhash(df).select("doc_id", "simhash")
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.expr(f"concat('{j}:', cast(shiftright(simhash, {8 * j}) & 255 as string))")
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bucket"),
    )
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
    bands = ", ".join(
        f"concat('{j}:', cast((simhash >> {8 * j}) & 255 as varchar))"
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


SIMHASH_ORACLE_BODY = f"""
SELECT doc_id,
       cast(list_sum(list_transform(generate_series(0, 31), j ->
         CASE WHEN list_sum(list_transform({WORDS_DUCK}, w ->
             (({h32_duck('w')} >> j) & 1) * 2 - 1)) > 0
         THEN (cast(1 as bigint) << j) ELSE 0 END)) as bigint) AS simhash
FROM documents
"""

SIMHASH_ORACLE = f"""
SELECT doc_id,
       cast(list_sum(list_transform(generate_series(0, 31), j ->
         CASE WHEN list_sum(list_transform({WORDS_DUCK}, w ->
             (({h32_duck('w')} >> j) & 1) * 2 - 1)) > 0
         THEN (cast(1 as bigint) << j) ELSE 0 END)) as bigint) AS simhash,
       source
FROM documents
"""
