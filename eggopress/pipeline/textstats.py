"""Text analysis operators: tokenization, language-ID heuristic, quality
scoring, token counting, document fingerprinting.

The tokenizer is deliberately SQL-expressible (whitespace words; token id
= (ascii(first_char) * 131 + len(word)) % VOCAB) so the DuckDB oracle can
replicate it exactly — it stands in for a real BPE vocabulary while
exercising the same engine paths (array<int32> token columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

VOCAB = 50_257
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
FP_MOD = 2_147_483_647

def fan_out(df: DataFrame, factor: int = 2, min_bytes: int = 0) -> DataFrame:
    """Scan-parallelism floor for heavy narrow passes (optimization guide
    §2.5 input skew / §6 split sizing): a single-row-group parquet file
    scans as ONE task no matter how many cores the cluster has, so per-row
    work that runs BEFORE the first exchange (shingling, md5/xxhash
    hashing, tokenize, cosine folds) serializes on one core. When the
    input has materially fewer partitions than the cluster's parallelism,
    one cheap round-robin shuffle of the RAW rows (pre-explode, pre-hash —
    the narrowest the data ever is) fans the work out to every core.
    No-op when the input is already split at least half as wide as the
    target (the 100 TB case: thousands of row groups), so this never adds
    a shuffle at scale. Results of every caller are partition-independent
    (hashes, per-row projections, aggregations), so the round-robin
    placement cannot change any query output.

    min_bytes gates the shuffle on the INPUT's on-disk size when it is
    knowable (a plain file scan): below it, the serial narrow work is
    cheaper than the extra exchange's fixed cost, so callers whose
    per-byte work is light (tokenize: one split per doc) pass a higher
    floor than callers whose per-byte work is heavy (shingling: ~100
    hashes per doc), which always fan out. Unknowable input sizes
    (mid-plan frames) fan out on the partition test alone."""
    spark = df.sparkSession
    if min_bytes:
        try:
            total = 0
            for f in df.inputFiles():
                p = f[len("file:"):] if f.startswith("file:") else f
                if "://" in p:
                    total = None
                    break
                total += os.path.getsize(p)
            if total is not None and total < min_bytes:
                return df
        except Exception:
            pass
    target = max(spark.sparkContext.defaultParallelism * factor, 1)
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


# ---- dialect-paired fragments (Spark SQL expr / DuckDB SQL) -------------

WORDS_SPARK = "filter(split(text, ' '), w -> length(w) > 0)"
WORDS_DUCK = "list_filter(string_split(text, ' '), w -> len(w) > 0)"


def tok_spark(w: str) -> str:
    return f"(ascii(substring({w}, 1, 1)) * 131 + length({w})) % {VOCAB}"


def tok_duck(w: str) -> str:
    return f"(ascii(substr({w}, 1, 1)) * 131 + len({w})) % {VOCAB}"


def h32_spark(s: str) -> str:
    """32-bit md5-prefix hash, identical in both dialects."""
    return f"cast(conv(substring(md5({s}), 1, 8), 16, 10) as bigint)"


def h32_duck(s: str) -> str:
    return f"cast('0x' || substr(md5({s}), 1, 8) as bigint)"


def h32b_spark(s: str) -> str:
    """Second independent 32 bits from the same md5 (hex chars 9-16) —
    together with h32 this gives 64 dialect-identical hash bits per value
    without a second digest computation."""
    return f"cast(conv(substring(md5({s}), 9, 8), 16, 10) as bigint)"


def h32b_duck(s: str) -> str:
    return f"cast('0x' || substr(md5({s}), 9, 8) as bigint)"


TOKENS_SPARK = f"transform({WORDS_SPARK}, w -> cast({tok_spark('w')} as int))"
TOKENS_DUCK = f"list_transform({WORDS_DUCK}, w -> cast({tok_duck('w')} as int))"

_SW = "(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
STOP_RATIO_SPARK = (
    f"size(filter({WORDS_SPARK}, w -> w in {_SW})) / cast(size({WORDS_SPARK}) as double)"
)
STOP_RATIO_DUCK = (
    f"len(list_filter({WORDS_DUCK}, w -> w in {_SW})) / cast(len({WORDS_DUCK}) as double)"
)

# BPE-ish regex tokenizer (alnum runs), shared regex semantics
RWORDS_SPARK = "filter(split(text, '[^a-zA-Z0-9]+'), w -> length(w) > 0)"
RWORDS_DUCK = "list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), w -> len(w) > 0)"


# --------------------------------------------------------- operators

def tokenize(df: DataFrame, make_ids: bool = True) -> DataFrame:
    """documents -> corpus shape (doc_id, tokens, n_tok, source).

    make_ids=True derives 'source-0000000042' ids from numeric doc_ids
    (the testdata shape); pass False when doc_id is already a unique
    string (the ingest path — lpad would truncate long ids)."""
    id_expr = (
        "concat(source, '-', lpad(cast(doc_id as string), 10, '0'))"
        if make_ids
        else "cast(doc_id as string)"
    )
    # fan out BEFORE the projection: the split/tokenize expressions are the
    # heavy narrow work, and they must run after the repartition exchange,
    # not on the (possibly single-task) scan feeding it. Tokenize is LIGHT
    # per byte (~one split per doc), so small inputs skip the shuffle —
    # below ~32 MB the extra exchange costs more than the serial split
    # (measured on the sf1.0 bench: pack/histogram regressed ~1.5s with
    # an unconditional fan-out, while the split itself is ~1.4s serial).
    df = fan_out(df, min_bytes=32 << 20)
    return df.select(
        F.expr(id_expr).alias("doc_id"),
        F.expr(TOKENS_SPARK).alias("tokens"),
        F.expr(f"cast(size({WORDS_SPARK}) as int)").alias("n_tok"),
        F.col("source"),
    )


def token_counts(df: DataFrame) -> DataFrame:
    """Per-source whitespace + regex token totals."""
    return (
        df.select(
            "source",
            F.expr(f"size({WORDS_SPARK})").alias("ws"),
            F.expr(f"size({RWORDS_SPARK})").alias("re"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("re").alias("re_tokens"),
        )
    )


TOKEN_COUNTS_ORACLE = f"""
SELECT source,
       count(*) AS n_docs,
       cast(sum(len({WORDS_DUCK})) as bigint) AS ws_tokens,
       cast(sum(len({RWORDS_DUCK})) as bigint) AS re_tokens
FROM documents GROUP BY source
"""


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-ratio heuristic vs the labeled lang column."""
    return (
        df.select(
            "lang",
            F.expr(
                f"case when {STOP_RATIO_SPARK} >= 0.05 then 'en' else 'other' end"
            ).alias("pred_lang"),
        )
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


LANG_ID_ORACLE = f"""
SELECT lang,
       CASE WHEN {STOP_RATIO_DUCK} >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang,
       count(*) AS n
FROM documents GROUP BY 1, 2
"""


def quality_scores(df: DataFrame) -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality features,
    bucketed for stable aggregation."""
    return (
        df.select(
            "source",
            F.expr(f"size({WORDS_SPARK})").alias("n_words"),
            F.expr(f"round(n_chars / cast(size({WORDS_SPARK}) as double), 4)").alias("mean_wlen"),
            F.expr(f"round({STOP_RATIO_SPARK}, 4)").alias("stop_ratio"),
        )
        .groupBy("source")
        .agg(
            F.sum("n_words").alias("total_words"),
            F.round(F.avg("mean_wlen"), 4).alias("avg_mean_wlen"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
        )
    )


QUALITY_ORACLE = f"""
SELECT source,
       cast(sum(n_words) as bigint) AS total_words,
       round(avg(mean_wlen), 4) AS avg_mean_wlen,
       round(avg(stop_ratio), 4) AS avg_stop_ratio
FROM (
  SELECT source,
         len({WORDS_DUCK}) AS n_words,
         round(n_chars / cast(len({WORDS_DUCK}) as double), 4) AS mean_wlen,
         round({STOP_RATIO_DUCK}, 4) AS stop_ratio
  FROM documents
) GROUP BY source
"""


def fingerprints(df: DataFrame) -> DataFrame:
    """Rolling polynomial word-hash fingerprint per document."""
    fp = (
        f"aggregate({WORDS_SPARK}, 0L, (acc, w) -> "
        f"pmod(acc * 131 + {h32_spark('w')}, {FP_MOD}))"
    )
    return df.select(
        F.col("doc_id"), F.expr(fp).alias("fingerprint"), F.col("source")
    )


FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(cast(0 as bigint), list_transform({WORDS_DUCK}, w -> {h32_duck('w')})),
         (acc, h) -> (acc * 131 + h) % {FP_MOD}
       ) AS fingerprint,
       source
FROM documents
"""


def token_histogram(corpus: DataFrame, min_count: int = 1) -> DataFrame:
    """Vocabulary histogram over a corpus-shaped frame (tokens:
    array<int>) -> (token, n). The naive plan — explode + groupBy —
    materializes one row PER TOKEN OCCURRENCE before the partial
    aggregate collapses them; at 10^12 tokens that is 10^12 transient
    rows. Here each Arrow batch is folded to a np.bincount vector first,
    so a partition emits at most VOCAB (token, count) rows no matter how
    many tokens it holds, and the groupBy shuffle moves
    <= n_partitions x VOCAB rows total."""
    import numpy as np
    import pyarrow as pa

    def _hist(batches):
        counts = np.zeros(VOCAB, dtype=np.int64)
        for batch in batches:
            arr = batch.column("tokens")
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            if len(flat):
                counts += np.bincount(flat, minlength=VOCAB)
        nz = np.nonzero(counts)[0]
        yield pa.RecordBatch.from_arrays(
            [pa.array(nz.astype(np.int32)), pa.array(counts[nz])],
            names=["token", "n"],
        )

    return (
        corpus.select("tokens")
        .mapInArrow(_hist, "token int, n long")
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") >= min_count)
    )


TOKEN_HISTOGRAM_ORACLE = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({TOKENS_DUCK}) AS token FROM documents)
GROUP BY token
"""


def train_split(corpus: DataFrame,
                fractions: tuple[tuple[str, float], ...] = (
                    ("train", 0.9), ("val", 0.05), ("test", 0.05)),
                buckets: int = 10_000) -> DataFrame:
    """Deterministic train/val/test assignment: split = the cumulative
    fraction range that h32(doc_id) % buckets falls in. Content-stable —
    the same doc lands in the same split on any run, any cluster shape,
    any row order (no sample() nondeterminism), and adding data never
    moves existing docs between splits. Pure projection: no shuffle, no
    UDF; the hash is the md5-prefix trick shared with the DuckDB
    oracles."""
    if abs(sum(f for _, f in fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    expr, lo = "CASE", 0
    for name, frac in fractions[:-1]:
        lo += int(round(frac * buckets))
        expr += f" WHEN {h32_spark('doc_id')} % {buckets} < {lo} THEN '{name}'"
    expr += f" ELSE '{fractions[-1][0]}' END"
    return corpus.withColumn("split", F.expr(expr))


def train_split_case_duck(fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05)),
        buckets: int = 10_000) -> str:
    expr, lo = "CASE", 0
    for name, frac in fractions[:-1]:
        lo += int(round(frac * buckets))
        expr += f" WHEN {h32_duck('doc_id')} % {buckets} < {lo} THEN '{name}'"
    return expr + f" ELSE '{fractions[-1][0]}' END"


def sample_corpus(corpus: DataFrame, fractions: dict[str, float],
                  default: float = 1.0, buckets: int = 10_000) -> DataFrame:
    """Deterministic per-source downsampling — the domain-mixing step of
    a training-data pipeline (e.g. keep 10% of crawl, 100% of wiki).
    A doc survives iff h32(doc_id) % buckets < frac(source) * buckets:
    content-stable like train_split (same doc kept on any run / cluster
    shape / row order; adding data never flips existing docs), a pure
    projection filter with no shuffle, no UDF, no sample()
    nondeterminism. Filters compose with Catalyst pushdown like any
    other predicate."""
    for src, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction out of [0,1] for {src!r}: {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction out of [0,1]: {default}")
    # threshold built from Column expressions, not an interpolated SQL
    # CASE — a source name containing a quote is then just a value, never
    # syntax (the DuckDB oracle below escapes because SQL text is all it
    # can emit)
    thresh = F.lit(int(round(default * buckets)))
    for src in sorted(fractions, reverse=True):
        thresh = F.when(
            F.col("source") == F.lit(src),
            F.lit(int(round(fractions[src] * buckets))),
        ).otherwise(thresh)
    h = F.expr(f"{h32_spark('doc_id')} % {buckets}")
    return corpus.filter(h < thresh)


def sample_corpus_where_duck(fractions: dict[str, float],
                             default: float = 1.0,
                             buckets: int = 10_000) -> str:
    case = "CASE source"
    for src in sorted(fractions):
        lit = src.replace("'", "''")
        case += f" WHEN '{lit}' THEN {int(round(fractions[src] * buckets))}"
    case += f" ELSE {int(round(default * buckets))} END"
    return f"{h32_duck('doc_id')} % {buckets} < {case}"


def pack_sequences(corpus: DataFrame, ctx: int = 2048,
                   n_partitions: int | None = None,
                   materialize: bool = False) -> DataFrame:
    """Contiguous sequence packing — the concat-then-chunk step that
    turns variable-length documents into fixed ctx-token training
    sequences: within each source, docs concatenate in doc_id order and
    the stream is cut every ctx tokens. Default output adds (pack_id,
    pack_off): the sequence a doc STARTS in and its token offset inside
    it (docs may straddle a boundary, exactly like the real concat+chunk
    pipeline). materialize=True instead EMITS the packed product itself
    — (source, pack_id, tokens:array<int>[<=ctx], n_tok) — the
    fixed-context sequences a training job consumes (the materialized
    analog of the reference's published editions, docs/spec.md:62-74);
    the last pack per source may be shorter than ctx.

    Deterministic by construction (doc_id order; doc_id is assumed
    unique, which tokenize/ingest guarantee). Scale shape — the classic
    TWO-PASS distributed scan, never a per-source window (a window
    partitioned by source funnels every row of a 70%-skewed source
    through ONE task):
      1. range-partition a SKINNY (source, doc_id, n_tok) projection —
         the offsets never need the token payload, so the heavy columns
         never enter the shuffle — and materialize it once to scratch
         with the partition id frozen in (range partitions are ordered,
         so within a source, rising pid == rising doc_id);
      2. pass 1 aggregates per-(pid, source) token totals — a
         metadata-cardinality frame, O(partitions x sources) — and the
         driver prefix-sums them into per-(pid, source) BASE offsets;
      3. pass 2 computes the local prefix sum inside each (pid, source)
         window — bounded by the range-partition size, not the source
         size — adds the broadcast base offset, and joins the
         per-doc_id assignment back to the corpus (the payload's ONE
         shuffle).
    materialize adds one more bounded shuffle: each doc explodes into
    its per-pack slices (built-in sequence/slice, no UDF) and packs
    reassemble under (source, pack_id) keys, each holding <= ctx tokens
    regardless of corpus size."""
    from pyspark.sql.window import Window

    from eggopress.pipeline.dedup import _materialize_scratch

    if ctx <= 0:
        raise ValueError(f"ctx must be positive: {ctx}")
    spark = corpus.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    staged = _materialize_scratch(
        corpus.select("source", "doc_id", F.col("n_tok").cast("long").alias("_nt"))
        .repartitionByRange(n, "source", "doc_id")
        .sortWithinPartitions("source", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = staged.groupBy("_pid", "source").agg(
        F.sum("_nt").alias("_t")).collect()
    base_rows, run = [], {}
    for r in sorted(totals, key=lambda r: (r["source"], r["_pid"])):
        base_rows.append((int(r["_pid"]), r["source"], run.get(r["source"], 0)))
        run[r["source"]] = run.get(r["source"], 0) + int(r["_t"])
    base = spark.createDataFrame(base_rows or [(0, "", 0)],
                                 "_pid int, source string, _base long")
    w = (Window.partitionBy("_pid", "source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    local_prev = F.coalesce(F.sum("_nt").over(w), F.lit(0))
    assign = (
        staged.withColumn("_lprev", local_prev)
        .join(F.broadcast(base), ["_pid", "source"])
        .select("doc_id", (F.col("_lprev") + F.col("_base")).alias("_prev"))
    )
    annotated = corpus.join(assign, "doc_id")
    if not materialize:
        return annotated.select(
            *corpus.columns,
            F.floor(F.col("_prev") / ctx).cast("int").alias("pack_id"),
            (F.col("_prev") % ctx).cast("int").alias("pack_off"),
        )
    # doc -> one row per pack it overlaps; slice indices are closed-form
    # from the global offset, all JVM built-ins
    pieces = (
        annotated.filter(F.col("n_tok") > 0)
        .select("source", "_prev", "tokens", "n_tok")
        .withColumn("pack_id", F.expr(
            f"explode(sequence(cast(floor(_prev / {ctx}) as int),"
            f" cast(floor((_prev + n_tok - 1) / {ctx}) as int)))"))
        .select(
            "source", "pack_id",
            F.expr(f"greatest(_prev - cast(pack_id as bigint) * {ctx}, 0L)")
            .cast("int").alias("_pos"),
            F.expr(
                f"slice(tokens,"
                f" cast(greatest(cast(pack_id as bigint) * {ctx} - _prev, 0L) as int) + 1,"
                f" cast(least(cast(n_tok as bigint), (cast(pack_id as bigint) + 1) * {ctx} - _prev)"
                f" - greatest(cast(pack_id as bigint) * {ctx} - _prev, 0L) as int))"
            ).alias("_piece"),
        )
    )
    return (
        pieces.groupBy("source", "pack_id")
        .agg(F.expr(
            "flatten(transform(sort_array(collect_list(struct(_pos, _piece))),"
            " x -> x._piece))").alias("tokens"))
        .withColumn("n_tok", F.size("tokens"))
        .select("source", "pack_id", "tokens", "n_tok")
    )


def pack_rollup_oracle(ctx: int = 2048) -> str:
    """Per-(source, pack) doc/token rollup over the packed corpus."""
    return f"""
SELECT source, cast(floor(prev / {ctx}) as int) AS pack_id,
       count(*) AS n_docs, cast(sum(n_tok) as bigint) AS n_tok_sum
FROM (
  SELECT source, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM (SELECT source,
               concat(source, '-', lpad(cast(doc_id as varchar), 10, '0')) AS doc_id,
               len({WORDS_DUCK}) AS n_tok
        FROM documents)
)
GROUP BY 1, 2
"""


def _ngrams_spark(n: int) -> str:
    """Distinct word n-gram strings of a doc (docs shorter than n words
    contribute none) over a staged `_w` words array."""
    return (
        f"case when size(_w) >= {n} then "
        f"array_distinct(transform(sequence(1, size(_w) - {n} + 1), "
        f"i -> concat_ws(' ', slice(_w, i, {n})))) "
        f"else array() end"
    )


def _ngrams_duck(n: int) -> str:
    return (
        f"case when len({WORDS_DUCK}) >= {n} then "
        f"list_distinct(list_transform(generate_series(1, len({WORDS_DUCK}) - {n} + 1), "
        f"i -> array_to_string(({WORDS_DUCK})[i:i+{n - 1}], ' '))) "
        f"else [] end"
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 13) -> DataFrame:
    """Benchmark decontamination — the flag-eval-overlap pass every
    serious training pipeline runs before the data ships: a document is
    CONTAMINATED if it shares at least one word n-gram (the classic
    13-gram rule; n is a knob) with any benchmark text. Returns
    (doc_id, n_hits) for flagged docs; callers anti-join to drop, or
    keep the report for audit.

    Scale shape: the benchmark side is tiny by nature (eval sets are
    thousands of docs, the corpus is billions), so its distinct gram
    hashes BROADCAST and the corpus side never shuffles — one narrow
    pass explodes each doc's distinct grams, probes the broadcast set,
    and a bounded groupBy(doc_id) counts hits (rows entering it are
    bounded by actual matches, not corpus size). Grams are matched on
    the dialect-identical 64-bit md5 hash — carried as TWO 32-bit
    columns (an int64 combine of two 32-bit halves overflows in both
    ANSI dialects) — so the operator has an exact SQL oracle."""
    if n < 1:
        raise ValueError(f"n must be positive: {n}")

    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        df = fan_out(df)  # n-gram explode + 2 md5s/gram: heavy narrow work
        staged = df.selectExpr(
            *(["doc_id"] if keep_id else []),
            f"{WORDS_SPARK} as _w",
        ).selectExpr(
            *(["doc_id"] if keep_id else []),
            f"explode({_ngrams_spark(n)}) as g",
        )
        cols = (["doc_id"] if keep_id else []) + [
            F.expr(h32_spark("g")).alias("gh1"),
            F.expr(h32b_spark("g")).alias("gh2"),
        ]
        return staged.select(*cols)

    bench = grams(benchmark, keep_id=False).distinct()
    return (
        grams(docs, keep_id=True)
        .join(F.broadcast(bench), ["gh1", "gh2"])
        .groupBy("doc_id")
        .agg(F.countDistinct("gh1", "gh2").alias("n_hits"))
    )


def decontaminate_oracle(n: int = 13,
                         bench_where: str = "doc_id % 151 = 0") -> str:
    return f"""
WITH bench AS (
  SELECT DISTINCT {h32_duck('gram')} AS gh1, {h32b_duck('gram')} AS gh2
  FROM (SELECT unnest({_ngrams_duck(n)}) AS gram
        FROM documents WHERE {bench_where})
), dg AS (
  SELECT doc_id, {h32_duck('gram')} AS gh1, {h32b_duck('gram')} AS gh2
  FROM (SELECT concat(source, '-', lpad(cast(doc_id as varchar), 10, '0')) AS doc_id,
               unnest({_ngrams_duck(n)}) AS gram
        FROM documents)
)
SELECT doc_id,
       cast(count(DISTINCT dg.gh1 || ':' || dg.gh2) as bigint) AS n_hits
FROM dg JOIN bench ON dg.gh1 = bench.gh1 AND dg.gh2 = bench.gh2
GROUP BY doc_id
"""


def pack_checksum_oracle(ctx: int = 2048) -> str:
    """Order-sensitive per-pack checksum over the MATERIALIZED packs:
    every token's global position maps to (pack_id, position-in-pack),
    and checksum = sum(token * (pos_in_pack + 1)) is order-sensitive, so
    it proves the concat+chunk reassembly, not just the token multiset."""
    return f"""
SELECT source, cast(gpos // {ctx} as int) AS pack_id,
       cast(count(*) as int) AS n_tok,
       cast(sum(cast(tok as bigint) * (gpos % {ctx} + 1)) as bigint) AS checksum
FROM (
  SELECT source, prev + i - 1 AS gpos, toks[i] AS tok
  FROM (
    SELECT source, toks, prev, unnest(generate_series(1, len(toks))) AS i
    FROM (
      SELECT source, toks,
             coalesce(sum(len(toks)) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM (SELECT source,
                   concat(source, '-', lpad(cast(doc_id as varchar), 10, '0')) AS doc_id,
                   {TOKENS_DUCK} AS toks
            FROM documents)
    )
  )
)
GROUP BY 1, 2
"""


def token_cardinality(corpus: DataFrame, m: int = 4096) -> DataFrame:
    """Per-source distinct-token cardinality SKETCH (linear counting):
    hash every token occurrence into one of m buckets, count occupied
    buckets, estimate distinct = -m * ln(1 - occupied/m).

    The scale shape is the point: exact count-distinct shuffles one row
    per distinct value; here the in-stage explode never leaves its
    partition — map-side partial distinct collapses the (source, bucket)
    pairs before the exchange, so the shuffle carries at most
    partitions x sources x m rows no matter the corpus size (the same
    bounded-shuffle discipline as token_histogram). m trades accuracy
    for state: the standard error is ~ sqrt(m)*(e^(n/m)-n/m-1)/n. The
    estimate is a deterministic function of content (md5-bucket hash),
    so it has an exact SQL oracle — unlike approx_count_distinct's
    engine-internal HLL.

    Saturation (occupied == m) is undefined for linear counting (ln 0);
    the estimate is NULL there as an explicit 'increase m' sentinel —
    defined identically in the DuckDB oracle, where a bare ln(0) would
    instead be a hard error while Spark silently NULLed."""
    if m <= 0:
        raise ValueError(f"m must be positive: {m}")
    occ = (
        corpus.select("source", F.explode("tokens").alias("t"))
        .select("source", F.expr(f"pmod({h32_spark('cast(t as string)')}, {m})").alias("b"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("occupied"))
    )
    return occ.select(
        "source", "occupied",
        F.when(
            F.col("occupied") < m,
            F.round(-float(m) * F.log(1.0 - F.col("occupied") / float(m)), 6),
        ).alias("est_distinct"),
    )


def token_cardinality_oracle(m: int = 4096) -> str:
    h = h32_duck("cast(t as varchar)")
    return f"""
SELECT source, occupied,
       CASE WHEN occupied < {m}
            THEN round(-{float(m)} * ln(1.0 - occupied / {float(m)}), 6)
       END AS est_distinct
FROM (
  SELECT source, count(DISTINCT {h} % {m}) AS occupied
  FROM (SELECT source, unnest({TOKENS_DUCK}) AS t FROM documents)
  GROUP BY source
)
"""
