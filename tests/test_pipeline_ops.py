"""Pipeline-operator tests beyond the oracle-parity suite: algorithm
variants must agree with each other, and scale-path candidates must be
supersets of true results."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.mark.parametrize("thr", [0.5, 0.6, 0.8, 0.9])
def test_jaccard_prefix_matches_inverted(spark, docs, thr):
    """Parity at HIGH thresholds too: the positional filter once silently
    dropped boundary pairs admitted by the 6dp-rounded final comparison
    (true J a hair under t, round(J,6) == t) — sweep the regimes."""
    from eggopress.pipeline import dedup

    a = {tuple(r) for r in dedup.ngram_jaccard_pairs(docs, thr, "prefix").collect()}
    b = {tuple(r) for r in dedup.ngram_jaccard_pairs(docs, thr, "inverted").collect()}
    assert a == b
    if thr <= 0.6:
        assert len(a) > 0


def test_minhash_candidates_cover_true_dups(spark, docs):
    """LSH candidates must include every pair above a high threshold
    (recall check for the banding parameters)."""
    from eggopress.pipeline import dedup

    true_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, 0.9, "inverted").collect()
    }
    cands = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert true_pairs, "fixture should contain near-duplicate docs"
    missed = true_pairs - cands
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_close_for_duplicates(spark, docs):
    from eggopress.pipeline import dedup

    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    dup = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, 0.95, "inverted").collect()
    }
    for a, b in dup:
        ham = bin(sh[a] ^ sh[b]).count("1")
        assert ham <= 6, f"simhash hamming {ham} for near-identical pair {(a, b)}"


def test_lsh_topk_subset_of_brute(spark, embs):
    """LSH ANN results must be drawn from the true ranking (every returned
    id appears in the brute-force full ranking with the same score)."""
    from eggopress.pipeline import simsearch

    q = list(embs.filter(F.col("vec_id") == 0).first()["embedding"])
    brute = {r.vec_id: r.cos for r in simsearch.brute_topk(embs, q, 500).collect()}
    approx = simsearch.lsh_topk(embs, q, 10).collect()
    assert 1 <= len(approx) <= 10
    for r in approx:
        assert r.vec_id in brute
        assert abs(brute[r.vec_id] - r.cos) < 1e-9


def test_multimodal_decode_stub_raises():
    from eggopress.pipeline import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")


def test_exact_dedup_drops_known_copies(spark, docs):
    from eggopress.pipeline import dedup

    base = docs.count()
    doubled = docs.union(docs)
    out = dedup.exact_dedup(doubled)
    kept = out.agg(F.sum("kept")).first()[0]
    dropped = out.agg(F.sum("dropped")).first()[0]
    assert kept + dropped == 2 * base
    assert dropped >= base  # every doc had at least one copy
