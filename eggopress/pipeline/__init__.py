"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, minhash-LSH, simhash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (lang-id, quality, token counting, fingerprinting), and
multimodal binary-column plumbing.

Every operator is defined twice in lockstep: a Spark DataFrame builder and
a DuckDB oracle SQL string (same arithmetic, dialect-adjusted), so the
driver's side-by-side correctness gate pins the semantics.
"""
