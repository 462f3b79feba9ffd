"""Build a sf1.0-SCALE replica of /root/testdata for perf validation only.

Not the driver's data (its generator is private): distributions are
copied/resampled from sf0.1 and scaled 10x, preserving the properties
that matter for plan shape and cost: row counts, single-row-group
parquet files (single-split scans), tiny document vocabulary, same
column types. Output: /root/repo/_scratch/sf1.0/. Never touches
/root/testdata (read-only).
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/_scratch/sf1.0"
os.makedirs(DST, exist_ok=True)
rng = np.random.default_rng(4242)
ROWGROUP = 1 << 30  # single row group, like the driver's files


def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet", row_group_size=ROWGROUP,
                   compression="snappy")
    print(name, table.num_rows)


# ---- documents: 50k docs resampled from the sf0.1 word model ----
docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
vocab = sorted({w for s in docs["text"] for w in s.split()})
lens = np.array([len(s.split()) for s in docs["text"]])
langs = np.array(docs["lang"])
sources = np.array(docs["source"])
N = 50000
new_lens = rng.choice(lens, size=N)            # empirical length dist
lang_pick = rng.choice(langs, size=N)
src_pick = rng.choice(sources, size=N)
texts = []
vocab_arr = np.array(vocab)
for n in new_lens:
    texts.append(" ".join(vocab_arr[rng.integers(0, len(vocab_arr), n)]))
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(lang_pick.tolist()),
    "source": pa.array(src_pick.tolist()),
    "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
}))


def tiled(name, keycols, copies=10):
    """10 shifted copies of the sf0.1 table: marginal distributions exact,
    key ranges scale like TPC-H."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    shifts = {c: int(np.max(t.column(c).to_numpy()) + 1) for c in keycols}
    for i in range(copies):
        cols = {}
        for f in t.schema:
            arr = t.column(f.name)
            if f.name in keycols:
                cols[f.name] = pa.array(arr.to_numpy() + i * shifts[f.name])
            else:
                cols[f.name] = arr.combine_chunks()
        chunks.append(pa.table(cols))
    write(name, pa.concat_tables(chunks).combine_chunks())


tiled("lineitem", ["l_orderkey"])
tiled("orders", ["o_orderkey"])
tiled("customer", ["c_custkey"])
tiled("part", ["p_partkey"])
tiled("supplier", ["s_suppkey"])
tiled("events", ["event_id"])

# ---- embeddings: 10 copies, tiny noise on copies 1..9 so vectors are
# not exact duplicates (keeps ANN candidate structure sane) ----
emb = pq.read_table(f"{SRC}/embeddings.parquet")
vid = emb.column("vec_id").to_numpy()
mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
lab = emb.column("label").to_numpy()
vshift = int(vid.max() + 1)
parts = []
for i in range(10):
    m = mat if i == 0 else mat + rng.normal(0, 1e-3, mat.shape)
    parts.append(pa.table({
        "vec_id": pa.array(vid + i * vshift),
        "embedding": pa.array(list(m), type=emb.schema.field("embedding").type),
        "label": pa.array(lab),
    }))
write("embeddings", pa.concat_tables(parts).combine_chunks())

for name in ("nation", "region"):
    write(name, pq.read_table(f"{SRC}/{name}.parquet"))
print("done:", DST)
