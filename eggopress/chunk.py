"""Arrow batch <-> column-chunk (de)composition and per-chunk encode/decode.

This is the engine's nested<->flat duality (reference: ADAM flatten,
datasets/dbsnp/toast.sh:36-42 and SURVEY.md P1): a `tokens:list<int32>`
column is decomposed into its Arrow values buffer + the n_tok lengths
(which double as the offsets stream), each encoded independently; decode
re-nests via cumsum. Strings are handled as (lengths, utf8 buffer).
No per-row Python anywhere — buffers in, buffers out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eggopress.codecs import core as codecs
from eggopress.schema import CHUNK_ARROW_SCHEMA, CORPUS_ARROW_SCHEMA

COLUMNS = ("doc_id", "source", "n_tok", "tokens")


def _string_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """StringArray -> (int64 lengths, concatenated utf8 buffer)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    b = arr.cast(pa.binary())
    offsets = np.frombuffer(
        b.buffers()[1], dtype=np.int32, count=len(b) + 1 + b.offset
    )[b.offset :].astype(np.int64)
    data = b.buffers()[2]
    buf = b"" if data is None else data.to_pybytes()[offsets[0] : offsets[-1]]
    return np.diff(offsets), buf


def _string_from_parts(lengths: np.ndarray, buf: bytes) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.utf8(), len(lengths), [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)]
    )


def _list_values(arr: pa.Array) -> np.ndarray:
    """list<int32> -> flat int32 values (honoring slice offsets)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.flatten().to_numpy(zero_copy_only=False).astype(np.int32, copy=False)


def encode_batch(batch: pa.RecordBatch, partition_id: str, source: str,
                 salt: int, chunk_id: int) -> dict:
    """Encode one corpus batch (all rows must belong to one partition)."""
    n_rows = batch.num_rows
    doc_lengths, doc_buf = _string_parts(batch.column("doc_id"))
    src_lengths, src_buf = _string_parts(batch.column("source"))
    n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
    values = _list_values(batch.column("tokens"))

    doc_blob = codecs.encode_strs(doc_lengths, doc_buf)
    src_blob = codecs.encode_strs(src_lengths, src_buf)
    ntok_blob = codecs.encode_ints(n_tok)
    tok_blob = codecs.encode_ints(values)

    raw = (
        len(doc_buf) + 4 * n_rows  # doc_id data + offsets
        + len(src_buf) + 4 * n_rows
        + 4 * n_rows  # n_tok
        + 4 * len(values) + 4 * n_rows  # token values + list offsets
    )
    enc = len(doc_blob) + len(src_blob) + len(ntok_blob) + len(tok_blob)
    return {
        "source": source,
        "salt": salt,
        "partition_id": partition_id,
        "chunk_id": chunk_id,
        "n_rows": n_rows,
        "n_values": int(len(values)),
        "raw_bytes": int(raw),
        "encoded_bytes": int(enc),
        # chunk-skipping stats: a predicate decode prunes chunks whose
        # [min, max] window misses the predicate (SURVEY.md §4)
        "n_tok_min": int(n_tok.min()) if n_rows else 0,
        "n_tok_max": int(n_tok.max()) if n_rows else 0,
        "tok_min": int(values.min()) if len(values) else 0,
        "tok_max": int(values.max()) if len(values) else 0,
        "doc_id_blob": doc_blob,
        "source_blob": src_blob,
        "n_tok_blob": ntok_blob,
        "tokens_blob": tok_blob,
        "doc_id_bytes": len(doc_blob),
        "source_bytes": len(src_blob),
        "n_tok_bytes": len(ntok_blob),
        "tokens_bytes": len(tok_blob),
        "doc_id_codec": codecs.codec_of(doc_blob),
        "source_codec": codecs.codec_of(src_blob),
        "n_tok_codec": codecs.codec_of(ntok_blob),
        "tokens_codec": codecs.codec_of(tok_blob),
    }


def chunk_rows_to_batch(rows: list[dict]) -> pa.RecordBatch:
    arrays = []
    for field in CHUNK_ARROW_SCHEMA:
        arrays.append(pa.array([r[field.name] for r in rows], type=field.type))
    return pa.RecordBatch.from_arrays(arrays, schema=CHUNK_ARROW_SCHEMA)


# which encoded streams each corpus column needs at decode time; tokens
# re-nests through the n_tok lengths, so it pulls that stream too
BLOB_DEPS = {
    "doc_id": ("doc_id_blob",),
    "source": ("source_blob",),
    "n_tok": ("n_tok_blob",),
    "tokens": ("n_tok_blob", "tokens_blob"),
}


def decode_chunk_projected(columns: tuple[str, ...],
                           blobs: dict[str, bytes]) -> pa.RecordBatch:
    """Decode only `columns` of a chunk (column order = CORPUS schema
    order). `blobs` must hold every stream in BLOB_DEPS[c] for each
    requested column — and nothing forces it to hold the rest, which is
    the point: a projection never touches the undecoded streams."""
    arrays: dict[str, pa.Array] = {}
    if "doc_id" in columns:
        arrays["doc_id"] = _string_from_parts(*codecs.decode_strs(blobs["doc_id_blob"]))
    if "source" in columns:
        arrays["source"] = _string_from_parts(*codecs.decode_strs(blobs["source_blob"]))
    if "n_tok" in columns or "tokens" in columns:
        n_tok = codecs.decode_ints(blobs["n_tok_blob"])
        if "n_tok" in columns:
            arrays["n_tok"] = pa.array(n_tok.astype(np.int32), type=pa.int32())
        if "tokens" in columns:
            values = codecs.decode_ints(blobs["tokens_blob"]).astype(np.int32)
            offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
            np.cumsum(n_tok, out=offsets[1:])
            arrays["tokens"] = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()).cast(pa.int32()),
                pa.array(values, type=pa.int32()),
            ).cast(CORPUS_ARROW_SCHEMA.field("tokens").type)
    fields = [f for f in CORPUS_ARROW_SCHEMA if f.name in columns]
    return pa.RecordBatch.from_arrays(
        [arrays[f.name] for f in fields], schema=pa.schema(fields)
    )


def decode_chunk_row(doc_blob: bytes, src_blob: bytes, ntok_blob: bytes,
                     tok_blob: bytes) -> pa.RecordBatch:
    """Inverse of encode_batch: blobs -> corpus batch, bit-identical."""
    return decode_chunk_projected(
        tuple(f.name for f in CORPUS_ARROW_SCHEMA),
        {
            "doc_id_blob": doc_blob,
            "source_blob": src_blob,
            "n_tok_blob": ntok_blob,
            "tokens_blob": tok_blob,
        },
    )
