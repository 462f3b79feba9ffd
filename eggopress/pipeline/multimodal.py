"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched Pandas UDFs.

The fixture synthesizes REAL BMP files (the 'BM' magic, little-endian
file-size, and a BITMAPINFOHEADER carrying width/height/bpp at fixed
offsets), so feature extraction is a genuine binary media-header decode —
np.frombuffer at header offsets over one concatenated batch buffer, zero
per-element Python — with an exact DuckDB oracle (the header fields are
deterministic functions of the document). Full pixel decode of compressed
formats (PNG/JPEG/audio/video) still needs a media library the container
doesn't ship: ``decode_image`` remains an honest NotImplementedError.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, bpp int, "
    "checksum bigint, mime string"
)

ADLER_MOD = 65_521
BMP_HEADER_LEN = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def _bmp_headers(byte_len: np.ndarray, width: np.ndarray,
                 height: np.ndarray) -> np.ndarray:
    """(n, 54) uint8 header matrix, fully vectorized."""
    n = len(byte_len)
    hdr = np.zeros((n, BMP_HEADER_LEN), dtype=np.uint8)
    hdr[:, 0] = 0x42  # 'B'
    hdr[:, 1] = 0x4D  # 'M'

    def le32(col: int, vals: np.ndarray) -> None:
        v = vals.astype(np.int64)
        for k in range(4):
            hdr[:, col + k] = (v >> (8 * k)) & 0xFF

    le32(2, byte_len + BMP_HEADER_LEN)  # file size
    le32(10, np.full(n, BMP_HEADER_LEN))  # pixel-data offset
    le32(14, np.full(n, 40))  # DIB header size
    le32(18, width)
    le32(22, height)
    hdr[:, 26] = 1  # planes
    hdr[:, 28] = 24  # bits per pixel
    return hdr


def attach_binary(df: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload:binary, meta struct) — the multimodal
    table shape. payload is a real BMP: 54-byte header (width/height
    derived deterministically from n_chars so the oracle can check the
    parsed values) followed by the utf-8 text standing in for pixel data.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [t.encode("utf-8") for t in pdf["text"]]
            blen = np.fromiter((len(t) for t in texts), dtype=np.int64,
                               count=len(texts))
            width = (blen % 640) + 1
            height = ((blen * 3) % 480) + 1
            hdrs = _bmp_headers(blen, width, height)
            payloads = [hdrs[i].tobytes() + texts[i] for i in range(len(texts))]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "n_bytes": (blen + BMP_HEADER_LEN).astype("int64"),
                "mime": "image/bmp",
            })

    flat = df.select("doc_id", "text").mapInPandas(
        fn, "doc_id bigint, payload binary, n_bytes bigint, mime string"
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(F.col("n_bytes"), F.col("mime")).alias("meta"),
    )


def decode_image(payload: bytes):
    """Full pixel decode of compressed media would go here (PIL/ffmpeg).
    STUB: the container ships no media libraries — header parsing (the
    part expressible with numpy alone) lives in extract_features."""
    raise NotImplementedError(
        "pixel decode stubbed: no image/audio libraries in this environment"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched BMP header decode over binary payloads (mapInPandas).

    One concatenated buffer per batch + offset arithmetic: magic check,
    little-endian width/height/bpp reads at fixed header offsets, and an
    adler-style checksum over the pixel bytes — all vectorized numpy, zero
    per-element Python in the hot path."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.str.len().to_numpy(dtype=np.int64)
            buf = np.frombuffer(b"".join(payloads.tolist()), dtype=np.uint8)
            ends = np.cumsum(byte_len)
            starts = ends - byte_len
            if np.any(byte_len < BMP_HEADER_LEN):
                raise ValueError("payload shorter than a BMP header")
            magic_ok = (buf[starts] == 0x42) & (buf[starts + 1] == 0x4D)
            if not np.all(magic_ok):
                raise ValueError("payload without BMP magic")

            def le32(off: int) -> np.ndarray:
                v = buf[starts + off].astype(np.int64)
                for k in range(1, 4):
                    v |= buf[starts + off + k].astype(np.int64) << (8 * k)
                return v

            width = le32(18).astype("int32")
            height = le32(22).astype("int32")
            bpp = (buf[starts + 28].astype(np.int64)
                   | (buf[starts + 29].astype(np.int64) << 8)).astype("int32")
            # checksum over pixel data only (bytes after the header)
            cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            checksum = ((cs[ends] - cs[starts + BMP_HEADER_LEN]) % ADLER_MOD).astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int32"),
                "width": width,
                "height": height,
                "bpp": bpp,
                "checksum": checksum,
                "mime": pdf["mime"],
            })

    flat = assets.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(fn, FEATURE_SCHEMA)


# the header fields are deterministic functions of the document (and the
# ascii-only corpus makes the pixel checksum the character-code sum), so
# the WHOLE feature row — including the dims parsed back out of the binary
# header — has an exact SQL oracle
FEATURES_ORACLE = f"""
SELECT doc_id,
       cast(n_chars + {BMP_HEADER_LEN} as int) AS byte_len,
       cast((n_chars % 640) + 1 as int) AS width,
       cast(((n_chars * 3) % 480) + 1 as int) AS height,
       cast(24 as int) AS bpp,
       cast(coalesce(list_sum(list_transform(string_split_regex(text, ''), c -> ascii(c))), 0) % {ADLER_MOD} as bigint) AS checksum,
       'image/bmp' AS mime
FROM documents
"""
