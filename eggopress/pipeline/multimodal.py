"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched Pandas UDFs.

The Spark-side machinery (schema, mapInPandas batch shape, partitioning)
is real and tested; the actual media decode is STUBBED (no image/audio
libraries in this container): ``decode_image`` raises NotImplementedError,
and ``extract_features`` uses a deterministic fake decoder over the bytes
(length, first byte, adler-style checksum, fake width/height derived from
the payload) so the plumbing has an exact oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, first_byte int, checksum bigint, "
    "fake_width int, fake_height int, mime string"
)

ADLER_MOD = 65_521


def attach_binary(df: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload:binary, meta struct) — the multimodal
    table shape; payload is the utf-8 text standing in for media bytes."""
    return df.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real media decode would go here (PIL/ffmpeg). STUB: the container
    ships no media libraries."""
    raise NotImplementedError(
        "media decode stubbed: no image/audio libraries in this environment"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Deterministic fake 'decode': byte stats + payload-derived fake
    dimensions — exercising the real batch plumbing end to end.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.str.len().to_numpy(dtype=np.int64)
            # one concatenated buffer + offset arithmetic: the whole batch
            # is processed by vectorized numpy ops, zero per-element Python
            buf = np.frombuffer(b"".join(payloads.tolist()), dtype=np.uint8)
            ends = np.cumsum(byte_len)
            starts = ends - byte_len
            if len(buf) == 0:
                first_byte = np.full(len(pdf), -1, dtype="int32")
            else:
                first_byte = np.where(
                    byte_len > 0, buf[np.minimum(starts, len(buf) - 1)], -1
                ).astype("int32")
            cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            checksum = ((cs[ends] - cs[starts]) % ADLER_MOD).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len.astype("int32"),
                    "first_byte": first_byte,
                    "checksum": checksum,
                    "fake_width": (byte_len % 640).astype("int32"),
                    "fake_height": ((byte_len * 3) % 480).astype("int32"),
                    "mime": pdf["mime"],
                }
            )

    flat = assets.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(fn, FEATURE_SCHEMA)


# ascii-only corpus => byte checksum == sum of character codes (probed in
# tests); fake dims are pure arithmetic on n_chars
FEATURES_ORACLE = f"""
SELECT doc_id,
       cast(n_chars as int) AS byte_len,
       cast(CASE WHEN n_chars > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END as int) AS first_byte,
       cast(list_sum(list_transform(string_split_regex(text, ''), c -> ascii(c))) % {ADLER_MOD} as bigint) AS checksum,
       cast(n_chars % 640 as int) AS fake_width,
       cast((n_chars * 3) % 480 as int) AS fake_height,
       'text/plain' AS mime
FROM documents
"""
