"""Unified codec entry points + blob introspection."""

from __future__ import annotations

from eggopress.codecs.framing import pack_parts, split_blob, unpack_parts  # noqa: F401
from eggopress.codecs.intcodecs import (  # noqa: F401
    INT_CODECS,
    decode_ints,
    encode_ints,
)
from eggopress.codecs.strcodecs import (  # noqa: F401
    STR_CODECS,
    decode_strs,
    encode_strs,
)


def codec_of(blob: bytes) -> str:
    """Codec name recorded in a blob header (for manifests/metrics)."""
    header, _ = split_blob(blob)
    return header["c"]
