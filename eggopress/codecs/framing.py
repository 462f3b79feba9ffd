"""Blob framing: self-describing codec blobs and multi-part payloads."""

from __future__ import annotations

import json
import struct

_LEN = struct.Struct("<I")


def make_blob(header: dict, payload: bytes) -> bytes:
    hdr = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return _LEN.pack(len(hdr)) + hdr + payload


def split_blob(blob: bytes) -> tuple[dict, bytes]:
    (hlen,) = _LEN.unpack_from(blob, 0)
    header = json.loads(blob[4 : 4 + hlen].decode("utf-8"))
    return header, blob[4 + hlen :]


def pack_parts(parts: list[bytes]) -> bytes:
    out = [_LEN.pack(len(parts))]
    for p in parts:
        out.append(_LEN.pack(len(p)))
        out.append(p)
    return b"".join(out)


def unpack_parts(buf: bytes) -> list[bytes]:
    (n,) = _LEN.unpack_from(buf, 0)
    parts, off = [], 4
    for _ in range(n):
        (plen,) = _LEN.unpack_from(buf, off)
        off += 4
        parts.append(buf[off : off + plen])
        off += plen
    return parts
