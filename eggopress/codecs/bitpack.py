"""Bit-packing primitives (capability C4, SURVEY.md §2.4).

Packs non-negative integers < 2**width into a little-endian bit stream.
Fully vectorized: encode expands to a (n, width) bit matrix and
``np.packbits``; decode uses ``np.unpackbits`` + a float64 matmul with the
power-of-two weight vector (exact: row sums < 2**32 <= 2**53).
Width is capped at 32 — values wider than that take the plain path.
"""

from __future__ import annotations

import numpy as np

MAX_WIDTH = 32


def bit_lengths(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length() for a uint64 array."""
    x = x.astype(np.uint64, copy=True)
    w = np.zeros(x.shape, dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= np.uint64(1 << s)
        w[m] += s
        x[m] >>= np.uint64(s)
    w += x.astype(np.uint8)  # residual x is in {0,1}
    return w


def bit_width_of_max(maxval: int) -> int:
    return int(maxval).bit_length()


def pack(vals: np.ndarray, width: int) -> bytes:
    """Pack vals (non-negative, < 2**width) into width bits each.

    Layout: width = 8q + r is stored as q contiguous byte planes (plane j =
    byte j of every value) followed by a little-endian bit stream of the r
    high bits. Exactly ceil(n*width bits) of payload, but every pass writes
    contiguously — no strided stores, no wide-int intermediates.
    """
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    if width > MAX_WIDTH:
        raise ValueError(f"bitpack width {width} > {MAX_WIDTH}")
    v = vals.astype(np.uint32, copy=False)
    q, r = divmod(width, 8)
    parts = []
    for j in range(q):
        parts.append(((v >> np.uint32(8 * j)) & np.uint32(0xFF)).astype(np.uint8).tobytes())
    if r:
        hi = (v >> np.uint32(8 * q)).astype(np.uint8)  # values < 2**r
        bits = np.empty((r, n), dtype=np.uint8)
        for j in range(r):
            np.bitwise_and(hi >> np.uint8(j), np.uint8(1), out=bits[j])
        # transpose so each value's r bits are consecutive in the stream
        parts.append(np.packbits(bits.T.ravel(), bitorder="little").tobytes())
    return b"".join(parts)


def unpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    q, r = divmod(width, 8)
    out = np.zeros(n, dtype=np.uint32)
    off = 0
    for j in range(q):
        plane = np.frombuffer(buf, dtype=np.uint8, count=n, offset=off)
        out |= plane.astype(np.uint32) << np.uint32(8 * j)
        off += n
    if r:
        bits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, offset=off),
            count=n * r,
            bitorder="little",
        ).reshape(n, r)
        hi = np.zeros(n, dtype=np.uint32)
        for j in range(r):
            hi |= bits[:, j].astype(np.uint32) << np.uint32(j)
        out |= hi << np.uint32(8 * q)
    return out.astype(np.uint64)
