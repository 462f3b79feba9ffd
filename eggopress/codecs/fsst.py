"""FSST-style learned symbol-table byte-string compression (capability C3).

Follows the published idea of FSST (Boncz, Neumann, Leis — VLDB'20 "FSST:
Fast Random Access String Compression", see PAPERS.md): learn a table of
short, frequent substrings ("symbols", up to 8 bytes) from a sample and
replace occurrences with 1-byte codes.

Engineering adaptation for a pure-Python/numpy data plane: instead of the
paper's escape-byte scheme we assign codes only from byte values that do
NOT occur in the chunk's buffer, so encode is a sequence of C-speed
``bytes.replace`` calls and decode is the exact reverse sequence. This is
provably self-inverse: symbols are drawn from the buffer's alphabet, codes
from outside it, so no replacement can fabricate or destroy another
symbol's code. Candidate symbols are mined with numpy sliding windows over
a bounded sample; gain = (len-1) * count.

If every byte value 0..255 occurs in the buffer, the table is empty and
the codec degenerates to plain (the selection layer then drops it).
"""

from __future__ import annotations

import base64

import numpy as np

MAX_SYMBOLS = 64
SAMPLE_BYTES = 1 << 15
_SYM_LENGTHS = (8, 6, 4, 3, 2)
_MIN_COUNT = 4
_MAX_WINDOWS = 16384


def _mine_length(sample: np.ndarray, L: int) -> list[tuple[int, bytes]]:
    """Frequent L-byte substrings: windows packed into uint64 keys so the
    frequency count is a fast 1-D np.unique, not an axis=0 row sort."""
    n = len(sample) - L + 1
    if n <= 0:
        return []
    key = np.zeros(n, dtype=np.uint64)
    for j in range(L):
        key |= sample[j : j + n].astype(np.uint64) << np.uint64(8 * j)
    if n > _MAX_WINDOWS:  # deterministic stride subsample
        key = key[:: n // _MAX_WINDOWS + 1]
    uniq, counts = np.unique(key, return_counts=True)
    good = counts >= _MIN_COUNT
    return [
        ((L - 1) * int(c), int(u).to_bytes(8, "little")[:L])
        for u, c in zip(uniq[good], counts[good])
    ]


def build_table(buf: bytes) -> list[tuple[int, bytes]]:
    """Learn up to MAX_SYMBOLS (code_byte, symbol) pairs from buf's head."""
    if not buf:
        return []
    sample = np.frombuffer(buf, dtype=np.uint8, count=min(len(buf), SAMPLE_BYTES))
    # codes = byte values absent from the *whole* buffer
    used = np.zeros(256, dtype=bool)
    full = np.frombuffer(buf, dtype=np.uint8)
    used[np.unique(full)] = True
    free_codes = np.flatnonzero(~used)
    if len(free_codes) == 0:
        return []
    cands: list[tuple[int, bytes]] = []  # (gain, symbol)
    for L in _SYM_LENGTHS:
        cands.extend(_mine_length(sample, L))
    # greedy by gain; skip symbols fully contained in an already-chosen one
    cands.sort(key=lambda t: (-t[0], t[1]))
    chosen: list[bytes] = []
    for _, sym in cands:
        if len(chosen) >= min(MAX_SYMBOLS, len(free_codes)):
            break
        if any(sym in c for c in chosen):
            continue
        chosen.append(sym)
    return [(int(free_codes[i]), sym) for i, sym in enumerate(chosen)]


def encode(buf: bytes, table: list[tuple[int, bytes]]) -> bytes:
    out = buf
    for code, sym in table:
        out = out.replace(sym, bytes([code]))
    return out


def decode(buf: bytes, table: list[tuple[int, bytes]]) -> bytes:
    out = buf
    for code, sym in reversed(table):
        out = out.replace(bytes([code]), sym)
    return out


def table_to_json(table: list[tuple[int, bytes]]) -> list[list]:
    return [[code, base64.b64encode(sym).decode("ascii")] for code, sym in table]


def table_from_json(obj: list[list]) -> list[tuple[int, bytes]]:
    return [(int(code), base64.b64decode(sym)) for code, sym in obj]
