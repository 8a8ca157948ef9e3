"""Burrows-Wheeler transform of *rotations* (bzip2 flavor), host reference.

Forward: sorts all n rotations of the block and emits the last column plus
the sorted position of rotation 0 (the "key"/origin pointer) — semantics of
reference src/bwt_algorithms/bwt_sort.rs:27-57. Implemented as prefix
doubling over ranks mod n (wraparound falls out naturally, making the
reference's Duval-rotation SA-IS workaround unnecessary — cf.
src/bwt_algorithms/sais_fallback.rs:582-620). This same doubling scheme is
the device suffix-sort kernel's oracle.

Inverse: counting-sort next-pointer chase, semantics of
src/bwt_algorithms/bwt_sort.rs:91-130.
"""
from __future__ import annotations

import numpy as np


def bwt_encode(data: np.ndarray) -> tuple[int, np.ndarray]:
    """Returns (key, last_column)."""
    d = np.asarray(data, dtype=np.uint8)
    n = d.size
    if n == 0:
        return 0, d.copy()
    if n == 1:
        return 0, d.copy()
    rank = d.astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while k < n:
        rank2 = rank[(idx + k) % n]
        order = np.lexsort((rank2, rank))
        r_sorted = rank[order]
        r2_sorted = rank2[order]
        new_rank = np.empty(n, dtype=np.int64)
        neq = np.empty(n, dtype=np.int64)
        neq[0] = 0
        neq[1:] = (np.diff(r_sorted) != 0) | (np.diff(r2_sorted) != 0)
        new_rank[order] = np.cumsum(neq)
        rank = new_rank
        if rank.max() == n - 1:
            break
        k <<= 1
    # rank may still have ties if the string is periodic (rotations equal);
    # ties mean identical rotations — any stable order yields the same BWT,
    # but the key must be rotation 0's sorted position. Break ties by index.
    sa = np.lexsort((np.arange(n), rank))
    key = int(np.flatnonzero(sa == 0)[0])
    last = d[(sa - 1) % n]
    return key, last


def bwt_decode(key: int, last: np.ndarray) -> np.ndarray:
    """Invert the rotation BWT given the last column and origin pointer."""
    L = np.asarray(last, dtype=np.uint8)
    n = L.size
    if n == 0:
        return L.copy()
    # tt[j] = index in L of the j-th smallest (byte, occurrence) pair:
    # stable counting sort of L's bytes.
    order = np.argsort(L, kind="stable")  # positions of sorted first column
    out = np.empty(n, dtype=np.uint8)
    p = order[key]
    # pointer chase — serial; vectorized via cycle-walk in the device path
    for i in range(n):
        out[i] = L[p]
        p = order[p]
    return out


def bwt_decode_fast(key: int, last: np.ndarray) -> np.ndarray:
    """Pointer-doubling inverse BWT: O(n log n) fully vectorized.

    Builds the orbit of `key` under the next-pointer permutation by repeated
    jump doubling instead of a serial chase.
    """
    L = np.asarray(last, dtype=np.uint8)
    n = L.size
    if n == 0:
        return L.copy()
    nxt = np.argsort(L, kind="stable").astype(np.int64)
    # seq[i] = nxt^(i+... ) — build positions[i] = nxt^i(start) for i in 0..n-1
    start = int(nxt[key])
    positions = np.empty(n, dtype=np.int64)
    positions[0] = start
    filled = 1
    jump = nxt.copy()
    while filled < n:
        take = min(filled, n - filled)
        positions[filled : filled + take] = jump[positions[:take]]
        filled += take
        if filled < n:
            jump = jump[jump]
    return L[positions]
