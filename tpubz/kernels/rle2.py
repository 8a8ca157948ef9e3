"""RLE2 zero-run coding on device: segmented formulation.

Reference semantics (src/tools/rle2_mtf.rs:84-101): MTF rank 0 never emitted;
a zero run of length L becomes the bijective base-2 digits of L (RUNA=0,
RUNB=1 symbols, low digit first; digit_j = ((L+1) >> j) & 1 over
floor(log2(L+1)) digits); literal rank r >= 1 becomes symbol r+1; EOB
(= used+1) is appended last.

Vectorized: zero-run length before each nonzero position via a prefix-max of
last-nonzero indices, per-position emission counts, exclusive cumsum for
output offsets, then one scatter for literals plus MAX_DIGITS masked scatters
for run digits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIGITS = 21  # runs are < 2^21 (block <= 900k)


def num_digits(run_len):
    """Digit count of the bijective base-2 coding: floor(log2(L+1)); 0 if L==0."""
    L1 = (run_len + 1).astype(jnp.uint32)
    return jnp.where(run_len > 0, 31 - jax.lax.clz(L1).astype(jnp.int32), 0)


def rle2_encode(
    ranks: jnp.ndarray, n: jnp.ndarray, eob: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ranks: int32[N] MTF ranks (first n valid).

    Returns (syms uint16[N+8], rle2_len, freqs int32[258]): the RLE2 symbol
    stream (length rle2_len incl. trailing EOB; run coding only shrinks zero
    runs so output stays below input length + digits slack).
    """
    N = ranks.shape[0]
    OUT = N + 8  # slack for EOB + trailing digits; last slot is a dump lane
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    nonzero = valid & (ranks != 0)
    # last nonzero index strictly before i (or -1): exclusive prefix max
    nz_idx = jnp.where(nonzero, idx, -1)
    last_nz = jax.lax.associative_scan(jnp.maximum, nz_idx)
    prev_nz = jnp.concatenate((jnp.full(1, -1, jnp.int32), last_nz[:-1]))
    run_before = jnp.where(nonzero, idx - prev_nz - 1, 0)
    d = num_digits(run_before)
    emit = jnp.where(nonzero, d + 1, 0)
    off = jnp.cumsum(emit) - emit  # exclusive
    total_body = jnp.sum(emit)
    # trailing zero run after the last nonzero (or the whole block)
    last_valid_nz = jnp.max(jnp.where(nonzero, idx, -1))
    tail_run = n - 1 - last_valid_nz
    tail_d = num_digits(tail_run)

    # Inverse mapping instead of per-digit scatters: for each output slot k,
    # find its source position via a marker-cumsum (emitters mark their
    # exclusive output offset; cumsum-1 indexes the covering emitter), then
    # compute the symbol from (k - off[src]) in closed form.
    out_idx = jnp.arange(OUT, dtype=jnp.int32)
    marker = jnp.zeros(OUT, jnp.int32).at[jnp.where(nonzero, off, OUT)].add(
        1, mode="drop"
    )
    # dense emitter id per output slot (1-based; 0 = before first emitter)
    dense = jnp.cumsum(marker)
    # map dense emitter id -> (off, d, run, rank) via scatter of emitter data
    nz_rank = jnp.cumsum(nonzero.astype(jnp.int32))  # dense id at each pos
    slot = jnp.where(nonzero, nz_rank - 1, N)  # emitter's dense index
    e_off = jnp.zeros(N + 1, jnp.int32).at[slot].set(off, mode="drop")
    e_d = jnp.zeros(N + 1, jnp.int32).at[slot].set(d, mode="drop")
    e_run = jnp.zeros(N + 1, jnp.int32).at[slot].set(run_before, mode="drop")
    e_lit = jnp.zeros(N + 1, jnp.int32).at[slot].set(ranks + 1, mode="drop")
    src = jnp.clip(dense - 1, 0, N)
    k_off = out_idx - e_off[src]
    body_sym = jnp.where(
        k_off < e_d[src],
        ((e_run[src] + 1) >> jnp.clip(k_off, 0, 31)) & 1,
        e_lit[src],
    )
    # slots at/after total_body: tail digits then EOB
    tail_j = out_idx - total_body
    tail_sym = jnp.where(
        tail_j < tail_d,
        ((tail_run + 1) >> jnp.clip(tail_j, 0, 31)) & 1,
        eob,
    )
    in_body = (out_idx < total_body) & (dense > 0)
    syms = jnp.where(in_body, body_sym, tail_sym).astype(jnp.uint16)
    rle2_len = total_body + tail_d + 1
    freqs = (
        jnp.zeros(258, jnp.int32)
        .at[jnp.where(out_idx < rle2_len, syms.astype(jnp.int32), 258)]
        .add(1, mode="drop")
    )
    return syms, rle2_len, freqs
