"""RLE2 zero-run coding on device: segmented formulation.

Reference semantics (src/tools/rle2_mtf.rs:84-101): MTF rank 0 never emitted;
a zero run of length L becomes the bijective base-2 digits of L (RUNA=0,
RUNB=1 symbols, low digit first; digit_j = ((L+1) >> j) & 1 over
floor(log2(L+1)) digits); literal rank r >= 1 becomes symbol r+1; EOB
(= used+1) is appended last.

Vectorized: zero-run length before each nonzero position via a prefix-max of
last-nonzero indices, per-position emission counts, exclusive cumsum for
output offsets, then an inverse mapping — emitters stamp their payload at
their output offset and forward-fill cumscans give every output slot its
symbol in closed form (gather- and loop-free).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp




def num_digits(run_len):
    """Digit count of the bijective base-2 coding: floor(log2(L+1)); 0 if L==0."""
    L1 = (run_len + 1).astype(jnp.uint32)
    return jnp.where(run_len > 0, 31 - jax.lax.clz(L1).astype(jnp.int32), 0)


def rle2_encode(
    ranks: jnp.ndarray,
    n: jnp.ndarray,
    eob: jnp.ndarray,
    with_freqs: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None]:
    """ranks: int32[N] MTF ranks (first n valid).

    Returns (syms uint16[N+8], rle2_len, freqs int32[258]): the RLE2 symbol
    stream (length rle2_len incl. trailing EOB; run coding only shrinks zero
    runs so output stays below input length + digits slack). with_freqs=False
    skips the frequency histogram (freqs is None) — the lean host-refine
    graph counts on host instead.
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

    # Inverse mapping instead of per-digit scatters: each emitter stamps its
    # INPUT POSITION at its exclusive output offset (one scatter), a cummax
    # forward-fill gives every output slot its covering emitter, and two
    # standalone gathers pull the emitter's (off, run, literal) — standalone
    # gathers run at full rate on this backend (only in-loop gathers are
    # pathological); this replaces the previous four stamp+fill passes.
    out_idx = jnp.arange(OUT, dtype=jnp.int32)
    tgt = jnp.where(nonzero, off, OUT)
    run1 = run_before + 1

    stamped = jnp.full(OUT, -1, jnp.int32).at[tgt].set(idx, mode="drop")
    e_pos = jax.lax.associative_scan(jnp.maximum, stamped)
    ep = jnp.clip(e_pos, 0, N - 1)
    # packed per-emitter payload: run1 <= 2^21 in the top bits, literal
    # (rank+1 <= 256) in the low 9 — one gather covers both
    payload = (run1 << 9) | (ranks + 1)
    g_pay = payload[ep]
    e_off_f = jnp.where(e_pos >= 0, off[ep], -1)
    e_lit_f = g_pay & ((1 << 9) - 1)
    run1_f = g_pay >> 9
    k_off = out_idx - e_off_f
    # a slot is its emitter's literal (k_off == d) iff the NEXT slot starts
    # a new emitter or the body ends there — saves the d-field fill
    e_next = jnp.concatenate((e_off_f[1:], jnp.full(1, -1, jnp.int32)))
    is_lit = (e_next == out_idx + 1) | (out_idx + 1 == total_body)
    body_sym = jnp.where(
        is_lit,
        e_lit_f,
        (run1_f >> jnp.clip(k_off, 0, 31)) & 1,
    )
    # slots at/after total_body: tail digits then EOB
    tail_j = out_idx - total_body
    tail_sym = jnp.where(
        tail_j < tail_d,
        ((tail_run + 1) >> jnp.clip(tail_j, 0, 31)) & 1,
        eob,
    )
    in_body = (out_idx < total_body) & (e_pos >= 0)
    syms = jnp.where(in_body, body_sym, tail_sym).astype(jnp.uint16)
    rle2_len = total_body + tail_d + 1
    if not with_freqs:
        return syms, rle2_len, None
    freqs = (
        jnp.zeros(258, jnp.int32)
        .at[jnp.where(out_idx < rle2_len, syms.astype(jnp.int32), 258)]
        .add(1, mode="drop")
    )
    return syms, rle2_len, freqs


def rle2_encode_batch(
    ranks: jnp.ndarray, n: jnp.ndarray, eob: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched RLE2 over [B, N] blocks: the single-block formulation with
    every scan/cumsum running along axis=1 (resets per block by
    construction) and scatters flattened with per-block row bases. One
    launch, single-block op count — the vmapped variant's compile cost
    scales badly on this backend.

    ranks int32[B, N], n int32[B], eob int32[B] ->
    (syms uint16[B, N+8], rle2_len int32[B], freqs int32[B, 258]).
    """
    B, N = ranks.shape
    OUT = N + 8
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    valid = idx < n[:, None]
    nonzero = valid & (ranks != 0)
    nz_idx = jnp.where(nonzero, idx, -1)
    last_nz = jax.lax.associative_scan(jnp.maximum, nz_idx, axis=1)
    prev_nz = jnp.concatenate(
        (jnp.full((B, 1), -1, jnp.int32), last_nz[:, :-1]), axis=1
    )
    run_before = jnp.where(nonzero, idx - prev_nz - 1, 0)
    d = num_digits(run_before)
    emit = jnp.where(nonzero, d + 1, 0)
    off = jnp.cumsum(emit, axis=1) - emit  # exclusive, per block
    total_body = jnp.sum(emit, axis=1)  # [B]
    last_valid_nz = jnp.max(jnp.where(nonzero, idx, -1), axis=1)  # [B]
    tail_run = n - 1 - last_valid_nz
    tail_d = num_digits(tail_run)

    out_idx = jnp.broadcast_to(jnp.arange(OUT, dtype=jnp.int32), (B, OUT))
    row_base = jnp.arange(B, dtype=jnp.int32)[:, None] * OUT
    tgt_flat = jnp.where(nonzero, row_base + off, B * OUT)
    run1 = run_before + 1

    def fill(values, width):
        stamped = (
            jnp.full(B * OUT, -1, jnp.int32)
            .at[tgt_flat]
            .set((off << width) | values, mode="drop")
        ).reshape(B, OUT)
        return jax.lax.associative_scan(jnp.maximum, stamped, axis=1)

    e_off_f = fill(jnp.zeros_like(off), 0)
    e_lit_f = fill(ranks + 1, 9) & ((1 << 9) - 1)
    rhi_f = fill(run1 >> 10, 11) & ((1 << 11) - 1)
    rlo_f = fill(run1 & 1023, 10) & ((1 << 10) - 1)
    run1_f = (rhi_f << 10) | rlo_f
    k_off = out_idx - e_off_f
    e_next = jnp.concatenate(
        (e_off_f[:, 1:], jnp.full((B, 1), -1, jnp.int32)), axis=1
    )
    is_lit = (e_next == out_idx + 1) | (out_idx + 1 == total_body[:, None])
    body_sym = jnp.where(
        is_lit,
        e_lit_f,
        (run1_f >> jnp.clip(k_off, 0, 31)) & 1,
    )
    tail_j = out_idx - total_body[:, None]
    tail_sym = jnp.where(
        tail_j < tail_d[:, None],
        ((tail_run[:, None] + 1) >> jnp.clip(tail_j, 0, 31)) & 1,
        eob[:, None],
    )
    in_body = (out_idx < total_body[:, None]) & (e_off_f >= 0)
    syms = jnp.where(in_body, body_sym, tail_sym).astype(jnp.uint16)
    rle2_len = total_body + tail_d + 1
    frow = jnp.arange(B, dtype=jnp.int32)[:, None] * 258
    freqs = (
        jnp.zeros(B * 258, jnp.int32)
        .at[
            jnp.where(
                out_idx < rle2_len[:, None], frow + syms.astype(jnp.int32), B * 258
            )
        ]
        .add(1, mode="drop")
    ).reshape(B, 258)
    return syms, rle2_len, freqs
