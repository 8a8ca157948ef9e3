"""Move-to-front on device, scan-free.

The reference's MTF is an inherently serial per-byte scan over a 256-entry
list (src/tools/rle2_mtf.rs:61-138). TPU formulation, built only from the
primitives this backend executes at full rate (sorts, rolls, cumscans,
standalone scatters, elementwise) — no lax loops, no batched gathers:

  1. The MTF list at any point is: symbols seen so far ordered by last
     occurrence (most recent first), then unseen symbols in initial
     (sorted-alphabet) order. So each chunk's start state follows directly
     from an exclusive cummax of per-(chunk, symbol) last-occurrence
     positions + one batched rank-by-sort. No transform composition needed.
  2. Within a chunk, rank[i] = # distinct symbols since the previous
     occurrence of sym[i]:
       prev in-chunk:     #{j in (prev_i, i) : next_j >= i}  (positions that
                          are last-in-window occurrences of their symbol)
       prev out-of-chunk: start_rank[sym_i] + #{j < i : first-in-chunk_j,
                          start_rank[sym_j] >= start_rank[sym_i]}
                          (symbols re-seen in the chunk moved in front; the
                          rest keep their chunk-start relative order)
     Both cases reduce over one (chunk x chunk) boolean dominance matrix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ABSENT = 256  # plain int: no backend init at import time


def _rank_by_key(key):
    """rank[..., lane] = position of lane in ascending-key order (batched,
    gather/scatter-free via double sort)."""
    m = key.shape[-1]
    lanes = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32), key.shape
    )
    _, lane_by_order = jax.lax.sort((key, lanes), num_keys=1)
    pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), key.shape)
    _, rank = jax.lax.sort((lane_by_order, pos), num_keys=1)
    return rank


def _lookup_by_sort(table_vals, qkeys, nkeys):
    """out[q] = table_vals[qkeys[q]] without gathers: merge table entries and
    queries in one sort, forward-fill table values with a cummax, sort back.
    table_vals: int32[nkeys] (each < 2**9), qkeys: int32[Q] in [0, nkeys)."""
    Q = qkeys.shape[0]
    tkey = jnp.arange(nkeys, dtype=jnp.int32)
    keys = jnp.concatenate((tkey, qkeys))
    tag = jnp.concatenate(
        (jnp.zeros(nkeys, jnp.int32), jnp.ones(Q, jnp.int32))
    )
    qid = jnp.concatenate(
        (jnp.full(nkeys, -1, jnp.int32), jnp.arange(Q, dtype=jnp.int32))
    )
    enc0 = jnp.concatenate((table_vals.astype(jnp.int32), jnp.zeros(Q, jnp.int32)))
    k_s, tag_s, qid_s, enc_s = jax.lax.sort((keys, tag, qid, enc0), num_keys=2)
    # forward-fill: each key group starts with its (unique) table entry. The
    # carrier packs key<<9|value; when that exceeds int32 (batched callers:
    # nkeys up to B*nc*256) the 9 value bits are split across TWO int32
    # cummax fills, each carrier still monotone in key (x64 is disabled, so
    # an int64 carrier would silently truncate).
    if nkeys * (1 << 9) < 2**31:
        carrier = jnp.where(tag_s == 0, (k_s << 9) | enc_s, -1)
        filled = jax.lax.associative_scan(jnp.maximum, carrier)
        vals = filled & ((1 << 9) - 1)
    else:
        assert nkeys < 1 << 26, "lookup key space too large for int32 fills"
        hi = jnp.where(tag_s == 0, (k_s << 4) | (enc_s >> 5), -1)
        lo = jnp.where(tag_s == 0, (k_s << 5) | (enc_s & 31), -1)
        hi_f = jax.lax.associative_scan(jnp.maximum, hi)
        lo_f = jax.lax.associative_scan(jnp.maximum, lo)
        vals = ((hi_f & 15) << 5) | (lo_f & 31)
    # return query results in query order (sort by qid; table rows first)
    _, out = jax.lax.sort((qid_s, vals), num_keys=1)
    return out[nkeys:]


def mtf_ranks(
    last: jnp.ndarray, n: jnp.ndarray, chunk: int = 256, use_pallas: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """last: uint8[N] BWT output (first n valid; N % chunk == 0).

    Returns (ranks int32[N], used bool[256]): ranks[i] = MTF rank of last[i]
    over the compacted used-symbol alphabet; pad lanes carry garbage.
    """
    N = last.shape[0]
    assert N % chunk == 0, "N must be a multiple of the chunk size"
    nc = N // chunk
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    sym = jnp.where(valid, last.astype(jnp.int32), 255)

    used = jnp.zeros(256, jnp.bool_).at[jnp.where(valid, sym, 256)].set(
        True, mode="drop"
    )
    init_rank = jnp.where(used, jnp.cumsum(used.astype(jnp.int32)) - 1, ABSENT)

    # global prev/next occurrence per position via one variadic sort
    s_sym, s_idx = jax.lax.sort((sym, idx), num_keys=1)
    same_prev = jnp.concatenate((jnp.zeros(1, jnp.bool_), s_sym[1:] == s_sym[:-1]))
    same_next = jnp.concatenate((s_sym[1:] == s_sym[:-1], jnp.zeros(1, jnp.bool_)))
    prev_sorted = jnp.where(same_prev, jnp.roll(s_idx, 1), -1)
    next_sorted = jnp.where(same_next, jnp.roll(s_idx, -1), N)
    _, prev_g, next_g = jax.lax.sort((s_idx, prev_sorted, next_sorted), num_keys=1)

    # per-(chunk, symbol) last occurrence: flag last-in-chunk entries in the
    # (sym, idx) sorted stream, one standalone scatter into (nc, 256)
    s_cid = s_idx // chunk
    nxt_diff = jnp.concatenate(
        ((s_sym[1:] != s_sym[:-1]) | (s_cid[1:] != s_cid[:-1]), jnp.ones(1, jnp.bool_))
    )
    tgt_c = jnp.where(nxt_diff, s_cid, nc)
    tgt_s = jnp.where(nxt_diff, s_sym, 0)
    last_pos = (
        jnp.full((nc, 256), -1, jnp.int32)
        .at[tgt_c, tgt_s]
        .max(s_idx, mode="drop")
    )
    # exclusive running max over chunks = last occurrence before chunk start
    run = jax.lax.associative_scan(jnp.maximum, last_pos, axis=0)
    last_before = jnp.concatenate(
        (jnp.full((1, 256), -1, jnp.int32), run[:-1]), axis=0
    )
    # chunk start state: seen symbols by recency desc, then unseen by initial
    # order — one combined sort key per lane
    key = jnp.where(last_before >= 0, N - last_before, 2 * N + init_rank[None, :])
    start_rank = _rank_by_key(key)  # (nc, 256)

    # start rank of each position's symbol (sort-based lookup, gather-free)
    cid = idx // chunk
    srank = _lookup_by_sort(
        start_rank.reshape(-1), cid * 256 + sym, nc * 256
    ).reshape(nc, chunk)

    cstart = cid * chunk
    lprev = jnp.where(prev_g >= cstart, prev_g - cstart, -1).reshape(nc, chunk)
    lnext = jnp.where(next_g < cstart + chunk, next_g - cstart, chunk).reshape(
        nc, chunk
    )
    lfirst = lprev < 0

    if use_pallas:
        # VMEM-streamed dominance kernel: no HBM-materialized C^2 tensors
        from .mtf_pallas import dominance_ranks

        ranks = dominance_ranks(lprev, lnext, srank, group=8)
        return ranks.reshape(N), used
    li = jnp.arange(chunk, dtype=jnp.int32)
    ii = li[None, :, None]  # row: position i
    jj = li[None, None, :]  # col: candidate j
    before = jj < ii
    case1 = (jj > lprev[:, :, None]) & (lnext[:, None, :] >= ii)
    case2 = lfirst[:, None, :] & (srank[:, None, :] >= srank[:, :, None])
    has_prev = (lprev >= 0)[:, :, None]
    mat = before & jnp.where(has_prev, case1, case2)
    counts = jnp.sum(mat, axis=-1, dtype=jnp.int32)
    ranks = counts + jnp.where(lfirst, srank, 0)
    return ranks.reshape(N), used


def mtf_ranks_batch(
    last: jnp.ndarray, n: jnp.ndarray, chunk: int = 256,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched MTF over [B, N] blocks as ONE flat problem (no vmap).

    Per-block symbols are namespaced as block*256+sym, so every heavy op is
    the single-block op at B-times-larger shapes: one variadic sort over
    B*N, one scatter into (B*nc, 256), per-row rank/lookup, and the same
    (rows, C, C) dominance reduction with rows = B*nc instead of nc. The
    compiled graph therefore has the single-block graph's op count — the
    vmapped alternative hit pathological compile times on this backend.

    Returns (ranks int32[B, N], used bool[B, 256]); pad lanes garbage.
    """
    B, N = last.shape
    assert N % chunk == 0
    nc = N // chunk
    M = B * N
    flat_idx = jnp.arange(M, dtype=jnp.int32)
    bid = flat_idx // N
    pos_in_b = flat_idx % N
    n_flat = jnp.repeat(n.astype(jnp.int32), N)
    valid = pos_in_b < n_flat
    sym = jnp.where(valid, last.reshape(M).astype(jnp.int32), 255)
    symk = bid * 256 + sym  # block-namespaced symbol

    used_flat = (
        jnp.zeros(B * 256, jnp.bool_)
        .at[jnp.where(valid, symk, B * 256)]
        .set(True, mode="drop")
    )
    used = used_flat.reshape(B, 256)
    init_rank = jnp.where(
        used, jnp.cumsum(used.astype(jnp.int32), axis=1) - 1, ABSENT
    )

    # global prev/next occurrence per position (same-block by construction:
    # equal symk implies equal block)
    s_key, s_idx = jax.lax.sort((symk, flat_idx), num_keys=1)
    same_prev = jnp.concatenate(
        (jnp.zeros(1, jnp.bool_), s_key[1:] == s_key[:-1])
    )
    same_next = jnp.concatenate(
        (s_key[1:] == s_key[:-1], jnp.zeros(1, jnp.bool_))
    )
    prev_sorted = jnp.where(same_prev, jnp.roll(s_idx, 1), -1)
    next_sorted = jnp.where(same_next, jnp.roll(s_idx, -1), M)
    _, prev_g, next_g = jax.lax.sort(
        (s_idx, prev_sorted, next_sorted), num_keys=1
    )

    # per-(global chunk, symbol) last occurrence (chunks never span blocks)
    s_cid = s_idx // chunk
    nxt_diff = jnp.concatenate(
        (
            (s_key[1:] != s_key[:-1]) | (s_cid[1:] != s_cid[:-1]),
            jnp.ones(1, jnp.bool_),
        )
    )
    tgt_c = jnp.where(nxt_diff, s_cid, B * nc)
    tgt_s = jnp.where(nxt_diff, s_key % 256, 0)
    last_pos = (
        jnp.full((B * nc, 256), -1, jnp.int32)
        .at[tgt_c, tgt_s]
        .max(s_idx, mode="drop")
    )
    # exclusive running max over chunks, RESET per block
    run = jax.lax.associative_scan(
        jnp.maximum, last_pos.reshape(B, nc, 256), axis=1
    )
    last_before = jnp.concatenate(
        (jnp.full((B, 1, 256), -1, jnp.int32), run[:, :-1]), axis=1
    ).reshape(B * nc, 256)
    init_rank_bc = jnp.repeat(init_rank, nc, axis=0)  # (B*nc, 256)
    key = jnp.where(last_before >= 0, M - last_before, 2 * M + init_rank_bc)
    start_rank = _rank_by_key(key)

    cid = flat_idx // chunk
    srank = _lookup_by_sort(
        start_rank.reshape(-1), cid * 256 + sym, B * nc * 256
    ).reshape(B * nc, chunk)

    cstart = cid * chunk
    lprev = jnp.where(prev_g >= cstart, prev_g - cstart, -1).reshape(
        B * nc, chunk
    )
    lnext = jnp.where(next_g < cstart + chunk, next_g - cstart, chunk).reshape(
        B * nc, chunk
    )
    lfirst = lprev < 0
    if use_pallas:
        # VMEM-tiled dominance kernel: the XLA (rows, C, C) reduction at
        # batch scale (rows = B*nc) is a compile explosion on this backend;
        # the Pallas kernel's compile cost is independent of rows
        from .mtf_pallas import dominance_ranks

        ranks = dominance_ranks(lprev, lnext, srank, group=8)
        return ranks.reshape(B, N), used
    li = jnp.arange(chunk, dtype=jnp.int32)
    ii = li[None, :, None]
    jj = li[None, None, :]
    before = jj < ii
    case1 = (jj > lprev[:, :, None]) & (lnext[:, None, :] >= ii)
    case2 = lfirst[:, None, :] & (srank[:, None, :] >= srank[:, :, None])
    has_prev = (lprev >= 0)[:, :, None]
    mat = before & jnp.where(has_prev, case1, case2)
    counts = jnp.sum(mat, axis=-1, dtype=jnp.int32)
    ranks = counts + jnp.where(lfirst, srank, 0)
    return ranks.reshape(B, N), used
