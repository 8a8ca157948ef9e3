"""Move-to-front on device, parallelized with a recency monoid.

The reference's MTF is an inherently serial per-byte scan over a 256-entry
list (src/tools/rle2_mtf.rs:61-138). TPU formulation: split the block into
chunks; each chunk's effect on the MTF list is fully described by its
*recency transform* (the chunk's distinct symbols ordered by last occurrence,
most recent first). These transforms form a monoid under
``a ∘ b = symbols-of-b ++ (a \\ b)``, so per-chunk start states come from one
`associative_scan`, and the残 serial work is a C-step `lax.scan` whose body is
vectorized over all chunks and the full 256-lane alphabet at once.

Transform representation over the 256-symbol alphabet:
  mask[s] : symbol occurs in the segment
  rank[s] : recency rank (0 = most recent) for mask symbols, ABSENT otherwise
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ABSENT = jnp.int32(256)


def _compose(a_mask, a_rank, b_mask, b_rank):
    """Recency-monoid compose (a applied first, then b), batched over leading
    dims: result = symbols of b (b's ranks) then symbols of a\\b (a's ranks,
    compacted by removing b-symbols)."""
    both = a_mask & b_mask
    # histogram of a-ranks of symbols that b removes from a's residual order
    dump = jnp.where(both, a_rank, ABSENT)
    batch = a_rank.shape[:-1]
    h = jax.vmap(
        lambda dd: jnp.zeros(257, jnp.int32).at[dd].add(1, mode="drop")
    )(dump.reshape(-1, 256)).reshape(batch + (257,))
    removed_below = jnp.cumsum(h[..., :256], axis=-1) - h[..., :256]
    size_b = jnp.sum(b_mask, axis=-1, keepdims=True).astype(jnp.int32)
    a_compact = size_b + a_rank - jnp.take_along_axis(
        removed_below, jnp.minimum(a_rank, 255), axis=-1
    )
    new_rank = jnp.where(b_mask, b_rank, jnp.where(a_mask, a_compact, ABSENT))
    return a_mask | b_mask, new_rank.astype(jnp.int32)


def mtf_ranks(
    last: jnp.ndarray, n: jnp.ndarray, chunk: int = 512
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
    sym = last.astype(jnp.int32)

    used = jnp.zeros(256, jnp.bool_).at[jnp.where(valid, sym, 256)].set(
        True, mode="drop"
    )
    init_rank = jnp.where(used, jnp.cumsum(used.astype(jnp.int32)) - 1, ABSENT)

    csym = sym.reshape(nc, chunk)
    # per-chunk recency transform: last occurrence position per symbol
    pos_in_chunk = jnp.broadcast_to(jnp.arange(chunk, dtype=jnp.int32), (nc, chunk))
    last_pos = (
        jnp.full((nc, 256), -1, jnp.int32)
        .at[jnp.arange(nc)[:, None], csym]
        .max(pos_in_chunk)
    )
    t_mask = last_pos >= 0
    # recency rank via descending argsort of last_pos
    order = jnp.argsort(-last_pos, axis=-1)
    t_rank = (
        jnp.zeros((nc, 256), jnp.int32)
        .at[jnp.arange(nc)[:, None], order]
        .set(jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (nc, 256)))
    )
    t_rank = jnp.where(t_mask, t_rank, ABSENT)

    # exclusive scan: shift right with identity transform at chunk 0
    ident_mask = jnp.zeros((1, 256), jnp.bool_)
    ident_rank = jnp.full((1, 256), ABSENT, jnp.int32)
    sh_mask = jnp.concatenate((ident_mask, t_mask[:-1]))
    sh_rank = jnp.concatenate((ident_rank, t_rank[:-1]))
    pre_mask, pre_rank = jax.lax.associative_scan(
        lambda a, b: _compose(a[0], a[1], b[0], b[1]), (sh_mask, sh_rank), axis=0
    )
    # chunk start state = initial alphabet order composed with the prefix
    init_m = jnp.broadcast_to(used, (nc, 256))
    init_r = jnp.broadcast_to(init_rank, (nc, 256))
    _, start_rank = _compose(init_m, init_r, pre_mask, pre_rank)

    # within-chunk serial MTF, vectorized over all chunks x 256 lanes
    def step(R, col):
        s = col  # (nc,) symbol per chunk at this position
        r = jnp.take_along_axis(R, s[:, None], axis=-1)  # (nc, 1)
        R = jnp.where(R < r, R + 1, R)
        R = R.at[jnp.arange(nc), s].set(0)
        return R, r[:, 0]

    _, outs = jax.lax.scan(step, start_rank, csym.T)  # outs: (chunk, nc)
    ranks = outs.T.reshape(N)
    return ranks, used
