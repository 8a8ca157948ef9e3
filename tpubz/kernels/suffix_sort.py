"""Rotation suffix sort (BWT forward) on device: prefix doubling.

The reference's hot kernel is a comparator rotation sort with a SA-IS
fallback (src/bwt_algorithms/bwt_sort.rs:27-86, sais_fallback.rs). On TPU we
instead run prefix doubling: O(log n) rounds of a lexicographic two-key sort
(`jax.lax.sort` variadic, which XLA lowers to its native sort network),
re-ranking by cumsum of adjacent-difference flags. Ranks are composed mod n,
so *rotation* (wraparound) order falls out naturally and the reference's
Duval-rotation SA-IS workaround (sais_fallback.rs:582-620) is unnecessary.

Fixed shape N with a dynamic valid length n: padded lanes carry rank PAD_RANK
and sort to the tail. A `while_loop` exits as soon as ranks stop changing
(equivalent to the reference selecting cheaper algorithms for easy data —
most real blocks converge in far fewer than log2(n) rounds).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_RANK = 1 << 30


def bwt_forward(data: jnp.ndarray, n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """data: uint8[N] (first n valid). Returns (key, last uint8[N]).

    last[i] for i < n is the BWT last column; key is rotation 0's sorted
    position. Padded output lanes are zero.
    """
    N = data.shape[0]
    n = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    rank = jnp.where(valid, data.astype(jnp.int32), PAD_RANK)

    def second_rank(rank, k):
        # rank of the rotation k ahead, mod n; padded lanes stay PAD_RANK.
        # True mod keeps every round well-defined even once k >= n (standard
        # cyclic doubling), where ranks have provably reached fixpoint.
        j = jnp.remainder(idx + k, jnp.maximum(n, 1))
        return jnp.where(valid, rank[j], PAD_RANK)

    def rerank(r1s, r2s, order):
        changed_flag = jnp.concatenate(
            (
                jnp.zeros(1, jnp.int32),
                ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
            )
        )
        new_sorted = jnp.cumsum(changed_flag)
        # padded lanes route to an out-of-bounds dump slot and are dropped
        tgt = jnp.where(valid[order], order, N)
        return jnp.zeros(N, jnp.int32).at[tgt].set(new_sorted, mode="drop")

    def cond(state):
        k, rank, done = state
        return (~done) & (k < N)

    def body(state):
        k, rank, _ = state
        r2 = second_rank(rank, k)
        r1s, r2s, order = jax.lax.sort((rank, r2, idx), num_keys=2)
        new_rank = rerank(r1s, r2s, order)
        new_rank = jnp.where(valid, new_rank, PAD_RANK)
        done = jnp.all(new_rank == rank)
        return k * 2, new_rank, done

    # first round: sort on (byte, next byte) -> rank_2 directly
    r2 = second_rank(rank, jnp.int32(1))
    r1s, r2s, order = jax.lax.sort((rank, r2, idx), num_keys=2)
    rank = jnp.where(valid, rerank(r1s, r2s, order), PAD_RANK)
    # initial done derives from n so its sharding axis-variance matches the
    # loop-carried value under shard_map (a literal False is replicated)
    k, rank, _ = jax.lax.while_loop(cond, body, (jnp.int32(2), rank, n < 0))

    # final order; identical rotations (periodic data) still tie — break by
    # index, which matches any stable rotation sort's BWT output
    _, sa = jax.lax.sort((jnp.where(valid, rank, PAD_RANK), idx), num_keys=1)
    key = jnp.argmax((sa == 0) & (jnp.arange(N) < n)).astype(jnp.int32)
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    last = jnp.where(valid, data[prev], 0).astype(jnp.uint8)
    return key, last
