"""Per-primitive cost measurements at bzip2 -9 shapes (900k) on the real chip.

Answers the round-2 question: which primitives make the fused post stage
(MTF+RLE2+compact+hist) cost ~88 ms?  Measures every scatter the post stage
issues, their sort/gather/compare-based replacements, and the q-ary prefix
doubling round candidates for the BWT.

All graphs are AOT-compiled (.lower().compile()) before any chip time is
used, so a hung remote compile cannot wedge the chip.  Fresh inputs per
trial (the relay dedupes identical dispatches).  Prints one JSON line per
measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpubz.block.encode import setup_jax_cache

N = 900_096
OUT = N + 8
NC = N // 256
NSEL = (OUT + 49) // 50


# --- post-stage scatters as they exist today -------------------------------

@jax.jit
def sc_fill_stamp(tgt, val):
    """RLE2 fill: scatter-set 900k updates into OUT slots (x4 in prod)."""
    return jnp.full(OUT, -1, jnp.int32).at[tgt].set(val, mode="drop")


@jax.jit
def sc_freqs(sym):
    """freqs: scatter-add 900k -> 258."""
    return jnp.zeros(258, jnp.int32).at[sym].add(1, mode="drop")


@jax.jit
def sc_chunk_hist(flat):
    """chunk hist: scatter-add 900k -> NSEL*258."""
    return jnp.zeros(NSEL * 258, jnp.int32).at[flat].add(1, mode="drop")


@jax.jit
def sc_last_pos(tgt_c, tgt_s, val):
    """MTF last_pos: scatter-max 900k -> (NC, 256)."""
    return jnp.full((NC, 256), -1, jnp.int32).at[tgt_c, tgt_s].max(
        val, mode="drop"
    )


@jax.jit
def sc_used(sym):
    """MTF used: scatter-set 900k -> 256."""
    return jnp.zeros(256, jnp.bool_).at[sym].set(True, mode="drop")


@jax.jit
def sc_hi_pack(tgt, val):
    """compact sidecar: scatter-set 900k -> 8192."""
    return jnp.zeros(8192, jnp.int32).at[tgt].set(val, mode="drop")


# --- replacements -----------------------------------------------------------

@jax.jit
def rp_gather(src, idx):
    """standalone 900k gather from 900k."""
    return src[idx]


@jax.jit
def rp_sort1(key):
    return jax.lax.sort((key,), num_keys=1)


@jax.jit
def rp_sort2(key, pay):
    return jax.lax.sort((key, pay), num_keys=1)


@jax.jit
def rp_cummax(x):
    return jax.lax.associative_scan(jnp.maximum, x)


@jax.jit
def rp_freqs_cmp(sym):
    """freqs via compare-reduce: (258, 900k) fused compare-sum."""
    return jnp.sum(
        sym[None, :] == jnp.arange(258, dtype=jnp.int32)[:, None],
        axis=1,
        dtype=jnp.int32,
    )


@jax.jit
def rp_hist_onehot(sym3d):
    """chunk hist via compare-reduce: (NSEL, 50) syms vs 258 -> sum over 50."""
    eq = sym3d[:, :, None] == jnp.arange(258, dtype=jnp.int32)[None, None, :]
    return jnp.sum(eq, axis=1, dtype=jnp.int32)


# --- BWT doubling rounds: 2-key (production) vs 4-key (q-ary) ---------------

@jax.jit
def round_2key(rank, r2, idx):
    r1s, r2s, order = jax.lax.sort((rank, r2, idx), num_keys=2)
    flag = jnp.concatenate(
        (
            jnp.zeros(1, jnp.int32),
            ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
        )
    )
    new_sorted = jnp.cumsum(flag)
    _, new_rank = jax.lax.sort((order, new_sorted), num_keys=1)
    return new_rank


@jax.jit
def round_4key(rank, r2, r3, r4, idx):
    a, b, c, d, order = jax.lax.sort((rank, r2, r3, r4, idx), num_keys=4)
    flag = jnp.concatenate(
        (
            jnp.zeros(1, jnp.int32),
            (
                (a[1:] != a[:-1])
                | (b[1:] != b[:-1])
                | (c[1:] != c[:-1])
                | (d[1:] != d[:-1])
            ).astype(jnp.int32),
        )
    )
    new_sorted = jnp.cumsum(flag)
    _, new_rank = jax.lax.sort((order, new_sorted), num_keys=1)
    return new_rank


CASES = []


def case(name, fn, gen):
    CASES.append((name, fn, gen))


def main():
    setup_jax_cache()
    rng = np.random.default_rng(0)

    def fresh_i32(lo, hi, size=N):
        return jnp.asarray(rng.integers(lo, hi, size, dtype=np.int32))

    case("scatter_fill_stamp_900k_to_OUT", sc_fill_stamp,
         lambda: (fresh_i32(0, OUT), fresh_i32(0, 1 << 20)))
    case("scatter_add_900k_to_258", sc_freqs, lambda: (fresh_i32(0, 258),))
    case("scatter_add_900k_to_4.6M", sc_chunk_hist,
         lambda: (fresh_i32(0, NSEL * 258),))
    case("scatter_max_900k_to_ncx256", sc_last_pos,
         lambda: (fresh_i32(0, NC), fresh_i32(0, 256), fresh_i32(0, N)))
    case("scatter_set_900k_to_256", sc_used, lambda: (fresh_i32(0, 256),))
    case("scatter_set_900k_to_8192", sc_hi_pack,
         lambda: (fresh_i32(0, 8192), fresh_i32(0, 1 << 20)))
    case("gather_900k_from_900k", rp_gather,
         lambda: (fresh_i32(0, 1 << 20), fresh_i32(0, N)))
    case("sort1_900k", rp_sort1, lambda: (fresh_i32(0, 1 << 30),))
    case("sort2_900k", rp_sort2,
         lambda: (fresh_i32(0, 1 << 30), fresh_i32(0, N)))
    case("cummax_900k", rp_cummax, lambda: (fresh_i32(0, 1 << 30),))
    case("freqs_compare_reduce", rp_freqs_cmp, lambda: (fresh_i32(0, 258),))
    case("chunk_hist_compare_reduce", rp_hist_onehot,
         lambda: (jnp.asarray(
             rng.integers(0, 258, (NSEL, 50), dtype=np.int32)),))
    case("doubling_round_2key", round_2key,
         lambda: (fresh_i32(0, N), fresh_i32(0, N),
                  jnp.arange(N, dtype=jnp.int32)))
    case("doubling_round_4key", round_4key,
         lambda: (fresh_i32(0, N), fresh_i32(0, N), fresh_i32(0, N),
                  fresh_i32(0, N), jnp.arange(N, dtype=jnp.int32)))

    only = set(sys.argv[1:])
    todo = [c for c in CASES if not only or c[0] in only]

    # AOT-compile everything first (compile service, no chip time)
    for name, fn, gen in todo:
        t0 = time.time()
        fn.lower(*(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in gen())).compile()
        print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}),
              flush=True)

    for name, fn, gen in todo:
        # warm run (executable load), then best-of-5 with fresh inputs
        jax.block_until_ready(fn(*gen()))
        best = 1e9
        for _ in range(5):
            args = gen()
            jax.block_until_ready(args)
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        print(json.dumps({"kernel": name, "ms": round(best * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
