"""Decide the device-decode leg with data (VERDICT r3 item 4).

The per-block device ibwt (kernels/ibwt.py) is ~20 sequential host-driven
device round trips per block — unusable on any rig with launch latency. The
only candidate that could win is a BATCHED in-graph design: stack the
next-pointer builds for B blocks, then run the log2(n) pointer-doubling in
ONE graph over [B, N] (fori_loop, no per-step host RTT).

Every doubling step is one [B, N] random gather (positions[k:2k] =
jump^k(positions[:k]) needs jump composed with itself: jump = jump[jump]
plus one application to the growing prefix — at minimum ONE full-width
gather per step). This probe measures exactly that chained gather loop
in-graph (dependent applications, opaque non-foldable mask, k2-k1
marginal), which LOWER-BOUNDS any batched ibwt: if 20 chained [8, 900k]
gathers already cost more than the native 16-way segmented chase decodes 8
whole blocks (~15-25 ms/block for the FULL decode incl. Huffman), the
device leg loses and TPUBZ_DEVICE_IBWT gets deleted with this probe as the
record.

(r3 context: a single 900k in-graph gather measured 6.9 ms — 6-7x a full
900k 2-op SORT — so the expectation is a decisive negative; this probe
exists to close the item with chip data rather than extrapolation.)
"""
import json
import statistics
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from tpubz.block.encode import setup_jax_cache

setup_jax_cache()

B = 8
N = 900_096
STEPS = 20  # ceil(log2(900k))


def make(k):
    @jax.jit
    def f(jump0):
        acc = jnp.int32(0)
        jump = jump0
        for _ in range(k):
            jump = jump ^ jnp.where(
                acc > jnp.int32(1 << 30), jnp.int32(1), jnp.int32(0)
            )

            def body(_, j):
                return jnp.take_along_axis(j, j, axis=1)

            jump = jax.lax.fori_loop(0, STEPS, body, jump)
            acc = acc + jump[0, 0]
        return acc

    return f


def timeit(fn, x, trials=5):
    t0 = time.time()
    jax.device_get(fn(x))
    compile_s = time.time() - t0
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(x))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts), compile_s


def main():
    rng = np.random.default_rng(0)
    # a single cycle per row: realistic worst-locality permutation, like a
    # BWT next-pointer orbit
    jump = np.empty((B, N), np.int32)
    for b in range(B):
        p = rng.permutation(N).astype(np.int32)
        nxt = np.empty(N, np.int32)
        nxt[p] = np.roll(p, -1)
        jump[b] = nxt
    x = jnp.asarray(jump)
    jax.block_until_ready(x)

    t1, c1 = timeit(make(1), x)
    t2, c2 = timeit(make(2), x)
    marg = t2 - t1
    print(
        json.dumps(
            {
                "kernel": f"ibwt_doubling_{STEPS}x_gather[{B},{N}]",
                "marginal_ms_per_loop": round(marg, 1),
                "ms_per_block": round(marg / B, 2),
                "ms_per_gather_row": round(marg / B / STEPS, 2),
                "t1_ms": round(t1, 1),
                "t2_ms": round(t2, 1),
                "compile_s": [round(c1, 1), round(c2, 1)],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
