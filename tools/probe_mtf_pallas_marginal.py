"""MTF dominance: jnp vs Pallas, in-graph marginal on the real chip (r4).

VERDICT r3 item 8: the full-chain MTF stages default to the jnp dominance
formulation, which materializes (nc, C, C) boolean tensors in HBM — the
Pallas kernel (kernels/mtf_pallas.py) exists to avoid exactly that. The r2
dispatch-level shootout put Pallas SLOWER (26.5 vs 24.1 ms), but the r3
kernel rewrite changed the stage entirely (17.9 -> 9.3 ms), so the choice
must be re-measured at current HEAD — with the in-graph dependent-chain
method (dispatch-level timing dedupes/pipelines on this relay;
PERFORMANCE.md "Dispatch-level probes"): chain k dependent applications in
one jit, report (t2-t1)/(k2-k1).
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

from tpubz.block.encode import MTF_CHUNK, setup_jax_cache
from tpubz.kernels.mtf import mtf_ranks

setup_jax_cache()

N = 900_096


def make(k, use_pallas):
    @jax.jit
    def f(data, n):
        acc = jnp.int32(0)
        d = data
        for i in range(k):
            ranks, used = mtf_ranks(
                d, n, chunk=MTF_CHUNK, use_pallas=use_pallas
            )
            acc = acc + ranks[0] + used[0].astype(jnp.int32)
            d = (ranks % 256).astype(jnp.uint8) ^ jnp.uint8(i + 1)
        return acc

    return f


def timeit(fn, x, n, trials=5):
    t0 = time.time()
    jax.device_get(fn(x, n))
    compile_s = time.time() - t0
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(x, n))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts), compile_s


def main():
    rng = np.random.default_rng(0)
    # BWT-output-like data (not uniform-random: runs + skew, so dominance
    # row occupancy is realistic)
    d = np.repeat(
        rng.integers(0, 256, N // 4, dtype=np.uint8), 4
    )[:N]
    data = jnp.asarray(d)
    n = jnp.int32(N - 96)
    jax.block_until_ready(data)
    for name, up in (("mtf_jnp", False), ("mtf_pallas", True)):
        try:
            t1, c1 = timeit(make(1, up), data, n)
            t3, c3 = timeit(make(3, up), data, n)
            print(
                json.dumps(
                    {
                        "kernel": name,
                        "marginal_ms": round((t3 - t1) / 2, 2),
                        "t1_ms": round(t1, 1),
                        "t3_ms": round(t3, 1),
                        "compile_s": [round(c1, 1), round(c3, 1)],
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"kernel": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
