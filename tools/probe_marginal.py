"""Definitive in-graph marginal cost of the production stages on the real chip.

Motivation: the dispatch-level probes disagree wildly (mfu_report's pipelined
floor 3.7 ms vs probe_primitives' 0.33 ms; stage pipelined ~20 ms vs
constituent primitives summing <2 ms). Relay-attached async dispatch makes
any per-call timing suspect. This probe is immune to that: each measurement
is ONE jit call whose graph applies the stage k times DEPENDENTLY (output
feeds the next input), ends in a scalar, and is fetched with device_get —
the relay cannot return early or pipeline anything away. marginal ms/stage =
(t(k2) - t(k1)) / (k2 - k1): pure chip exec, all launch/RTT cancels.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpubz.block.encode import MTF_CHUNK, setup_jax_cache
from tpubz.kernels.suffix_sort import bwt_forward
from tpubz.kernels.mtf import mtf_ranks
from tpubz.kernels.rle2 import rle2_encode

setup_jax_cache()

N = 900096


def timeit(fn, x, n, trials=5):
    jax.device_get(fn(x, n))  # compile+run
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(x, n))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts)


def marginal(name, make, ks=(1, 3)):
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, N, dtype=np.uint8))
    n = jnp.int32(N - 96)
    jax.block_until_ready(data)
    t = {k: timeit(make(k), data, n) for k in ks}
    k1, k2 = ks
    marg = (t[k2] - t[k1]) / (k2 - k1)
    print(
        f"{name:28s} t({k1})={t[k1]:7.1f}  t({k2})={t[k2]:7.1f}  "
        f"marginal={marg:7.2f} ms/iter",
        flush=True,
    )
    return marg


def make_bwt(k):
    @jax.jit
    def f(data, n):
        acc = jnp.int32(0)
        d = data
        for i in range(k):
            key, last = bwt_forward(d, n)
            acc = acc + key + last[0].astype(jnp.int32)
            d = jnp.bitwise_xor(last, jnp.uint8(i + 1))  # force dependence
        return acc
    return f


def make_mtf(k):
    @jax.jit
    def f(data, n):
        acc = jnp.int32(0)
        d = data
        for i in range(k):
            ranks, used = mtf_ranks(d, n, chunk=MTF_CHUNK)
            acc = acc + ranks[0] + used[0].astype(jnp.int32)
            d = (ranks % 256).astype(jnp.uint8) ^ jnp.uint8(i + 1)
        return acc
    return f


def make_rle2(k):
    @jax.jit
    def f(data, n):
        acc = jnp.int32(0)
        r = data.astype(jnp.int32)
        for i in range(k):
            syms, rle2_len, _ = rle2_encode(r, n, jnp.int32(200), with_freqs=False)
            acc = acc + syms[0].astype(jnp.int32) + rle2_len
            r = (syms.astype(jnp.int32) % 256) ^ (i + 1)
        return acc
    return f


def make_sort5(k):
    @jax.jit
    def f(data, n):
        x = data.astype(jnp.int32) * 7919 + jnp.arange(N, dtype=jnp.int32)
        idx = jnp.arange(N, dtype=jnp.int32)
        acc = jnp.int32(0)
        for i in range(k):
            a, b, c, d, o = jax.lax.sort(
                (x, x + 1, x + 2, x + 3, idx), num_keys=4
            )
            acc = acc + a[0] + o[0]
            x = d + i
        return acc
    return f


def make_sort2(k):
    @jax.jit
    def f(data, n):
        x = data.astype(jnp.int32) * 7919 + jnp.arange(N, dtype=jnp.int32)
        idx = jnp.arange(N, dtype=jnp.int32)
        acc = jnp.int32(0)
        for i in range(k):
            a, o = jax.lax.sort((x, idx), num_keys=1)
            acc = acc + a[0] + o[0]
            x = a + o + i
        return acc
    return f


def make_cumsum(k):
    @jax.jit
    def f(data, n):
        x = data.astype(jnp.int32)
        acc = jnp.int32(0)
        for i in range(k):
            c = jnp.cumsum(x)
            acc = acc + c[-1]
            x = c % 97
        return acc
    return f


def make_roll_dyn(k):
    @jax.jit
    def f(data, n):
        x = data.astype(jnp.int32)
        acc = jnp.int32(0)
        for i in range(k):
            x = jnp.roll(x, -(n % (i + 2)))
            acc = acc + x[0]
        return acc
    return f


def make_dominance(k):
    nc = N // MTF_CHUNK

    @jax.jit
    def f(data, n):
        x = data.astype(jnp.int32)
        acc = jnp.int32(0)
        for i in range(k):
            m = x.reshape(nc, MTF_CHUNK)
            cnt = jnp.sum(
                m[:, :, None] < m[:, None, :], axis=-1, dtype=jnp.int32
            )
            acc = acc + cnt[0, 0]
            x = cnt.reshape(N) + i
        return acc
    return f


def main():
    marginal("sort2 (key+idx)", make_sort2)
    marginal("sort5 num_keys=4", make_sort5)
    marginal("cumsum 1D", make_cumsum)
    marginal("roll dynamic", make_roll_dyn, ks=(2, 6))
    marginal("dominance (nc,C,C)", make_dominance)
    marginal("STAGE mtf", make_mtf)
    marginal("STAGE rle2", make_rle2)
    marginal("STAGE bwt", make_bwt)


if __name__ == "__main__":
    main()
