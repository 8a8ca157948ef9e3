"""Per-pass cost of a VMEM-resident bitonic compare-exchange (Pallas).

The full 210-pass bitonic kernel (probe_pallas_sort.py) exceeds the remote
Mosaic service's practical compile budget, so this measures the building
block instead. r4 rewrite: the original concat-shift formulation
materialized BOTH shifted copies per pass and OOM'd scoped VMEM at 16
passes (17.88M > 16M); this version uses the reshape/pair formulation —
view (R, C) as (R/2d, 2, d, C) for row-space distances so a pass is one
min + one max over the two halves, no full-array shifted temps — and
measures row-space (d >= C) and lane-space (d < C) passes separately,
since lane shuffles are the risky direction on TPU.

Compare against lax.sort 1-op (~1.0 ms at this shape): a full 2^20 network
is 210 passes (155 lane + 55 row in the (1024, 1024) layout), so parity
needs ~4.8 us/pass.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpubz.block.encode import setup_jax_cache

setup_jax_cache()

LOG2N = 20
N2 = 1 << LOG2N
R, C = 1024, 1024
LOG2C = 10


def _cex_row(x, j, k):
    """Compare-exchange at row distance d = 2^(j-LOG2C) (j >= LOG2C), asc
    by bit k of the linear index. Pair view: (R/2d, 2, d, C)."""
    dd = 1 << (j - LOG2C)
    o = R // (2 * dd)
    v = x.reshape(o, 2, dd, C)
    lo = jnp.minimum(v[:, 0], v[:, 1])
    hi = jnp.maximum(v[:, 0], v[:, 1])
    if k >= LOG2N:
        return jnp.stack((lo, hi), axis=1).reshape(R, C)
    # asc = bit k of linear index = bit (k - LOG2C) of row = bit
    # (k - LOG2C - (j - LOG2C + 1)) of the outer index o
    ob = k - j - 1
    oi = jax.lax.broadcasted_iota(jnp.int32, (o, 1, 1), 0)
    asc = (oi >> ob) & 1 == 0
    a = jnp.where(asc, lo, hi)
    b = jnp.where(asc, hi, lo)
    return jnp.stack((a, b), axis=1).reshape(R, C)


def _cex_lane(x, j, k):
    """Compare-exchange at lane distance d = 2^j (j < LOG2C), asc by bit k.
    Pair view splits the LANE dim: (R, C/2d, 2, d)."""
    dd = 1 << j
    o = C // (2 * dd)
    v = x.reshape(R, o, 2, dd)
    lo = jnp.minimum(v[:, :, 0], v[:, :, 1])
    hi = jnp.maximum(v[:, :, 0], v[:, :, 1])
    if k >= LOG2N:
        return jnp.stack((lo, hi), axis=2).reshape(R, C)
    if k >= LOG2C:
        rb = k - LOG2C
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
        asc = (ri >> rb) & 1 == 0
    else:
        ob = k - j - 1
        oi = jax.lax.broadcasted_iota(jnp.int32, (1, o, 1), 1)
        asc = (oi >> ob) & 1 == 0
    a = jnp.where(asc, lo, hi)
    b = jnp.where(asc, hi, lo)
    return jnp.stack((a, b), axis=2).reshape(R, C)


def make_stage_kernel(js, mode):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for j in js:
            x = (_cex_row if mode == "row" else _cex_lane)(x, j, LOG2N)
        o_ref[...] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
        )(x.reshape(R, C)).reshape(N2)

    return run


def timeit(fn, x, trials=5):
    """Vary the input VALUE per trial: this relay dedupes repeated
    identical dispatches, so timing the same (fn, x) five times measures
    one execution and four cache hits (the r4 first run of this probe read
    a NEGATIVE 8-pass marginal that way)."""
    jax.device_get(fn(x))
    ts = []
    for t in range(trials):
        xt = x + jnp.int32(t + 1)
        jax.block_until_ready(xt)
        t0 = time.time()
        jax.device_get(fn(xt))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts)


def main():
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 1 << 30, N2, dtype=np.int32))
    jax.block_until_ready(xs)

    cases = {
        "row2": make_stage_kernel([19, 18], "row"),
        "row8": make_stage_kernel([19, 18, 17, 16, 15, 14, 13, 12], "row"),
        "lane2": make_stage_kernel([9, 8], "lane"),
        "lane8": make_stage_kernel([9, 8, 7, 6, 5, 4, 3, 2], "lane"),
    }
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(4) as pool:
        futs = {
            n: pool.submit(lambda f=f: jax.device_get(f(xs)[0]))
            for n, f in cases.items()
        }
        for n, f in futs.items():
            try:
                f.result()
                print(f"{n}: compiled", flush=True)
            except Exception as e:
                print(f"{n}: FAILED {str(e)[:300]}", flush=True)
                cases[n] = None

    def chain(kern, kk):
        @jax.jit
        def f(x):
            acc = jnp.int32(0)
            for i in range(kk):
                y = kern(x + i)
                acc = acc + y[0]
                x = y
            return acc
        return f

    # deep chains: a single pass costs ~0.1 ms, far below the ~±3 ms RTT
    # noise of one call — k=25 puts 24 extra kernel applications in the
    # graph so the marginal rises well clear of the noise floor
    K2 = 25
    for name, kern in cases.items():
        if kern is None:
            continue
        f1, fk = chain(kern, 1), chain(kern, K2)
        t1 = timeit(f1, xs)
        tk = timeit(fk, xs)
        npass = {"row2": 2, "row8": 8, "lane2": 2, "lane8": 8}[name]
        marg = (tk - t1) / (K2 - 1)
        print(
            f"{name:8s} t(1)={t1:7.1f} t({K2})={tk:7.1f}"
            f" marginal={marg:7.2f} ms/app = {marg / npass * 1000:6.0f}"
            f" us/pass",
            flush=True,
        )


if __name__ == "__main__":
    main()
