"""Per-pass cost of a VMEM-resident bitonic compare-exchange (Pallas).

The full 210-pass bitonic kernel (probe_pallas_sort.py) exceeds the remote
Mosaic service's practical compile budget, so this measures the building
block instead: a kernel running the LAST bitonic stage (20 passes, every
XOR distance from 2^19 down to 1) over a 2^20 i32 block held in VMEM, plus
a 2-pass variant to separate fixed kernel overhead. Full-network cost
extrapolates as 210/20 of the stage's marginal pass cost; compare against
lax.sort 1-op (~1.0 ms at this shape = ~4.8 us per bitonic-pass
equivalent).
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


def _shift_neg(x, d, axis):
    if axis == 1:
        return jnp.concatenate((x[:, d:], x[:, :d]), axis=1)
    return jnp.concatenate((x[d:], x[:d]), axis=0)


def _shift_pos(x, d, axis):
    if axis == 1:
        return jnp.concatenate((x[:, C - d :], x[:, : C - d]), axis=1)
    return jnp.concatenate((x[R - d :], x[: R - d]), axis=0)


def _cex(x, d, asc):
    if d < C:
        axis, dd = 1, d
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    else:
        axis, dd = 0, d // C
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    is_a = (pos & dd) == 0
    p = jnp.where(is_a, _shift_neg(x, dd, axis), _shift_pos(x, dd, axis))
    take_min = is_a == asc
    return jnp.where(take_min, jnp.minimum(x, p), jnp.maximum(x, p))


def make_stage_kernel(passes):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        idx = (
            jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        )
        asc = ((idx >> LOG2N) & 1) == 0  # final stage: all ascending
        for j in range(LOG2N - 1, LOG2N - 1 - passes, -1):
            x = _cex(x, 1 << j, asc)
        # a couple of small-distance passes too when passes >= 4 (lane
        # shuffles are the risky direction on TPU)
        if passes >= 4:
            for j in (3, 2, 1, 0):
                x = _cex(x, 1 << j, asc)
        o_ref[...] = x

    @jax.jit
    def run(x):
        # donate the input block: in+out+temps for a 4 MB array otherwise
        # measure 17.88 MB of scoped VMEM vs the 16 MB/core limit
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
        )(x.reshape(R, C)).reshape(N2)

    return run


def timeit(fn, x, trials=5):
    jax.device_get(fn(x))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(x))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts)


def main():
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 1 << 30, N2, dtype=np.int32))
    jax.block_until_ready(xs)

    from concurrent.futures import ThreadPoolExecutor

    k2 = make_stage_kernel(2)     # 2 big-distance passes
    k16 = make_stage_kernel(12)   # 12 big + 4 small = 16 passes
    with ThreadPoolExecutor(2) as pool:
        f1 = pool.submit(lambda: jax.device_get(k2(xs)[0]))
        f2 = pool.submit(lambda: jax.device_get(k16(xs)[0]))
        f1.result(); f2.result()
    print("compiled", flush=True)

    def chain(kern, k):
        @jax.jit
        def f(x):
            acc = jnp.int32(0)
            for i in range(k):
                y = kern(x + i)
                acc = acc + y[0]
                x = y
            return acc
        return f

    for name, kern in (("stage2 (2 passes)", k2), ("stage16 (16 passes)", k16)):
        f1, f3 = chain(kern, 1), chain(kern, 3)
        t1 = timeit(f1, xs)
        t3 = timeit(f3, xs)
        print(f"{name:22s} t(1)={t1:7.1f} t(3)={t3:7.1f} marginal={(t3-t1)/2:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
