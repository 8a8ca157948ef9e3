"""Primitive-level cost decomposition at the 900k shape on the real chip.

The MFU report (tools/mfu_report.py) shows every production stage at 0.3-1.5%
of HBM peak — neither bandwidth- nor compute-bound. This probe times the
individual primitives the stages are built from, so optimization targets the
actual cost (XLA sort? 1D cumsum lowering? the 900k scatter stamp? the
(nc,257) scatter-max?) instead of folklore.

Each primitive is wrapped in its own jit with a trivial consumer (sum) so
XLA can't DCE it; timings are pipelined x8 medians minus the pipelined
trivial-launch floor.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpubz.block.encode import setup_jax_cache

setup_jax_cache()

N = 900096
NC = N // 256


def bench(name, fn, args_list, trials=5):
    fn(*args_list[0]).block_until_ready()  # compile
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.block_until_ready([fn(*a) for a in args_list])
        ts.append((time.time() - t0) / len(args_list) * 1000)
    med = statistics.median(ts)
    print(f"{name:34s} {med:7.2f} ms", flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32)) for _ in range(8)]
    perms = [jnp.asarray(rng.permutation(N).astype(np.int32)) for _ in range(8)]
    flags = [jnp.asarray(rng.integers(0, 2, N, dtype=np.int32)) for _ in range(8)]
    jax.block_until_ready(xs + perms + flags)
    one = [(x,) for x in xs]
    two = list(zip(xs, perms))
    three = list(zip(xs, perms, flags))

    floor = bench("trivial (x+1)", jax.jit(lambda x: x + 1), one)

    bench("sort 1op", jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)[0]), one)
    bench(
        "sort 2op (key+payload)",
        jax.jit(lambda x, p: jax.lax.sort((x, p), num_keys=1)[1]),
        two,
    )
    bench(
        "sort 5op num_keys=4",
        jax.jit(
            lambda x, p, f: jax.lax.sort(
                (x, p, f, x + 1, p + 1), num_keys=4
            )[4]
        ),
        three,
    )
    bench(
        "sort 2op unstable",
        jax.jit(
            lambda x, p: jax.lax.sort((x, p), num_keys=1, is_stable=False)[1]
        ),
        two,
    )
    bench("cumsum 1D i32", jax.jit(lambda x: jnp.cumsum(x)), one)
    bench(
        "cumsum 2D two-level",
        jax.jit(
            lambda x: (
                lambda c2: (
                    c2
                    + jnp.concatenate(
                        (jnp.zeros((1,), jnp.int32), jnp.cumsum(c2[:, -1])[:-1])
                    )[:, None]
                ).reshape(N)
            )(jnp.cumsum(x.reshape(1024, N // 1024), axis=1))
        ),
        one,
    )
    bench(
        "assoc_scan max 1D",
        jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x)),
        one,
    )
    bench(
        "scatter set 900k->900k",
        jax.jit(
            lambda x, p: jnp.zeros(N, jnp.int32).at[p].set(x, mode="drop")
        ),
        two,
    )
    bench(
        "scatter-max 900k->(nc,257)",
        jax.jit(
            lambda x, p: jnp.full((NC, 257), -1, jnp.int32)
            .at[p % NC, p % 257]
            .max(x, mode="drop")
        ),
        two,
    )
    bench(
        "gather 900k standalone",
        jax.jit(lambda x, p: x[p]),
        two,
    )
    bench("roll dynamic", jax.jit(lambda x, p: jnp.roll(x, p[0])), two)
    bench(
        "dominance reduce (nc,256,256)",
        jax.jit(
            lambda x: jnp.sum(
                x.reshape(NC, 256)[:, :, None] < x.reshape(NC, 256)[:, None, :],
                axis=-1,
                dtype=jnp.int32,
            )
        ),
        one,
    )
    print(f"(floor to subtract: {floor:.2f} ms)")


if __name__ == "__main__":
    main()
