"""What does a SKIPPED (converged) doubling round cost in-graph?

probe_marginal.py measured the bwt stage at 10.5 ms/iter on random data,
which converges at round 1 — so ~7 ms of that is NOT sort work: it's the
other 9 fori_loop iterations whose lax.cond takes the identity branch but
still shuffles the loop carries (two 900k i32 arrays). This probe pins that
by varying ROUNDS on the same converging input, and A/Bs three fixes:

  - fori10 / fori4 / fori1: the production fori_loop at different trips
  - unroll10: Python-unrolled rounds (lets XLA see the whole chain; conds
    remain, carry shuffling disappears)
  - while10: lax.while_loop with the convergence in the loop predicate
    (executes exactly the active rounds; claimed pathological in r2 — the
    claim predates the early-stop rework, re-measured here)

Same dependent-chain + scalar device_get method as probe_marginal.py.
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
from tpubz.kernels.suffix_sort import PAD_RANK

setup_jax_cache()

N = 900096


def bwt_param(data, n, rounds, mode):
    """bwt_forward with a parametrized round count / loop mode."""
    NN = data.shape[0]
    n = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(NN, dtype=jnp.int32)
    valid = idx < n
    nn = jnp.maximum(n, 1)

    def shifted(rank, k):
        kp = jnp.remainder(k, nn)
        a = jnp.roll(rank, -kp)
        b = jnp.roll(rank, nn - kp)
        return jnp.where(idx < nn - kp, a, b)

    def one_round(rank, prev_distinct, k):
        r2 = jnp.where(valid, shifted(rank, k), PAD_RANK)
        r3 = jnp.where(valid, shifted(rank, 2 * k), PAD_RANK)
        r4 = jnp.where(valid, shifted(rank, 3 * k), PAD_RANK)
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
        distinct = new_sorted[nn - 1] + 1
        done_now = (distinct == nn) | (distinct == prev_distinct)

        def write_back():
            _, nr = jax.lax.sort((order, new_sorted), num_keys=1)
            return jnp.where(valid, nr, PAD_RANK)

        new_rank = jax.lax.cond(
            distinct == prev_distinct, lambda: rank, write_back
        )
        return new_rank, distinct, done_now

    d0 = data.astype(jnp.int32)
    rank0 = (d0 << 16) | (shifted(d0, 1) << 8) | shifted(d0, 2)
    rank = jnp.where(valid, rank0, PAD_RANK)

    def body(carry, k_static=None):
        rank, k, done, prevd = carry
        new_rank, newd, done_now = jax.lax.cond(
            done,
            lambda r, p: (r, p, True),
            lambda r, p: one_round(r, p, k),
            rank,
            prevd,
        )
        return (new_rank, k * 4, done | done_now, newd)

    init = (rank, jnp.int32(3), n < 0, jnp.int32(-1) + (rank[0] & 0))

    if mode == "fori":
        rank, _, _, _ = jax.lax.fori_loop(
            0, rounds, lambda i, c: body(c), init
        )
    elif mode == "unroll":
        c = init
        for _ in range(rounds):
            c = body(c)
        rank, _, _, _ = c
    elif mode == "while":
        def cond(c):
            return (~c[2]) & (c[1] < 3 * (4 ** rounds))

        rank, _, _, _ = jax.lax.while_loop(cond, body, init)
    else:
        raise ValueError(mode)

    key = jnp.sum(valid & (rank < rank[0]), dtype=jnp.int32)
    k1 = jnp.where(valid, shifted(rank, 1), PAD_RANK)
    _, last = jax.lax.sort(
        (k1, jnp.where(valid, data, 0).astype(jnp.uint8)), num_keys=1
    )
    return key, last


def timeit(fn, x, n, trials=5):
    jax.device_get(fn(x, n))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(x, n))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts)


def makes(rounds, mode):
    def mk(k):
        @jax.jit
        def f(d, n):
            acc = jnp.int32(0)
            for i in range(k):
                key, last = bwt_param(d, n, rounds, mode)
                acc = acc + key + last[0].astype(jnp.int32)
                d = jnp.bitwise_xor(last, jnp.uint8(i + 1))
            return acc
        return f
    return mk(1), mk(2)


VARIANTS = (
    ("fori10", 10, "fori"),
    ("fori6", 6, "fori"),
    ("fori2", 2, "fori"),
    ("unroll10", 10, "unroll"),
    ("while10", 10, "while"),
)


def main():
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(0)
    rand = jnp.asarray(rng.integers(0, 256, N, dtype=np.uint8))  # 1 active round
    # text-like: 4-ish active rounds (repetitive structure)
    words = rng.integers(97, 123, (512, 6), dtype=np.uint8)
    doc = words[rng.integers(0, 512, N // 6 + 1)].reshape(-1)[:N]
    text = jnp.asarray(doc)
    nv = jnp.int32(N - 96)
    jax.block_until_ready([rand, text])

    fns = {name: makes(rounds, mode) for name, rounds, mode in VARIANTS}
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [
            pool.submit(lambda fn=fn: jax.device_get(fn(rand, nv)))
            for pair in fns.values()
            for fn in pair
        ]
        for f in futs:
            f.result()
    print("warm done", flush=True)

    for dname, data in (("rand", rand), ("text", text)):
        for name, _, _ in VARIANTS:
            f1, f2 = fns[name]
            t1 = timeit(f1, data, nv)
            t2 = timeit(f2, data, nv)
            print(
                f"{dname} {name:12s} t(1)={t1:7.1f}  t(2)={t2:7.1f}  "
                f"marginal={t2 - t1:7.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
