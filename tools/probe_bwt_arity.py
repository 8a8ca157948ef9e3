"""4-ary vs 8-ary prefix doubling at the NEW (r3) kernel structure.

r2 measured arity/packing variants as washes — but that was when launch and
gather overhead dominated the stage. After the r3 rewrites the doubling
sorts ARE the majority of bwt time (~3 ms/active round), so fewer rounds is
worth re-measuring: 8-ary covers 3*8^r after r rounds (7 rounds max vs 10),
at the price of a 9-operand sort per round. Same dependent-chain +
scalar-device_get method as the other r3 probes; text-like data is the case
that matters (random converges in 1 round either way).
"""
import statistics
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpubz.block.encode import setup_jax_cache
from tpubz.kernels.suffix_sort import PAD_RANK, bwt_forward

setup_jax_cache()

N = 900096


def bwt_ary(data, n, arity, rounds):
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
        ops = [rank] + [
            jnp.where(valid, shifted(rank, j * k), PAD_RANK)
            for j in range(1, arity)
        ]
        out = jax.lax.sort(tuple(ops) + (idx,), num_keys=arity)
        order = out[-1]
        keys = out[:-1]
        diff = keys[0][1:] != keys[0][:-1]
        for kk in keys[1:]:
            diff = diff | (kk[1:] != kk[:-1])
        flag = jnp.concatenate(
            (jnp.zeros(1, jnp.int32), diff.astype(jnp.int32))
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

    def body(i, carry):
        rank, k, done, prevd = carry
        new_rank, newd, done_now = jax.lax.cond(
            done,
            lambda r, p: (r, p, True),
            lambda r, p: one_round(r, p, k),
            rank,
            prevd,
        )
        return (new_rank, k * arity, done | done_now, newd)

    rank, _, _, _ = jax.lax.fori_loop(
        0, rounds, body, (rank, jnp.int32(3), n < 0, jnp.int32(-1) + (rank[0] & 0))
    )
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


def makes(arity, rounds):
    def mk(k):
        @jax.jit
        def f(d, n):
            acc = jnp.int32(0)
            for i in range(k):
                key, last = bwt_ary(d, n, arity, rounds)
                acc = acc + key + last[0].astype(jnp.int32)
                d = jnp.bitwise_xor(last, jnp.uint8(i + 1))
            return acc
        return f
    return mk(1), mk(2)


VARIANTS = (("4ary", 4, 10), ("6ary", 6, 9), ("8ary", 8, 7))


def main():
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(0)
    words = rng.integers(97, 123, (512, 6), dtype=np.uint8)
    doc = words[rng.integers(0, 512, N // 6 + 1)].reshape(-1)[:N]
    text = jnp.asarray(doc)
    rand = jnp.asarray(rng.integers(0, 256, N, dtype=np.uint8))
    nv = jnp.int32(N - 96)
    jax.block_until_ready([text, rand])

    # correctness cross-check on a small case vs the production kernel
    small = jnp.asarray(
        np.frombuffer((b"banana bandana bazaar " * 400)[:8192], np.uint8)
    )
    sn = jnp.int32(8000)
    ref = jax.device_get(jax.jit(bwt_forward)(small, sn))
    for name, arity, rounds in VARIANTS:
        got = jax.device_get(
            jax.jit(lambda d, n, a=arity, r=rounds: bwt_ary(d, n, a, r))(small, sn)
        )
        ok = int(ref[0]) == int(got[0]) and bool((ref[1] == got[1]).all())
        print(f"{name} small-case match: {ok}", flush=True)

    fns = {name: makes(a, r) for name, a, r in VARIANTS}
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [
            pool.submit(lambda fn=fn: jax.device_get(fn(text, nv)))
            for pair in fns.values()
            for fn in pair
        ]
        for f in futs:
            f.result()
    print("warm done", flush=True)

    for dname, data in (("text", text), ("rand", rand)):
        for name, _, _ in VARIANTS:
            f1, f2 = fns[name]
            t1 = timeit(f1, data, nv)
            t2 = timeit(f2, data, nv)
            print(
                f"{dname} {name:6s} t(1)={t1:7.1f}  t(2)={t2:7.1f}  "
                f"marginal={t2 - t1:7.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
