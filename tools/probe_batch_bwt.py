"""Real-chip A/B: per-block BWT vs the batched convergence-aware path.

VERDICT r3 item 2: the r3 sharded/batched transform ran all 10 doubling
rounds for every block (skip_converged=False) where the per-block path
early-exits at the data's median ~4 — so the path meant to scale was
~2.5x slower per block. r4 adds skip_converged="batch" (a lax.while_loop
whose vmap batching rule runs until ALL blocks in the batch converge, i.e.
max(active rounds) instead of the fixed 10).

Measurement method: dispatch-level timing is untrustworthy here (the relay
dedupes repeated identical dispatches and pipelines per-call latency away —
PERFORMANCE.md "dispatch-level probes"), so each case chains k DEPENDENT
applications inside ONE jit and reports the k2-k1 marginal. The chained
input is the real block data xor an OPAQUE always-zero mask derived from
the previous application's output (where(acc > 2^30, 1, 0): acc sums keys
and bytes so it stays far below 2^30, but XLA cannot prove that, so the
applications neither constant-fold nor CSE — the first draft used
`acc & 0`, which folded to 0 and let CSE delete every repetition). All
cases process the SAME 8 real bench-corpus blocks (active-round
distribution {1,1,1,4,4,4,6,6}, median 4) so convergence behavior is
production-realistic:

  1. per_block8:  8 single-block bwt_forward(skip_converged=True) calls
  2. batch8_conv: one vmapped call, skip_converged="batch" — vmap lifts the
     while to ALL-done, so the batch pays B x max(rounds)     (48 round-eq)
  3. batch8_fix:  one vmapped call, skip_converged=False     (80 round-eq)
  4. scan8_conv:  lax.map over the batch, skip_converged="batch" — the
     while cond stays SCALAR under scan, so each block exits at its own
     convergence: sum(rounds) = 27 round-eq in one launch     (r4 winner?)
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

from bench import build_corpus
from tpubz.block.encode import setup_jax_cache
from tpubz.format.constants import block_budget
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.kernels.suffix_sort import bwt_forward

setup_jax_cache()

B = 8


def _mask(acc):
    # opaque always-zero uint8 (see module docstring)
    return jnp.where(acc > jnp.int32(1 << 30), jnp.uint8(1), jnp.uint8(0))


def make_per(k):
    @jax.jit
    def f(batch, ns):
        acc = jnp.int32(0)
        for _ in range(k):
            for i in range(B):
                d = batch[i] ^ _mask(acc)
                key, last = bwt_forward(d, ns[i])
                acc = acc + key + last[0].astype(jnp.int32)
        return acc

    return f


def make_batch(k, mode, mapper=jax.vmap):
    @jax.jit
    def f(batch, ns):
        acc = jnp.int32(0)
        for _ in range(k):
            d = batch ^ _mask(acc)
            if mapper is jax.vmap:
                keys, lasts = jax.vmap(
                    lambda x, m: bwt_forward(x, m, skip_converged=mode)
                )(d, ns)
            else:
                keys, lasts = jax.lax.map(
                    lambda a: bwt_forward(a[0], a[1], skip_converged=mode),
                    (d, ns),
                )
            acc = acc + jnp.sum(keys) + jnp.sum(lasts[:, 0].astype(jnp.int32))
        return acc

    return f


def timeit(fn, batch, ns, trials=5):
    t0 = time.time()
    jax.device_get(fn(batch, ns))  # compile+run
    compile_s = time.time() - t0
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(batch, ns))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts), compile_s


def main():
    level = 9
    N = 2048 * ((block_budget(level) + 2047) // 2048)
    corpus = build_corpus(8)
    arr = np.frombuffer(corpus, np.uint8)
    out, blocks = rle1_blocks(arr, block_budget(level))
    blocks = blocks[:B]
    batch = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    for i, (o0, o1, _, _) in enumerate(blocks):
        batch[i, : o1 - o0] = out[o0:o1]
        ns[i] = o1 - o0
    batch_d = jnp.asarray(batch)
    ns_d = jnp.asarray(ns)
    jax.block_until_ready(batch_d)

    cases = (
        ("bwt_scan8_convergence", lambda k: make_batch(k, "batch", jax.lax.map)),
        ("bwt_per_block8", make_per),
        ("bwt_batch8_convergence", lambda k: make_batch(k, "batch")),
        ("bwt_batch8_fixed10", lambda k: make_batch(k, False)),
    )
    for name, mk in cases:
        t1, c1 = timeit(mk(1), batch_d, ns_d)
        t2, c2 = timeit(mk(2), batch_d, ns_d)
        print(
            json.dumps(
                {
                    "kernel": name,
                    "marginal_ms_per_block": round((t2 - t1) / B, 2),
                    "t1_ms": round(t1, 1),
                    "t2_ms": round(t2, 1),
                    "compile_s": [round(c1, 1), round(c2, 1)],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
