"""Probe chip-bound variants of the production encode chain.

1. mtf+rle2c fused into one launch (2-launch chain) vs the 3-launch chain.
2. 8-ary BWT doubling (7 rounds, 9-operand sorts) vs production 4-ary (10).

Measured pipelined (back-to-back async dispatch over 8 real blocks, sync at
the end) — the steady-state number production actually sees.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_corpus
from tpubz.format.constants import block_budget
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.block.encode import (
    MTF_CHUNK,
    DeviceBlockEncoder,
    _stage_bwt,
    _stage_mtf,
    _stage_rle2c,
    setup_jax_cache,
)
from tpubz.kernels.mtf import mtf_ranks
from tpubz.kernels.rle2 import rle2_encode
from tpubz.kernels.suffix_sort import PAD_RANK

setup_jax_cache()
HI_CAP = 8192


@jax.jit
def g_mtf_rle2c(last, n):
    ranks, used = mtf_ranks(last, n, chunk=MTF_CHUNK)
    eob = jnp.sum(used).astype(jnp.int32) + 1
    syms, rle2_len, _ = rle2_encode(ranks, n, eob, with_freqs=False)
    s32 = syms.astype(jnp.int32)
    idx = jnp.arange(s32.shape[0], dtype=jnp.int32)
    is_hi = (s32 >= 256) & (idx < rle2_len - 1)
    hi_key = jnp.where(is_hi, idx, jnp.int32(1 << 30))
    (hi_sorted,) = jax.lax.sort((hi_key,), num_keys=1)
    hi_pos = hi_sorted[:HI_CAP]
    hi_count = jnp.sum(is_hi.astype(jnp.int32))
    syms_u8 = jnp.minimum(s32, 255).astype(jnp.uint8)
    q = syms_u8.reshape(4, -1)
    return rle2_len, (q[0], q[1], q[2], q[3]), hi_pos, hi_count, used


def bwt_forward_8ary(data, n):
    """8-ary doubling: 7 rounds of 8-key sorts (coverage x8 per round)."""
    N = data.shape[0]
    n = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    nn = jnp.maximum(n, 1)

    def shifted(rank, k):
        kp = jnp.remainder(k, nn)
        a = jnp.roll(rank, -kp)
        b = jnp.roll(rank, nn - kp)
        return jnp.where(idx < nn - kp, a, b)

    def one_round(rank, k):
        keys = [rank] + [
            jnp.where(valid, shifted(rank, j * k), PAD_RANK) for j in range(1, 8)
        ]
        out = jax.lax.sort((*keys, idx), num_keys=8)
        order = out[8]
        diff = jnp.zeros(N - 1, jnp.bool_)
        for a in out[:8]:
            diff = diff | (a[1:] != a[:-1])
        flag = jnp.concatenate((jnp.zeros(1, jnp.int32), diff.astype(jnp.int32)))
        new_sorted = jnp.cumsum(flag)
        _, new_rank = jax.lax.sort((order, new_sorted), num_keys=1)
        return jnp.where(valid, new_rank, PAD_RANK)

    d0 = data.astype(jnp.int32)
    rank0 = (d0 << 16) | (shifted(d0, 1) << 8) | shifted(d0, 2)
    rank = jnp.where(valid, rank0, PAD_RANK)

    def body(i, carry):
        rank, k, done = carry
        new_rank = jax.lax.cond(done, lambda r: r, lambda r: one_round(r, k), rank)
        done2 = done | jnp.all(new_rank == rank)
        return new_rank, k * 8, done2

    rank, _, _ = jax.lax.fori_loop(0, 7, body, (rank, jnp.int32(3), n < 0))
    _, sa = jax.lax.sort((rank, idx), num_keys=1)
    key = jnp.argmax((sa == 0) & valid).astype(jnp.int32)
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    last = jnp.where(valid, data[prev], 0).astype(jnp.uint8)
    return key, last


g_bwt8 = jax.jit(bwt_forward_8ary)

enc = DeviceBlockEncoder(9)
N = enc.N
du8 = jax.ShapeDtypeStruct((N,), jnp.uint8)
sn = jax.ShapeDtypeStruct((), jnp.int32)
t0 = time.time()
g_mtf_rle2c.lower(du8, sn).compile()
print(f"mtf_rle2c fused compiled {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
g_bwt8.lower(du8, sn).compile()
print(f"bwt 8-ary compiled {time.time()-t0:.0f}s", flush=True)

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
ds = []
for (o0, o1, _, _) in blocks[:8]:
    pad = np.zeros(N, np.uint8)
    blk = out[o0:o1]
    pad[: blk.size] = blk
    ds.append((jnp.asarray(pad), jnp.int32(blk.size)))
for d, _ in ds:
    d.block_until_ready()


def pipelined(chain, sync_idx):
    rs = [chain(d, n) for d, n in ds]
    for r in rs:
        jax.device_get(r[sync_idx])


def chain3(d, n):
    key, last = _stage_bwt(d, n)
    ranks, used = _stage_mtf(last, n)
    r = _stage_rle2c(ranks, n, used)
    return (key, r[0])


def chain2(d, n):
    key, last = _stage_bwt(d, n)
    r = g_mtf_rle2c(last, n)
    return (key, r[0])


def chain3_bwt8(d, n):
    key, last = g_bwt8(d, n)
    ranks, used = _stage_mtf(last, n)
    r = _stage_rle2c(ranks, n, used)
    return (key, r[0])


for name, chain in (("3-launch", chain3), ("2-launch", chain2),
                    ("3-launch bwt8", chain3_bwt8)):
    pipelined(chain, 1)  # warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        pipelined(chain, 1)
        best = min(best, (time.time() - t0) / len(ds))
    print(f"{name}: {best*1e3:.1f} ms/block pipelined", flush=True)

# correctness spot check for bwt8
for d, n in ds[:3]:
    k1, l1 = _stage_bwt(d, n)
    k8, l8 = g_bwt8(d, n)
    assert int(k1) == int(k8) and bool(jnp.all(l1 == l8)), "bwt8 mismatch!"
print("bwt8 matches production on real blocks", flush=True)
