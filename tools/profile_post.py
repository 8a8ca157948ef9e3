"""Attribute the lean post-stage compute: MTF vs RLE2+compact, on real data.

AOT-compiles two probe graphs (MTF-only; RLE2+compact-only), then measures
each at steady state with sync via a small-output fetch. Subtract the
~34 ms warm-launch overhead floor (tools/prof_split measurement) to get
per-stage compute.
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
    HI_CAP,
    DeviceBlockEncoder,
    _stage_bwt,
    setup_jax_cache,
)
from tpubz.kernels.mtf import mtf_ranks
from tpubz.kernels.rle2 import rle2_encode

setup_jax_cache()


@jax.jit
def g_mtf(last, n):
    return mtf_ranks(last, n, chunk=MTF_CHUNK)


@jax.jit
def g_rle2(ranks, n, used):
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
    return rle2_len, (q[0], q[1], q[2], q[3]), hi_pos, hi_count


enc = DeviceBlockEncoder(9)
N = enc.N
t0 = time.time()
g_mtf.lower(
    jax.ShapeDtypeStruct((N,), jnp.uint8), jax.ShapeDtypeStruct((), jnp.int32)
).compile()
print(f"mtf compiled {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
g_rle2.lower(
    jax.ShapeDtypeStruct((N,), jnp.int32),
    jax.ShapeDtypeStruct((), jnp.int32),
    jax.ShapeDtypeStruct((256,), jnp.bool_),
).compile()
print(f"rle2 compiled {time.time()-t0:.0f}s", flush=True)

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))


def run(blk):
    pad = np.zeros(N, np.uint8)
    pad[: blk.size] = blk
    d = jnp.asarray(pad)
    d.block_until_ready()
    nn = jnp.int32(blk.size)
    key, last = _stage_bwt(d, nn)
    int(jax.device_get(key))  # sync
    t0 = time.time()
    ranks, used = g_mtf(last, nn)
    jax.device_get(used)  # small sync fetch
    t1 = time.time()
    r = g_rle2(ranks, nn, used)
    int(jax.device_get(r[0]))
    t2 = time.time()
    return t1 - t0, t2 - t1


run(out[blocks[0][0] : blocks[0][1]])
rows = []
for (o0, o1, i0, i1) in blocks[1:8]:
    m, r = run(out[o0:o1])
    rows.append((m, r))
    print(f"mtf {m*1e3:7.1f}  rle2+compact {r*1e3:7.1f}", flush=True)
a = np.median(np.array(rows), axis=0) * 1e3
print(f"median: mtf {a[0]:.1f}  rle2+compact {a[1]:.1f}  (minus ~34ms launch floor each)")
