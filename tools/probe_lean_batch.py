"""Probe: does the vmapped LEAN transform compile and execute well at B>1?

The round-1 batched fused graph was rejected because the scatter-heavy
MTF/RLE2 formulations exploded at compile time (vmap) or ran ~5x slower
(flat). The lean kernels have one scatter each — this probe AOT-compiles
the vmapped lean graph at B=4 and measures steady-state exec on real data.
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
from tpubz.block.encode import MTF_CHUNK, HI_CAP, DeviceBlockEncoder, setup_jax_cache
from tpubz.kernels.mtf import mtf_ranks
from tpubz.kernels.rle2 import rle2_encode
from tpubz.kernels.suffix_sort import bwt_forward

setup_jax_cache()
B = int(os.environ.get("PROBE_B", "4"))


@jax.jit
def lean_b(data, n):
    def one(d, m):
        key, last = bwt_forward(d, m, skip_converged=False)
        ranks, used = mtf_ranks(last, m, chunk=MTF_CHUNK)
        eob = jnp.sum(used).astype(jnp.int32) + 1
        syms, rle2_len, _ = rle2_encode(ranks, m, eob, with_freqs=False)
        s32 = syms.astype(jnp.int32)
        idx = jnp.arange(s32.shape[0], dtype=jnp.int32)
        is_hi = (s32 >= 256) & (idx < rle2_len - 1)
        hi_key = jnp.where(is_hi, idx, jnp.int32(1 << 30))
        (hi_sorted,) = jax.lax.sort((hi_key,), num_keys=1)
        hi_pos = hi_sorted[:HI_CAP]
        hi_count = jnp.sum(is_hi.astype(jnp.int32))
        syms_u8 = jnp.minimum(s32, 255).astype(jnp.uint8)
        return key, rle2_len, used, syms_u8, hi_pos, hi_count

    return jax.vmap(one)(data, n)


enc = DeviceBlockEncoder(9)
N = enc.N
t0 = time.time()
lean_b.lower(
    jax.ShapeDtypeStruct((B, N), jnp.uint8),
    jax.ShapeDtypeStruct((B,), jnp.int32),
).compile()
print(f"lean_b B={B} compiled {time.time()-t0:.0f}s", flush=True)

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
groups = [blocks[i : i + B] for i in range(0, len(blocks) - B + 1, B)]


def run(group):
    pad = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    for i, (o0, o1, _, _) in enumerate(group):
        blk = out[o0:o1]
        pad[i, : blk.size] = blk
        ns[i] = blk.size
    d = jnp.asarray(pad)
    d.block_until_ready()
    t0 = time.time()
    r = lean_b(d, jnp.asarray(ns))
    jax.device_get(r[1])  # sync via small output
    t1 = time.time()
    u8 = jax.device_get(r[3])
    t2 = time.time()
    return t1 - t0, t2 - t1


run(groups[0])
rows = []
for g in groups[:4]:
    ex, fe = run(g)
    rows.append((ex, fe))
    print(f"exec {ex*1e3:7.1f}  fetch(all u8) {fe*1e3:7.1f}  (/{B} blocks)", flush=True)
a = np.median(np.array(rows), axis=0) * 1e3
print(f"median per-batch: exec {a[0]:.1f}  fetch {a[1]:.1f} -> per-block exec {a[0]/B:.1f} ms")
