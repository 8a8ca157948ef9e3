"""A/B the production 3-launch chain against a no-cond rle2c variant.

After cond-gating the hi-symbol extraction sort in _stage_rle2c, bench
encode dropped from ~14 to ~9-10 MB/s while decode (pure host) held its
band — suspect the HLO conditional breaks the relay's async launch
pipelining. This probe times the exact production chain vs the same chain
with the pre-cond rle2c body, pipelined over 8 real blocks.
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
    HI_CAP,
    MTF_CHUNK,
    DeviceBlockEncoder,
    _stage_bwt,
    _stage_mtf,
    _stage_rle2c,
    setup_jax_cache,
)
from tpubz.kernels.rle2 import rle2_encode

setup_jax_cache()


@jax.jit
def rle2c_nocond(ranks, n, used):
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
    return rle2_len, (q[0], q[1], q[2], q[3]), hi_pos, hi_count, syms


def fetch(out):
    rle2_len, quarters, hi_pos, hi_count, _ = out
    rl = int(jax.device_get(rle2_len))
    ql = quarters[0].shape[0]
    need = min(4, (rl + ql - 1) // ql)
    jax.device_get((quarters[:need], hi_pos[:64], hi_count))


def main():
    enc = DeviceBlockEncoder(9)
    N = enc.N
    t0 = time.time()
    rle2c_nocond.lower(
        jax.ShapeDtypeStruct((N,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((256,), jnp.bool_),
    ).compile()
    print(f"nocond compiled {time.time()-t0:.0f}s", flush=True)

    corpus = build_corpus(8)
    arr = np.frombuffer(corpus, np.uint8)
    out, blocks = rle1_blocks(arr, block_budget(9))
    pads = []
    for (o0, o1, _, _) in blocks[:8]:
        pad = np.zeros(N, np.uint8)
        blk = out[o0:o1]
        pad[: blk.size] = blk
        pads.append((jnp.asarray(pad), jnp.int32(blk.size)))
    for d, _ in pads:
        d.block_until_ready()

    def chain(rle2c_fn, d, n):
        key, last = _stage_bwt(d, n)
        ranks, used = _stage_mtf(last, n)
        return key, rle2c_fn(ranks, n, used)

    for fn, nm in ((_stage_rle2c, "cond"), (rle2c_nocond, "nocond")):
        outs = [chain(fn, d, n) for d, n in pads]
        for k, o in outs:
            fetch(o)
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            outs = [chain(fn, d, n) for d, n in pads]
            for k, o in outs:
                fetch(o)
            best = min(best, (time.time() - t0) / len(pads))
        print(f"chain[{nm}]: {best*1e3:.1f} ms/block pipelined", flush=True)


if __name__ == "__main__":
    main()
