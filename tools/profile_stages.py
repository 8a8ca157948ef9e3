"""Split the fused exec time: BWT launch vs post (MTF+RLE2+compact+hist)."""
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
from tpubz.block.encode import DeviceBlockEncoder, _stage_bwt, _stage_post

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
enc = DeviceBlockEncoder(9)
N = enc.N


def run(blk):
    pad = np.zeros(N, np.uint8)
    pad[: blk.size] = blk
    d = jnp.asarray(pad)
    d.block_until_ready()
    nn = jnp.int32(blk.size)
    t0 = time.time()
    key, last = _stage_bwt(d, nn)
    jax.block_until_ready((key, last))
    t1 = time.time()
    post = _stage_post(last, nn)
    jax.block_until_ready(post)
    t2 = time.time()
    return t1 - t0, t2 - t1


run(out[blocks[0][0] : blocks[0][1]])  # warm
rows = []
for (o0, o1, i0, i1) in blocks[1:8]:
    bw, po = run(out[o0:o1])
    rows.append((bw, po))
    print(f"bwt {bw*1e3:7.1f}  post {po*1e3:7.1f}")
a = np.median(np.array(rows), axis=0) * 1e3
print(f"median: bwt {a[0]:.1f}  post {a[1]:.1f}")
