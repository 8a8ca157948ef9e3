"""Sharded/dist transform measured on the REAL chip (mesh of 1).

VERDICT r3 missing #2: dist/sharded.py had only ever run on the virtual CPU
mesh. This drives make_sharded_transform on a real-device mesh of 1 over
the bench corpus's 8 RLE1 blocks and reports end-to-end route MB/s (upload
+ dispatch + fetch of all five outputs, i.e. what a pod host would pay per
local batch) alongside the in-graph chip time from tools/probe_batch_bwt.py
(16.6 ms/block). Data varies per call (one byte xor'd inside each block)
because this relay dedupes repeated identical dispatches.

Local batch size: TPUBZ_PROBE_B (default 1 — the pod shape, one block per
device). B_local=8 was attempted and is COMPILE-PROHIBITIVE on this
backend: the flat block-namespaced mtf/rle2 batch graph at 8x900k exceeded
a 70-minute compile budget (the vmapped formulation before it exceeded 40
minutes) — so the production sharded config is one-to-few blocks per
device per dispatch, which compiles at single-block op count.
"""
import os
import json
import statistics
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
from tpubz.dist.sharded import block_mesh, make_sharded_transform

setup_jax_cache()

NBLOCKS = 8


def main():
    B = int(os.environ.get("TPUBZ_PROBE_B", "1"))
    level = 9
    N = 2048 * ((block_budget(level) + 2047) // 2048)
    corpus = build_corpus(8)
    arr = np.frombuffer(corpus, np.uint8)
    out, blocks = rle1_blocks(arr, block_budget(level))
    blocks = blocks[:NBLOCKS]
    batch = np.zeros((NBLOCKS, N), np.uint8)
    ns = np.zeros(NBLOCKS, np.int32)
    for i, (o0, o1, _, _) in enumerate(blocks):
        batch[i, : o1 - o0] = out[o0:o1]
        ns[i] = o1 - o0
    raw_bytes = int(ns.sum())

    mesh = block_mesh(jax.devices()[:1])
    fn, _ = make_sharded_transform(mesh, N)

    def sweep(t):
        """One pass over all 8 blocks in groups of B (a pod host's serial
        dispatch cadence at local batch B); returns wall seconds."""
        t0 = time.time()
        for base in range(0, NBLOCKS, B):
            b = batch[base : base + B].copy()
            b[:, 0] ^= t + 1  # defeat relay dispatch dedupe, keep realism
            res = fn(jnp.asarray(b), jnp.asarray(ns[base : base + B]))
            [np.asarray(x) for x in res]
        return time.time() - t0

    t0 = time.time()
    sweep(100)  # compile + warm
    compile_s = time.time() - t0
    ts = [sweep(t) for t in range(5)]
    med = statistics.median(ts)
    print(
        json.dumps(
            {
                "kernel": f"sharded_transform_mesh1_blocal{B}",
                "e2e_ms_per_block": round(med * 1000 / NBLOCKS, 1),
                "route_MBps": round(raw_bytes / med / 1e6, 1),
                "trials_s": [round(t, 3) for t in ts],
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
