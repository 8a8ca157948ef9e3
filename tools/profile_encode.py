"""Steady-state per-block phase profile of the device encode path.

Measures, per block, on the real chip: H2D upload, fused-launch execute,
D2H materialize, and host refine/emit — the four serial claims on the relay
link / host CPU. Run after cache warm (stamp must be current)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_corpus
from tpubz.format.constants import block_budget
from tpubz.format.crc import block_crc
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.block.encode import DeviceBlockEncoder, _transform, materialize, _probe_split_lean as _probe_full

assert _probe_full(), "fused graph not warm"

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
enc = DeviceBlockEncoder(9)
N = enc.N
print(f"{len(blocks)} blocks, N={N}")


def run_block(blk):
    pad = np.zeros(N, np.uint8)
    pad[: blk.size] = blk
    t0 = time.time()
    d = jax.device_put(pad)
    d.block_until_ready()
    t1 = time.time()
    o = _transform(d, jnp.int32(blk.size), lean=True)
    jax.block_until_ready(o)
    t2 = time.time()
    m = materialize(o)
    t3 = time.time()
    return (t1 - t0, t2 - t1, t3 - t2), m


# warm pass
_, m0 = run_block(out[blocks[0][0] : blocks[0][1]])

rows = []
for (o0, o1, i0, i1) in blocks[1:8]:
    blk = out[o0:o1]
    (up, ex, fe), m = run_block(blk)
    t3 = time.time()
    crc = block_crc(arr[i0:i1])
    acc = DeviceBlockEncoder.emit_block(*m, crc)
    t4 = time.time()
    rows.append((up, ex, fe, t4 - t3, m[2]))
    print(
        f"upload {up*1e3:6.1f}  exec {ex*1e3:6.1f}  fetch {fe*1e3:6.1f}"
        f"  refine+emit {(t4-t3)*1e3:6.1f}  rle2_len {m[2]}"
    )

a = np.array([r[:4] for r in rows])
med = np.median(a, axis=0) * 1e3
print(
    f"median: upload {med[0]:.1f}  exec {med[1]:.1f}  fetch {med[2]:.1f}"
    f"  refine+emit {med[3]:.1f}  total {med.sum():.1f} ms/block"
)
print(f"serial-link share (up+exec+fetch): {med[:3].sum():.1f} ms/block "
      f"-> {0.9/ (med[:3].sum()/1e3):.1f} MB/s ceiling at 900k blocks")
