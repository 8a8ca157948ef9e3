"""Per-phase profile of the native CPU encode engine (tpubz/native/bwt.cpp).

Times, per 900k block of the bench corpus: the full native block transform
(BWT+MTF+RLE2), the BWT alone, MTF+RLE2 alone, and refinement+emission —
the phases a CPU-engine optimization must target.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_corpus
from tpubz.format.constants import block_budget
from tpubz.format.crc import block_crc
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.native import get_lib, block_transform_native, bwt_native
from tpubz.block.encode import DeviceBlockEncoder

assert get_lib() is not None

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
print(f"{len(blocks)} blocks")

tot = {"bwt": [], "mtf_rle2": [], "refine_emit": [], "full": []}
for o0, o1, i0, i1 in blocks:
    blk = out[o0:o1]
    t0 = time.time()
    key_last = bwt_native(blk)
    t1 = time.time()
    res = block_transform_native(blk)
    t2 = time.time()
    key, rle2, freqs, used = res
    crc = block_crc(arr[i0:i1])
    t3 = time.time()
    DeviceBlockEncoder.emit_block(key, rle2, rle2.size, freqs, used, crc)
    t4 = time.time()
    tot["bwt"].append(t1 - t0)
    tot["full"].append(t2 - t1)
    tot["mtf_rle2"].append((t2 - t1) - (t1 - t0))
    tot["refine_emit"].append(t4 - t3)
    print(
        f"bwt {1e3*(t1-t0):6.1f}  full-transform {1e3*(t2-t1):6.1f}  "
        f"(mtf+rle2 ~{1e3*((t2-t1)-(t1-t0)):6.1f})  refine+emit {1e3*(t4-t3):6.1f}"
    )

med = {k: sorted(v)[len(v) // 2] * 1e3 for k, v in tot.items()}
print(
    f"median: bwt {med['bwt']:.1f}  mtf+rle2 {med['mtf_rle2']:.1f}  "
    f"refine+emit {med['refine_emit']:.1f}  per-block total "
    f"{med['full']+med['refine_emit']:.1f} ms -> "
    f"{0.9/(med['full']+med['refine_emit'])*1e3:.1f} MB/s/thread"
)
