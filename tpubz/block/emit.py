"""Host block emission — deliberately JAX-free.

The emission half of the block pipeline (Huffman refinement dispatch +
header/payload bit packing, reference compress_block.rs:24-66 framing +
huffman.rs:207-466 emission) has no device content: it consumes transform
outputs as plain numpy arrays whether they came from the device pipeline,
the native CPU engine, or the numpy oracle. Keeping it out of
block/encode.py (which imports jax at module scope for the jitted
transforms) lets the CPU-only paths — tiny streams, accelerator-free
hosts, the streaming file API — run without ever importing jax (~2 s and
a backend init saved per process).
"""
from __future__ import annotations

import numpy as np

from ..format.constants import BLOCK_MAGIC
from ..hostref.bitio import BitAccum
from ..hostref.huffman import huffman_emit, refine_stream


def emit_block(key, syms, rle2_len, freqs, used, crc) -> BitAccum:
    """Host emission from (possibly batched-and-sliced) device outputs.

    Fast path: the ENTIRE emission (refinement, headers, payload, packing)
    is one GIL-free native call (native/emit.cpp) — emission was the last
    GIL-holding leg of the per-block hot path and serialized the worker
    pool on the interpreter. The Python path below is byte-identical
    (cross-checked in tests) and remains the no-toolchain fallback."""
    from ..format.constants import huffman_iters
    from ..native import emit_block_native

    nat = emit_block_native(
        int(key), int(crc), syms[:rle2_len], used, huffman_iters()
    )
    if nat is not None:
        data, nbits = nat
        acc = BitAccum()
        acc.put_bytes(data, nbits)
        return acc
    rle2 = syms[:rle2_len].astype(np.int64)
    alpha = int(used.sum()) + 2
    selectors, lengths, table_count = refine_stream(
        rle2, freqs.astype(np.int64), alpha
    )
    acc = BitAccum()
    acc.put(BLOCK_MAGIC, 48)
    acc.put(crc, 32)
    acc.put(0, 1)
    acc.put(int(key), 24)
    huffman_emit(acc, rle2, used, selectors, lengths, table_count)
    return acc
