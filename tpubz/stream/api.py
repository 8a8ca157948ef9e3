"""Device-path whole-stream compression API.

Mirrors the host reference stream assembly (tpubz/hostref/stream.py) but
routes every block's O(n) transforms through the jitted device pipeline,
batched `BATCH` blocks per device call (vmapped), with Huffman refinement in
the native C++ engine. Output is byte-identical to the host reference (and
therefore decodable by reference bzip2).

The reference gets block parallelism from a rayon pool + ordered channel
(src/compression/compress.rs:69-132); here batches are processed in block
order so the ordered gather is the natural array order of each batch.
"""
from __future__ import annotations

import os

import numpy as np

from ..format.constants import FOOTER_MAGIC, STREAM_MAGIC, block_budget
from ..format.crc import block_crc, stream_crc_fold
from ..hostref.bitio import BitAccum
from ..hostref.rle1 import rle1_encode, split_blocks

BATCH = int(os.environ.get("TPUBZ_BATCH", "8"))

_setup_done = False


def _setup_jax():
    """Persistent compilation cache: first-compile of the 900k transforms is
    expensive (tens of seconds); cache them across processes."""
    global _setup_done
    if _setup_done:
        return
    import jax

    cache_dir = os.environ.get("TPUBZ_JAX_CACHE", "/root/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    _setup_done = True


_encoders: dict[int, "BatchedEncoder"] = {}


class BatchedEncoder:
    """vmapped device transform over fixed-size block batches."""

    def __init__(self, level: int):
        _setup_jax()
        import jax

        from ..block.encode import DeviceBlockEncoder, _transform

        self.single = DeviceBlockEncoder(level)
        self.N = self.single.N
        self._batched = jax.jit(jax.vmap(_transform))

    def transform_batch(self, blocks: list[np.ndarray]):
        """blocks: list of RLE1 block arrays (possibly fewer than BATCH)."""
        import jax.numpy as jnp

        b = len(blocks)
        data = np.zeros((BATCH, self.N), np.uint8)
        ns = np.ones(BATCH, np.int32)  # dummy lanes carry 1 valid byte
        for i, blk in enumerate(blocks):
            data[i, : blk.size] = blk
            ns[i] = blk.size
        out = self._batched(jnp.asarray(data), jnp.asarray(ns))
        key, syms, rle2_len, freqs, used = (np.asarray(x) for x in out)
        return [
            (int(key[i]), syms[i], int(rle2_len[i]), freqs[i], used[i])
            for i in range(b)
        ]


def _encoder(level: int) -> BatchedEncoder:
    if level not in _encoders:
        _encoders[level] = BatchedEncoder(level)
    return _encoders[level]


def compress(data: bytes | np.ndarray, level: int = 9) -> bytes:
    if not 1 <= level <= 9:
        raise ValueError("level must be 1..9")
    arr = (
        np.frombuffer(data, dtype=np.uint8)
        if isinstance(data, (bytes, bytearray, memoryview))
        else np.asarray(data, dtype=np.uint8)
    )
    enc = _encoder(level)
    from ..block.encode import DeviceBlockEncoder

    acc = BitAccum()
    for b in STREAM_MAGIC:
        acc.put(b, 8)
    acc.put(0x30 + level, 8)
    out, seg_out, seg_in = rle1_encode(arr)
    blocks = split_blocks(out, seg_out, seg_in, block_budget(level))
    s_crc = 0
    for lo in range(0, len(blocks), BATCH):
        group = blocks[lo : lo + BATCH]
        block_arrays = [out[o0:o1] for (o0, o1, _, _) in group]
        results = (
            [enc.single.transform(block_arrays[0])]
            if len(group) == 1
            else enc.transform_batch(block_arrays)
        )
        for (o0, o1, i0, i1), res in zip(group, results):
            if len(group) == 1:
                key, syms, rle2_len, freqs, used = (np.asarray(x) for x in res)
                key, rle2_len = int(key), int(rle2_len)
            else:
                key, syms, rle2_len, freqs, used = res
            crc = block_crc(arr[i0:i1])
            s_crc = stream_crc_fold(s_crc, crc)
            blk = DeviceBlockEncoder.emit_block(key, syms, rle2_len, freqs, used, crc)
            vals, bits = blk.arrays()
            acc.extend(vals, bits)
    acc.put(FOOTER_MAGIC, 48)
    acc.put(s_crc, 32)
    payload, _ = acc.pack()
    return payload
