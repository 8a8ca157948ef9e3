"""Device-path whole-stream compression API.

Mirrors the host reference stream assembly (tpubz/hostref/stream.py) but
routes every block's O(n) transforms through the jitted device pipeline,
with Huffman refinement in the native C++ engine. Output is byte-identical
to the host reference (and therefore decodable by reference bzip2).

Parallelism: the reference overlaps block compression via a rayon pool with
an ordered channel fan-in (src/compression/compress.rs:69-132). Here JAX's
async dispatch gives the same overlap with no extra machinery: device
transforms for a sliding window of upcoming blocks are enqueued ahead while
the host refines/emits earlier blocks, and results are drained in block
order — the ordered gather is just the drain order.
"""
from __future__ import annotations

import logging
import os
from collections import deque

import numpy as np

log = logging.getLogger("tpubz")

from ..format.constants import FOOTER_MAGIC, STREAM_MAGIC, block_budget
from ..format.crc import block_crc, stream_crc_fold
from ..hostref.bitio import BitAccum
from ..hostref.rle1 import rle1_blocks

WINDOW = int(os.environ.get("TPUBZ_WINDOW", "16"))

_encoders: dict[int, object] = {}


class _HostFallbackEncoder:
    """Drop-in for DeviceBlockEncoder when no accelerator backend can
    initialize (e.g. the TPU is claimed by another process): runs the host
    reference block pipeline, preserving the same output bytes."""

    def __init__(self, level: int):
        self.level = level

    def encode_block(self, rle1_block, crc):
        from ..hostref.block import encode_block

        return encode_block(rle1_block, crc)


def _encoder(level: int):
    if level not in _encoders:
        try:
            from ..block.encode import DeviceBlockEncoder

            enc = DeviceBlockEncoder(level)
            # force backend init now so failure falls back cleanly
            import jax

            jax.devices()
            _encoders[level] = enc
        except Exception:
            _encoders[level] = _HostFallbackEncoder(level)
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
    from concurrent.futures import ThreadPoolExecutor

    from ..block.encode import DeviceBlockEncoder, materialize

    acc = BitAccum()
    for b in STREAM_MAGIC:
        acc.put(b, 8)
    acc.put(0x30 + level, 8)
    out, blocks = rle1_blocks(arr, block_budget(level))
    s_crc = 0
    inflight: deque = deque()
    # device->host fetches run on a side thread (device_get releases the
    # GIL) so each block's transfer overlaps the previous block's emission
    fetch_pool = ThreadPoolExecutor(2)

    def drain_one():
        nonlocal s_crc
        (i0, i1), mat_fut = inflight.popleft()
        key, syms, rle2_len, freqs, used = mat_fut.result()
        crc = block_crc(arr[i0:i1])
        s_crc = stream_crc_fold(s_crc, crc)
        blk = DeviceBlockEncoder.emit_block(
            key, syms, rle2_len, freqs, used, crc
        )
        vals, bits = blk.arrays()
        acc.extend(vals, bits)

    try:
        if isinstance(enc, _HostFallbackEncoder):
            for (o0, o1, i0, i1) in blocks:
                crc = block_crc(arr[i0:i1])
                s_crc = stream_crc_fold(s_crc, crc)
                blk = enc.encode_block(out[o0:o1], crc)
                vals, bits = blk.arrays()
                acc.extend(vals, bits)
        else:
            for (o0, o1, i0, i1) in blocks:
                fut = enc.transform(out[o0:o1])
                inflight.append(((i0, i1), fetch_pool.submit(materialize, fut)))
                # queue-depth observability, mirroring the reference's RX
                # queue logging (compress.rs:81-85)
                log.debug("in-flight device blocks: %d", len(inflight))
                if len(inflight) >= WINDOW:
                    drain_one()
            while inflight:
                drain_one()
    finally:
        fetch_pool.shutdown(wait=False)
    acc.put(FOOTER_MAGIC, 48)
    acc.put(s_crc, 32)
    payload, _ = acc.pack()
    return payload
