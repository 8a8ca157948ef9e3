"""Device-path whole-stream compression API.

Mirrors the host reference stream assembly (tpubz/hostref/stream.py) but
routes every block's O(n) transforms through the jitted device pipeline.
The output is byte-identical to the host reference (and therefore decodable
by reference bzip2).
"""
from __future__ import annotations

import numpy as np

from ..format.constants import FOOTER_MAGIC, STREAM_MAGIC, block_budget
from ..format.crc import block_crc, stream_crc_fold
from ..hostref.bitio import BitAccum
from ..hostref.rle1 import rle1_encode, split_blocks
from ..block.encode import DeviceBlockEncoder

_encoders: dict[int, DeviceBlockEncoder] = {}


def _encoder(level: int) -> DeviceBlockEncoder:
    if level not in _encoders:
        _encoders[level] = DeviceBlockEncoder(level)
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
    acc = BitAccum()
    for b in STREAM_MAGIC:
        acc.put(b, 8)
    acc.put(0x30 + level, 8)
    out, seg_out, seg_in = rle1_encode(arr)
    blocks = split_blocks(out, seg_out, seg_in, block_budget(level))
    s_crc = 0
    for (olo, ohi, ilo, ihi) in blocks:
        crc = block_crc(arr[ilo:ihi])
        s_crc = stream_crc_fold(s_crc, crc)
        blk = enc.encode_block(out[olo:ohi], crc)
        vals, bits = blk.arrays()
        acc.extend(vals, bits)
    acc.put(FOOTER_MAGIC, 48)
    acc.put(s_crc, 32)
    payload, _ = acc.pack()
    return payload
