"""Whole-stream compress/decompress, host reference (the codec oracle).

Stream layout (reference src/bitstream/bitwriter.rs:67-123 and
src/compression/decompress.rs:38-402):
  "BZh" + ASCII level | blocks (bit-aligned, not byte-aligned) |
  48-bit footer magic | 32-bit stream CRC | zero-pad to byte.
Stream CRC folds per-block CRCs in block order (src/tools/crc.rs:25-27).
"""
from __future__ import annotations

import numpy as np

from ..format.constants import FOOTER_MAGIC, BLOCK_MAGIC, STREAM_MAGIC, block_budget
from ..format.crc import block_crc, stream_crc_fold
from .bitio import BitAccum, BitReader
from .block import decode_block, encode_block
from .rle1 import rle1_blocks


def compress(data: bytes | np.ndarray, level: int = 9) -> bytes:
    if not 1 <= level <= 9:
        raise ValueError("level must be 1..9")
    arr = (
        np.frombuffer(data, dtype=np.uint8)
        if isinstance(data, (bytes, bytearray, memoryview))
        else np.asarray(data, dtype=np.uint8)
    )
    acc = BitAccum()
    for b in STREAM_MAGIC:
        acc.put(b, 8)
    acc.put(0x30 + level, 8)
    out, blocks = rle1_blocks(arr, block_budget(level))
    s_crc = 0
    for (olo, ohi, ilo, ihi) in blocks:
        crc = block_crc(arr[ilo:ihi])
        s_crc = stream_crc_fold(s_crc, crc)
        blk = encode_block(out[olo:ohi], crc)
        vals, bits = blk.arrays()
        acc.extend(vals, bits)
    acc.put(FOOTER_MAGIC, 48)
    acc.put(s_crc, 32)
    payload, _ = acc.pack()
    return payload


def decompress(data: bytes) -> bytes:
    """Scalar reference decode. Handles CONCATENATED streams exactly like
    the production decoder (stream/decode.py): after a stream's footer the
    reader byte-aligns and continues if another 'BZh' header follows —
    without this, --trace-bits (which routes through here) would silently
    truncate `cat a.bz2 b.bz2` output to the first stream."""
    br = BitReader(data)
    parts: list[np.ndarray] = []
    while True:
        magic = bytes(br.read(8) for _ in range(3))
        if magic != STREAM_MAGIC:
            raise ValueError("not a bzip2 stream")
        level = br.read(8) - 0x30
        if not 1 <= level <= 9:
            raise ValueError("invalid block size digit")
        s_crc = 0
        while True:
            magic48 = br.read(48)
            if magic48 == FOOTER_MAGIC:
                break
            if magic48 != BLOCK_MAGIC:
                raise ValueError("invalid block header magic")
            raw, blk_crc = decode_block(br, level)
            actual = block_crc(raw)
            if actual != blk_crc:
                raise ValueError(
                    f"block CRC mismatch: stream says {blk_crc:#010x}, got {actual:#010x}"
                )
            s_crc = stream_crc_fold(s_crc, blk_crc)
            parts.append(raw)
        stream_crc_stored = br.read(32)
        if stream_crc_stored != s_crc:
            raise ValueError(
                f"stream CRC mismatch: stream says {stream_crc_stored:#010x}, got {s_crc:#010x}"
            )
        nxt = (br.pos + 7) // 8
        if nxt + 4 > len(data) or data[nxt : nxt + 3] != STREAM_MAGIC:
            break
        br.pos = nxt * 8
    if not parts:
        return b""
    return np.concatenate(parts).tobytes()
