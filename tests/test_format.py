"""Format-layer unit tests: CRC, symbol map, bit I/O.

Mirrors the reference's inline test strategy (SURVEY.md §4): bit order,
split reads, packing/padding, symbol-map round-trip incl. the full 256 map.
"""
import numpy as np
import pytest

from tpubz.format.crc import block_crc, block_crc_slow, stream_crc_fold
from tpubz.format.symbol_map import decode_symbol_map, encode_symbol_map
from tpubz.hostref.bitio import BitAccum, BitReader, pack_bits, splice_bit_chunks


def test_crc_known_vector():
    # CRC-32/BZIP2 check value
    assert block_crc(b"123456789") == 0xFC891918


def test_crc_fast_matches_slow(rng):
    for n in (0, 1, 7, 255, 4096):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert block_crc(d) == block_crc_slow(d)


def test_stream_crc_fold():
    # rotate-left-1 then xor (reference src/tools/crc.rs:25-27)
    assert stream_crc_fold(0, 0x12345678) == 0x12345678
    assert stream_crc_fold(0x80000000, 0) == 1
    assert stream_crc_fold(0x80000001, 0xFFFFFFFF) == (3 ^ 0xFFFFFFFF)


@pytest.mark.parametrize(
    "used_idx",
    [[0], [65], [0, 255], list(range(256)), [15, 16, 17, 240]],
)
def test_symbol_map_roundtrip(used_idx):
    used = np.zeros(256, dtype=bool)
    used[used_idx] = True
    words = encode_symbol_map(used)
    out = decode_symbol_map(words)
    assert list(out) == sorted(used_idx)


def test_pack_bits_msb_first():
    # 0b101 (3 bits) + 0b01 (2 bits) + 0xFF (8 bits) = 101 01 11111111 000...
    out = pack_bits(np.array([0b101, 0b01, 0xFF]), np.array([3, 2, 8]))
    bits = "".join(f"{b:08b}" for b in out)
    assert bits.startswith("1010111111111000"[: 13])
    assert len(out) == 2


def test_bitaccum_reader_roundtrip(rng):
    acc = BitAccum()
    fields = []
    for _ in range(500):
        nbits = int(rng.integers(1, 33))
        val = int(rng.integers(0, 1 << nbits))
        acc.put(val, nbits)
        fields.append((val, nbits))
    acc.put(0x314159265359, 48)
    fields.append((0x314159265359, 48))
    payload, total = acc.pack()
    assert total == sum(b for _, b in fields)
    br = BitReader(payload)
    for val, nbits in fields:
        assert br.read(nbits) == val


def test_splice_bit_chunks():
    a = BitAccum(); a.put(0b1011, 4)
    b = BitAccum(); b.put(0b11, 2); b.put(0xAB, 8)
    chunks = [a.pack(), b.pack()]
    out, total = splice_bit_chunks(chunks)
    assert total == 14
    br = BitReader(out)
    assert br.read(4) == 0b1011
    assert br.read(2) == 0b11
    assert br.read(8) == 0xAB
