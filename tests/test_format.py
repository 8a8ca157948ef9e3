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


def test_splice_byte_chunks_fuzz_vs_field_oracle(rng):
    """Vectorized byte splice == field-by-field packing for random chunk
    mixes at every sub-byte offset (incl. empty chunks and garbage pad bits,
    which the splice must mask)."""
    from tpubz.hostref.bitio import splice_byte_chunks

    for _ in range(60):
        nchunks = int(rng.integers(1, 8))
        chunks = []
        oracle = BitAccum()
        for _ in range(nchunks):
            nbits = int(rng.integers(0, 77))
            acc = BitAccum()
            left = nbits
            while left:
                take = min(int(rng.integers(1, 25)), left)
                v = int(rng.integers(0, 1 << take))
                acc.put(v, take)
                oracle.put(v, take)
                left -= take
            data, n = acc.pack()
            if n % 8 and rng.integers(0, 2):
                # inject garbage into the pad bits: splice must mask it
                ba = bytearray(data)
                ba[-1] |= (1 << (8 - n % 8)) - 1
                data = bytes(ba)
            chunks.append((data, n))
        got, total = splice_byte_chunks(chunks)
        want, wtotal = oracle.pack()
        assert total == wtotal and got == want


def test_put_words_and_put_bytes_pack(rng):
    """Byte-run chunks (put_words / put_bytes) splice through pack()
    identically to the equivalent field puts, at arbitrary preceding bit
    offsets and non-word-aligned bit lengths."""
    for lead_bits in (0, 3, 8, 13):
        for nbits in (1, 16, 31, 32, 33, 64, 95):
            words = np.array([0xDEADBEEF, 0x0BADF00D, 0xC0FFEE11], np.uint32)
            acc = BitAccum()
            oracle = BitAccum()
            if lead_bits:
                acc.put(0b1010110101101 & ((1 << lead_bits) - 1), lead_bits)
                oracle.put(0b1010110101101 & ((1 << lead_bits) - 1), lead_bits)
            acc.put_words(words, nbits)
            left = nbits
            for w in words:
                take = min(32, left)
                if take <= 0:
                    break
                oracle.put(int(w) >> (32 - take), take)
                left -= take
            a, ta = acc.pack()
            b, tb = oracle.pack()
            assert (a, ta) == (b, tb), (lead_bits, nbits)
            # arrays() view must agree with pack()
            from tpubz.hostref.bitio import pack_bits

            vals, bits = acc.arrays()
            assert pack_bits(vals, bits) == a


def test_incremental_splicer_matches_batch(rng):
    """IncrementalSplicer (drain-time fold) must emit exactly what the
    batch splice_byte_chunks emits, across chunk sizes that straddle its
    buffer-doubling boundaries and pad-bit masking."""
    from tpubz.hostref.bitio import IncrementalSplicer, splice_byte_chunks

    for trial in range(30):
        nchunks = int(rng.integers(1, 12))
        chunks = []
        for _ in range(nchunks):
            nb = int(rng.integers(0, 3000))
            data = rng.integers(0, 256, nb, dtype=np.uint8).tobytes()
            nbits = int(rng.integers(0, 8 * nb + 1))
            chunks.append((data, nbits))
        inc = IncrementalSplicer(cap_hint=64)  # force growth
        for d, n in chunks:
            inc.add(d, n)
        got, total = inc.finish()
        want, wtotal = splice_byte_chunks(chunks)
        assert total == wtotal and got == want, trial
