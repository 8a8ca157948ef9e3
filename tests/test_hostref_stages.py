"""Per-stage host-reference tests: RLE1, BWT, MTF+RLE2, Huffman."""
import numpy as np
import pytest

from tpubz.hostref.bwt import bwt_decode, bwt_decode_fast, bwt_encode
from tpubz.hostref.huffman import (
    build_decode_table,
    canonical_codes,
    code_lengths_from_freqs,
)
from tpubz.hostref.mtf_rle2 import mtf_rle2_decode, mtf_rle2_encode, zero_run_digits
from tpubz.hostref.rle1 import rle1_decode, rle1_encode, split_blocks


RLE1_CASES = [
    b"",
    b"a",
    b"aaa",
    b"aaaa",
    b"aaaaa",
    b"a" * 255,
    b"a" * 256,
    b"a" * 300,
    b"abcd" * 100 + b"e" * 600,
]


@pytest.mark.parametrize("case", RLE1_CASES)
def test_rle1_roundtrip(case):
    arr = np.frombuffer(case, np.uint8)
    out, seg_out, seg_in = rle1_encode(arr)
    assert bytes(rle1_decode(out)) == case


def test_rle1_random_roundtrip(rng):
    for lo, hi in ((0, 4), (0, 256)):
        d = bytes(rng.integers(lo, hi, 20000, dtype=np.uint8))
        out, _, _ = rle1_encode(np.frombuffer(d, np.uint8))
        assert bytes(rle1_decode(out)) == d


def test_rle1_block_split_preserves_data(rng):
    d = bytes(rng.integers(0, 4, 30000, dtype=np.uint8))
    arr = np.frombuffer(d, np.uint8)
    out, seg_out, seg_in = rle1_encode(arr)
    for budget in (10, 100, 5000):
        blocks = split_blocks(out, seg_out, seg_in, budget)
        dec = b"".join(bytes(rle1_decode(out[o0:o1])) for o0, o1, _, _ in blocks)
        assert dec == d
        # raw ranges tile the input exactly (needed for per-block CRC)
        assert blocks[0][2] == 0 and blocks[-1][3] == len(d)
        for (a, b) in zip(blocks, blocks[1:]):
            assert a[3] == b[2]


def test_bwt_matches_naive(rng):
    def naive(d):
        n = len(d)
        rots = sorted(range(n), key=lambda i: bytes(d[i:]) + bytes(d[:i]))
        return rots.index(0), np.array([d[(i - 1) % n] for i in rots], np.uint8)

    for case in (b"banana", b"mississippi", b"abababab", b"aaa",
                 bytes(rng.integers(0, 256, 500, dtype=np.uint8))):
        d = np.frombuffer(case, np.uint8)
        k, last = bwt_encode(d)
        nk, nlast = naive(d)
        assert (k, bytes(last)) == (nk, bytes(nlast))


def test_bwt_inverse(rng):
    for case in (b"banana", b"ab" * 300, bytes(rng.integers(0, 8, 5000, dtype=np.uint8))):
        d = np.frombuffer(case, np.uint8)
        k, last = bwt_encode(d)
        assert bytes(bwt_decode(k, last)) == case
        assert bytes(bwt_decode_fast(k, last)) == case


def test_zero_run_digits_bijective():
    def undo(ds):
        n, m = 0, 1
        for dd in ds:
            n += m * (dd + 1)
            m <<= 1
        return n

    for n in list(range(1, 300)) + [1000, 65535, 900000]:
        assert undo(zero_run_digits(n)) == n


def test_mtf_rle2_roundtrip(rng):
    for case in (b"banana", b"\x00" * 1000, bytes(rng.integers(0, 256, 4000, dtype=np.uint8))):
        d = np.frombuffer(case, np.uint8)
        rle2, freqs, used = mtf_rle2_encode(d)
        assert int(freqs.sum()) == rle2.size
        assert rle2[-1] == int(used.sum()) + 1  # EOB last
        dec = mtf_rle2_decode(rle2, np.flatnonzero(used).astype(np.uint8), len(case))
        assert bytes(dec) == case


def test_code_lengths_depth_cap():
    # pathological exponential freqs force the flattening retry
    freqs = np.array([1 << min(i, 40) for i in range(30)], dtype=np.int64)
    lens = code_lengths_from_freqs(freqs, 30)
    assert lens.max() <= 17
    assert lens.min() >= 1
    # Kraft inequality holds (complete prefix code)
    assert np.isclose(np.sum(2.0 ** -lens), 1.0)


def test_canonical_code_prefix_free():
    lens = np.array([3, 3, 2, 4, 4, 2])
    codes = canonical_codes(lens)
    bits = [format(c, f"0{l}b") for c, l in zip(codes, lens)]
    for i, a in enumerate(bits):
        for j, b in enumerate(bits):
            if i != j:
                assert not b.startswith(a)


def test_decode_table_roundtrip(rng):
    lens = np.array([2, 3, 3, 4, 4, 4, 4, 2])
    codes = canonical_codes(lens)
    t = build_decode_table(lens)
    from tpubz.hostref.bitio import BitAccum, BitReader
    from tpubz.hostref.huffman import huffman_decode_payload

    syms = rng.integers(0, 7, 500)  # exclude 7, use as EOB
    acc = BitAccum()
    for s in syms:
        acc.put(int(codes[s]), int(lens[s]))
    acc.put(int(codes[7]), int(lens[7]))  # EOB
    payload, _ = acc.pack()
    br = BitReader(payload)
    sel = np.zeros(1000, dtype=np.int64)
    out = huffman_decode_payload(br, [t], sel, eob=7)
    assert list(out) == list(syms)
