"""Decoder format-envelope tests: accept streams our encoder never emits.

The format allows code lengths up to 20 while the encoder caps at 17
(reference huffman_code_from_weights.rs:65, decompress.rs:239); a compliant
decoder must accept them. Streams here are hand-assembled bit by bit.
"""
import numpy as np

from tpubz.format.constants import BLOCK_MAGIC, FOOTER_MAGIC, STREAM_MAGIC
from tpubz.format.crc import block_crc, stream_crc_fold
from tpubz.format.symbol_map import encode_symbol_map
from tpubz.hostref.bitio import BitAccum
from tpubz.hostref.bwt import bwt_encode
from tpubz.hostref.huffman import canonical_codes
from tpubz.hostref.mtf_rle2 import mtf_rle2_encode


def _build_stream_with_lengths(data: bytes, lengths_fn):
    """Single-block -1 stream whose two Huffman tables use lengths_fn(alpha)."""
    arr = np.frombuffer(data, np.uint8)
    crc = block_crc(arr)
    key, last = bwt_encode(arr)  # no RLE1 (no 4-runs in data)
    rle2, freqs, used = mtf_rle2_encode(last)
    alpha = int(used.sum()) + 2
    lens = lengths_fn(alpha)
    codes = canonical_codes(lens)
    acc = BitAccum()
    for b in STREAM_MAGIC:
        acc.put(b, 8)
    acc.put(0x30 + 1, 8)
    acc.put(BLOCK_MAGIC, 48)
    acc.put(crc, 32)
    acc.put(0, 1)
    acc.put(key, 24)
    for w in encode_symbol_map(used):
        acc.put(w, 16)
    acc.put(2, 3)  # table count (format minimum)
    nsel = (rle2.size + 49) // 50
    acc.put(nsel, 15)
    for _ in range(nsel):
        acc.put(0, 1)  # selector MTF index 0 (unary: single 0 bit)
    for _t in range(2):
        cur = int(lens[0])
        acc.put(cur, 5)
        for s in range(alpha):
            delta = int(lens[s]) - cur
            cur = int(lens[s])
            while delta > 0:
                acc.put(0b10, 2)
                delta -= 1
            while delta < 0:
                acc.put(0b11, 2)
                delta += 1
            acc.put(0, 1)
    for s in rle2:
        acc.put(int(codes[s]), int(lens[s]))
    acc.put(FOOTER_MAGIC, 48)
    acc.put(stream_crc_fold(0, crc), 32)
    payload, _ = acc.pack()
    return payload


def _deep_lengths(alpha):
    """Kraft-complete unary chain 1, 2, ..., alpha-2, alpha-1, alpha-1."""
    assert alpha == 21, "test data must use exactly 19 byte values"
    lens = np.zeros(alpha, np.int64)
    lens[: alpha - 1] = np.arange(1, alpha)
    lens[alpha - 1] = lens[alpha - 2]
    assert lens.max() == 20
    return lens


def test_decoder_accepts_20_bit_codes(sys_bunzip2):
    # exactly 19 used byte values -> alpha 21 -> deepest chain code is 20
    # bits (beyond our encoder's 17-bit cap); no 4-runs so RLE1 is a no-op
    data = bytes(range(19)) * 8
    stream = _build_stream_with_lengths(data, _deep_lengths)
    # our decoder accepts it...
    from tpubz.stream.decode import decompress

    assert decompress(stream) == data
    # ...and the canonical C tool agrees the stream is valid
    assert sys_bunzip2(stream) == data


def test_python_fallback_accepts_20_bit_codes():
    from tpubz.hostref.stream import decompress as py_decompress

    data = bytes(range(19)) * 8
    stream = _build_stream_with_lengths(data, _deep_lengths)
    assert py_decompress(stream) == data


def test_tiny_and_degenerate_alphabet_interop(rng, sys_bunzip2):
    """Tiny blocks and degenerate alphabets (1, 2, and all-256 symbols)
    through the production compress -> our decode AND system bunzip2:
    pins the native whole-block emitter's corner cases (alpha as small as
    3, single-group selector streams, full symbol map)."""
    import subprocess

    import tpubz

    cases = []
    for n in (1, 2, 3, 4, 5, 17, 51, 255, 256, 1000):
        cases.append(np.full(n, 65, np.uint8))
        cases.append(rng.integers(0, 2, n).astype(np.uint8))
        cases.append(rng.integers(0, 256, n).astype(np.uint8))
    cases.append(np.arange(256, dtype=np.uint8).repeat(40))
    for i, a in enumerate(cases):
        d = a.tobytes()
        c = tpubz.compress(d, 1)
        assert tpubz.decompress(c) == d, (i, len(d))
        p = subprocess.run(["bunzip2", "-c"], input=c, capture_output=True)
        assert p.returncode == 0 and p.stdout == d, (i, len(d))
