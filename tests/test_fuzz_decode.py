"""Corrupt-input fuzz: decode must never crash, hang, or expand unboundedly.

The decoders' failure envelope (SURVEY §5: validation + CRC checks) is
probed systematically: random byte flips, truncations, and garbage inputs
through the parallel in-memory decoder, the native block decoder, and the
bounded-memory streaming decoder. Every outcome must be a clean ValueError/
EOFError — or byte-identical output when the flip landed in a don't-care
bit (trailing padding, the ignored randomized flag, bytes past the footer).
"""
import io

import numpy as np
import pytest

from tpubz.hostref.stream import compress, decompress


@pytest.fixture(scope="module")
def stream_and_plain(rng):
    d = (
        bytes(rng.integers(0, 256, 60_000, dtype=np.uint8))
        + b"repetition! " * 4_000
        + bytes(rng.integers(0, 8, 60_000, dtype=np.uint8))
    )
    return compress(d, 1), d


def test_fuzz_byte_flips(rng, stream_and_plain):
    c, d = stream_and_plain
    failures = 0
    for _ in range(120):
        buf = bytearray(c)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            out = decompress(bytes(buf))
        except (ValueError, EOFError):
            failures += 1
            continue
        assert out == d, f"silent corruption accepted at byte {pos}"
    # the overwhelming majority of flips must be *detected*
    assert failures > 100


def test_fuzz_truncations(rng, stream_and_plain):
    c, _ = stream_and_plain
    for _ in range(40):
        cut = int(rng.integers(1, len(c)))
        with pytest.raises((ValueError, EOFError)):
            decompress(c[:cut])


def test_fuzz_garbage(rng):
    for n in (1, 5, 100, 5_000):
        g = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        with pytest.raises((ValueError, EOFError)):
            decompress(g)
    # valid magic, garbage body
    g = b"BZh1" + bytes(rng.integers(0, 256, 2_000, dtype=np.uint8))
    with pytest.raises((ValueError, EOFError)):
        decompress(g)


def test_fuzz_native_block_decode(rng, stream_and_plain):
    """The native block decoder parses untrusted bitstreams directly; feed
    it corrupted blocks at the real block offset — must raise ValueError,
    never crash the process."""
    from tpubz.native import decode_block_native, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    c, _ = stream_and_plain
    for _ in range(120):
        buf = bytearray(c)
        pos = int(rng.integers(4, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        arr = np.frombuffer(bytes(buf), np.uint8)
        try:
            decode_block_native(arr, 32 + 48, 1)
        except ValueError:
            pass  # clean rejection


def test_fuzz_streaming_bounded(rng, stream_and_plain):
    """Corrupt input mid-stream must raise promptly from the bounded-memory
    streaming decoder (no unbounded buffering, ADVICE r1 item 2)."""
    from tpubz.stream.files import decompress_stream

    c, d = stream_and_plain
    for _ in range(15):
        buf = bytearray(c)
        pos = int(rng.integers(10, len(buf) - 10))
        buf[pos] ^= int(rng.integers(1, 256))
        out = io.BytesIO()
        try:
            decompress_stream(io.BytesIO(bytes(buf)), out)
        except (ValueError, EOFError):
            continue
        assert out.getvalue() == d


@pytest.mark.slow
def test_differential_fuzz_vs_system(rng, sys_bzip2, sys_bunzip2):
    """Differential fuzz: random structured inputs, both directions against
    the system binaries, plus the size guarantee — across entropy regimes,
    sizes spanning 0..3 blocks, and levels 1/9."""
    def gen(case):
        kind = case % 5
        size = int(rng.integers(0, 320_000))
        if kind == 0:  # uniform bytes
            return bytes(rng.integers(0, 256, size, dtype=np.uint8))
        if kind == 1:  # low entropy
            return bytes(rng.integers(0, 4, size, dtype=np.uint8))
        if kind == 2:  # text-ish with repeats
            words = [b"the ", b"quick ", b"brown ", b"fox \n", b"lorem "]
            out = bytearray()
            while len(out) < size:
                out += words[int(rng.integers(0, len(words)))] * int(
                    rng.integers(1, 9)
                )
            return bytes(out[:size])
        if kind == 3:  # run-heavy
            out = bytearray()
            while len(out) < size:
                out += bytes([int(rng.integers(0, 256))]) * int(
                    rng.integers(1, 600)
                )
            return bytes(out[:size])
        return bytes(np.tile(np.arange(256, dtype=np.uint8), size // 256 + 1)[:size])

    for case in range(20):
        d = gen(case)
        level = 1 if case % 2 else 9
        c = compress(d, level)
        assert decompress(c) == d
        assert sys_bunzip2(c) == d
        assert len(c) <= len(sys_bzip2(d, level))
        assert decompress(sys_bzip2(d, level)) == d
