"""End-to-end host-reference codec vs the system bzip2 oracle.

This automates what the reference validated only manually (SURVEY.md §4):
system bzip2 round-trips in both directions, at multiple levels, plus
corrupt-input rejection.
"""
import numpy as np
import pytest

from tpubz.hostref.stream import compress, decompress


def _cases(rng):
    return {
        "empty": b"",
        "one": b"x",
        "runs": b"a" * 100_000,
        "text": (b"the quick brown fox jumps over the lazy dog\n" * 800),
        "random": bytes(rng.integers(0, 256, 120_000, dtype=np.uint8)),
        "lowent": bytes(rng.integers(0, 4, 150_000, dtype=np.uint8)),
        "period": b"abcabc" * 10_000,
        "allbytes": bytes(range(256)) * 40,
    }


@pytest.mark.parametrize("level", [1, 9])
def test_self_roundtrip(rng, level):
    for name, d in _cases(rng).items():
        c = compress(d, level)
        assert decompress(c) == d, name


@pytest.mark.parametrize("level", [1, 9])
def test_system_bunzip2_accepts_ours(rng, sys_bunzip2, level):
    for name, d in _cases(rng).items():
        c = compress(d, level)
        assert sys_bunzip2(c) == d, name


@pytest.mark.parametrize("level", [1, 9])
def test_we_decode_system_bzip2(rng, sys_bzip2, level):
    for name, d in _cases(rng).items():
        assert decompress(sys_bzip2(d, level)) == d, name


@pytest.mark.parametrize("level", [1, 9])
def test_size_not_worse_than_reference(rng, sys_bzip2, level):
    # north-star constraint: compressed size <= reference bzip2 size
    for name, d in _cases(rng).items():
        if not d:
            continue
        ours = len(compress(d, level))
        theirs = len(sys_bzip2(d, level))
        assert ours <= theirs, (name, level, ours, theirs)


def test_multiblock_level1(rng, sys_bunzip2):
    # >100k at level 1 forces multiple blocks through the ordered assembly
    d = bytes(rng.integers(0, 64, 350_000, dtype=np.uint8))
    c = compress(d, 1)
    assert decompress(c) == d
    assert sys_bunzip2(c) == d


def test_corrupt_rejection(rng):
    d = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    c = bytearray(compress(d, 1))
    with pytest.raises(ValueError):
        decompress(bytes(c[:2]) + b"xx" + bytes(c[4:]))
    # flip a payload bit -> CRC mismatch (or structural error)
    c[len(c) // 2] ^= 0x10
    with pytest.raises((ValueError, EOFError)):
        decompress(bytes(c))


def test_streaming_matches_in_memory(rng, sys_bunzip2, monkeypatch):
    import io

    import tpubz.stream.files as F

    monkeypatch.setattr(F, "WINDOW_BYTES", 250_000)
    d = bytes(rng.integers(0, 50, 900_000, dtype=np.uint8))
    buf = io.BytesIO()
    F.compress_stream(io.BytesIO(d), buf, 1)
    c = buf.getvalue()
    assert c == compress(d, 1)  # prefix-stable split -> identical stream
    assert sys_bunzip2(c) == d


def test_concatenated_streams_decode(rng, sys_bunzip2):
    from tpubz.stream.decode import decompress as full_decompress

    a = bytes(rng.integers(0, 64, 60_000, dtype=np.uint8))
    b = b"hello multi-stream world" * 300
    cat = compress(a, 1) + compress(b, 9)
    assert full_decompress(cat) == a + b
    assert sys_bunzip2(cat) == a + b


def test_streaming_decode_matches(rng, monkeypatch):
    import io

    import tpubz.stream.files as F

    # window far below one compressed block: forces the refill-retry path
    monkeypatch.setattr(F, "WINDOW_BYTES", 64 * 1024)
    a = bytes(rng.integers(0, 64, 500_000, dtype=np.uint8))
    b = b"stream two " * 10_000
    cat = compress(a, 1) + compress(b, 9)
    buf = io.BytesIO()
    n = F.decompress_stream(io.BytesIO(cat), buf)
    assert buf.getvalue() == a + b and n == len(a) + len(b)


def test_all_levels_roundtrip(rng, sys_bunzip2):
    d = bytes(rng.integers(0, 48, 220_000, dtype=np.uint8))
    for level in range(1, 10):
        c = compress(d, level)
        assert decompress(c) == d, level
        assert sys_bunzip2(c) == d, level
