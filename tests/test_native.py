"""Native C++ engine vs the pure-python oracle: bit-identical behavior."""
import numpy as np
import pytest

from tpubz.native import refine_stream_native
import tpubz.hostref.huffman as H


def test_native_lib_builds_when_toolchain_present():
    """A C++ source error must FAIL the suite, not silently route production
    onto the (bit-identical but much slower) numpy fallbacks: when g++
    exists, the native lib must build and load."""
    import shutil

    from tpubz.native import get_lib

    if shutil.which("g++") is None:
        pytest.skip("no g++ on this host")
    assert get_lib() is not None, (
        "native lib failed to build/load with g++ present — check compile "
        "errors in tpubz/native/*.cpp"
    )


@pytest.fixture(scope="module")
def native_available():
    if refine_stream_native(np.array([0, 1, 2], np.uint16), 3, 8) is None:
        pytest.skip("native toolchain unavailable")


def _python_refine(rle2, alpha):
    freqs = np.bincount(rle2, minlength=258).astype(np.int64)
    return H.assign_selectors_and_lengths(np.asarray(rle2, np.int64), freqs, alpha)


def test_refine_native_matches_python(rng, native_available):
    for _ in range(6):
        alpha = int(rng.integers(3, 259))
        rle2_len = int(rng.integers(3, 30000))
        # skewed symbol distribution (zipf-ish) to exercise tree shapes
        p = 1.0 / (np.arange(alpha) + 1.0)
        p /= p.sum()
        rle2 = rng.choice(alpha, size=rle2_len, p=p).astype(np.uint16)
        rle2[-1] = alpha - 1  # EOB-ish tail
        sel_p, len_p, tc_p = _python_refine(rle2, alpha)
        nat = refine_stream_native(rle2, alpha, H.huffman_iters())
        sel_n, len_n, tc_n = nat
        assert tc_n == tc_p
        assert list(sel_n) == list(sel_p)
        assert np.array_equal(len_n[:tc_n], len_p[:tc_n])


def test_decode_rejects_oversubscribed_code_lengths(native_available):
    """A crafted block whose Huffman lengths oversubscribe the code space
    (all symbols length 1) must fail cleanly with -5, not overflow the
    12-bit LUT fill (previously heap corruption via decode_block_native)."""
    from tpubz.hostref.bitio import BitAccum
    from tpubz.native import decode_block_native

    acc = BitAccum()
    acc.put(0, 32)       # block CRC
    acc.put(0, 1)        # randomized flag
    acc.put(0, 24)       # BWT key
    acc.put(0x8000, 16)  # symbol map level 1: group 0 present
    acc.put(0x8000, 16)  # group 0: symbol 0 present -> nsyms=1, alpha=3
    acc.put(2, 3)        # table count
    acc.put(1, 15)       # selector count
    acc.put(0, 1)        # selector 0 unary-coded (table 0)
    for _ in range(2):   # two tables
        acc.put(1, 5)    # origin length 1
        for _ in range(3):
            acc.put(0, 1)  # no delta: three symbols all length 1 (3 > 2^1)
    payload, nbits = acc.pack()
    arr = np.frombuffer(payload + b"\x00" * 16, np.uint8)
    with pytest.raises(ValueError, match="code length"):
        decode_block_native(arr, 0, 1)


def test_stream_identical_with_and_without_native(rng, monkeypatch):
    from tpubz.hostref.stream import compress

    d = bytes(rng.integers(0, 100, 30000, dtype=np.uint8))
    with_native = compress(d, 1)
    import tpubz.native as N

    monkeypatch.setattr(N, "refine_stream_native", lambda *a, **k: None)
    without = compress(d, 1)
    assert with_native == without
