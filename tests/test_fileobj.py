"""tpubz.open() — the bz2.open-compatible file-object API over the
bounded-memory streaming codecs. Cross-checked against the stdlib bz2
module in both directions (the strongest interop oracle available in-proc)."""
import bz2
import io
import os

import numpy as np
import pytest

import tpubz


def _payload(rng, n=400_000):
    return (
        bytes(rng.integers(0, 200, n // 2, dtype=np.uint8))
        + b"spam" * (n // 8)
        + bytes(rng.integers(0, 6, n // 4, dtype=np.uint8))
    )


def test_write_then_stdlib_reads(tmp_path, rng):
    d = _payload(rng)
    p = tmp_path / "a.bz2"
    with tpubz.open(p, "wb", compresslevel=7) as f:
        # incremental writes of awkward sizes
        for off in range(0, len(d), 123_457):
            assert f.write(d[off : off + 123_457]) == len(d[off : off + 123_457])
        assert f.tell() == len(d)
    assert bz2.open(p, "rb").read() == d


def test_stdlib_writes_then_read(tmp_path, rng):
    d = _payload(rng)
    p = tmp_path / "b.bz2"
    with bz2.open(p, "wb") as f:
        f.write(d)
    with tpubz.open(p, "rb") as f:
        got = b""
        while True:
            chunk = f.read(77_001)
            if not chunk:
                break
            got += chunk
    assert got == d


def test_roundtrip_own(tmp_path, rng):
    d = _payload(rng, 150_000)
    p = tmp_path / "c.bz2"
    with tpubz.open(p, "wb") as f:
        f.write(d)
    with tpubz.open(p, "rb") as f:
        assert f.read() == d


def test_append_mode_concatenates(tmp_path, rng):
    p = tmp_path / "d.bz2"
    with tpubz.open(p, "wb") as f:
        f.write(b"hello ")
    with tpubz.open(p, "ab") as f:
        f.write(b"world")
    with tpubz.open(p, "rb") as f:
        assert f.read() == b"hello world"
    assert bz2.open(p, "rb").read() == b"hello world"


def test_text_mode(tmp_path):
    p = tmp_path / "e.bz2"
    with tpubz.open(p, "wt", encoding="utf-8") as f:
        f.write("héllo\nwörld\n")
    with tpubz.open(p, "rt", encoding="utf-8") as f:
        assert f.read() == "héllo\nwörld\n"


def test_fileobj_target(rng):
    d = _payload(rng, 80_000)
    buf = io.BytesIO()
    with tpubz.open(buf, "wb") as f:
        f.write(d)
    assert bz2.decompress(buf.getvalue()) == d
    with tpubz.open(io.BytesIO(buf.getvalue()), "rb") as f:
        assert f.read() == d


def test_read_on_write_handle_raises(tmp_path):
    with tpubz.open(tmp_path / "f.bz2", "wb") as f:
        with pytest.raises(io.UnsupportedOperation):
            f.read()
    with tpubz.open(tmp_path / "f.bz2", "rb") as f:
        with pytest.raises(io.UnsupportedOperation):
            f.write(b"x")


def test_corrupt_input_raises(tmp_path):
    p = tmp_path / "g.bz2"
    with tpubz.open(p, "wb") as f:
        f.write(b"payload " * 4000)
    raw = bytearray(p.read_bytes())
    raw[len(raw) // 2] ^= 0x20
    p.write_bytes(bytes(raw))
    with pytest.raises(Exception):
        with tpubz.open(p, "rb") as f:
            f.read()


def test_early_close_reader_does_not_hang(tmp_path, rng):
    d = _payload(rng, 600_000)
    p = tmp_path / "h.bz2"
    with tpubz.open(p, "wb") as f:
        f.write(d)
    f = tpubz.open(p, "rb")
    assert f.read(1000) == d[:1000]
    f.close()  # must not deadlock on the worker's backpressure
    assert f.closed


def test_bz2file_alias_and_mode_surface(tmp_path, rng):
    d = _payload(rng, 120_000)
    p = tmp_path / "alias.bz2"
    with tpubz.BZ2File(p, "wb") as f:
        f.write(d)
    with bz2.BZ2File(p) as f:
        assert f.read() == d


def test_seek_matches_stdlib(tmp_path, rng):
    d = _payload(rng, 300_000)
    p = tmp_path / "s.bz2"
    p.write_bytes(bz2.compress(d, 9))
    with tpubz.BZ2File(p, "rb") as f, bz2.BZ2File(p) as g:
        assert f.seekable() and g.seekable()
        for args in [
            (1000,),
            (500, io.SEEK_CUR),
            (100_000,),
            (7,),                 # backward: rewind + re-decode
            (-2000, io.SEEK_END),
            (10**9,),             # past EOF parks at EOF
            (0,),
        ]:
            assert f.seek(*args) == g.seek(*args), args
            assert f.tell() == g.tell()
            assert f.read(4096) == g.read(4096), args


def test_peek_does_not_advance(tmp_path, rng):
    d = _payload(rng, 50_000)
    p = tmp_path / "pk.bz2"
    p.write_bytes(bz2.compress(d, 9))
    with tpubz.BZ2File(p, "rb") as f:
        head = f.peek(16)
        assert len(head) >= 16 and d.startswith(head[:16])
        assert f.tell() == 0
        assert f.read(16) == d[:16]
        f.seek(0, io.SEEK_END)
        assert f.peek() == b""


def test_seek_on_write_handle_raises(tmp_path):
    with tpubz.BZ2File(tmp_path / "w.bz2", "wb") as f:
        assert not f.seekable()
        with pytest.raises((io.UnsupportedOperation, ValueError)):
            f.seek(0)


def test_seek_nonseekable_source_raises(rng):
    d = _payload(rng, 20_000)

    class NoSeek(io.RawIOBase):
        def __init__(self, b):
            self._b = io.BytesIO(b)

        def readable(self):
            return True

        def read(self, n=-1):
            return self._b.read(n)

    f = tpubz.BZ2File(NoSeek(bz2.compress(d)), "rb")
    assert not f.seekable()
    with pytest.raises(io.UnsupportedOperation):
        f.seek(0)
    assert f.read() == d
    f.close()
