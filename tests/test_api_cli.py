"""Top-level API and CLI argument parsing."""
import numpy as np
import pytest

import tpubz
from tpubz.cli import parse_args


def test_top_level_api(rng, sys_bunzip2):
    d = bytes(rng.integers(0, 64, 50_000, dtype=np.uint8))
    c = tpubz.compress(d, 1)
    assert tpubz.decompress(c) == d
    assert sys_bunzip2(c) == d


def test_parse_combined_short_flags():
    o = parse_args(["-v4k", "file.txt"])
    assert o.verbosity == 1 and o.level == 4 and o.keep
    assert o.files == ["file.txt"]


def test_parse_long_flags_and_aliases():
    o = parse_args(["--decompress", "--keep", "a.bz2", "--force"])
    assert o.mode == "unzip" and o.keep and o.force
    assert parse_args(["--fast"]).level == 1
    assert parse_args(["--best"]).level == 9


def test_parse_invoked_as():
    assert parse_args([], prog="/usr/bin/bunzip2").mode == "unzip"
    o = parse_args([], prog="bzcat")
    assert o.mode == "unzip" and o.stdout
    assert parse_args([], prog="tpubz").mode == "zip"


def test_parse_rejects_unknown():
    with pytest.raises(SystemExit):
        parse_args(["--frobnicate"])
    with pytest.raises(SystemExit):
        parse_args(["-Z"])


def test_verbosity_stacking():
    assert parse_args(["-vvv"]).verbosity == 3
    assert parse_args(["-v", "-v"]).verbosity == 2


def test_workfactor_parsed_unused():
    """--workfactor parity with the reference's parsed-but-unused
    BzOpts.work_factor (cli.rs:62-85): value accepted and range-checked,
    nothing else changes."""
    o = parse_args(["--workfactor=30", "-9", "x.txt"])
    assert o.workfactor == 30 and o.level == 9 and o.files == ["x.txt"]
    with pytest.raises(SystemExit):
        parse_args(["--workfactor=251"])
    with pytest.raises(SystemExit):
        parse_args(["--workfactor=abc"])


def test_profile_flag_writes_trace(rng, tmp_path, monkeypatch):
    """TPUBZ_PROFILE (and the --profile= flag that sets it) wraps the
    device-path compress in a jax.profiler trace written to the given dir."""
    o = parse_args(["--profile=" + str(tmp_path / "prof"), "-1"])
    assert o.level == 1 and o.profile == str(tmp_path / "prof")
    assert not o.files  # flag consumed, not treated as a file

    import os

    from tpubz.stream.api import compress

    prof_dir = tmp_path / "prof"
    monkeypatch.setenv("TPUBZ_PROFILE", str(prof_dir))
    d = bytes(rng.integers(0, 64, 30_000, dtype=np.uint8))
    c = compress(d, 1)
    assert tpubz.decompress(c) == d
    # jax writes plugins/profile/<ts>/*.xplane.pb under the trace dir
    found = [
        f
        for root, _, files in os.walk(prof_dir)
        for f in files
        if f.endswith(".xplane.pb") or f.endswith(".trace.json.gz")
    ]
    assert found, "no profiler artifacts written"


def test_iterations_flag(rng, tmp_path, monkeypatch):
    """--iterations controls refinement pass count (clamped >= 4); more
    passes can only keep or shrink output (best-snapshot rule)."""
    import subprocess

    from tpubz.format.constants import huffman_iters, set_huffman_iters
    from tpubz.hostref.stream import compress

    d = bytes(rng.integers(0, 150, 120_000, dtype=np.uint8))
    try:
        set_huffman_iters(4)
        assert huffman_iters() == 4
        c4 = len(compress(d, 1))
        set_huffman_iters(2)
        assert huffman_iters() == 4  # clamped: C-faithful trajectory needs 4
        set_huffman_iters(12)
        c12 = len(compress(d, 1))
        assert c12 <= c4
    finally:
        set_huffman_iters(None)
    ref = len(subprocess.run(["bzip2", "-1", "-c"], input=d, capture_output=True).stdout)
    assert c4 <= ref

    from tpubz.cli import parse_args

    o = parse_args(["--iterations=6", "-1"])
    assert o.iterations == 6 and o.level == 1


def test_tiny_stream_routes_host_and_stays_jax_free(rng, tmp_path):
    """Streams under TPUBZ_MIN_DEVICE_BLOCKS route to the CPU engine when
    no device encoder is warm, and that path must never import jax (the
    tiny-file CLI latency contract: block emission lives in the jax-free
    tpubz/block/emit.py). Runs in a -S subprocess so this environment's
    sitecustomize (which imports jax into every process) can't mask a
    regression."""
    import subprocess
    import sys

    src = tmp_path / "tiny.txt"
    dst = tmp_path / "tiny.txt.bz2"
    data = b"hello tiny stream\n" * 40
    src.write_bytes(data)
    import os
    import pathlib

    import numpy
    import tpubz

    repo = str(pathlib.Path(tpubz.__file__).resolve().parents[1])
    # resolve site-packages here (the -S child skips site.py, so the venv's
    # paths must be passed in explicitly)
    sitedir = os.path.dirname(os.path.dirname(numpy.__file__))
    code = (
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        f"sys.path.append({sitedir!r})\n"
        "from tpubz.stream.files import compress_file\n"
        f"compress_file({str(src)!r}, {str(dst)!r}, 9)\n"
        "assert 'jax' not in sys.modules, 'tiny stream pulled in jax'\n"
    )
    p = subprocess.run(
        [sys.executable, "-S", "-c", code], capture_output=True, text=True
    )
    assert p.returncode == 0, p.stderr
    # the host-routed bytes are the canonical stream bytes
    from tpubz.hostref.stream import compress as oracle
    from tpubz.stream.decode import decompress

    blob = dst.read_bytes()
    assert blob == oracle(data, 9)
    assert decompress(blob) == data


def test_cli_trace_bits_decode(tmp_path, monkeypatch, capsys):
    """--trace-bits decodes through the scalar reference decoder and logs a
    bit position for every header field and decoded symbol (the decode-side
    counterpart of the encoder's header traces; reference
    decompress.rs:312-318)."""
    import logging
    import os
    import subprocess

    from tpubz.cli import run

    data = b"trace me, trace me again, trace me once more\n"
    blob = subprocess.run(
        ["bzip2", "-9", "-c"], input=data, capture_output=True
    ).stdout
    src = tmp_path / "t.bz2"
    src.write_bytes(blob)
    monkeypatch.delenv("TPUBZ_TRACE_BITS", raising=False)
    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    log = logging.getLogger("tpubz")
    log.addHandler(handler)
    try:
        rc = run(["-d", "-k", "-f", "--trace-bits", str(src)], prog="tpubz")
    finally:
        log.removeHandler(handler)
        os.environ.pop("TPUBZ_TRACE_BITS", None)
    assert rc == 0
    assert (tmp_path / "t").read_bytes() == data
    msgs = [m for m in records if "read at bit" in m]
    assert any("block CRC" in m for m in msgs)
    assert any("sym " in m for m in msgs)
    # per-symbol trace count >= number of MTF symbols in a tiny block
    assert len(msgs) > 10


def test_cli_trace_bits_concat_and_stdin(tmp_path, monkeypatch, capsysbinary):
    """--trace-bits must decode CONCATENATED streams completely (the scalar
    reference decoder now loops over 'BZh' headers like production) and
    must stay active for stdin decode (review findings r5)."""
    import io
    import os
    import subprocess
    import sys as _sys

    from tpubz.cli import run

    a, b = b"first stream\n", b"second stream\n"
    blob = (
        subprocess.run(["bzip2", "-9c"], input=a, capture_output=True).stdout
        + subprocess.run(["bzip2", "-9c"], input=b, capture_output=True).stdout
    )
    src = tmp_path / "m.bz2"
    src.write_bytes(blob)
    monkeypatch.delenv("TPUBZ_TRACE_BITS", raising=False)
    rc = run(["-d", "-k", "-f", "--trace-bits", str(src)], prog="tpubz")
    os.environ.pop("TPUBZ_TRACE_BITS", None)
    assert rc == 0
    assert (tmp_path / "m").read_bytes() == a + b  # both streams decoded

    # stdin path: the traced scalar decoder must be the one that runs
    monkeypatch.setattr(_sys, "stdin", type("S", (), {"buffer": io.BytesIO(blob)})())
    out = io.BytesIO()
    monkeypatch.setattr(_sys, "stdout", type("S", (), {"buffer": out})())
    rc = run(["-d", "--trace-bits"], prog="tpubz")
    os.environ.pop("TPUBZ_TRACE_BITS", None)
    assert rc == 0 and out.getvalue() == a + b
