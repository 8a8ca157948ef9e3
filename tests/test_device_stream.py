"""Device-path stream API: byte-identical to the host reference, and the
sharded/dry-run entry points execute on a virtual 8-device CPU mesh."""
import numpy as np
import pytest

from tpubz.hostref.stream import compress as host_compress, decompress


@pytest.mark.slow
def test_device_stream_byte_identical(rng):
    from tpubz.stream.api import compress as dev_compress

    cases = [
        b"the quick brown fox jumps over the lazy dog\n" * 200,
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),
        b"a" * 30000,
    ]
    for d in cases:
        c_dev = dev_compress(d, 1)
        assert c_dev == host_compress(d, 1)
        assert decompress(c_dev) == d


def test_dryrun_multichip_8():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
