"""bench.py driver contract: importable, one JSON line with required keys."""
import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["TPUBZ_BENCH_MB"] = "1"
    p = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        timeout=560,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert p.returncode == 0, p.stderr.decode()[-500:]
    lines = [l for l in p.stdout.decode().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    result = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, key
    assert result["roundtrip_ok"] is True
