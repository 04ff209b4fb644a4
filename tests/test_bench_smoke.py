"""bench.py contract smoke test (CPU, tiny sizes): prints exactly one JSON
line with the required keys. Guards the driver-facing artifact."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_json_contract():
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "BENCH_CHUNKS": "2",
        "BENCH_BASELINE_CHUNKS": "1",
        "BENCH_N": "512",
        "BENCH_NCUT_METHOD": "eigh",
        "BENCH_SOLVER": "host",
    })
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=900,
                       cwd=root)
    assert r.returncode == 0, r.stderr[-800:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    data = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in data
    assert data["value"] > 0
