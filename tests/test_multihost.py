"""Multi-host DCN-sim test: 2 CPU processes on localhost (VERDICT r1 #8).

Each subprocess initializes jax.distributed against a localhost
coordinator (TCP = DCN stand-in), forms the global mesh, takes its
host_chunk_slice of a shared synthetic chunk set, solves its chunks with
the batched Fiedler solve, and all-reduces metric sums across hosts.
Asserts: global device count = sum of local, disjoint+complete chunk
ownership, and the cross-host sum matches the single-process oracle."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["AUTOINST_REPO"])
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from autoinst_tpu.parallel import multihost

info = multihost.init_distributed()
mesh = multihost.global_mesh(model=1)

# shared synthetic chunk set (same seed on every host)
rng = np.random.default_rng(0)
n_chunks, n = 8, 48
Ws, valids = [], []
for c in range(n_chunks):
    pts = rng.uniform(0, 3, (n, 3)).astype(np.float32)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    Ws.append(np.where(d <= 1.5, np.exp(-d), 0).astype(np.float32))
    valids.append(np.ones(n, bool))
Ws, valids = np.stack(Ws), np.stack(valids)

mine = multihost.host_chunk_slice(n_chunks)

# per-host local solve of its chunk slice (no cross-host graph traffic)
from autoinst_tpu.ops import eigen
import jax.numpy as jnp
evs, lams = jax.vmap(lambda w, v: eigen.fiedler_lobpcg(w, v, iters=40))(
    jnp.asarray(Ws[mine]), jnp.asarray(valids[mine]))
local_sum = float(np.sum(np.asarray(lams)))

# metric accumulators cross DCN
total = multihost.allreduce_host_sums(np.array([local_sum, len(mine)]))

# payload to a per-process file: stdout is shared with Gloo chatter and
# scraping it proved flaky under concurrent load (VERDICT r2 weak #4)
with open(os.environ["AUTOINST_PAYLOAD"], "w") as fh:
    json.dump({
        "process_index": info["process_index"],
        "process_count": info["process_count"],
        "n_local_devices": len(info["local_devices"]),
        "n_global_devices": len(info["global_devices"]),
        "mesh_data": mesh.shape["data"],
        "my_chunks": [int(i) for i in mine],
        "lam_total": float(total[0]),
        "chunk_total": float(total[1]),
    }, fh)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_sim(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    payloads = []
    for pid in range(2):
        payload_file = tmp_path / f"payload_{pid}.json"
        payloads.append(payload_file)
        env = dict(os.environ)
        env.update({
            "AUTOINST_REPO": REPO,
            "AUTOINST_PAYLOAD": str(payload_file),
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p, payload_file in zip(procs, payloads):
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(payload_file.read_text()))

    assert {o["process_index"] for o in outs} == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["n_local_devices"] == 4
        assert o["n_global_devices"] == 8      # DCN-joined global runtime
        assert o["mesh_data"] == 8

    # disjoint + complete chunk ownership
    own = [set(o["my_chunks"]) for o in outs]
    assert own[0] & own[1] == set()
    assert own[0] | own[1] == set(range(8))
    assert outs[0]["chunk_total"] == 8.0       # allreduce saw both hosts
    assert outs[0]["lam_total"] == outs[1]["lam_total"]

    # cross-host sum == single-process oracle over all chunks
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from autoinst_tpu.ops import eigen
    rng = np.random.default_rng(0)
    n_chunks, n = 8, 48
    tot = 0.0
    Ws = []
    for c in range(n_chunks):
        pts = rng.uniform(0, 3, (n, 3)).astype(np.float32)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        Ws.append(np.where(d <= 1.5, np.exp(-d), 0).astype(np.float32))
    _, lams = jax.vmap(lambda w: eigen.fiedler_lobpcg(
        w, jnp.ones(n, bool), iters=40))(jnp.asarray(np.stack(Ws)))
    oracle = float(np.sum(np.asarray(lams)))
    assert abs(outs[0]["lam_total"] - oracle) < 1e-3
