"""bf16 feature-transfer wire format (utils/transfer.py).

The TPU deployment ships feature matrices as bfloat16 to halve tunnel bytes
(transfer time ~= solver time per batch, results/bench_ab_r3). These tests
pin (a) the knob semantics on CPU (no narrowing unless forced), and (b) that
one bf16 rounding of TARL features perturbs the affinity matrix by far less
than anything the NCut threshold sweep could notice.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from autoinst_tpu.ops.affinity import affinity_xla
from autoinst_tpu.utils.transfer import feature_transfer_dtype, put_features


def test_cpu_default_is_f32():
    # CPU backend (tests/conftest.py): transfers are free, keep f32
    assert feature_transfer_dtype() == jnp.float32
    x = np.random.default_rng(0).normal(size=(8, 96)).astype(np.float32)
    out = put_features(x)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), x)


def test_bad_knob_rejected(monkeypatch):
    monkeypatch.setenv("AUTOINST_TRANSFER_DTYPE", "float16")
    with pytest.raises(ValueError):
        feature_transfer_dtype()


def _bf16_roundtrip(x):
    return np.asarray(x).astype(jnp.bfloat16).astype(np.float32)


def test_bf16_rounding_affinity_error_budget():
    """One bf16 rounding of TARL features moves affinities < 1e-2 even in
    the worst row, ~1e-3 typically -- orders below the T=0.03 cut margin."""
    rng = np.random.default_rng(1)
    n = 256
    pts = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    tarl = rng.normal(size=(n, 96)).astype(np.float32) * 0.5
    valid = jnp.ones((n,), bool)
    a32 = np.asarray(affinity_xla(jnp.asarray(pts), valid,
                                  tarl=jnp.asarray(tarl),
                                  alpha=1.0, theta=0.5, proximity=1e9))
    a16 = np.asarray(affinity_xla(jnp.asarray(pts), valid,
                                  tarl=jnp.asarray(_bf16_roundtrip(tarl)),
                                  alpha=1.0, theta=0.5, proximity=1e9))
    err = np.abs(a32 - a16)
    assert err.max() < 1e-2
    assert err.mean() < 1e-3


def test_bf16_rounding_preserves_cuts():
    """Recursive NCut labels on a blobby chunk are identical whether the
    TARL features took the bf16 wire round trip or not."""
    from autoinst_tpu.ncuts.solver import recursive_ncut_batch

    rng = np.random.default_rng(2)
    blobs, feats = [], []
    for i in range(4):
        c = np.array([6.0 * i, 0.0, 0.0])
        blobs.append(c + rng.normal(scale=0.4, size=(32, 3)))
        f = np.zeros((32, 96), np.float32)
        f[:] = rng.normal(size=96)
        feats.append(f + rng.normal(scale=0.02, size=(32, 96)))
    pts = np.concatenate(blobs).astype(np.float32)
    tarl = np.concatenate(feats).astype(np.float32)
    valid = jnp.ones((len(pts),), bool)

    labs = []
    for t in (tarl, _bf16_roundtrip(tarl)):
        A = affinity_xla(jnp.asarray(pts), valid, tarl=jnp.asarray(t),
                         alpha=1.0, theta=0.5, proximity=3.0)
        labs.append(recursive_ncut_batch(A[None], [len(pts)], T=0.03,
                                         method="eigh")[0])
    # same partition (label ids may permute)
    a, b = labs
    remap = {}
    for la, lb in zip(a.tolist(), b.tolist()):
        assert remap.setdefault(la, lb) == lb
