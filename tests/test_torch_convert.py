"""Torch->flax converter: structural coverage + transform correctness on a
synthetic state dict shaped like the reference checkpoint."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoinst_tpu.models.maskpls import torch_convert as tc
from autoinst_tpu.models.maskpls.model import MaskPLSConfig, MaskPS

from test_maskpls import tiny_batch


def synthetic_torch_state(template, rule_groups=None):
    """Random torch-layout tensors for every key the converter consumes,
    with shapes derived by inverting each transform."""
    import flax
    params = dict(flax.traverse_util.flatten_dict(template["params"],
                                                  sep="/"))
    rng = np.random.default_rng(0)
    state = {}
    if rule_groups is None:
        rule_groups = (("backbone.", tc._rules_backbone()),
                       ("decoder.", tc._rules_decoder()))

    def inv_shape(flax_path, kind):
        shape = params[flax_path + "/kernel"].shape \
            if kind.startswith("conv") else None
        if kind == "conv3":
            kci, co = shape
            return (27, kci // 27, co)
        if kind in ("conv2", "convT2"):
            kci, co = shape
            return (8, kci // 8, co)
        if kind == "conv1":
            return shape
        raise ValueError(kind)

    for prefix, rules in rule_groups:
        for base, scope, kind in rules:
            tb = prefix + base
            if kind.startswith("conv"):
                state[tb + ".kernel"] = rng.normal(
                    size=inv_shape(scope, kind)).astype(np.float32) * 0.05
            elif kind in ("bn", "ln"):
                c = params[scope + "/scale"].shape[0]
                state[tb + ".weight"] = rng.uniform(
                    0.5, 1.5, size=c).astype(np.float32)
                state[tb + ".bias"] = rng.normal(size=c).astype(
                    np.float32) * 0.05
                if kind == "bn":
                    state[tb + ".running_mean"] = rng.normal(size=c).astype(
                        np.float32) * 0.05
                    state[tb + ".running_var"] = rng.uniform(
                        0.5, 2, size=c).astype(np.float32)
            elif kind == "linear":
                k = params[scope + "/kernel"]
                state[tb + ".weight"] = rng.normal(
                    size=(k.shape[1], k.shape[0])).astype(np.float32) * 0.05
                state[tb + ".bias"] = rng.normal(size=k.shape[1]).astype(
                    np.float32) * 0.05
            elif kind == "mha":
                d = params[scope + "/q/kernel"].shape[0]
                state[tb + ".in_proj_weight"] = rng.normal(
                    size=(3 * d, d)).astype(np.float32) * 0.05
                state[tb + ".in_proj_bias"] = rng.normal(size=3 * d).astype(
                    np.float32) * 0.05
                state[tb + ".out_proj.weight"] = rng.normal(
                    size=(d, d)).astype(np.float32) * 0.05
                state[tb + ".out_proj.bias"] = rng.normal(size=d).astype(
                    np.float32) * 0.05
            elif kind == "raw":
                state[tb] = rng.normal(size=params[scope].shape).astype(
                    np.float32) * 0.05
    return state


@pytest.fixture(scope="module")
def template():
    batch, _ = tiny_batch()
    batch = jax.tree.map(jnp.asarray, batch)
    cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32)
    model = MaskPS(cfg)
    return (model, batch,
            model.init(jax.random.PRNGKey(0), batch, train=False))


def test_full_coverage_and_forward(template):
    model, batch, variables = template
    state = synthetic_torch_state(variables)
    converted = tc.convert_state_dict(state, variables)
    out, pad, logits = model.apply(converted, batch, train=False)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()

    # transform spot-checks
    import flax
    flat = flax.traverse_util.flatten_dict(converted["params"], sep="/")
    # conv permutation roundtrip: our kernel row for offset o equals the
    # torch kernel at ME's index of o
    src = state["backbone.stem.0.kernel"]
    ours = np.asarray(flat["backbone/SparseConv_0/kernel"]).reshape(27, -1,
                                                                    32)
    for our_k, off in enumerate(tc._OUR_K3):
        me_k = tc._ME_K3.index(off)
        np.testing.assert_array_equal(ours[our_k], src[me_k])
    # linear transpose
    np.testing.assert_array_equal(
        np.asarray(flat["backbone/Dense_0/kernel"]),
        state["backbone.sem_head.weight"].T)
    # batch stats landed
    stats = flax.traverse_util.flatten_dict(converted["batch_stats"],
                                            sep="/")
    np.testing.assert_array_equal(
        np.asarray(stats["backbone/MaskedBatchNorm_0/mean"]),
        state["backbone.stem.1.bn.running_mean"])


def test_missing_key_raises(template):
    _, _, variables = template
    state = synthetic_torch_state(variables)
    del state["backbone.stem.0.kernel"]
    with pytest.raises(KeyError):
        tc.convert_state_dict(state, variables)


def test_shape_mismatch_raises(template):
    _, _, variables = template
    state = synthetic_torch_state(variables)
    state["backbone.sem_head.weight"] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError):
        tc.convert_state_dict(state, variables)


def test_expected_keys_cover_state(template):
    _, _, variables = template
    state = synthetic_torch_state(variables)
    assert set(tc.expected_torch_keys()) == set(state.keys())


class TestTarlConverter:
    def _extractor(self):
        from autoinst_tpu.models.tarl.extractor import TarlExtractor
        return TarlExtractor(v0=1024, n_points=1024)

    def test_convert_and_forward(self):
        ex = self._extractor()
        template = ex._init_template()
        state = synthetic_torch_state(
            template, rule_groups=[("", tc._rules_tarl())])
        variables = tc.convert_tarl_state_dict(state, template)
        ex.variables = variables
        rng = np.random.default_rng(1)
        pts = rng.uniform(-4, 4, (600, 3))
        feats = ex.extract(pts, rng.uniform(0, 1, 600))
        assert feats.shape == (600, 96)
        assert np.isfinite(feats).all()
        # conv kernel offset permutation spot check (same as MaskPLS rule)
        import flax
        flat = dict(flax.traverse_util.flatten_dict(variables["params"],
                                                    sep="/"))
        src = state["stem.0.kernel"]           # [27, ci, co]
        got = flat["SparseConv_0/kernel"]
        k, ci, co = src.shape
        np.testing.assert_allclose(
            np.asarray(got), src[tc._PERM_K3].reshape(k * ci, co), rtol=1e-6)

    def test_no_head_params_in_template(self):
        """voxel_output=True must not create out_bnorm / sem_head params
        (the tarl.pt checkpoint has none)."""
        import flax
        ex = self._extractor()
        template = ex._init_template()
        flat = dict(flax.traverse_util.flatten_dict(template["params"],
                                                    sep="/"))
        assert not any(k.startswith("Dense_0/") for k in flat), \
            [k for k in flat if k.startswith("Dense_")]
        # exactly the converter's target paths exist
        rule_paths = {s for _, s, _ in tc._rules_tarl()}
        for p in rule_paths:
            assert any(k.startswith(p + "/") or k == p for k in flat), p

    def test_expected_tarl_keys_cover_state(self):
        ex = self._extractor()
        template = ex._init_template()
        state = synthetic_torch_state(
            template, rule_groups=[("", tc._rules_tarl())])
        assert set(tc.expected_tarl_keys()) == set(state.keys())
