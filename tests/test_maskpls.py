"""MaskPLS stack tests: sparse conv vs dense oracle, forward shapes,
loss/matcher behavior, a short training-loss-decreases run, panoptic
inference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoinst_tpu.models.maskpls import sparse
from autoinst_tpu.models.maskpls.model import (MaskPLSConfig, MaskPS,
                                               create_train_state,
                                               mask_loss, panoptic_inference,
                                               train_step)
from autoinst_tpu.models.maskpls.pseudo_dataset import PseudoDataset, collate


def dense_conv_oracle(grid_feats, weights):
    """grid_feats [X,Y,Z,Ci], weights [27,Ci,Co]: valid-everywhere 3^3 conv."""
    X, Y, Z, ci = grid_feats.shape
    co = weights.shape[-1]
    out = np.zeros((X, Y, Z, co))
    padded = np.zeros((X + 2, Y + 2, Z + 2, ci))
    padded[1:-1, 1:-1, 1:-1] = grid_feats
    for o, (di, dj, dk) in enumerate(sparse.K3_OFFSETS):
        shifted = padded[1 + di:X + 1 + di, 1 + dj:Y + 1 + dj,
                         1 + dk:Z + 1 + dk]
        out += shifted @ weights[o]
    return out


class TestSparseConv:
    def test_matches_dense_oracle(self):
        rng = np.random.default_rng(0)
        X = Y = Z = 4
        coords = np.array([(i, j, k) for i, j, k in np.ndindex(X, Y, Z)])
        # knock out some voxels to make it truly sparse
        keep = rng.random(len(coords)) > 0.3
        coords = coords[keep]
        plan = sparse.build_plan(coords, v0=256, num_levels=2)
        ci, co = 5, 7
        feats = rng.normal(size=(plan.levels[0].num, ci)).astype(np.float32)
        w = rng.normal(size=(27, ci, co)).astype(np.float32) * 0.1

        fp = np.zeros((256, ci), np.float32)
        fp[:plan.levels[0].num] = feats
        out = np.asarray(sparse.gather_conv(
            jnp.asarray(fp), jnp.asarray(plan.levels[0].nbr3), jnp.asarray(w)))

        # dense oracle on the same occupancy
        grid = np.zeros((X, Y, Z, ci))
        lv_coords = plan.levels[0].coords[:plan.levels[0].num]
        for n, (i, j, k) in enumerate(lv_coords):
            grid[i, j, k] = feats[n]
        dense = dense_conv_oracle(grid, w)
        for n, (i, j, k) in enumerate(lv_coords):
            np.testing.assert_allclose(out[n], dense[i, j, k], atol=1e-3)

    def test_down_up_roundtrip_structure(self):
        rng = np.random.default_rng(1)
        coords = rng.integers(0, 10, size=(300, 3))
        plan = sparse.build_plan(coords, v0=512, num_levels=3)
        l0 = plan.levels[0]
        # level-l plan stores the child map that PRODUCES level l+1:
        # every real fine voxel's parent lists it among its children
        for vfine in range(0, l0.num, 17):
            p = l0.parent[vfine]
            off = l0.parent_off[vfine]
            assert l0.child[p, off] == vfine
        assert l0.child.max() <= 512

    def test_voxelize_features_mean(self):
        pv = jnp.asarray(np.array([0, 0, 1, 2], np.int32))
        feats = jnp.asarray(np.array([[1.0], [3.0], [5.0], [7.0]], np.float32))
        valid = jnp.ones(4, bool)
        out = np.asarray(sparse.voxelize_features(feats, pv, valid, 4))
        np.testing.assert_allclose(out[:3, 0], [2.0, 5.0, 7.0])


def tiny_scene(seed=0, n=600, n_inst=3):
    rng = np.random.default_rng(seed)
    pts, ins = [], []
    for i in range(n_inst):
        c = np.array([i * 3.0, 0, 0])
        pts.append(c + rng.normal(scale=0.4, size=(n // n_inst, 3)))
        ins.append(np.full(n // n_inst, i, np.int32))
    xyz = np.concatenate(pts)
    ins = np.concatenate(ins)
    masks = np.stack([ins == i for i in range(n_inst)])
    return {"xyz": xyz - xyz.mean(0),
            "feats": np.concatenate([xyz, np.ones((len(xyz), 1))], 1),
            "masks": masks, "classes": np.zeros(n_inst, np.int32),
            "ins_labels": ins}


CFG = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32)


def tiny_batch(seed=0):
    items = [tiny_scene(seed)]
    return collate(items, res=0.1, v0=1024, n_points=640, t_max=8)


class TestModel:
    def test_forward_shapes(self):
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        model = MaskPS(CFG)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        (out, pad, bb_logits) = model.apply(variables, batch, train=False)
        assert out["pred_logits"].shape == (1, 8, 2)
        assert out["pred_masks"].shape == (1, 640, 8)
        assert len(out["aux_outputs"]) == 9
        assert bb_logits.shape == (1, 640, 1)

    def test_loss_and_matching(self):
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        targets = jax.tree.map(jnp.asarray, targets)
        model = MaskPS(CFG)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out, pad, _ = model.apply(variables, batch, train=False)
        total, parts = mask_loss(out, targets, jax.random.PRNGKey(1), CFG)
        assert np.isfinite(float(total))
        assert "loss_ce" in parts and "8_loss_dice" in parts

    @pytest.mark.slow
    def test_training_reduces_loss(self):
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        targets = jax.tree.map(jnp.asarray, targets)
        cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                            lr=1e-3, batch_acc=1)
        state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
        losses = []
        for step in range(12):
            state, total, parts = train_step(
                state, batch, targets, jax.random.PRNGKey(step), cfg)
            losses.append(float(total))
        # matching + point sampling are stochastic: compare trend, not steps
        assert np.mean(losses[-3:]) < np.mean(losses[:2]), losses


class TestMatchingModes:
    """match_exact / match_joint stabilizers (round-4 churn diagnosis)."""

    def _setup(self, cfg):
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        targets = jax.tree.map(jnp.asarray, targets)
        model = MaskPS(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out, _, _ = model.apply(variables, batch, train=False)
        return out, targets

    def test_exact_costs_match_numpy_oracle(self):
        from autoinst_tpu.models.maskpls.model import matching_costs
        cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                            match_exact=True)
        out, targets = self._setup(cfg)
        costs = np.asarray(matching_costs(out, targets,
                                          jax.random.PRNGKey(3), cfg))[0]
        # numpy oracle on the valid slice only
        pv = np.asarray(targets["point_valid"][0]).astype(bool)
        logits = np.asarray(out["pred_logits"][0])
        masks = np.asarray(out["pred_masks"][0])[pv]        # [Pv, Q]
        tmask = np.asarray(targets["masks"][0])[:, pv]      # [T, Pv]
        tvalid = np.asarray(targets["valid"][0])
        prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        m = masks.T                                          # [Q, Pv]
        pos = np.logaddexp(0, -m)
        neg = np.logaddexp(0, m)
        cmask = (pos @ tmask.T + neg @ (1 - tmask).T) / pv.sum()
        sig = 1 / (1 + np.exp(-m))
        num = 2 * (sig @ tmask.T)
        den = sig.sum(1, keepdims=True) + tmask.sum(1)[None]
        cdice = 1 - (num + 1) / (den + 1)
        cls = np.asarray(targets["classes"][0])
        ccls = -prob[:, cls]
        oracle = cfg.w_mask * cmask + cfg.w_ce * ccls + cfg.w_dice * cdice
        oracle = np.where(tvalid[None, :], oracle, 1e6)
        np.testing.assert_allclose(costs, oracle, rtol=1e-4, atol=1e-4)

    def test_exact_costs_deterministic(self):
        from autoinst_tpu.models.maskpls.model import matching_costs
        cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                            match_exact=True)
        out, targets = self._setup(cfg)
        c1 = matching_costs(out, targets, jax.random.PRNGKey(1), cfg)
        c2 = matching_costs(out, targets, jax.random.PRNGKey(2), cfg)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_joint_matching_trains(self):
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        targets = jax.tree.map(jnp.asarray, targets)
        cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                            lr=1e-3, batch_acc=1, match_exact=True,
                            match_joint=True)
        state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
        losses = []
        for step in range(6):
            state, total, _ = train_step(
                state, batch, targets, jax.random.PRNGKey(step), cfg)
            losses.append(float(total))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


class TestPanoptic:
    def test_recovers_clear_instances(self):
        # construct logits/masks where queries 0,1 are confident objects
        q, n = 4, 100
        logits = np.full((q, 2), -5.0)
        logits[:, 1] = 5.0          # default: no-object
        logits[0] = [5.0, -5.0]
        logits[1] = [5.0, -5.0]
        masks = np.full((n, q), -10.0)
        masks[:50, 0] = 10.0
        masks[50:, 1] = 10.0
        sem, ins, confs = panoptic_inference(logits, masks,
                                             np.ones(n, bool))
        assert len(np.unique(ins[:50])) == 1
        assert len(np.unique(ins[50:])) == 1
        assert ins[0] != ins[60]
        assert (ins > 0).all()

    def test_no_objects(self):
        q, n = 4, 50
        logits = np.tile([[-5.0, 5.0]], (q, 1))
        masks = np.zeros((n, q))
        sem, ins, confs = panoptic_inference(logits, masks, np.ones(n, bool))
        assert (ins == 0).all()


class TestPseudoDataset:
    def test_loads_exported_chunks(self, tmp_path):
        d = tmp_path / "seq0"
        d.mkdir()
        scene = tiny_scene(3)
        np.savez(d / "000000.npz", pts=scene["xyz"],
                 ncut_labels=scene["ins_labels"],
                 kitti_labels=scene["ins_labels"],
                 cluster_labels=np.zeros_like(scene["ins_labels"]),
                 semantic=np.zeros_like(scene["ins_labels"]))
        ds = PseudoDataset(str(tmp_path), min_points=50)
        assert len(ds) == 1
        item = ds[0]
        assert item["masks"].shape[0] == 3
        assert np.allclose(item["xyz"].mean(0), 0, atol=1e-6)
        batch, targets = collate([item], 0.1, 1024, 640, 8)
        assert targets["masks"].shape == (1, 8, 640)
        assert targets["valid"].sum() == 3

    def test_loads_leaf_npz_directory(self, tmp_path):
        # round-3 chain regression: the relabel output's leaf dir
        # (train/0, a flat folder of .npz) must load directly too
        scene = tiny_scene(4)
        np.savez(tmp_path / "000000.npz", pts=scene["xyz"],
                 ncut_labels=scene["ins_labels"])
        np.savez(tmp_path / "000002.npz", pts=scene["xyz"],
                 ncut_labels=scene["ins_labels"])
        ds = PseudoDataset(str(tmp_path), min_points=50)
        assert len(ds) == 2
        assert ds[0]["masks"].shape[0] == 3


def test_point_pool_not_flooded_by_invalid_slots():
    """Invalid target slots must fall back to uniform fill, not point 0.

    With t_max 40 and ~10 real masks the old behavior put ~half the pool
    on index 0, diluting every mask/dice gradient (suspected cause of the
    round-3 diffuse-sigmoid stall)."""
    from autoinst_tpu.models.maskpls.model import sample_point_pool
    t_max, n = 8, 640
    cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32)
    masks = np.zeros((1, t_max, n), np.float32)
    masks[0, 0, 100:200] = 1.0
    masks[0, 1, 300:400] = 1.0          # 2 valid of 8 slots
    valid = np.zeros((1, t_max), bool)
    valid[0, :2] = True
    targets = {"masks": jnp.asarray(masks), "valid": jnp.asarray(valid),
               "point_valid": jnp.ones((1, n), bool)}
    pool = np.asarray(sample_point_pool(jax.random.PRNGKey(0), targets,
                                        cfg, n))
    frac_zero = (pool == 0).mean()
    assert frac_zero < 0.05, f"pool flooded with point 0: {frac_zero:.2%}"
    # each valid mask is represented by its own points
    in_m0 = ((pool >= 100) & (pool < 200)).mean()
    in_m1 = ((pool >= 300) & (pool < 400)).mean()
    assert in_m0 > 0.1 and in_m1 > 0.1


class TestMixedPrecision:
    def test_bf16_backbone_close_to_f32(self):
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        cfg32 = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32)
        cfg16 = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                              compute_dtype="bfloat16")
        m32, m16 = MaskPS(cfg32), MaskPS(cfg16)
        v = m32.init(jax.random.PRNGKey(0), batch, train=False)
        out32, _, _ = m32.apply(v, batch, train=False)
        out16, _, _ = m16.apply(v, batch, train=False)
        a = np.asarray(out32["pred_masks"])
        b = np.asarray(out16["pred_masks"])
        assert np.isfinite(b).all()
        # bf16 GEMMs: loose agreement is expected
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.15


class TestMixedPrecisionTraining:
    @pytest.mark.slow
    def test_bf16_training_reduces_loss(self):
        """bf16 backbone GEMMs with f32 params/optimizer: training still
        converges (mixed-precision recipe for the MXU)."""
        batch, targets = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        targets = jax.tree.map(jnp.asarray, targets)
        cfg = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                            lr=1e-3, batch_acc=1, compute_dtype="bfloat16")
        state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
        losses = []
        for step in range(12):
            state, total, parts = train_step(
                state, batch, targets, jax.random.PRNGKey(step), cfg)
            losses.append(float(total))
        assert np.all(np.isfinite(losses)), losses
        assert np.mean(losses[-3:]) < np.mean(losses[:2]), losses


def test_remat_is_pure_memory_knob():
    """remat=True must not change the parameter tree (names/shapes) nor
    the forward values — it only reduces backward HBM."""
    import flax
    batch, _ = tiny_batch()
    batch = jax.tree.map(jnp.asarray, batch)
    cfg0 = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32)
    cfg1 = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                         remat=True)
    from autoinst_tpu.models.maskpls.model import MaskPS
    m0, m1 = MaskPS(cfg0), MaskPS(cfg1)
    v0 = m0.init(jax.random.PRNGKey(0), batch, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), batch, train=False)
    f0 = flax.traverse_util.flatten_dict(v0["params"], sep="/")
    f1 = flax.traverse_util.flatten_dict(v1["params"], sep="/")
    assert set(f0) == set(f1)
    out0, _, _ = m0.apply(v0, batch, train=False)
    out1, _, _ = m1.apply(v0, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out0["pred_masks"]),
                                  np.asarray(out1["pred_masks"]))


class TestKnnUpGrid:
    def test_matches_exact_on_dense_scene(self):
        """Grid-restricted kNN-up ~equals the brute-force exact result on a
        dense scene. Voxel coords are lower corners, so a point near the
        upper face of its cell can have a true 3rd-NN corner at offset +2
        (outside the 27-cube): those rows are rare (<1%) and the inverse-d2
        blend stays close; all other rows must match to float tolerance."""
        rng = np.random.default_rng(3)
        # a dense slab: every 0.1m voxel in a 12x12x4 grid occupied
        base = np.stack(np.meshgrid(*[np.arange(12)] * 2, np.arange(4),
                                    indexing="ij"), -1).reshape(-1, 3)
        xyz = (base + rng.uniform(0.2, 0.8, base.shape)) * 0.1
        plan = sparse.build_plan(sparse.quantize_points(xyz, 0.1), v0=1024,
                                 num_levels=2)
        batch = sparse.plans_to_batch([plan], [xyz.astype(np.float32)],
                                      [np.ones((len(xyz), 1), np.float32)],
                                      0.1, n_points=len(xyz) + 16)
        lvl = batch["levels"][0]
        v = lvl["nbr3"].shape[1]
        feats = rng.normal(size=(v, 8)).astype(np.float32)
        exact = sparse.knn_up(jnp.asarray(lvl["coords"][0]),
                              jnp.asarray(lvl["valid"][0]),
                              jnp.asarray(feats),
                              jnp.asarray(batch["pt_coords"][0]))
        grid = sparse.knn_up_grid(jnp.asarray(lvl["coords"][0]),
                                  jnp.asarray(feats),
                                  jnp.asarray(batch["pt_coords"][0]),
                                  jnp.asarray(batch["point_voxel"][0]),
                                  jnp.asarray(lvl["nbr3"][0]))
        val = np.asarray(batch["pt_valid"][0])
        g, e = np.asarray(grid)[val], np.asarray(exact)[val]
        row_exact = np.all(np.abs(g - e) <= 1e-5 + 1e-4 * np.abs(e), axis=1)
        assert row_exact.mean() > 0.99, row_exact.mean()
        # mismatching rows swap a low-weight neighbor; with uncorrelated
        # random features the error bound is loose (real features are
        # spatially smooth, so practical error is far smaller)
        scale = np.abs(e).mean()
        assert np.abs(g - e)[~row_exact].max() < 2.0 * scale
        # padded points: finite (zeros), not NaN
        assert np.isfinite(np.asarray(grid)).all()

    def test_close_on_sparse_scene(self):
        """On sparse clutter (singleton voxels) the grid variant degenerates
        toward 1-NN: far neighbors outside the 3^3 cube get zero weight
        instead of their small 1/d^2 share. Documented deviation
        (docs/PARITY.md); bound the drift on a worst-case uniform scene."""
        rng = np.random.default_rng(4)
        xyz = rng.uniform(0, 3.0, size=(400, 3))
        plan = sparse.build_plan(sparse.quantize_points(xyz, 0.1), v0=1024,
                                 num_levels=2)
        batch = sparse.plans_to_batch([plan], [xyz.astype(np.float32)],
                                      [np.ones((len(xyz), 1), np.float32)],
                                      0.1, n_points=512)
        lvl = batch["levels"][0]
        v = lvl["nbr3"].shape[1]
        feats = rng.normal(size=(v, 8)).astype(np.float32)
        exact = np.asarray(sparse.knn_up(
            jnp.asarray(lvl["coords"][0]), jnp.asarray(lvl["valid"][0]),
            jnp.asarray(feats), jnp.asarray(batch["pt_coords"][0])))
        grid = np.asarray(sparse.knn_up_grid(
            jnp.asarray(lvl["coords"][0]), jnp.asarray(feats),
            jnp.asarray(batch["pt_coords"][0]),
            jnp.asarray(batch["point_voxel"][0]),
            jnp.asarray(lvl["nbr3"][0])))
        val = np.asarray(batch["pt_valid"][0])
        err = np.abs(grid[val] - exact[val]).mean()
        scale = np.abs(exact[val]).mean()
        assert err / scale < 0.3, (err, scale)

    def test_model_forward_modes_close(self):
        """End-to-end backbone outputs with grid vs exact kNN-up agree on a
        dense tiny scene."""
        batch, _ = tiny_batch()
        batch = jax.tree.map(jnp.asarray, batch)
        cfg_g = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                              knn_mode="grid")
        cfg_e = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                              knn_mode="exact")
        mg, me = MaskPS(cfg_g), MaskPS(cfg_e)
        v = mg.init(jax.random.PRNGKey(0), batch, train=False)
        outg, _, _ = mg.apply(v, batch, train=False)
        oute, _, _ = me.apply(v, batch, train=False)
        a, b = np.asarray(outg["pred_masks"]), np.asarray(oute["pred_masks"])
        assert np.isfinite(a).all()
        denom = np.abs(b).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.1, np.abs(a - b).mean()


class TestConvVJP:
    """Memory-light conv formulations must match the naive dense math in
    value AND gradients (gather_conv has a hand-written VJP)."""

    def test_gather_conv_value_and_grads(self):
        rng = np.random.default_rng(5)
        v, k, ci, co = 40, 27, 8, 6
        feats = jnp.asarray(rng.normal(size=(v, ci)).astype(np.float32))
        nbr = jnp.asarray(rng.integers(0, v + 1, size=(v, k)).astype(
            np.int32))  # includes sentinel rows
        w = jnp.asarray(rng.normal(size=(k, ci, co)).astype(np.float32))

        def naive(feats, w):
            ext = jnp.concatenate([feats, jnp.zeros((1, ci))], 0)
            g = ext[nbr]                         # [V, K, Ci]
            return jnp.einsum("vki,kio->vo", g, w)

        def ours(feats, w):
            return sparse.gather_conv(feats, nbr, w)

        np.testing.assert_allclose(np.asarray(ours(feats, w)),
                                   np.asarray(naive(feats, w)), atol=1e-4)
        cot = jnp.asarray(rng.normal(size=(v, co)).astype(np.float32))
        g_ours = jax.grad(lambda f, ww: jnp.sum(ours(f, ww) * cot),
                          argnums=(0, 1))(feats, w)
        g_ref = jax.grad(lambda f, ww: jnp.sum(naive(f, ww) * cot),
                         argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(g_ours[0]),
                                   np.asarray(g_ref[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_ours[1]),
                                   np.asarray(g_ref[1]), atol=1e-4)

    def test_gather_conv_vmap_grad(self):
        rng = np.random.default_rng(6)
        b, v, k, ci, co = 2, 16, 5, 4, 3
        feats = jnp.asarray(rng.normal(size=(b, v, ci)).astype(np.float32))
        nbr = jnp.asarray(rng.integers(0, v + 1, (b, v, k)).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(k, ci, co)).astype(np.float32))

        def loss(f, ww):
            out = jax.vmap(
                lambda fb, nb: sparse.gather_conv(fb, nb, ww))(f, nbr)
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(feats, w)
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(g)).all() for g in grads)

    def test_up_conv_matches_per_voxel_kernel(self):
        rng = np.random.default_rng(7)
        vc, vf, ci, co = 12, 30, 5, 4
        feats = jnp.asarray(rng.normal(size=(vc, ci)).astype(np.float32))
        parent = jnp.asarray(rng.integers(0, vc + 1, vf).astype(np.int32))
        poff = jnp.asarray(rng.integers(0, 8, vf).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(8, ci, co)).astype(np.float32))

        def naive(feats, w):
            ext = jnp.concatenate([feats, jnp.zeros((1, ci))], 0)
            g = ext[parent]
            return jnp.einsum("vi,vio->vo", g, w[poff])

        ours = sparse.up_conv(feats, parent, poff, w)
        np.testing.assert_allclose(np.asarray(ours),
                                   np.asarray(naive(feats, w)), atol=1e-4)
        cot = jnp.asarray(rng.normal(size=(vf, co)).astype(np.float32))
        g_ours = jax.grad(lambda f, ww: jnp.sum(
            sparse.up_conv(f, parent, poff, ww) * cot), (0, 1))(feats, w)
        g_ref = jax.grad(lambda f, ww: jnp.sum(naive(f, ww) * cot),
                         (0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(g_ours[0]),
                                   np.asarray(g_ref[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_ours[1]),
                                   np.asarray(g_ref[1]), atol=1e-4)


def test_knn_up_grid_cell_matches_gathered_coords():
    """Arithmetic candidate corners (cell= path) must reproduce the
    gathered-coords path."""
    rng = np.random.default_rng(9)
    xyz = rng.uniform(0, 2.0, size=(500, 3))
    plan = sparse.build_plan(sparse.quantize_points(xyz, 0.1), v0=1024,
                             num_levels=2)
    batch = sparse.plans_to_batch([plan], [xyz.astype(np.float32)],
                                  [np.ones((len(xyz), 1), np.float32)],
                                  0.1, n_points=512)
    lvl = batch["levels"][0]
    v = lvl["nbr3"].shape[1]
    feats = rng.normal(size=(v, 8)).astype(np.float32)
    args = (jnp.asarray(lvl["coords"][0]), jnp.asarray(feats),
            jnp.asarray(batch["pt_coords"][0]),
            jnp.asarray(batch["point_voxel"][0]),
            jnp.asarray(lvl["nbr3"][0]))
    a = np.asarray(sparse.knn_up_grid(*args))
    b = np.asarray(sparse.knn_up_grid(*args, cell=lvl["cell"]))
    val = np.asarray(batch["pt_valid"][0])
    np.testing.assert_allclose(b[val], a[val], rtol=1e-4, atol=1e-5)


class TestLevelWidthPlanning:
    """Regression tests for ADVICE r1 (medium): plan_level_counts must
    mirror build_plan's origin shift, and dataset_level_widths must cover
    subsample-induced origin parity changes."""

    def test_plan_level_counts_match_build_plan(self):
        rng = np.random.default_rng(7)
        for trial in range(20):
            # random offsets exercise both origin parities at every level
            coords = rng.integers(0, 40, (500, 3)) + rng.integers(-64, 64, 3)
            counts = sparse.plan_level_counts(coords)
            plan = sparse.build_plan(coords, v0=1024)
            actual = [lvl.num for lvl in plan.levels]
            assert counts == actual, (trial, counts, actual)

    def test_dataset_level_widths_cover_subsampled_epochs(self, tmp_path):
        from autoinst_tpu.models.maskpls.pseudo_dataset import (
            PseudoDataset, dataset_level_widths)
        rng = np.random.default_rng(3)
        d = tmp_path / "seq"
        d.mkdir()
        for i in range(6):
            pts = rng.uniform(-20, 20, (4000, 3))
            np.savez(d / f"chunk_{i}.npz", pts=pts,
                     ncut_labels=rng.integers(0, 5, 4000))
        res, v0 = 0.1, 512
        ds = PseudoDataset(str(tmp_path), sub_pts=3000, subsample=True,
                           aug=True, split="train", seed=1)
        widths = dataset_level_widths(ds, res, v0)
        # many subsampled+augmented epochs: counts must never exceed widths
        for epoch in range(5):
            for i in range(len(ds)):
                it = ds[i]
                q = sparse.quantize_points(it["xyz"], res)
                plan = sparse.build_plan(q, v0, level_widths=widths)
                for lvl, lw in zip(plan.levels, widths):
                    assert lvl.coords.shape[0] == lw, (
                        f"width grew {lvl.coords.shape[0]} > {lw}: second "
                        "shape set => recompile => axon crash risk")


def test_lr_schedule_shapes():
    """warmup+cosine schedule (deviation from the reference's constant-LR
    AdamW, mask_model.py:107-109): constant when lr_total_steps=0, else
    ramps to peak at warmup and decays to lr*min_frac at the horizon."""
    from autoinst_tpu.models.maskpls.model import MaskPLSConfig, lr_schedule
    const = lr_schedule(MaskPLSConfig(lr=3e-4))
    assert const == 3e-4
    cfg = MaskPLSConfig(lr=5e-4, lr_warmup=100, lr_total_steps=1000,
                        lr_min_frac=0.01)
    sched = lr_schedule(cfg)
    assert float(sched(0)) <= 5e-6 * 1.01
    assert abs(float(sched(100)) - 5e-4) < 1e-8
    assert float(sched(1000)) <= 5e-6 * 1.01
    # monotone decay after warmup
    vals = [float(sched(s)) for s in (100, 300, 600, 1000)]
    assert all(a >= b for a, b in zip(vals, vals[1:])), vals
