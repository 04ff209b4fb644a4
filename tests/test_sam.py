"""JAX-native SAM vs the torch twin (tests/torch_sam_twin.py) + AMG/adapter
contracts (reference 2D-VFMs/SAM/adapter.py:30-67)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from autoinst_tpu.models.segmentation2d.sam.amg import (SamMaskGenerator,
                                                        build_point_grid)
from autoinst_tpu.models.segmentation2d.sam.convert import \
    convert_sam_state_dict
from autoinst_tpu.models.segmentation2d.sam.model import Sam, SamConfig

from torch_sam_twin import TwinSam, randomize

CFG = SamConfig(img_size=64, enc_dim=32, enc_depth=3, enc_heads=2,
                global_idx=(1,), window=3, out_dim=16, dec_heads=2,
                dec_mlp=32, iou_mlp_dim=16)
# grid = 4, window 3: window partition must pad 4 -> 6 (exercises padding)


@pytest.fixture(scope="module")
def models():
    twin = randomize(TwinSam(img_size=CFG.img_size, enc_dim=CFG.enc_dim,
                             enc_depth=CFG.enc_depth,
                             enc_heads=CFG.enc_heads, window=CFG.window,
                             global_idx=CFG.global_idx,
                             out_dim=CFG.out_dim, dec_heads=CFG.dec_heads,
                             dec_mlp=CFG.dec_mlp,
                             iou_mlp_dim=CFG.iou_mlp_dim), seed=7)
    twin.eval()
    twin.requires_grad_(False)
    model = Sam(CFG)
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (1, CFG.img_size, CFG.img_size, 3))
    pts = rng.uniform(0, CFG.img_size, (1, 3, 2))
    lbl = np.array([[1, 0, -1]], np.int32)
    s4 = CFG.grid * 4
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                          jnp.asarray(pts), jnp.asarray(lbl),
                          jnp.zeros((1, s4, s4, 1)))
    state = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = convert_sam_state_dict(state, template)
    return twin, model, variables


def _inputs(seed=1, n_pts=3):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (1, CFG.img_size, CFG.img_size, 3)) * 2 - 1
    pts = rng.uniform(4, CFG.img_size - 4, (1, n_pts, 2))
    lbl = np.array([[1, 0, -1][:n_pts]], np.float32)
    return img, pts, lbl


def test_encoder_parity(models):
    twin, model, variables = models
    img, _, _ = _inputs()
    ours = model.apply(variables, jnp.asarray(img), method=model.encode)
    theirs = twin.image_encoder(
        torch.tensor(img, dtype=torch.float32).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_prompt_parity(models):
    twin, model, variables = models
    _, pts, lbl = _inputs()
    sparse, dense = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(lbl.astype(np.int32)),
        method=lambda m, c, l: m.prompt(c, l))
    t_sparse, t_dense = twin.prompt_encoder(
        torch.tensor(pts, dtype=torch.float32),
        torch.tensor(lbl), pad=False)
    np.testing.assert_allclose(np.asarray(sparse), t_sparse.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(dense), t_dense.numpy().transpose(0, 2, 3, 1),
        atol=2e-5)


def test_mask_input_dense_parity(models):
    twin, model, variables = models
    rng = np.random.default_rng(3)
    s4 = CFG.grid * 4
    mask = rng.normal(size=(1, s4, s4, 1)).astype(np.float32)
    _, pts, lbl = _inputs()
    _, dense = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(lbl.astype(np.int32)),
        jnp.asarray(mask), method=lambda m, c, l, mi: m.prompt(c, l, mi))
    _, t_dense = twin.prompt_encoder(
        torch.tensor(pts, dtype=torch.float32), torch.tensor(lbl),
        masks=torch.tensor(mask).permute(0, 3, 1, 2), pad=False)
    np.testing.assert_allclose(
        np.asarray(dense), t_dense.numpy().transpose(0, 2, 3, 1),
        atol=2e-5)


def test_full_forward_parity(models):
    """Whole path: encoder + prompt + two-way decoder + upscale + IoU."""
    twin, model, variables = models
    img, pts, lbl = _inputs(seed=5)
    masks, iou = model.apply(variables, jnp.asarray(img), jnp.asarray(pts),
                             jnp.asarray(lbl.astype(np.int32)))
    t_masks, t_iou = twin(
        torch.tensor(img, dtype=torch.float32).permute(0, 3, 1, 2),
        torch.tensor(pts, dtype=torch.float32), torch.tensor(lbl))
    np.testing.assert_allclose(np.asarray(iou), t_iou.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(masks), t_masks.numpy(),
                               atol=3e-4)


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert np.isclose(g.min(), 1 / 8) and np.isclose(g.max(), 7 / 8)


def test_amg_generates_mask_dicts(models):
    _, model, variables = models
    gen = SamMaskGenerator(variables, CFG, points_per_side=4,
                           points_per_batch=8, pred_iou_thresh=-1e9,
                           stability_score_thresh=0.0)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    masks = gen(image)
    assert masks, "relaxed thresholds must yield at least one mask"
    areas = [m["area"] for m in masks]
    assert areas == sorted(areas, reverse=True)
    for m in masks:
        assert set(m) == {"segmentation", "bbox", "area", "predicted_iou",
                          "stability_score"}
        assert m["segmentation"].shape == (48, 64)
        assert m["segmentation"].dtype == bool
        assert m["area"] == int(m["segmentation"].sum())
        x, y, w, h = m["bbox"]
        ys, xs = np.nonzero(m["segmentation"])
        assert (x, y) == (xs.min(), ys.min())
        assert (w, h) == (xs.max() - xs.min(), ys.max() - ys.min())


def test_amg_through_mask_adapter(models, tmp_path):
    """SamMaskGenerator drops into MaskAdapter: the npz[masks] cache the
    dataset layer reads (kitti_odometry_dataset.py:207-222)."""
    from autoinst_tpu.models.segmentation2d.adapter import MaskAdapter
    _, model, variables = models
    gen = SamMaskGenerator(variables, CFG, points_per_side=3,
                           points_per_batch=9, pred_iou_thresh=-1e9,
                           stability_score_thresh=0.0)

    class DS:
        def __len__(self):
            return 1

        def get_image(self, cam, i):
            return np.random.default_rng(i).integers(
                0, 255, (48, 64, 3), dtype=np.uint8)

    adapter = MaskAdapter(generator=gen)
    adapter.run_on_folder(DS(), "cam2", str(tmp_path))
    data = np.load(tmp_path / "000000.npz", allow_pickle=True)
    masks = data["masks"]
    assert len(masks) >= 1
    assert masks[0]["segmentation"].shape == (48, 64)


def test_run_cli_writes_caches(tmp_path, monkeypatch):
    """Reference 2D-VFMs/SAM/run.py surface: folder in, npz caches out,
    existing outputs skipped."""
    import sys
    from PIL import Image
    from autoinst_tpu.models.segmentation2d.sam import run as sam_run
    img_dir = tmp_path / "img"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"{i:06d}.png")
    monkeypatch.setattr(sam_run, "ARCHS", {"vit_h": lambda: CFG})
    monkeypatch.setattr(
        sys, "argv",
        ["run", "-i", str(img_dir), "-o", str(out_dir), "-f", "png"])
    sam_run.main()
    files = sorted(p.name for p in out_dir.iterdir())
    assert files == ["000000.npz", "000001.npz"]
    data = np.load(out_dir / "000000.npz", allow_pickle=True)
    assert isinstance(data["masks"].tolist(), list)
