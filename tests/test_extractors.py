"""Feature-factory tests: TARL extractor, DINO dense ViT, SLIC masks."""

import os
import zlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoinst_tpu.models.segmentation2d import MaskAdapter, slic_superpixels
from autoinst_tpu.models.segmentation2d.slic import labels_to_masks


class TestSLIC:
    def test_segments_shapes_and_coverage(self):
        rng = np.random.default_rng(0)
        img = np.zeros((60, 90, 3), np.uint8)
        img[:, :45] = [200, 30, 30]
        img[:, 45:] = [30, 30, 200]
        img = img + rng.integers(0, 20, img.shape).astype(np.uint8)
        labels = slic_superpixels(img, n_segments=24)
        assert labels.shape == (60, 90)
        assert len(np.unique(labels)) > 8
        masks = labels_to_masks(labels, min_area=10)
        total = sum(m["area"] for m in masks)
        assert total <= 60 * 90
        # color boundary respected: few superpixels straddle the middle
        straddle = 0
        for m in masks:
            seg = m["segmentation"]
            left, right = seg[:, :45].sum(), seg[:, 45:].sum()
            if left > 20 and right > 20:
                straddle += 1
        assert straddle <= 2

    def test_adapter_writes_cache(self, tmp_path):
        class FakeDS:
            def __len__(self):
                return 2

            def get_image(self, cam, i):
                rng = np.random.default_rng(i)
                return rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)

        ad = MaskAdapter(n_segments=12, min_area=5)
        ad.run_on_folder(FakeDS(), "cam2", str(tmp_path))
        data = np.load(tmp_path / "000000.npz", allow_pickle=True)["masks"]
        assert len(data) > 0
        assert "segmentation" in data[0]


class TestTarlExtractor:
    def test_extract_and_cache_contract(self, tmp_path):
        from autoinst_tpu.models.tarl import TarlExtractor
        ex = TarlExtractor(resolution=0.1, v0=2048, n_points=1024)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-4, 4, (700, 3))
        intensity = rng.uniform(0, 1, 700)
        feats = ex.extract(pts, intensity)
        assert feats.shape == (700, 96)
        assert np.isfinite(feats).all()

        class FakeDS:
            def __len__(self):
                return 1

            def get_point_cloud(self, i):
                return pts

            def get_intensity(self, i):
                return intensity

        ex.run_on_folder(FakeDS(), str(tmp_path))
        with open(tmp_path / "000000.bin", "rb") as fh:
            raw = zlib.decompress(fh.read())
        arr = np.frombuffer(raw, np.float32).reshape(-1, 96)
        np.testing.assert_allclose(arr, feats, atol=1e-6)


class TestDinoViT:
    def test_dense_feature_shape(self):
        from autoinst_tpu.models.dino import ViTDenseExtractor
        ex = ViTDenseExtractor(stride=7)
        img = np.random.default_rng(2).integers(
            0, 255, (42, 70, 3)).astype(np.uint8)
        fmap = ex.extract(img)
        # reference pads to the NEXT patch multiple first
        # (extractor.py:142-156): 42->56, 70->84;
        # (H - patch)//stride + 1 = (56-14)//7+1 = 7 ; (84-14)//7+1 = 11
        assert fmap.shape == (7, 11, 384)
        assert np.isfinite(fmap).all()


class TestDinoConverter:
    """Torch-twin oracle: the converter + our ViT must reproduce the
    reference dinov2 block math (pre-norm attn/mlp with LayerScale,
    token facet = raw block output)."""

    CFG = dict(dim=32, heads=2, depth=3, patch=4, pos_grid=3, facet_block=2)

    def _synthetic_state(self, rng):
        d, depth, patch = self.CFG["dim"], self.CFG["depth"], self.CFG["patch"]
        g = self.CFG["pos_grid"]
        s = {"cls_token": rng.normal(size=(1, 1, d)),
             "pos_embed": rng.normal(size=(1, g * g + 1, d)) * 0.02,
             "patch_embed.proj.weight": rng.normal(
                 size=(d, 3, patch, patch)) * 0.05,
             "patch_embed.proj.bias": rng.normal(size=d) * 0.05}
        for i in range(depth):
            tb = f"blocks.{i}"
            s[f"{tb}.norm1.weight"] = rng.uniform(0.5, 1.5, d)
            s[f"{tb}.norm1.bias"] = rng.normal(size=d) * 0.05
            s[f"{tb}.norm2.weight"] = rng.uniform(0.5, 1.5, d)
            s[f"{tb}.norm2.bias"] = rng.normal(size=d) * 0.05
            s[f"{tb}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)) * 0.05
            s[f"{tb}.attn.qkv.bias"] = rng.normal(size=3 * d) * 0.05
            s[f"{tb}.attn.proj.weight"] = rng.normal(size=(d, d)) * 0.05
            s[f"{tb}.attn.proj.bias"] = rng.normal(size=d) * 0.05
            s[f"{tb}.ls1.gamma"] = rng.uniform(0.5, 1.5, d)
            s[f"{tb}.ls2.gamma"] = rng.uniform(0.5, 1.5, d)
            s[f"{tb}.mlp.fc1.weight"] = rng.normal(size=(4 * d, d)) * 0.05
            s[f"{tb}.mlp.fc1.bias"] = rng.normal(size=4 * d) * 0.05
            s[f"{tb}.mlp.fc2.weight"] = rng.normal(size=(d, 4 * d)) * 0.05
            s[f"{tb}.mlp.fc2.bias"] = rng.normal(size=d) * 0.05
        return {k: np.asarray(v, np.float32) for k, v in s.items()}

    def _torch_forward(self, state, img):
        """Reference dinov2 math in torch (stride = patch, native grid so
        pos-embed interpolation is identity)."""
        import torch
        import torch.nn.functional as F
        t = {k: torch.from_numpy(v) for k, v in state.items()}
        d, heads = self.CFG["dim"], self.CFG["heads"]
        x = F.conv2d(torch.from_numpy(img).permute(0, 3, 1, 2),
                     t["patch_embed.proj.weight"],
                     t["patch_embed.proj.bias"], stride=self.CFG["patch"])
        b, _, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)                      # [B, hw, D]
        x = x + t["pos_embed"][:, 1:]
        cls = t["cls_token"] + t["pos_embed"][:, :1]
        x = torch.cat([cls.expand(b, -1, -1), x], dim=1)
        for i in range(self.CFG["depth"]):
            tb = f"blocks.{i}"
            y = F.layer_norm(x, (d,), t[f"{tb}.norm1.weight"],
                             t[f"{tb}.norm1.bias"])
            qkv = F.linear(y, t[f"{tb}.attn.qkv.weight"],
                           t[f"{tb}.attn.qkv.bias"])
            n = y.shape[1]
            qkv = qkv.reshape(b, n, 3, heads, d // heads).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = torch.softmax(q @ k.transpose(-2, -1)
                                 / np.sqrt(d // heads), dim=-1)
            o = (attn @ v).transpose(1, 2).reshape(b, n, d)
            o = F.linear(o, t[f"{tb}.attn.proj.weight"],
                         t[f"{tb}.attn.proj.bias"])
            x = x + t[f"{tb}.ls1.gamma"] * o
            y = F.layer_norm(x, (d,), t[f"{tb}.norm2.weight"],
                             t[f"{tb}.norm2.bias"])
            y = F.linear(y, t[f"{tb}.mlp.fc1.weight"], t[f"{tb}.mlp.fc1.bias"])
            y = F.gelu(y)
            y = F.linear(y, t[f"{tb}.mlp.fc2.weight"], t[f"{tb}.mlp.fc2.bias"])
            x = x + t[f"{tb}.ls2.gamma"] * y
            if i == self.CFG["facet_block"]:
                out = x
        return out[:, 1:].reshape(b, h, w, d).numpy()

    def test_matches_torch_oracle(self):
        from autoinst_tpu.models.dino.vit import (ViTDense,
                                                  convert_dinov2_state_dict)
        rng = np.random.default_rng(0)
        state = self._synthetic_state(rng)
        cfg = self.CFG
        model = ViTDense(dim=cfg["dim"], heads=cfg["heads"],
                         depth=cfg["depth"], patch=cfg["patch"],
                         pos_grid=cfg["pos_grid"],
                         facet_block=cfg["facet_block"])
        size = cfg["patch"] * cfg["pos_grid"]
        img = rng.normal(size=(1, size, size, 3)).astype(np.float32)
        template = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                              stride=cfg["patch"])
        variables = convert_dinov2_state_dict(state, template,
                                              depth=cfg["depth"])
        ours = np.asarray(model.apply(variables, jnp.asarray(img),
                                      stride=cfg["patch"]))
        oracle = self._torch_forward(state, img)
        np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-4)

    def test_expected_keys(self):
        from autoinst_tpu.models.dino.vit import expected_dinov2_keys
        state = self._synthetic_state(np.random.default_rng(1))
        assert set(expected_dinov2_keys(self.CFG["depth"])) == set(state)

    def test_padding_matches_reference_rounding(self):
        from autoinst_tpu.models.dino.vit import pad_to_patch_multiple
        img = np.ones((370, 1226, 3), np.float32)   # KITTI camera size
        out = pad_to_patch_multiple(img, 14)
        assert out.shape == (378, 1232, 3)
        # reference: w=1226 -> new_w=1232 (pad 3 each side); h=370 ->
        # new_h=378 (pad 4 each side)
        assert out[:4].sum() == 0 and out[-4:].sum() == 0
        assert out[:, :3].sum() == 0 and out[:, -3:].sum() == 0


class TestPosEmbedResize:
    def test_matches_torch_bicubic_with_dino_trick(self):
        """ADVICE r1: pos-embed interpolation must equal the reference's
        torch F.interpolate bicubic (A=-0.75, w0+0.1 scale trick,
        align_corners=False) including the DINO h/w transposition quirk
        at NON-square output grids."""
        import torch
        import torch.nn as tnn
        import math
        import jax.numpy as jnp
        from autoinst_tpu.models.dino.vit import _torch_bicubic_pos_resize

        rng = np.random.default_rng(0)
        g, dim = 37, 8
        h, w = 13, 27           # non-square, non-native
        grid = rng.normal(size=(1, g, g, dim)).astype(np.float32)

        ours = np.asarray(_torch_bicubic_pos_resize(jnp.asarray(grid), h, w))

        # literal reference computation (extractor.py:88-97)
        ppe = torch.as_tensor(grid).reshape(1, g, g, dim).permute(0, 3, 1, 2)
        w0, h0 = w + 0.1, h + 0.1
        out = tnn.functional.interpolate(
            ppe, scale_factor=(w0 / g, h0 / g), mode="bicubic",
            align_corners=False, recompute_scale_factor=False)
        assert out.shape[-2] == w and out.shape[-1] == h
        ref = out.permute(0, 2, 3, 1).reshape(1, -1, dim).numpy()

        assert ours.shape == ref.shape
        err = np.abs(ours - ref).max()
        assert err < 5e-5, f"pos-embed resize mismatch {err}"
