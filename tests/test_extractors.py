"""Feature-factory tests: TARL extractor, DINO dense ViT, SLIC masks."""

import os
import zlib

import numpy as np
import pytest

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
        # (H - patch)//stride + 1 = (42-14)//7+1 = 5 ; (70-14)//7+1 = 9
        assert fmap.shape == (5, 9, 384)
        assert np.isfinite(fmap).all()
