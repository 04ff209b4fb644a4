"""ICP-refined aggregation: noisy poses get corrected against the map."""

import numpy as np
import pytest

from autoinst_tpu.pipeline.aggregation import aggregate_pointcloud
from autoinst_tpu.datasets import create_kitti_odometry_dataset

from synthetic_kitti import generate_sequence


class NoisyPoseDataset:
    """Wrap a dataset, perturbing every pose after the first."""

    def __init__(self, base, sigma_t=0.06, seed=0):
        self.base = base
        rng = np.random.default_rng(seed)
        self._noise = []
        for i in range(len(base)):
            T = np.eye(4)
            if i > 0:
                T[:3, 3] = rng.normal(scale=sigma_t, size=3)
            self._noise.append(T)

    def __len__(self):
        return len(self.base)

    def get_pose(self, i):
        return self._noise[i] @ self.base.get_pose(i)

    def __getitem__(self, i):
        return self.base[i]


@pytest.mark.slow
def test_icp_tightens_map(tmp_path):
    generate_sequence(str(tmp_path), n_scans=4, step=2.0,
                      points_per_object=200, ground_points=1500,
                      with_moving=False, tarl=False)
    base = create_kitti_odometry_dataset(str(tmp_path), 0, ncuts_mode=True,
                                         correct_scan_calibration=False)
    noisy = NoisyPoseDataset(base)

    def map_spread(icp):
        g, ng, poses, _, _ = aggregate_pointcloud(noisy, 0, 4, icp=icp)
        # spread proxy: mean 1-NN distance between consecutive-scan points
        from autoinst_tpu.hostops import grid_nn1
        pts = ng.points
        half = len(pts) // 2
        _, d = grid_nn1(pts[half:], pts[:half], cell=0.5)
        return float(np.median(d))

    spread_no = map_spread(False)
    spread_icp = map_spread(True)
    assert spread_icp <= spread_no * 1.05, (spread_no, spread_icp)
