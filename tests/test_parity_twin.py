"""Ours-vs-reference-ALGORITHM parity gate (VERDICT r2 #2).

Runs the full pipeline twice on the same synthetic map: once with our
solver chain (padded XLA affinity + LOBPCG worklist recursion,
ncut_backend="host") and once with the reference twin
(scipy cdist affinity + ARPACK shift-invert recursion,
ncut_backend="reference" -> ncuts/reference_twin.py, verbatim semantics
of reference normalized_cut.py:37-63 / ncuts_utils.py:60-156). Asserts
every sequence metric agrees within the parity tolerance the harness
uses (scripts/run_parity.py TOLERANCE = 0.02).
"""

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.pipeline.config import (PipelineConfig, config_spatial,
                                          config_tarl_spatial)
from autoinst_tpu.pipeline.run_pipeline import run

from synthetic_kitti import generate_sequence

TOLERANCE = 0.02
METRICS = ("p", "r", "f1", "ap", "ap0.25", "ap0.5", "S_assoc")


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_twin")
    generate_sequence(str(root), n_scans=14, step=2.5,
                      points_per_object=260, ground_points=1800,
                      n_objects=5, seed=11, varied_objects=True,
                      n_clutter=6)
    return str(root)


def _run(root, out, weight_config, backend):
    cfg = PipelineConfig(
        dataset_path=root, config=dict(weight_config), seqs=(0,),
        chunk_size=np.array([14, 14, 14]), overlap=3,
        metrics_min_points=120, ncut_method="eigh", ncut_backend=backend,
        use_pallas=False, out_folder=str(out) + "/", min_map_scans=2,
        canonical_label_order=True)
    results = run(cfg, dataset_factory=lambda seq:
                  create_kitti_odometry_dataset(root, seq, ncuts_mode=True))
    return results[0]["sequence"]


@pytest.mark.slow
@pytest.mark.parametrize("weight_config",
                         [config_spatial, config_tarl_spatial],
                         ids=["spatial", "tarl_spatial"])
def test_ours_matches_reference_algorithm(scene, tmp_path_factory,
                                          weight_config):
    out_ours = tmp_path_factory.mktemp("twin_ours_" + weight_config["name"])
    out_twin = tmp_path_factory.mktemp("twin_ref_" + weight_config["name"])
    ours = _run(scene, out_ours, weight_config, "host")
    twin = _run(scene, out_twin, weight_config, "reference")
    diffs = {k: ours[k] - twin[k] for k in METRICS if k in ours and k in twin}
    assert diffs, "no shared metrics"
    bad = {k: round(d, 4) for k, d in diffs.items() if abs(d) > TOLERANCE}
    assert not bad, (f"ours-vs-reference-algorithm diverges: {bad}; "
                     f"ours={ours} twin={twin}")
