"""Gate on the committed hard-map twin-parity snapshot (VERDICT r3 #4).

The round-2/3 twin verdict was earned on a map where both arms saturate
(p=r=f1=1.0) -- agreement there is cheap. This snapshot re-ran
scripts/run_parity.py --twin --map .selftrain/kitti on the NCuts-hard
selftrain demo map (baseline ap ~.31-.39 regime, far from saturation)
and must stay: (a) present, (b) non-saturated, (c) within the parity
tolerance. Regenerate with:

  python scripts/run_parity.py --synthetic --twin --map .selftrain/kitti \
      --out .parity_hard --configs tarl_spatial,spatial
"""

import json
import os

import pytest

REPORT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".parity_hard", "parity_report.json")
TOLERANCE = 0.02


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(REPORT):
        pytest.skip("no committed hard-map parity snapshot")
    with open(REPORT) as fh:
        return json.load(fh)


def test_hard_map_twin_within_tolerance(report):
    for name, entry in report["configs"].items():
        assert entry.get("parity_within_tol") is True, (name, entry)
        for k, d in entry["diff_twin"].items():
            assert abs(d) <= TOLERANCE, (name, k, d)


def test_hard_map_metrics_not_saturated(report):
    # the point of the hard map: agreement must be non-trivial. If a
    # regenerated map scores near-perfect, the snapshot proves nothing --
    # regenerate the map (selftrain_demo.py gen) instead of relaxing this.
    for name, entry in report["configs"].items():
        ours = entry["ours"]
        assert ours["ap"] < 0.7, (name, ours)
        assert ours["f1"] < 0.95, (name, ours)
