"""Composed ONE-STEP train parity vs functional torch (VERDICT r3 #2).

Component parity (forwards, losses, optimizer) is tested in isolation
elsewhere; these tests replay a FULL warm-up step and a FULL
self-training step in torch — EMA placement, train-mode BN batch
statistics (incl. the no-grad student(tdatav) stats forward),
upsample-before-loss ordering, consensus/CutMix/centroid machinery,
grouped SGD — and assert the jitted step's losses, parameter UPDATES,
BN running stats, and centroids agree.  Subprocess-isolated (the XLA-CPU
compile ballooning pathology, NOTES_r1.md).

Reference: train_DiGA_gta2city_warm_up.py:197-305,
           train_DiGA_gta2city_self_training.py:214-387.
"""

import os
import re
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


def _run(mode):
    pytest.importorskip("torch")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               PYTHONPATH=os.pathsep.join(
                   p for p in (repo_root, os.environ.get("PYTHONPATH")) if p))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "_train_step_parity_sub.py"),
         mode],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    vals = dict(re.findall(r"(\w+)=([-\d.e+]+)", proc.stdout))
    return {k: float(v) for k, v in vals.items()}, proc.stdout


def _assert_common(v, out, var_tol=1e-3):
    # losses: same reduction up to f32 reassociation
    for key in ("loss", "ce", "distil"):
        a, b = v[f"{key}_jax"], v[f"{key}_torch"]
        assert abs(a - b) <= 1e-3 * max(1.0, abs(b)), (key, out)
    # parameter updates: relative to the largest torch update
    assert v["param_delta_rel"] < 5e-3, out
    assert v["param_delta_scale"] > 0, out  # something actually moved
    # running stats exact to float tolerance: BatchNorm2D stores the
    # torch-style UNBIASED running var (models/norms.py), so means AND
    # vars are the same estimator on both sides
    assert v["stu_stats_mean_rel"] < 1e-3, out
    assert v["stu_stats_var_rel"] < var_tol, out
    assert v["tea_stats_mean_rel"] < 1e-3, out
    assert v["tea_stats_var_rel"] < var_tol, out


def test_warmup_step_matches_torch_replay():
    v, out = _run("warmup")
    _assert_common(v, out)
    assert v["tea_param_absdiff"] < 1e-6, out  # EMA is exact linear algebra


def test_semiseg_warmup_step_matches_torch_replay():
    """Composed semiseg warm-up step (HRNet+OCR, tiny arch): RGB flip,
    aux CE + aux distillation both 0.1-weighted (semiseg
    warm_up.py:259-263), single-group SGD (BN affine trains, no 10x
    head), ramped EMA, no-grad unlabeled BN-stats forward."""
    v, out = _run("semiseg")
    # unbiased running var matches torch's estimator exactly, so even the
    # n=32-sample bottom branch compares at float tolerance now
    _assert_common(v, out)
    assert v["tea_param_absdiff"] < 1e-6, out


def test_selftrain_step_matches_torch_replay():
    v, out = _run("selftrain")
    _assert_common(v, out)
    assert abs(v["cross_jax"] - v["cross_torch"]) <= 1e-3 * max(
        1.0, abs(v["cross_torch"])), out
    assert v["kept_jax"] == pytest.approx(v["kept_torch"], abs=1e-6), out
    assert v["centroid_absdiff"] < 1e-4, out
    assert v["count_absdiff"] == 0.0, out
