"""E2E self-training: pseudo-label PNG round-trip through loaders, then a
few jitted self-training steps via the full harness."""

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

import jax

from diga_tpu.configs.presets import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    LoaderSpec,
    TrainConfig,
)
from diga_tpu.data import cityscapes_dataset, synthetic
from diga_tpu.data.label_maps import CITYSCAPES_COLORS_19, make_png_palette
from diga_tpu.train.build import build_experiment
from diga_tpu.train.loop import run_training

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


def write_pseudo_pngs(city_root: str, img_list: str, h: int, w: int, seed=0):
    """Palette pseudo-label PNGs named like the reference generator's
    output (pseudolabel_generator.py:100-105)."""
    rng = np.random.default_rng(seed)
    out = os.path.join(city_root, "pseudo")
    os.makedirs(out, exist_ok=True)
    palette = make_png_palette(CITYSCAPES_COLORS_19)
    for line in open(img_list):
        name = os.path.basename(line.strip())
        lbl = rng.integers(0, 19, size=(h, w)).astype(np.uint8)
        img = Image.fromarray(lbl).convert("P")
        img.putpalette(palette)
        img.save(os.path.join(out, name))
    return "pseudo"


@pytest.fixture(scope="module")
def st_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    gta_root = str(root / "gta5")
    city_root = str(root / "city")
    gta_list = synthetic.make_gta5_fixture(gta_root, n=3, h=40, w=72)
    img_list, lbl_list = synthetic.make_cityscapes_fixture(city_root, n=3, h=40, w=72, split="train")
    val_img, val_lbl = synthetic.make_cityscapes_fixture(city_root, n=1, h=40, w=72, split="val")
    pseudo_dir = write_pseudo_pngs(city_root, img_list, 40, 72)
    return ExperimentConfig(
        name="smoke_st",
        stage="selftrain",
        data=DataConfig(
            source_root=gta_root, target_root=city_root,
            source_list=gta_list, target_img_list=img_list,
            target_lbl_list=lbl_list, val_img_list=val_img, val_lbl_list=val_lbl,
            pseudo_dir=pseudo_dir, num_workers=2,
            source_streams=(LoaderSpec("gta5", (40, 72), 1),),
            target_streams=(LoaderSpec("cityscapes", (40, 72), 1, use_pseudo=True),),
        ),
        train=TrainConfig(crop_hw=(32, 64), num_steps=3, eval_every=0,
                          beta=0.3, lambda_distil=0.25,
                          compute_dtype="float32", remat=False),
        eval=EvalConfig(out_hw=(40, 72), ds_hw=(20, 36)),
        extra={"layers": (1, 1, 1, 1)},
    )


def test_pseudo_png_roundtrip(st_cfg):
    ds = cityscapes_dataset(
        st_cfg.data.target_root, st_cfg.data.target_img_list,
        st_cfg.data.target_lbl_list, split="train",
        pseudo_dir=st_cfg.data.pseudo_dir, resize_hw=(40, 72),
    )
    s = ds[0]
    assert "pseudo" in s
    assert s["pseudo"].shape == (40, 72)
    valid = s["pseudo"][s["pseudo"] != 255]
    assert valid.size > 0 and valid.max() < 19


def test_selftrain_harness_runs(st_cfg, tmp_path):
    # runs in a FRESH python (tests/_selftrain_sub.py): the selftrain-step
    # XLA CPU compile intermittently balloons to >100 GB when issued late
    # in a long pytest process; a fresh process compiles it in ~2 GB.
    import subprocess
    import sys

    d = st_cfg.data
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=os.pathsep.join(
                   p for p in (repo_root, os.environ.get("PYTHONPATH")) if p))
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "_selftrain_sub.py"),
         d.source_root, d.target_root, d.source_list, d.target_img_list,
         d.target_lbl_list, d.val_img_list, d.val_lbl_list,
         str(tmp_path / "work")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT")][0]
    vals = dict(kv.split("=") for kv in line.split()[1:])
    assert int(vals["step"]) == 3
    assert np.isfinite(float(vals["loss"]))
    assert 0.0 <= float(vals["kept"]) <= 1.0
    # online centroid updates accumulated observations
    assert float(vals["counts"]) > 0
