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
    state, step, eval_apply, model = build_experiment(st_cfg)
    result, state = run_training(
        st_cfg, state, step, None,
        work_dir=str(tmp_path / "work"), log_every=1,
    )
    assert int(state.step) == 3
    assert np.isfinite(result.last_metrics["loss"])
    assert 0.0 <= result.last_metrics["consensus_kept"] <= 1.0
    # online centroid updates accumulated observations
    assert float(np.asarray(state.centroids.counts).sum()) > 0
