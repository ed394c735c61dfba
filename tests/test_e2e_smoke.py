"""End-to-end smoke: full harness (loaders -> jitted step -> eval ->
checkpoint export) on synthetic fixtures with a tiny-depth model.

This is the SURVEY.md §4 'short-horizon e2e train' gate: loss finite,
metrics logged, best-checkpoint export round-trips through the
reference's .pth format.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax

from diga_tpu.configs.presets import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    LoaderSpec,
    TrainConfig,
)
from diga_tpu.data import synthetic
from diga_tpu.train.build import build_experiment, export_state_role_keyed
from diga_tpu.train.loop import run_training

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    gta_root = str(root / "gta5")
    city_root = str(root / "city")
    gta_list = synthetic.make_gta5_fixture(gta_root, n=4, h=40, w=72)
    img_list, lbl_list = synthetic.make_cityscapes_fixture(city_root, n=3, h=40, w=72, split="train")
    val_img, val_lbl = synthetic.make_cityscapes_fixture(city_root, n=2, h=40, w=72, split="val")
    return ExperimentConfig(
        name="smoke_dg",
        stage="dg",
        data=DataConfig(
            source_root=gta_root,
            target_root=city_root,
            source_list=gta_list,
            target_img_list=img_list,
            target_lbl_list=lbl_list,
            val_img_list=val_img,
            val_lbl_list=val_lbl,
            num_workers=2,
            source_streams=(
                LoaderSpec("gta5", (40, 72), 1),
                LoaderSpec("gta5", (40, 72), 1),
            ),
            target_streams=(LoaderSpec("cityscapes", (40, 72), 1),),
        ),
        train=TrainConfig(
            crop_hw=(32, 64), num_steps=4, eval_every=3,
            compute_dtype="float32", remat=False,
        ),
        eval=EvalConfig(out_hw=(40, 72), ds_hw=(20, 36)),
        extra={"layers": (1, 1, 1, 1)},
    )


class TestE2ESmoke:
    def test_dg_training_runs(self, tiny_cfg, tmp_path):
        state, step, eval_apply, model = build_experiment(tiny_cfg)
        best_calls = []

        result, state = run_training(
            tiny_cfg, state, step, eval_apply,
            work_dir=str(tmp_path / "work"),
            eval_limit=2,
            on_best=lambda s, i, m: best_calls.append((i, m)),
            log_every=1,
        )
        assert np.isfinite(result.last_metrics["loss"])
        assert int(state.step) == 4
        # eval at step 3 ran and produced a score in [0, 1]
        assert 0.0 <= result.best_miou <= 1.0
        # metrics.jsonl written
        assert os.path.exists(tmp_path / "work" / "metrics.jsonl")

    def test_mesh_training_per_chip_batch(self, tiny_cfg, tmp_path):
        """Per-chip batch semantics over a data mesh: every stream batch is
        multiplied by the mesh size (so recipe batches that don't divide
        the device count still shard), and the step runs under GSPMD."""
        from diga_tpu.parallel import make_mesh
        from diga_tpu.train.loop import make_train_iterator

        mesh = make_mesh(4)
        it, src, tgt = make_train_iterator(tiny_cfg, False, batch_scale=4)
        batch = next(it)
        src.stop()
        assert batch["s_img"].shape[0] == 2 * 4  # two 1-image streams x mesh

        state, step, eval_apply, model = build_experiment(tiny_cfg, mesh=mesh)
        result, state = run_training(
            tiny_cfg, state, step, eval_apply,
            work_dir=str(tmp_path / "work_mesh"),
            num_steps=2, eval_limit=1, log_every=1, mesh=mesh,
        )
        assert np.isfinite(result.last_metrics["loss"])

    def test_role_keyed_export_import(self, tiny_cfg, tmp_path):
        state, step, eval_apply, model = build_experiment(tiny_cfg)
        out = str(tmp_path / "weights")
        export_state_role_keyed(state, out, layers=(1, 1, 1, 1))
        assert os.path.exists(os.path.join(out, "student.pth"))
        assert os.path.exists(os.path.join(out, "teacher.pth"))

        from diga_tpu.models.convert import load_torch_state_dict, segmodel_from_torch

        sd = load_torch_state_dict(os.path.join(out, "student.pth"))
        p, s = segmodel_from_torch(sd, layers=(1, 1, 1, 1))
        orig = jax.tree_util.tree_leaves(state.params)
        loaded = jax.tree_util.tree_leaves(p)
        assert len(orig) == len(loaded)
        for a, b in zip(orig, loaded):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)
