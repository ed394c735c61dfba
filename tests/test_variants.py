"""Variant coverage: SYNTHIA (uint16 labels, 16-class OHEM), BDD/Mapillary
eval loaders, and the semiseg warm-up step (HRNet+OCR, aux loss, RGB)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.configs.presets import get_preset
from diga_tpu.data import bdd_dataset, mapillary_dataset, synthia_dataset, synthetic
from diga_tpu.data.transforms import Compose, RandomSizedAndCrop

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


class TestSynthia:
    def test_loader_uint16_labels(self, tmp_path):
        root = str(tmp_path / "synthia")
        list_path = synthetic.make_synthia_fixture(root, n=2, h=48, w=64)
        ds = synthia_dataset(
            root, list_path, resize_hw=(48, 64),
            transform=Compose([RandomSizedAndCrop([32, 48])]),
        )
        s = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert s["image"].shape == (32, 48, 3)
        valid = s["label"][s["label"] != 255]
        assert valid.size > 0 and valid.max() < 16

    def test_preset_is_ohem_16class(self):
        cfg = get_preset("synthia2city_warmup")
        assert cfg.train.num_classes == 16
        assert cfg.train.seg_loss == "ohem"
        assert cfg.train.num_steps == 60_000
        assert cfg.train.lr_warmup == 1000

    def test_warmup_step_16class(self):
        """DG-style step with OHEM at 16 classes runs and is finite."""
        from diga_tpu.models.resnet_deeplab import DeepLabV2, head_param_mask
        from diga_tpu.train.optim import sgd_grouped
        from diga_tpu.train.schedules import poly_warmup_schedule
        from diga_tpu.train.state import create_seg_state
        from diga_tpu.train.steps import StepConfig, build_dg_step

        crop = (32, 64)
        model = DeepLabV2(num_classes=16, layers=(1, 1, 1, 1))
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((1, *crop, 3), jnp.float32)
        variables = model.init({"params": k, "dropout": k}, x, train=False)
        opt = sgd_grouped(poly_warmup_schedule(2.5e-4, 60_000, 1000),
                          head_param_mask(variables["params"]))
        state = create_seg_state(model, opt, k, crop)
        cfg = StepConfig(num_classes=16, crop_hw=crop, seg_loss="ohem",
                         lambda_distil=0.25)
        step = jax.jit(build_dg_step(model, opt, cfg))
        rr = np.random.default_rng(0)
        batch = {
            "s_img": rr.normal(size=(2, *crop, 3)).astype(np.float32),
            "s_lbl": rr.integers(0, 16, size=(2, *crop)).astype(np.int32),
        }
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestDGEvalLoaders:
    def test_bdd_loader(self, tmp_path):
        root = str(tmp_path / "bdd")
        img_list, lbl_list = synthetic.make_flat_fixture(root, trainid_labels=True)
        ds = bdd_dataset(root, img_list, lbl_list, resize_hw=(48, 64))
        s = ds[0]
        valid = s["label"][s["label"] != 255]
        assert valid.max() < 19  # already-trainid labels preserved

    def test_mapillary_loader_remaps_66(self, tmp_path):
        root = str(tmp_path / "map")
        img_list, lbl_list = synthetic.make_flat_fixture(root, max_label=66)
        ds = mapillary_dataset(root, img_list, lbl_list, resize_hw=(48, 64))
        s = ds[0]
        valid = s["label"][s["label"] != 255]
        assert valid.size == 0 or valid.max() < 19

    def test_bdd_bare_id_lists(self, tmp_path):
        # the reference's shipped lists are bare ids; the constructor must
        # expand the BDDLoader.py:66-67 path templates
        root = str(tmp_path / "bdd_ref")
        img_list, lbl_list = synthetic.make_bdd_reference_fixture(root)
        ds = bdd_dataset(root, img_list, lbl_list, resize_hw=(48, 64))
        s = ds[0]
        assert s["image"].shape == (48, 64, 3)
        valid = s["label"][s["label"] != 255]
        assert valid.size == 0 or valid.max() < 19

    def test_mapillary_bare_id_lists(self, tmp_path):
        root = str(tmp_path / "map_ref")
        img_list, lbl_list = synthetic.make_mapillary_reference_fixture(root)
        ds = mapillary_dataset(root, img_list, lbl_list, resize_hw=(48, 64))
        s = ds[0]
        assert s["image"].shape == (48, 64, 3)
        valid = s["label"][s["label"] != 255]
        assert valid.size == 0 or valid.max() < 19

    def test_dg_preset_eval_sets(self):
        cfg = get_preset("dg_gta5")
        sets = cfg.extra["eval_datasets"]
        assert sets["bdd"]["out_hw"] == (720, 1280)
        assert sets["mapillary"]["ds_hw"] == (540, 960)


class TestSemisegStep:
    def test_warmup_with_aux_and_rgb(self):
        import diga_tpu.models.hrnet_ocr as H
        from diga_tpu.models.hrnet_ocr import HRNetOCR
        from diga_tpu.train.optim import sgd_grouped
        from diga_tpu.train.schedules import poly_schedule
        from diga_tpu.train.state import create_seg_state
        from diga_tpu.train.steps import StepConfig, build_dg_step

        H.W32 = {
            "stem_channels": 8, "stage1_blocks": 1, "stage1_channels": 8,
            "stages": [(1, 1, (8, 16)), (1, 1, (8, 16, 32)), (1, 1, (8, 16, 32, 64))],
            "ocr_mid_channels": 32, "ocr_key_channels": 16,
        }
        crop = (32, 64)
        model = HRNetOCR(num_classes=19, arch_name="tiny")
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((1, *crop, 3), jnp.float32)
        variables = model.init({"params": k, "dropout": k}, x, train=False)
        # semiseg: no 10x head group (warm_up.py:160)
        labels = jax.tree_util.tree_map(lambda _: "backbone", variables["params"])
        opt = sgd_grouped(poly_schedule(1e-3, 80_000, 1.0), labels)
        state = create_seg_state(model, opt, k, crop)
        cfg = StepConfig(crop_hw=crop, aux_weight=0.1, rgb_input=True)
        step = jax.jit(build_dg_step(model, opt, cfg))
        rr = np.random.default_rng(0)
        batch = {
            "s_img": rr.normal(size=(2, *crop, 3)).astype(np.float32),
            "s_lbl": rr.integers(0, 19, size=(2, *crop)).astype(np.int32),
        }
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["loss_distil"]))
