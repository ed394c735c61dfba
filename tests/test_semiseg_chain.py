"""Semiseg stage chaining: warm-up export -> self-training load (HRNet).

VERDICT r1 missing #1: build_experiment used the DeepLab converter for any
student.pth regardless of model kind, so the semiseg chain broke at the
second stage.  These tests pin the model-kind-aware path plus the ImageNet
hrnetv2 positional-zip init (hrnet_module.py:564-594).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import diga_tpu.models.hrnet_ocr as H
from diga_tpu.configs.presets import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    TrainConfig,
)
from diga_tpu.train.build import build_experiment, export_state_role_keyed

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

TINY = {
    "stem_channels": 8,
    "stage1_blocks": 1,
    "stage1_channels": 8,
    "stages": [
        (1, 1, (8, 16)),
        (1, 1, (8, 16, 32)),
        (1, 1, (8, 16, 32, 64)),
    ],
    "ocr_mid_channels": 32,
    "ocr_key_channels": 16,
}

EXTRA = {
    "model": "hrnet_ocr", "hrnet_arch": "tiny", "no_translator": True,
    "rgb_input": True, "aux_weight": 0.1, "feat_dim": 32,
}


def _cfg(stage):
    return ExperimentConfig(
        name=f"semiseg_tiny_{stage}",
        stage=stage,
        data=DataConfig(),
        train=TrainConfig(crop_hw=(32, 64), num_steps=10, head_lr_mult=1.0,
                          compute_dtype="float32", remat=False),
        eval=EvalConfig(),
        extra=dict(EXTRA),
    )


def _flat(tree):
    return {
        "/".join(str(getattr(q, "key", q)) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.fixture(autouse=True)
def tiny_arch(monkeypatch):
    monkeypatch.setattr(H, "W32", TINY)


class TestSemisegChain:
    def test_warmup_export_selftrain_load(self, tmp_path):
        # stage 1: warm-up experiment, export role-keyed weights
        warm_state, warm_step, _, _ = build_experiment(_cfg("warmup"))
        rr = np.random.default_rng(0)
        batch = {
            "s_img": rr.normal(size=(2, 32, 64, 3)).astype(np.float32),
            "s_lbl": rr.integers(0, 19, size=(2, 32, 64)).astype(np.int32),
            # the shipped semiseg warm-up step consumes the unlabeled
            # stream for the reference's no-grad BN-stats forward
            # (StepConfig.tgt_stats_forward, semiseg warm_up.py:239-240)
            "t_img": rr.normal(size=(2, 32, 64, 3)).astype(np.float32),
        }
        warm_state, metrics = warm_step(warm_state, batch)
        assert np.isfinite(float(metrics["loss"]))
        wdir = str(tmp_path / "weights")
        export_state_role_keyed(warm_state, wdir, model_kind="hrnet_ocr",
                                hrnet_arch="tiny")

        # stage 2: self-training must load those weights through the HRNet
        # converter (the broken path used the DeepLab one unconditionally)
        st_state, st_step, _, _ = build_experiment(
            _cfg("selftrain"), load_weight_dir=wdir)

        got = _flat(st_state.params)
        want = _flat(warm_state.params)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=k)

        # and the self-training step runs on the chained weights
        st_batch = dict(batch)
        st_batch["t_img"] = rr.normal(size=(2, 32, 64, 3)).astype(np.float32)
        st_batch["t_pseudo"] = rr.integers(0, 19, size=(2, 32, 64)).astype(np.int32)
        st_state, st_metrics = st_step(st_state, st_batch)
        assert np.isfinite(float(st_metrics["loss"]))

    def test_imagenet_init_positional_zip(self, tmp_path):
        from diga_tpu.models.convert_hrnet import (
            hrnet_imagenet_init,
            hrnet_ocr_to_torch,
        )

        state, _, _, _ = build_experiment(_cfg("warmup"))
        params = jax.tree_util.tree_map(np.asarray, state.params)
        stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)

        # fake "ImageNet" checkpoint: backbone tensors in torch registration
        # order under DIFFERENT names (positional zip must not care), with
        # num_batches_tracked entries interleaved and a trailing classifier
        full = hrnet_ocr_to_torch(params, stats, TINY)
        rr = np.random.default_rng(1)
        pre = {}
        for i, (k, v) in enumerate(x for x in full.items()
                                   if x[0].startswith("hrnet.")):
            pre[f"imagenet.{i}"] = rr.normal(size=v.shape).astype(np.float32)
            if k.endswith("running_var"):
                pre[f"imagenet.{i}.num_batches_tracked"] = np.zeros((), np.int64)
        pre["classifier.weight"] = rr.normal(size=(1000, 64)).astype(np.float32)
        pre["classifier.bias"] = rr.normal(size=(1000,)).astype(np.float32)

        p2, s2 = hrnet_imagenet_init(params, stats, pre, TINY)
        # backbone now carries the pretrained values...
        out = hrnet_ocr_to_torch(p2, s2, TINY)
        back = [k for k in full if k.startswith("hrnet.")]
        vals = [v for k, v in pre.items()
                if k.startswith("imagenet.") and "num_batches" not in k]
        for k, v in zip(back, vals):
            np.testing.assert_array_equal(out[k], v, err_msg=k)
        # ...and the OCR head is untouched
        for k in full:
            if k.startswith("ocrnet."):
                np.testing.assert_array_equal(out[k], full[k], err_msg=k)

        # shape mismatch raises (reference hrnet_module.py:582-583)
        bad = dict(pre)
        bad["imagenet.0"] = np.zeros((3, 3), np.float32)
        with pytest.raises(RuntimeError, match="shape mismatch"):
            hrnet_imagenet_init(params, stats, bad, TINY)

        # torch-named checkpoints get the structural suffix guard: a
        # same-shape bn.weight/bn.bias swap (invisible to the shape check)
        # must be rejected, not silently loaded
        named = {}
        for i, (k, v) in enumerate(x for x in full.items()
                                   if x[0].startswith("hrnet.")):
            suffix = k.rsplit(".", 1)[-1]
            named[f"pre.{i}.{suffix}"] = rr.normal(size=v.shape).astype(np.float32)
        ks = list(named)
        i_w = next(i for i, k in enumerate(ks) if k.endswith(".weight")
                   and ks[i + 1].endswith(".bias"))
        swapped = {(ks[i_w + 1] if k == ks[i_w] else
                    ks[i_w] if k == ks[i_w + 1] else k): v
                   for k, v in named.items()}
        with pytest.raises(RuntimeError, match="suffix mismatch"):
            hrnet_imagenet_init(params, stats, swapped, TINY)
