"""End-to-end train-step tests on an 8-device virtual CPU mesh.

Covers: DG / warm-up / self-training step builders, EMA teacher coupling,
loss decrease over a short horizon, sharded execution under GSPMD jit,
and the two-scale evaluator (SURVEY.md §4's e2e smoke plan).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from diga_tpu.models.resnet_deeplab import DeepLabV2, head_param_mask
from diga_tpu.models.translator import Discriminator, ImgDecoder, ImgEncoder
from diga_tpu.ops.prototypes import Centroids
from diga_tpu.parallel import make_mesh, batch_sharding, replicated, shard_batch
from diga_tpu.train.optim import sgd_grouped
from diga_tpu.train.schedules import poly_schedule
from diga_tpu.train.state import create_seg_state
from diga_tpu.train.steps import StepConfig, build_dg_step, build_selftrain_step, build_warmup_step

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

CROP = (32, 64)
NCLS = 19


def tiny_model():
    return DeepLabV2(num_classes=NCLS, layers=(1, 1, 1, 1))


def make_optimizer(params):
    labels = head_param_mask(params)
    return sgd_grouped(poly_schedule(2.5e-4, 1000), labels)


def make_state(rng=0, centroids=False, frozen=None):
    model = tiny_model()
    # two-phase init: need params for labels, then optimizer
    k = jax.random.PRNGKey(rng)
    x = jnp.zeros((1, *CROP, 3), jnp.float32)
    variables = model.init({"params": k, "dropout": k}, x, train=False)
    opt = make_optimizer(variables["params"])
    cents = Centroids.create(NCLS, 256) if centroids else None
    state = create_seg_state(model, opt, k, CROP, centroids=cents, frozen=frozen)
    return model, opt, state


def fake_batch(b=8, with_target=False, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "s_img": rng.normal(size=(b, *CROP, 3)).astype(np.float32) * 0.5,
        "s_lbl": rng.integers(0, NCLS, size=(b, *CROP)).astype(np.int32),
    }
    # make labels learnable: class depends on position
    batch["s_lbl"][:, : CROP[0] // 2] = 0
    batch["s_lbl"][:, CROP[0] // 2 :] = 1
    if with_target:
        batch["t_img"] = rng.normal(size=(b, *CROP, 3)).astype(np.float32) * 0.5
        batch["t_pseudo"] = rng.integers(0, NCLS, size=(b, *CROP)).astype(np.int32)
    return batch


class TestDGStep:
    def test_loss_decreases_and_teacher_moves(self):
        model, opt, state = make_state()
        step = jax.jit(build_dg_step(model, opt, StepConfig(crop_hw=CROP)))
        batch = fake_batch(b=2)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss_semseg"]))
        assert losses[-1] < losses[0], losses
        # teacher lags the student (EMA): some learnable leaf must differ
        t_leaves = jax.tree_util.tree_leaves(state.teacher_params)
        s_leaves = jax.tree_util.tree_leaves(state.params)
        assert any(
            not np.allclose(np.asarray(t), np.asarray(s))
            for t, s in zip(t_leaves, s_leaves)
        )

    def test_frozen_bn_params_never_move(self):
        model, opt, state = make_state()
        step = jax.jit(build_dg_step(model, opt, StepConfig(crop_hw=CROP)))
        def frozen_leaves(params):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            return {
                "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
                for path, v in flat
                if "frozen_bn" in "/".join(str(getattr(p, "key", p)) for p in path)
            }
        before = frozen_leaves(state.params)
        assert before, "no frozen BN params found"
        for _ in range(3):
            state, _ = step(state, fake_batch(b=2))
        after = frozen_leaves(state.params)
        for k in before:
            np.testing.assert_array_equal(before[k], after[k])

    def test_sharded_over_mesh(self, eight_devices):
        mesh = make_mesh(8)
        model, opt, state = make_state()
        cfg = StepConfig(crop_hw=CROP)
        step = jax.jit(
            build_dg_step(model, opt, cfg),
            in_shardings=(replicated(mesh), None),
            out_shardings=(replicated(mesh), None),
        )
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch(fake_batch(b=8), mesh)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestWarmupStep:
    def test_runs_with_translator(self):
        k = jax.random.PRNGKey(3)
        enc = ImgEncoder(dim=8, n_downsample=2, n_res=1)
        dec = ImgDecoder(dim=32, n_upsample=2, n_res=1)
        x = jnp.zeros((1, *CROP, 3), jnp.float32)
        enc_p = enc.init(k, x)["params"]
        dec_p = dec.init(k, enc.apply({"params": enc_p}, x))["params"]
        frozen = {"enc_s": enc_p, "dec_s2t": dec_p}

        def translator_apply(frozen, img):
            z = enc.apply({"params": frozen["enc_s"]}, img)
            return dec.apply({"params": frozen["dec_s2t"]}, z)

        model, opt, state = make_state(frozen=frozen)
        step = jax.jit(build_warmup_step(model, translator_apply, opt, StepConfig(crop_hw=CROP)))
        state, metrics = step(state, fake_batch(b=2))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_distil"]) >= 0


class TestTargetStatsForward:
    """StepConfig.tgt_stats_forward replicates the reference's no-grad
    student(tdatav) viz forward: BN running stats absorb target-batch
    statistics; grads/params/teacher are untouched (warm_up.py:264-266)."""

    def test_stats_change_params_do_not(self):
        model, opt, state0 = make_state(frozen=None)
        batch = fake_batch(b=2, with_target=True)
        outs = {}
        for flag in (False, True):
            cfg = StepConfig(crop_hw=CROP, tgt_stats_forward=flag)
            step = jax.jit(build_dg_step(model, opt, cfg))
            state = jax.tree_util.tree_map(lambda x: x, state0)
            state, _ = step(state, batch)
            outs[flag] = state
        # params identical: the extra forward carries no gradient
        for a, b in zip(jax.tree_util.tree_leaves(outs[False].params),
                        jax.tree_util.tree_leaves(outs[True].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(outs[False].teacher_params),
                        jax.tree_util.tree_leaves(outs[True].teacher_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # but the student's BN running stats saw the target batch
        diffs = [float(jnp.max(jnp.abs(a - b)))
                 for a, b in zip(jax.tree_util.tree_leaves(outs[False].batch_stats),
                                 jax.tree_util.tree_leaves(outs[True].batch_stats))]
        assert max(diffs) > 0
        # teacher stats identical (the reference never forwards teacher(t)
        # in warm-up)
        for a, b in zip(jax.tree_util.tree_leaves(outs[False].teacher_batch_stats),
                        jax.tree_util.tree_leaves(outs[True].teacher_batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_default_wiring_from_preset(self):
        from diga_tpu.configs.presets import get_preset
        from diga_tpu.train.build import make_step_config, wants_target

        for name, want in [("gta2city_warmup", True), ("dg_gta5", True),
                           ("semiseg_1_8_warmup", True),
                           ("gta2city_selftrain", False)]:
            cfg = get_preset(name)
            assert make_step_config(cfg).tgt_stats_forward is want, name
        # selftrain still consumes t_img (consensus), via wants_target
        assert wants_target(get_preset("gta2city_selftrain")) is True
        # the documented fast-path override
        import dataclasses

        cfg = get_preset("gta2city_warmup")
        cfg = dataclasses.replace(cfg, extra={**cfg.extra,
                                              "tgt_stats_forward": False})
        assert make_step_config(cfg).tgt_stats_forward is False
        assert wants_target(cfg) is False


class TestSelfTrainStep:
    def test_runs_and_updates_centroids(self):
        def translator_apply(frozen, img):
            return img  # identity translator for the smoke test

        model, opt, state = make_state(centroids=True)
        cfg = StepConfig(crop_hw=CROP, lambda_distil=0.25, beta=0.3)
        step = jax.jit(build_selftrain_step(model, translator_apply, opt, cfg))
        before = np.asarray(state.centroids.counts).copy()
        state, metrics = step(state, fake_batch(b=2, with_target=True))
        after = np.asarray(state.centroids.counts)
        assert after.sum() > before.sum()
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["consensus_kept"]) <= 1.0


class TestFusedForwards:
    def test_fused_selftrain_step_close_to_unfused(self):
        """fuse_forwards batches the 4 model forwards into 2.  It is NOT
        exact — like the reference, every BN normalizes with train-mode
        batch statistics, and pooling [s_cat; t_img] changes them — so
        this asserts the fused step tracks the unfused one closely (the
        statistics estimate the same distribution) and that the mode is
        structurally sound (a slicing bug would produce O(1) gaps)."""

        def translator_apply(frozen, img):
            return img

        model = DeepLabV2(num_classes=NCLS, layers=(1, 1, 1, 1), droprate=0.0)
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((1, *CROP, 3), jnp.float32)
        variables = model.init({"params": k, "dropout": k}, x, train=False)
        opt = make_optimizer(variables["params"])
        batch = fake_batch(b=2, with_target=True)

        # non-degenerate centroids: zero-init makes every class equidistant,
        # so the consensus argmax tie-breaks on float noise and flips
        # discretely between two otherwise-identical programs
        cents = Centroids.create(NCLS, 256)
        cents = cents._replace(vectors=jnp.asarray(
            np.random.default_rng(7).normal(size=(NCLS, 256)).astype(np.float32)))

        results = {}
        for fused in (False, True):
            cfg = StepConfig(crop_hw=CROP, lambda_distil=0.25, beta=0.3,
                             fuse_forwards=fused)
            state = create_seg_state(
                model, opt, k, CROP, centroids=cents, frozen=None)
            step = jax.jit(build_selftrain_step(model, translator_apply, opt, cfg))
            new_state, metrics = step(state, batch)
            results[fused] = (new_state, metrics)

        m0, m1 = results[False][1], results[True][1]
        for key in m0:
            np.testing.assert_allclose(
                np.asarray(m0[key], np.float64), np.asarray(m1[key], np.float64),
                rtol=0.08, atol=0.02, err_msg=f"metric {key}")
        p0 = jax.tree_util.tree_leaves(results[False][0].params)
        p1 = jax.tree_util.tree_leaves(results[True][0].params)
        for a, b in zip(p0, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=5e-4)


class TestEvaluator:
    def test_two_scale_eval_perfect_model(self):
        from diga_tpu.eval import TwoScaleEvaluator

        # a fake model that predicts from the image's dominant channel
        def apply_fn(img):
            logits = jnp.zeros((*img.shape[:3], 3))
            return logits.at[..., 0].set(img[..., 0] * 10)

        label = np.zeros((1, 16, 32), np.int32)
        image = np.zeros((1, 16, 32, 3), np.float32)
        image[..., 0] = 1.0
        ev = TwoScaleEvaluator(apply_fn, num_classes=3, out_hw=(16, 32), ds_hw=(8, 16))
        ev.update(image, label)
        scores, cls_iu = ev.score.get_scores()
        assert scores["mean_iou"] == pytest.approx(1.0)


class TestShardedEvaluator:
    def test_two_scale_eval_sharded_over_mesh(self, eight_devices):
        from diga_tpu.eval import TwoScaleEvaluator
        from diga_tpu.parallel import make_mesh

        mesh = make_mesh(8)

        def apply_fn(img):
            logits = jnp.zeros((*img.shape[:3], 3))
            return logits.at[..., 0].set(img[..., 0] * 10)

        label = np.zeros((8, 16, 32), np.int32)
        image = np.zeros((8, 16, 32, 3), np.float32)
        image[..., 0] = 1.0
        ev = TwoScaleEvaluator(apply_fn, num_classes=3, out_hw=(16, 32),
                               ds_hw=(8, 16), mesh=mesh)
        ev.update(image, label)
        scores, _ = ev.score.get_scores()
        assert scores["mean_iou"] == pytest.approx(1.0)
        # counts cover all 8 images' pixels exactly once
        assert int(np.asarray(ev.score.confusion).sum()) == 8 * 16 * 32


class TestSpatialShardedEvaluator:
    def test_spatial_matches_unsharded_real_model(self, eight_devices):
        from diga_tpu.eval import TwoScaleEvaluator
        from diga_tpu.models.resnet_deeplab import DeepLabV2
        from diga_tpu.parallel import make_mesh

        model = DeepLabV2(num_classes=5, layers=(1, 1, 1, 1))
        k = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, 32, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda: model.init({"params": k, "dropout": k}, x0, train=False))()

        def apply_fn(img):
            _, _, logits, _ = model.apply(variables, img, train=False)
            return logits

        rng = np.random.default_rng(0)
        image = rng.normal(size=(1, 32, 64, 3)).astype(np.float32)
        label = rng.integers(0, 5, size=(1, 32, 64)).astype(np.int32)
        batch = {"image": image, "label": label}

        ev_ref = TwoScaleEvaluator(apply_fn, num_classes=5, out_hw=(32, 64),
                                   ds_hw=(16, 32))
        ev_ref.update(image, label)

        mesh = make_mesh(8)
        # height 32 shards over 8 devices; conv halos + the matmul resizes
        # reshard under GSPMD — results must match the unsharded run
        ev_sp = TwoScaleEvaluator(apply_fn, num_classes=5, out_hw=(32, 64),
                                  ds_hw=(16, 32), mesh=mesh, shard="spatial")
        ev_sp.update(image, label)

        np.testing.assert_array_equal(np.asarray(ev_ref.score.confusion),
                                      np.asarray(ev_sp.score.confusion))
        del batch
