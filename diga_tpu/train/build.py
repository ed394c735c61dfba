"""Assemble model + optimizer + state + jitted step from a preset config.

This is the glue every CLI uses; it also wires pretrained/previous-stage
weights through the torch-interop converters (the reference's stage
chaining: warm-up dir -> self-training --load_weight_dir,
train_DiGA_gta2city_self_training.py:34,165).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import ExperimentConfig
from ..models import convert
from ..models.resnet_deeplab import DeepLabV2, head_param_mask
from ..models.translator import Discriminator, ImgDecoder, ImgEncoder
from ..ops.prototypes import Centroids
from ..parallel import make_mesh, replicated
from .optim import sgd_grouped
from .schedules import poly_schedule, poly_warmup_schedule
from .state import SegTrainState, create_seg_state
from .steps import StepConfig, build_dg_step, build_selftrain_step, build_warmup_step


def make_model(cfg: ExperimentConfig):
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    # remat/s2b are CLI-overridable (--extra remat=false, --extra s2b=false,
    # --extra 'remat=["layer1","layer2"]'): the preset defaults are the
    # benched configs, the overrides are the tuned-batch escape hatch
    remat = cfg.extra.get("remat", cfg.train.remat)
    if isinstance(remat, list):
        remat = tuple(remat)
    if cfg.extra.get("model") == "hrnet_ocr":
        from ..models.hrnet_ocr import HRNetOCR

        return HRNetOCR(num_classes=cfg.train.num_classes, dtype=dtype,
                        arch_name=cfg.extra.get("hrnet_arch", "w48"),
                        remat=remat,
                        # "bn_stats" saves the (C,)-sized train-mode BN
                        # statistics across the remat boundary so the
                        # backward recompute skips re-reducing full
                        # activations (HRNet.remat_policy; measured A/B in
                        # docs/PERF.md)
                        remat_policy=cfg.extra.get("remat_policy"),
                        # --extra hrnet_pad=64: channel-padded compute
                        # layout for the 48/96-ch branches (HRNet.pad_to;
                        # layout-copy experiment, docs/PERF.md)
                        pad_to=int(cfg.extra.get("hrnet_pad", 0)))
    layers = tuple(cfg.extra.get("layers", (3, 4, 23, 3)))  # tiny-depth for tests
    return DeepLabV2(num_classes=cfg.train.num_classes, dtype=dtype,
                     layers=layers, remat=remat,
                     s2b=cfg.extra.get("s2b", cfg.train.s2b))


def make_schedule(cfg: ExperimentConfig):
    t = cfg.train
    if t.lr_warmup > 0:
        return poly_warmup_schedule(t.learning_rate, t.num_steps, t.lr_warmup, t.power)
    return poly_schedule(t.learning_rate, t.num_steps, t.power)


def make_step_config(cfg: ExperimentConfig) -> StepConfig:
    t = cfg.train
    return StepConfig(
        num_classes=t.num_classes,
        crop_hw=t.crop_hw,
        beta=t.beta,
        lambda_seg=t.lambda_seg,
        lambda_distil=t.lambda_distil,
        seg_loss=t.seg_loss,
        aux_weight=cfg.extra.get("aux_weight", 0.0),
        rgb_input=cfg.extra.get("rgb_input", False),
        use_crdomix=not cfg.extra.get("no_translator", False),
        photometric=cfg.extra.get("photometric", "diga"),
        # per-stage photometric deltas: Synthia warm-up jitter p=0.7
        # (Synthia/...warm_up.py:108); DG drops RandomSharpness
        # (train_DiGA_DG.py:114)
        p_jitter=cfg.extra.get("p_jitter", 0.5),
        with_sharpness=cfg.extra.get("with_sharpness", cfg.stage != "dg"),
        # reference warm-up/DG/semiseg-warm-up no-grad student(tdatav)
        # forward: updates the student BN running stats with target-batch
        # statistics every step (see StepConfig.tgt_stats_forward).  On by
        # default for parity; --extra tgt_stats_forward=false drops it
        # (documented fast path, docs/PARITY.md)
        tgt_stats_forward=cfg.extra.get(
            "tgt_stats_forward", cfg.stage in ("warmup", "dg")),
        # opt-in throughput mode, NOT parity-exact: every BN (DeepLab
        # backbone included) normalizes with train-mode batch statistics
        # like the reference (seg_model_noaux.py + student.train()), so
        # pooling the concatenated batches changes the statistics
        fuse_forwards=cfg.extra.get("fuse_forwards", False),
    )


def wants_target(cfg: ExperimentConfig) -> bool:
    """Does this stage's step consume batch['t_img']?  Self-training always
    (consensus/CutMix); warm-up/DG when the reference's no-grad viz forward
    is replicated (make_step_config tgt_stats_forward)."""
    if cfg.stage == "selftrain":
        return True
    return bool(cfg.extra.get("tgt_stats_forward",
                              cfg.stage in ("warmup", "dg")))


def make_translator_modules(cfg: ExperimentConfig):
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    enc = ImgEncoder(dtype=dtype)
    # subpixel up-conv is numerically exact vs the unfused path (same param
    # tree; tests/test_translator_parity.py + test_subpixel.py) and ~2.8x
    # fewer MACs in the decoder up-blocks — on by default everywhere
    dec = ImgDecoder(dtype=dtype,
                     subpixel_up=cfg.extra.get("subpixel_up", True))

    def translator_apply(frozen, img):
        z = enc.apply({"params": frozen["enc_s"]}, img)
        return dec.apply({"params": frozen["dec_s2t"]}, z)

    return enc, dec, translator_apply


def init_translator_frozen(cfg: ExperimentConfig, weight_dir: str | None, rng) -> dict:
    """Load enc_s/dec_s2t from a role-keyed dir, or random-init (tests)."""
    enc, dec, _ = make_translator_modules(cfg)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    enc_p = enc.init(rng, x)["params"]
    dec_p = dec.init(rng, enc.apply({"params": enc_p}, x))["params"]
    if weight_dir and os.path.exists(os.path.join(weight_dir, "enc_s.pth")):
        from ..models.convert_translator import encoder_from_torch, decoder_from_torch
        from ..utils.checkpoint import load_role_keyed

        sds = load_role_keyed(weight_dir, ["enc_s", "dec_s2t"])
        enc_p = encoder_from_torch(sds["enc_s"])
        dec_p = decoder_from_torch(sds["dec_s2t"])
    return {"enc_s": enc_p, "dec_s2t": dec_p}


def build_experiment(
    cfg: ExperimentConfig,
    load_weight_dir: str | None = None,
    centroid_path: str | None = None,
    mesh=None,
    pretrained_backbone: str | None = None,
):
    """Returns (state, jitted_step, eval_apply_fn, model)."""
    rng = jax.random.PRNGKey(cfg.train.seed)
    model = make_model(cfg)

    # params needed before optimizer (label tree)
    x = jnp.zeros((1, *cfg.train.crop_hw, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    labels = head_param_mask(variables["params"])
    if cfg.train.head_lr_mult == 1.0:
        labels = jax.tree_util.tree_map(
            lambda l: "backbone" if l == "head" else l, labels
        )
    opt = sgd_grouped(
        make_schedule(cfg), labels,
        momentum=cfg.train.momentum, weight_decay=cfg.train.weight_decay,
        head_mult=cfg.train.head_lr_mult,
    )

    # semiseg has no image translator: its warm-up is the DG-style step
    # with aux loss (train_DiGA_semiseg_warm_up.py has no enc/dec modules)
    uses_translator = cfg.stage in ("warmup", "selftrain") and not cfg.extra.get(
        "no_translator", False)
    frozen = None
    if uses_translator:
        frozen = init_translator_frozen(cfg, load_weight_dir, rng)

    centroids = None
    feat_dim = cfg.extra.get("feat_dim", 256)
    if cfg.stage == "selftrain":
        if centroid_path and os.path.exists(centroid_path):
            vec = np.load(centroid_path) if centroid_path.endswith(".npy") else _load_centroids_torch(centroid_path)
            centroids = Centroids(
                vectors=jnp.asarray(vec, jnp.float32),
                counts=jnp.full((cfg.train.num_classes,), 100.0, jnp.float32),
            )
        else:
            centroids = Centroids.create(cfg.train.num_classes, feat_dim)

    state = create_seg_state(model, opt, rng, cfg.train.crop_hw,
                             centroids=centroids, frozen=frozen)

    # weight loading: pretrained backbone, or a previous stage's student.
    # Both paths are model-kind aware: hrnet presets go through the HRNet
    # converters (semiseg stage chaining, ..._self_training.py:165), deeplab
    # through the SegModel ones — and tiny test depths are honored.
    model_kind = cfg.extra.get("model", "deeplab")
    layers = tuple(cfg.extra.get("layers", (3, 4, 23, 3)))
    if model_kind == "hrnet_ocr":
        from ..models.hrnet_ocr import W32, W48
        from ..models import convert_hrnet

        hrnet_arch = W48 if cfg.extra.get("hrnet_arch", "w48") == "w48" else W32
    if pretrained_backbone and os.path.exists(pretrained_backbone):
        sd = convert.load_torch_state_dict(pretrained_backbone)
        if model_kind == "hrnet_ocr":
            # ImageNet hrnetv2 positional-zip init (hrnet_module.py:564-594)
            params, stats = convert_hrnet.hrnet_imagenet_init(
                jax.tree_util.tree_map(np.asarray, state.params),
                jax.tree_util.tree_map(np.asarray, state.batch_stats),
                sd, hrnet_arch)
        else:
            p_bb, s_bb = convert.segmodel_from_torch(sd, layers)
            params, stats = convert.merge_pretrained_backbone(
                jax.tree_util.tree_map(np.asarray, state.params),
                jax.tree_util.tree_map(np.asarray, state.batch_stats), p_bb, s_bb)
        state = state.replace(
            params=params, batch_stats=stats,
            teacher_params=jax.tree_util.tree_map(np.copy, params),
            teacher_batch_stats=jax.tree_util.tree_map(np.copy, stats),
        )
    if load_weight_dir and os.path.exists(os.path.join(load_weight_dir, "student.pth")):
        sd = convert.load_torch_state_dict(os.path.join(load_weight_dir, "student.pth"))
        if model_kind == "hrnet_ocr":
            p, s = convert_hrnet.hrnet_ocr_from_torch(sd, hrnet_arch)
        else:
            p, s = convert.segmodel_from_torch(sd, layers)
        state = state.replace(params=p, batch_stats=s,
                              teacher_params=jax.tree_util.tree_map(np.copy, p),
                              teacher_batch_stats=jax.tree_util.tree_map(np.copy, s))

    scfg = make_step_config(cfg)
    _, _, translator_apply = make_translator_modules(cfg)
    if not uses_translator:
        translator_apply = lambda frozen, img: img  # identity (semiseg CutMix path)
    if cfg.stage == "dg" or (cfg.stage == "warmup" and not uses_translator):
        raw_step = build_dg_step(model, opt, scfg)
    elif cfg.stage == "warmup":
        raw_step = build_warmup_step(model, translator_apply, opt, scfg)
    elif cfg.stage == "selftrain":
        raw_step = build_selftrain_step(model, translator_apply, opt, scfg)
    else:
        raise ValueError(f"stage {cfg.stage} has no seg step (use cli/train_domain_translator)")

    if mesh is not None:
        step = jax.jit(raw_step, in_shardings=(replicated(mesh), None),
                       out_shardings=(replicated(mesh), None), donate_argnums=(0,))
        state = jax.device_put(state, replicated(mesh))
    else:
        step = jax.jit(raw_step, donate_argnums=(0,))

    rgb_input = cfg.extra.get("rgb_input", False)

    # inference uses the dilated (non-hoisted) stages: space-to-batch is a
    # TRAINING-shape win; at batch-1 full-res eval its subgrid batching +
    # masked-BN bookkeeping cost ~60% (measured 98 vs 61 ms/img two-scale).
    # Identical param/batch-stat trees either way, so the same state serves
    # both (tests/test_space_to_batch.py pins the output equivalence).
    eval_model = (dataclasses.replace(model, s2b=False)
                  if hasattr(model, "s2b") else model)
    # opt-in Pallas GroupNorm for the inference path (forward-only; the
    # training step keeps the differentiable XLA form) via
    # --extra eval_gn_impl=pallas.  Measured SLOWER than the XLA form on
    # the two-scale eval (71.3 vs 62.6 ms/img — ops/pallas_gn.py), so it
    # stays opt-in; kept as the recorded attempt at the eval GN lever.
    eval_gn = cfg.extra.get("eval_gn_impl")
    if eval_gn and hasattr(eval_model, "gn_impl"):
        eval_model = dataclasses.replace(eval_model, gn_impl=eval_gn)

    def eval_apply(state: SegTrainState, img):
        if rgb_input:
            # semiseg feeds RGB (BGR->RGB flip at model input,
            # semi-supervised_segmentation/evaluate_val.py:76)
            img = img[..., ::-1]
        _, _, logits, _ = eval_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            img, train=False,
        )
        return logits

    return state, step, eval_apply, model


def _load_centroids_torch(path: str):
    import torch

    obj = torch.load(path, map_location="cpu")
    return obj.numpy() if hasattr(obj, "numpy") else np.asarray(obj)


def export_state_role_keyed(state: SegTrainState, out_dir: str,
                            layers=(3, 4, 23, 3), model_kind: str = "deeplab",
                            hrnet_arch: str = "w48"):
    """Write student/teacher .pth in the reference layout."""
    from ..utils.checkpoint import export_role_keyed

    p = jax.tree_util.tree_map(np.asarray, state.params)
    s = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    tp = jax.tree_util.tree_map(np.asarray, state.teacher_params)
    ts = jax.tree_util.tree_map(np.asarray, state.teacher_batch_stats)
    if model_kind == "hrnet_ocr":
        from ..models.hrnet_ocr import W32, W48
        from ..models.convert_hrnet import hrnet_ocr_to_torch

        arch = W48 if hrnet_arch == "w48" else W32
        roles = {
            "student": hrnet_ocr_to_torch(p, s, arch),
            "teacher": hrnet_ocr_to_torch(tp, ts, arch),
        }
    else:
        roles = {
            "student": convert.segmodel_to_torch(p, s, layers),
            "teacher": convert.segmodel_to_torch(tp, ts, layers),
        }
    export_role_keyed(out_dir, roles)
