"""Compiled train steps for the DG / warm-up / self-training stages.

Each builder returns a pure function ``(state, batch) -> (state, metrics)``
meant to be wrapped in ``jax.jit`` (optionally with shardings over a data
mesh).  EVERYTHING in the reference's per-iteration loop that touches
tensors happens inside this one program: EMA update, photometric aug,
translator apply, CrDoMix/CutMix mask build, teacher+student forwards,
losses, centroid updates, and the SGD step.  The reference instead mixed
host Python (unique/sample per image, per-step D2H visualization) into
the loop (SURVEY.md §3.1) — those stalls are the throughput this design
buys back.

Stage semantics follow:
  * DG:            train_DiGA_DG.py:188-275
  * warm-up:       train_DiGA_gta2city_warm_up.py:197-305
  * self-training: train_DiGA_gta2city_self_training.py:214-387
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops import mixing, prototypes
from ..ops.ema import ema_alpha, ema_update
from ..ops.photometric import diga_photometric
from ..ops.resize import resize_bilinear
from .state import SegTrainState


@dataclasses.dataclass(frozen=True)
class StepConfig:
    num_classes: int = 19
    crop_hw: tuple[int, int] = (512, 896)
    beta: float = 0.4                    # photometric blend strength
    lambda_seg: float = 1.0
    lambda_distil: float = 0.5
    seg_loss: str = "ce"                 # 'ce' | 'ohem'
    ema_cap: float = 0.999
    distil_scale: float = 0.5
    ohem_thresh: float = 0.7
    ohem_min_kept: int = 100_000
    # semiseg (HRNet+OCR) extras: 0.1x aux loss on the OCR soft regions and
    # BGR->RGB flip at the model input (train_DiGA_semiseg_warm_up.py:238,259-263)
    aux_weight: float = 0.0
    rgb_input: bool = False
    # second view: CrDoMix composite (UDA) vs plain photometric view
    # (semiseg self-training, train_DiGA_semiseg_self_training.py:260)
    use_crdomix: bool = True
    # fused Pallas distillation kernel (ops/pallas_kernels.py): identical
    # numerics, recompute-based VJP avoids softmax residual traffic
    use_pallas_distill: bool = False
    # 'diga' = well-defined-space chain (documented deviation);
    # 'kornia' = reference-faithful kornia-0.5.8 chain on normalized
    # tensors incl. the trailing 2x-1 norm (ops/photometric.py)
    photometric: str = "diga"
    # per-stage photometric deltas: Synthia warm-up jitters with p=0.7
    # (Synthia/...warm_up.py:108); the DG chain has RandomSharpness
    # commented out (train_DiGA_DG.py:114)
    p_jitter: float = 0.5
    with_sharpness: bool = True
    # reference warm-up/DG/semiseg-warm-up run a no-grad student(tdatav)
    # forward every step for visualization (warm_up.py:265-266,
    # train_DiGA_DG.py:232-233, semiseg warm_up.py:239-240).  The logits
    # are viz-only, but the forward runs in TRAIN mode, so the student's
    # BN running statistics absorb target-batch statistics — semantics
    # visible at eval time (eval-mode BN uses running stats).  True here
    # replicates that stats side effect (the viz outputs feed nothing, so
    # XLA dead-codes the BN-free ASPP/OCR head; the cost is roughly a
    # backbone-only forward).  Self-training never does this student
    # forward (.._self_training.py:279-331) and keeps False.
    tgt_stats_forward: bool = False
    # batch-concatenate same-params model forwards into one program
    # (self-training: teacher on [s_cat;t_img], student on [s_cat;cross]).
    # THROUGHPUT MODE, NOT parity-exact: the reference runs every BN in
    # train mode (batch statistics; only the affine params are frozen —
    # seg_model_noaux.py:62-75 + student.train()), so pooling the
    # concatenated batches changes the normalization statistics (source
    # and target stats mix).  Off by default; parity runs must keep the
    # reference's separate-forward statistics.
    fuse_forwards: bool = False


def _seg_loss_fn(cfg: StepConfig) -> Callable:
    if cfg.seg_loss == "ohem":
        return lambda lg, lb: L.ohem_cross_entropy(
            lg, lb, thresh=cfg.ohem_thresh, min_kept=cfg.ohem_min_kept
        )
    return L.cross_entropy2d


def _distill_fn(cfg: StepConfig) -> Callable:
    if cfg.use_pallas_distill:
        from ..ops.pallas_kernels import distillation_loss_pallas

        return distillation_loss_pallas
    return L.distillation_loss


def _student_apply(model, params, batch_stats, x, rng, train=True, rgb_input=False):
    """Returns (aux, logits, feat, new_batch_stats).

    Both model families expose the same 4-slot output convention: slot 1
    is the aux/deep tensor (OCR soft regions for HRNet), slot 2 the
    logits, slot 3 the head features.
    """
    if rgb_input:
        x = x[..., ::-1]
    (_, aux, logits, feat), mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x, train=train, rngs={"dropout": rng}, mutable=["batch_stats"],
    )
    return aux, logits, feat, mut["batch_stats"]


def build_dg_step(model, optimizer, cfg: StepConfig):
    """Domain generalization: CE + symmetric distillation on photometric
    views only (no translator, no CrDoMix).  reference: train_DiGA_DG.py."""

    seg_loss = _seg_loss_fn(cfg)
    distill = _distill_fn(cfg)

    def step(state: SegTrainState, batch: dict):
        rng, k_aug, k_sdrop, k_tdrop, k_tviz = jax.random.split(state.rng, 5)
        s_img, s_lbl = batch["s_img"], batch["s_lbl"]
        b = s_img.shape[0]

        teacher_params = ema_update(
            state.teacher_params, state.params, ema_alpha(state.step, cfg.ema_cap)
        )

        s_aug = diga_photometric(s_img, k_aug, cfg.beta, cfg.photometric,
                                 p_jitter=cfg.p_jitter, with_sharpness=cfg.with_sharpness)
        s_cat = jnp.concatenate([s_img, s_aug], axis=0)

        # teacher forward (train-mode BN + dropout, like the reference's
        # never-eval'd teacher); its BN stats evolve independently
        t_aux, t_logits, _, teacher_bs = _student_apply(
            model, teacher_params, state.teacher_batch_stats, s_cat, k_tdrop,
            rgb_input=cfg.rgb_input,
        )
        t_logits_up = jax.lax.stop_gradient(resize_bilinear(t_logits, cfg.crop_hw))
        t_aux_up = (jax.lax.stop_gradient(resize_bilinear(t_aux, cfg.crop_hw))
                    if cfg.aux_weight > 0 else None)

        def loss_fn(params):
            aux, logits, _, new_bs = _student_apply(
                model, params, state.batch_stats, s_cat, k_sdrop,
                rgb_input=cfg.rgb_input,
            )
            logits_up = resize_bilinear(logits, cfg.crop_hw)
            ce = seg_loss(logits_up[:b], s_lbl)
            distil = distill(t_logits_up, logits_up, cfg.distil_scale)
            if cfg.aux_weight > 0:
                aux_up = resize_bilinear(aux, cfg.crop_hw)
                ce = ce + cfg.aux_weight * seg_loss(aux_up[:b], s_lbl)
                distil = distil + cfg.aux_weight * distill(
                    t_aux_up, aux_up, cfg.distil_scale)
            total = cfg.lambda_seg * ce + cfg.lambda_distil * distil
            return total, (ce, distil, new_bs)

        (total, (ce, distil, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if cfg.tgt_stats_forward:
            # the reference's no-grad student(tdatav) viz forward: pre-step
            # params, AFTER the s_cat stats update (train_DiGA_DG.py:231-233)
            _, _, _, new_bs = _student_apply(
                model, state.params, new_bs, batch["t_img"], k_tviz,
                rgb_input=cfg.rgb_input,
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            teacher_params=teacher_params,
            teacher_batch_stats=teacher_bs,
            opt_state=opt_state,
            rng=rng,
        )
        metrics = {"loss": total, "loss_semseg": ce, "loss_distil": distil}
        return new_state, metrics

    return step


def build_warmup_step(model, translator_apply, optimizer, cfg: StepConfig):
    """UDA warm-up: DG step + frozen translator + CrDoMix second view.

    ``translator_apply(frozen, x) -> x_translated`` wraps enc_s/dec_s2t.
    reference: train_DiGA_gta2city_warm_up.py:197-305.
    """

    seg_loss = _seg_loss_fn(cfg)
    distill = _distill_fn(cfg)

    def step(state: SegTrainState, batch: dict):
        rng, k_aug, k_mix, k_sdrop, k_tdrop, k_tviz = jax.random.split(state.rng, 6)
        s_img, s_lbl = batch["s_img"], batch["s_lbl"]
        b = s_img.shape[0]

        teacher_params = ema_update(
            state.teacher_params, state.params, ema_alpha(state.step, cfg.ema_cap)
        )

        s_aug = diga_photometric(s_img, k_aug, cfg.beta, cfg.photometric,
                                 p_jitter=cfg.p_jitter, with_sharpness=cfg.with_sharpness)
        rec_s2t = jax.lax.stop_gradient(translator_apply(state.frozen, s_img))
        s_crdomix = mixing.crdomix(rec_s2t, s_aug, s_lbl, k_mix, cfg.num_classes)
        s_cat = jnp.concatenate([s_img, s_crdomix], axis=0)

        t_aux, t_logits, _, teacher_bs = _student_apply(
            model, teacher_params, state.teacher_batch_stats, s_cat, k_tdrop,
            rgb_input=cfg.rgb_input,
        )
        t_logits_up = jax.lax.stop_gradient(resize_bilinear(t_logits, cfg.crop_hw))
        t_aux_up = (jax.lax.stop_gradient(resize_bilinear(t_aux, cfg.crop_hw))
                    if cfg.aux_weight > 0 else None)

        def loss_fn(params):
            aux, logits, _, new_bs = _student_apply(
                model, params, state.batch_stats, s_cat, k_sdrop,
                rgb_input=cfg.rgb_input,
            )
            logits_up = resize_bilinear(logits, cfg.crop_hw)
            ce = seg_loss(logits_up[:b], s_lbl)
            distil = distill(t_logits_up, logits_up, cfg.distil_scale)
            if cfg.aux_weight > 0:
                aux_up = resize_bilinear(aux, cfg.crop_hw)
                ce = ce + cfg.aux_weight * seg_loss(aux_up[:b], s_lbl)
                distil = distil + cfg.aux_weight * distill(
                    t_aux_up, aux_up, cfg.distil_scale)
            total = cfg.lambda_seg * ce + cfg.lambda_distil * distil
            return total, (ce, distil, new_bs)

        (total, (ce, distil, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if cfg.tgt_stats_forward:
            # the reference's no-grad student(tdatav) viz forward: pre-step
            # params, AFTER the s_cat stats update (warm_up.py:264-266)
            _, _, _, new_bs = _student_apply(
                model, state.params, new_bs, batch["t_img"], k_tviz,
                rgb_input=cfg.rgb_input,
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            teacher_params=teacher_params,
            teacher_batch_stats=teacher_bs,
            opt_state=opt_state,
            rng=rng,
        )
        metrics = {"loss": total, "loss_semseg": ce, "loss_distil": distil}
        return new_state, metrics

    return step


def build_selftrain_step(model, translator_apply, optimizer, cfg: StepConfig):
    """Self-training: warm-up step + bilateral-consensus pseudo-labels,
    online centroid EMA, and DACS CutMix on the target.

    reference: train_DiGA_gta2city_self_training.py:214-387.
    """

    seg_loss = _seg_loss_fn(cfg)
    distill = _distill_fn(cfg)

    def step(state: SegTrainState, batch: dict):
        rng, k_aug_s, k_aug_t, k_mix1, k_mix2, k_sdrop, k_tdrop, k_tdrop2, k_cdrop = (
            jax.random.split(state.rng, 9)
        )
        s_img, s_lbl = batch["s_img"], batch["s_lbl"]
        t_img, t_pseudo = batch["t_img"], batch["t_pseudo"]
        b = s_img.shape[0]

        teacher_params = ema_update(
            state.teacher_params, state.params, ema_alpha(state.step, cfg.ema_cap)
        )

        s_aug = diga_photometric(s_img, k_aug_s, cfg.beta, cfg.photometric,
                                 p_jitter=cfg.p_jitter, with_sharpness=cfg.with_sharpness)
        t_aug = diga_photometric(t_img, k_aug_t, cfg.beta, cfg.photometric,
                                 p_jitter=cfg.p_jitter, with_sharpness=cfg.with_sharpness)
        if cfg.use_crdomix:
            rec_s2t = jax.lax.stop_gradient(translator_apply(state.frozen, s_img))
            s_view2 = mixing.crdomix(rec_s2t, s_aug, s_lbl, k_mix1, cfg.num_classes)
        else:
            s_view2 = s_aug
        s_cat = jnp.concatenate([s_img, s_view2], axis=0)

        # ---- teacher forwards (no grad) ----
        if cfg.fuse_forwards:
            # one batched forward over [s_cat; t_img] — throughput mode
            # (see StepConfig.fuse_forwards: BN batch statistics pool
            # across the concatenated batches, a documented deviation)
            nt = t_img.shape[0]
            _, a_logits, a_feat, teacher_bs = _student_apply(
                model, teacher_params, state.teacher_batch_stats,
                jnp.concatenate([s_cat, t_img], axis=0), k_tdrop,
                rgb_input=cfg.rgb_input,
            )
            st_logits, tt_logits = a_logits[:-nt], a_logits[-nt:]
            st_feat, tt_feat = a_feat[:-nt], a_feat[-nt:]
        else:
            _, st_logits, st_feat, teacher_bs = _student_apply(
                model, teacher_params, state.teacher_batch_stats, s_cat, k_tdrop,
                rgb_input=cfg.rgb_input,
            )
            _, tt_logits, tt_feat, teacher_bs = _student_apply(
                model, teacher_params, teacher_bs, t_img, k_tdrop2,
                rgb_input=cfg.rgb_input,
            )
        st_logits = jax.lax.stop_gradient(st_logits)
        st_feat = jax.lax.stop_gradient(st_feat)
        tt_logits = jax.lax.stop_gradient(tt_logits)
        tt_feat = jax.lax.stop_gradient(tt_feat)
        st_logits_up = resize_bilinear(st_logits, cfg.crop_hw)

        # ---- bilateral consensus (reference :297-304) ----
        weights = prototypes.centroid_weight(tt_feat, state.centroids.vectors)
        weights_up = resize_bilinear(weights, cfg.crop_hw)
        t_consensus = prototypes.bilateral_consensus(t_pseudo, weights_up)

        # ---- DACS crossmix: source classes pasted into the photometric
        # target view (reference :306-325) ----
        cross_img, cross_lbl = mixing.dacs_crossmix(
            t_aug, s_img, s_lbl, t_consensus, k_mix2, cfg.num_classes
        )

        # ---- online centroid updates from teacher feats (reference :327-341) ----
        vec_t, ok_t = prototypes.masked_class_means(tt_feat, tt_logits, t_consensus)
        cents = prototypes.update_centroids(
            state.centroids, vec_t, ok_t, start_mean=False
        )
        vec_s, ok_s = prototypes.masked_class_means(
            st_feat[b:], st_logits[b:], s_lbl
        )
        cents = prototypes.update_centroids(cents, vec_s, ok_s, start_mean=False)

        def loss_fn(params):
            if cfg.fuse_forwards:
                nc = cross_img.shape[0]
                _, f_logits, _, bs2 = _student_apply(
                    model, params, state.batch_stats,
                    jnp.concatenate([s_cat, cross_img], axis=0), k_sdrop,
                    rgb_input=cfg.rgb_input,
                )
                logits, cross_logits = f_logits[:-nc], f_logits[-nc:]
            else:
                _, logits, _, bs1 = _student_apply(
                    model, params, state.batch_stats, s_cat, k_sdrop,
                    rgb_input=cfg.rgb_input,
                )
                _, cross_logits, _, bs2 = _student_apply(
                    model, params, bs1, cross_img, k_cdrop, rgb_input=cfg.rgb_input)
            logits_up = resize_bilinear(logits, cfg.crop_hw)
            cross_up = resize_bilinear(cross_logits, cfg.crop_hw)
            ce = seg_loss(logits_up[:b], s_lbl)
            ce_cross = seg_loss(cross_up, cross_lbl)
            distil = distill(st_logits_up, logits_up, cfg.distil_scale)
            total = cfg.lambda_seg * (ce + ce_cross) + cfg.lambda_distil * distil
            return total, (ce, ce_cross, distil, bs2)

        (total, (ce, ce_cross, distil, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            teacher_params=teacher_params,
            teacher_batch_stats=teacher_bs,
            opt_state=opt_state,
            rng=rng,
            centroids=cents,
        )
        metrics = {
            "loss": total,
            "loss_semseg": ce,
            "loss_crossmix": ce_cross,
            "loss_distil": distil,
            "consensus_kept": jnp.mean((t_consensus != 255).astype(jnp.float32)),
        }
        return new_state, metrics

    return step
