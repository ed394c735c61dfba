"""Subprocess body for test_train_step_parity (VERDICT r3 missing #1).

Replays ONE FULL train step — warm-up or self-training — in functional
torch and diffs it against the jitted step: EMA teacher placement,
train-mode BN batch statistics (incl. the no-grad student(tdatav) stats
forward), upsample-before-loss ordering, CE + distillation composition,
consensus/CutMix/centroid machinery (self-training), torch-SGD update
with the 10x head group and frozen BN affine.  This is the composition
where silent semantic drift lives; the per-component parity tests can't
see it.

Controlled randomness: photometric OFF via beta=0 (exact identity),
dropout OFF via droprate=0, and the CrDoMix/CutMix class selections +
translator output computed once in JAX with the step's exact key
derivation and INJECTED into the torch replay (their own parity is
pinned by test_device_ops / test_translator_parity).  SGD per the
NOTES_r3 lesson (Adam amplifies 1e-6 gradient noise into update flips).

Reference steps replayed:
  warm-up:       train_DiGA_gta2city_warm_up.py:197-305
  self-training: train_DiGA_gta2city_self_training.py:214-387
  EMA:           util/utils.py:103-116 (parameters only, ramped alpha)
  losses:        util/loss.py:48-62 (cross_entropy2d), :125-143 (distil)
  centroids:     calc_centroids.py:120-180 (Class_Features)

Prints one "RESULT key=value ..." line per comparison group; the parent
test asserts the tolerances.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

LAYERS = (1, 1, 1, 1)
CROP = (64, 128)
NCLS = 19
B = 2
LR = 2.5e-4
ITER = 5          # exercise the EMA ramp: alpha = min(1 - 1/6, .999) = 5/6
MOM = 0.9
WD = 5e-4


# ---------------------------------------------------------------- torch side

def _is_buffer(k):
    return "running_" in k


def _is_frozen_affine(k):
    # backbone BN scale/bias: gradient-frozen (seg_model_noaux.py:62-76);
    # layout from convert.segmodel_to_torch: layer0.1, layerN.B.bn{1,2,3},
    # layerN.B.downsample.1
    if k.startswith("final."):
        return False
    if not (k.endswith(".weight") or k.endswith(".bias")):
        return False
    stem = k.rsplit(".", 1)[0]
    return stem.endswith((".bn1", ".bn2", ".bn3", ".downsample.1")) or stem == "layer0.1"


def _is_head(k):
    return k.startswith("final.")


def to_torch_sd(params, stats):
    import torch

    from diga_tpu.models.convert import segmodel_to_torch

    sd_np = segmodel_to_torch(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, stats), layers=LAYERS)
    return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd_np.items()}


def ema_update_torch(sd_tea, sd_stu, alpha):
    """update_teacher_params (utils.py:113-115): .parameters() only —
    running stats are NOT EMA'd; frozen BN affine IS a parameter."""
    import torch

    with torch.no_grad():
        for k in sd_tea:
            if not _is_buffer(k):
                sd_tea[k] = alpha * sd_tea[k] + (1 - alpha) * sd_stu[k]


def make_sgd(sd_stu):
    """torch.optim.SGD with the reference groups: 1x backbone (BN affine
    excluded — get_1x_lr_params_NOscale), 10x head (seg_model_noaux.py:319-321),
    momentum .9, wd 5e-4 (warm_up.py:156)."""
    import torch

    p1x, p10x = [], []
    for k, v in sd_stu.items():
        if _is_buffer(k) or _is_frozen_affine(k):
            continue
        v.requires_grad_(True)
        (p10x if _is_head(k) else p1x).append(v)
    opt = torch.optim.SGD([{"params": p1x, "lr": LR},
                           {"params": p10x, "lr": LR * 10}],
                          momentum=MOM, weight_decay=WD)
    return opt


def cross_entropy2d_torch(inp, tgt):
    """util/loss.py:48-62: NLL sum over non-255, divided by the count of
    target >= 0 (= ALL pixels: labels are 0..18 plus 255)."""
    import torch.nn.functional as F

    logp = F.log_softmax(inp, dim=1)
    loss = F.nll_loss(logp, tgt, ignore_index=255, reduction="sum")
    return loss / (tgt >= 0).sum()


def distillation_loss_torch(teacher_out, student_out, scale=0.5):
    """util/loss.py:125-143 verbatim math."""
    import torch
    import torch.nn.functional as F

    student_out = student_out.chunk(2)
    teacher_out = F.softmax(teacher_out, dim=1).detach().chunk(2)
    total = 0
    for iq, q in enumerate(teacher_out):
        for v in range(len(student_out)):
            if v == iq:
                continue
            loss = torch.sum(-q * F.log_softmax(student_out[v], dim=1), dim=1)
            if iq == 1:
                loss = loss * scale
            total = total + loss.mean()
    return total


def upsample_torch(x, hw):
    import torch.nn.functional as F

    return F.interpolate(x, size=hw, mode="bilinear", align_corners=True)


def consensus_torch(tt_feat, centroids, t_pseudo):
    """feat_centroid_distance + get_centroid_weight (calc_centroids.py:166-176)
    -> upsample -> argmax -> disagree=255 (.._self_training.py:297-304)."""
    import torch
    import torch.nn.functional as F

    n, c, h, w = tt_feat.shape
    dist = torch.zeros((n, NCLS, h, w))
    for i in range(NCLS):
        dist[:, i] = torch.norm(
            centroids[i].reshape(-1, 1, 1).expand(-1, h, w) - tt_feat, 2, dim=1)
    weight = F.softmax(-dist, dim=1)
    weight = upsample_torch(weight, CROP)
    feat_pseudo = weight.max(1)[1]
    out = t_pseudo.clone()
    out[t_pseudo != feat_pseudo] = 255
    return out


def class_masks_torch(logits, labels=None):
    """process_label'd prediction (and label) one-hots (calc_centroids.py:120-145)."""
    import torch
    import torch.nn.functional as F

    pred = F.softmax(logits, dim=1).argmax(dim=1)            # (N, h, w)
    pred_oh = F.one_hot(pred, NCLS + 1).permute(0, 3, 1, 2).float()[:, :NCLS]
    if labels is None:
        return pred_oh
    lbl = labels.clone()
    lbl[lbl == 255] = NCLS
    lbl_oh = F.one_hot(lbl.long(), NCLS + 1).permute(0, 3, 1, 2).float()[:, :NCLS]
    return pred_oh * lbl_oh


def centroid_update_torch(centroids, counts, feat, logits, labels_full):
    """calculate_mean_vector + update_objective_SingleVector(start_mean=False)
    in the reference's per-(image, class) sequential order
    (.._self_training.py:327-341, calc_centroids.py:137-164)."""
    import torch
    import torch.nn.functional as F

    h, w = feat.shape[2:]
    lbl = F.interpolate(labels_full.float().unsqueeze(1), size=(h, w),
                        mode="nearest").squeeze(1)
    mask = class_masks_torch(logits, lbl)                    # (N, K, h, w)
    scale = mask.mean(dim=(2, 3))                            # adaptive_avg_pool2d(.,1)
    for n in range(feat.shape[0]):
        for t in range(NCLS):
            if scale[n, t].item() == 0:
                continue
            if (mask[n, t] > 0).sum() < 5:
                continue
            s = (feat[n] * mask[n, t]).mean(dim=(1, 2)) / scale[n, t]
            if s.sum().item() == 0:
                continue
            centroids[t] = centroids[t] * (1 - 1e-4) + 1e-4 * s
            counts[t] = min(counts[t] + 1, 3000.0)


# ---------------------------------------------------------------- jax side

def build_jax(stage):
    from diga_tpu.models.resnet_deeplab import DeepLabV2, head_param_mask
    from diga_tpu.models.translator import ImgDecoder, ImgEncoder
    from diga_tpu.ops.prototypes import Centroids
    from diga_tpu.train.optim import sgd_grouped
    from diga_tpu.train.schedules import poly_schedule
    from diga_tpu.train.state import create_seg_state

    model = DeepLabV2(num_classes=NCLS, layers=LAYERS, droprate=0.0)
    k = jax.random.PRNGKey(3)
    x = jnp.zeros((1, *CROP, 3), jnp.float32)
    variables = model.init({"params": k, "dropout": k}, x, train=False)
    opt = sgd_grouped(poly_schedule(LR, 1000), head_param_mask(variables["params"]),
                      momentum=MOM, weight_decay=WD)

    enc = ImgEncoder(dim=8, n_downsample=2, n_res=1)
    dec = ImgDecoder(dim=32, n_upsample=2, n_res=1)
    enc_p = enc.init(k, x)["params"]
    dec_p = dec.init(k, enc.apply({"params": enc_p}, x))["params"]
    frozen = {"enc_s": enc_p, "dec_s2t": dec_p}

    def translator_apply(fz, img):
        return dec.apply({"params": fz["dec_s2t"]},
                         enc.apply({"params": fz["enc_s"]}, img))

    rr = np.random.default_rng(11)
    cents = None
    if stage == "selftrain":
        # random (not zero) centroids: zero-init makes every class
        # equidistant and the consensus argmax tie-breaks on float noise
        cents = Centroids(
            vectors=jnp.asarray(rr.normal(size=(NCLS, 256)).astype(np.float32)),
            counts=jnp.full((NCLS,), 150.0, jnp.float32))

    state = create_seg_state(model, opt, k, CROP, centroids=cents, frozen=frozen)
    # non-trivial running stats; teacher != student so the EMA matters
    stats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rr.normal(size=a.shape).astype(np.float32) * 0.01),
        state.batch_stats)
    tstats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rr.normal(size=a.shape).astype(np.float32) * 0.01),
        state.batch_stats)
    tparams = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rr.normal(size=a.shape).astype(np.float32) * 0.01,
        state.params)
    state = state.replace(batch_stats=stats, teacher_params=tparams,
                          teacher_batch_stats=tstats,
                          step=jnp.asarray(ITER, jnp.int32))
    return model, opt, state, translator_apply


def make_batch(stage):
    rr = np.random.default_rng(23)
    s_img = (rr.normal(size=(B, *CROP, 3)) * 0.5).astype(np.float32)
    s_lbl = rr.integers(0, NCLS, size=(B, *CROP)).astype(np.int32)
    s_lbl[:, :4] = 255  # exercise the ignore path
    batch = {"s_img": s_img, "s_lbl": s_lbl}
    t_img = (rr.normal(size=(B, *CROP, 3)) * 0.5).astype(np.float32)
    batch["t_img"] = t_img
    if stage == "selftrain":
        batch["t_pseudo"] = rr.integers(0, NCLS, size=(B, *CROP)).astype(np.int32)
        batch["t_pseudo"][:, -4:] = 255
    return batch


def _delta_metrics(tag, old_params, new_params_jax, sd_new_torch, sd_old_torch):
    """Compare jax param DELTAS against torch deltas (comparing raw params
    would trivially pass: updates are O(lr * grad))."""
    from diga_tpu.models.convert import segmodel_to_torch

    old_sd = segmodel_to_torch(
        jax.tree_util.tree_map(np.asarray, old_params), _zero_stats(old_params),
        layers=LAYERS)
    new_sd = segmodel_to_torch(
        jax.tree_util.tree_map(np.asarray, new_params_jax),
        _zero_stats(new_params_jax), layers=LAYERS)
    worst, worst_scale = 0.0, 0.0
    for k in new_sd:
        if _is_buffer(k):
            continue
        dj = np.asarray(new_sd[k]) - np.asarray(old_sd[k])
        dt = sd_new_torch[k].detach().numpy() - sd_old_torch[k].detach().numpy()
        worst = max(worst, float(np.max(np.abs(dj - dt))))
        worst_scale = max(worst_scale, float(np.max(np.abs(dt))))
    rel = worst / max(worst_scale, 1e-30)
    print(f"RESULT {tag}_delta_rel={rel:.3e} {tag}_delta_scale={worst_scale:.3e}")


def _zero_stats(params):
    # segmodel_to_torch needs a stats tree; build zeros with matching paths
    from diga_tpu.models.resnet_deeplab import DeepLabV2

    model = DeepLabV2(num_classes=NCLS, layers=LAYERS, droprate=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 64, 3), jnp.float32), train=False)
    return jax.tree_util.tree_map(np.asarray, variables["batch_stats"])


def _stats_metrics(tag, new_stats_jax, sd_torch):
    """Running means AND vars compared tight: BatchNorm2D stores the
    torch-style unbiased running var (models/norms.py), so both sides
    lerp the same estimator."""
    from diga_tpu.models.convert import segmodel_to_torch

    sd_jax = segmodel_to_torch(_zero_params(), jax.tree_util.tree_map(
        np.asarray, new_stats_jax), layers=LAYERS)
    d_mean, d_var = 0.0, 0.0
    for k in sd_jax:
        if not _is_buffer(k):
            continue
        a = np.asarray(sd_jax[k])
        b = sd_torch[k].detach().numpy()
        rel = float(np.max(np.abs(a - b) / (np.abs(b) + 1e-3)))
        if k.endswith("running_mean"):
            d_mean = max(d_mean, rel)
        else:
            d_var = max(d_var, rel)
    print(f"RESULT {tag}_mean_rel={d_mean:.3e} {tag}_var_rel={d_var:.3e}")


def _zero_params():
    from diga_tpu.models.resnet_deeplab import DeepLabV2

    model = DeepLabV2(num_classes=NCLS, layers=LAYERS, droprate=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 64, 3), jnp.float32), train=False)
    return jax.tree_util.tree_map(np.asarray, variables["params"])


# ---------------------------------------------------------------- warm-up

def run_warmup():
    import torch

    from diga_tpu.models.torch_replay import segmodel_forward_torch
    from diga_tpu.ops import mixing
    from diga_tpu.train.steps import StepConfig, build_warmup_step

    model, opt, state, translator_apply = build_jax("warmup")
    batch = make_batch("warmup")
    cfg = StepConfig(crop_hw=CROP, beta=0.0, tgt_stats_forward=True)
    step = jax.jit(build_warmup_step(model, translator_apply, opt, cfg))

    # injected tensors: the step's exact key derivation (steps.py warm-up)
    _, k_aug, k_mix, k_sdrop, k_tdrop, k_tviz = jax.random.split(state.rng, 6)
    rec_s2t = translator_apply(state.frozen, jnp.asarray(batch["s_img"]))
    s_crdomix = np.asarray(mixing.crdomix(
        rec_s2t, jnp.asarray(batch["s_img"]), jnp.asarray(batch["s_lbl"]),
        k_mix, NCLS))

    old_params = state.params
    new_state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    # ---- torch replay ----
    sd_stu = to_torch_sd(state.params, state.batch_stats)
    sd_tea = to_torch_sd(state.teacher_params, state.teacher_batch_stats)
    sd_stu_old = {k: v.clone() for k, v in sd_stu.items()}
    alpha = min(1 - 1 / (ITER + 1), 0.999)
    ema_update_torch(sd_tea, sd_stu, alpha)
    optim = make_sgd(sd_stu)

    s_cat = np.concatenate([batch["s_img"], s_crdomix], 0)
    x_t = torch.from_numpy(s_cat.transpose(0, 3, 1, 2))
    t_t = torch.from_numpy(batch["t_img"].transpose(0, 3, 1, 2))
    s_lbl_t = torch.from_numpy(batch["s_lbl"]).long()

    with torch.no_grad():
        tea_logits, _ = segmodel_forward_torch(sd_tea, x_t, layers=LAYERS,
                                               training=True)
        tea_up = upsample_torch(tea_logits, CROP)
    stu_logits, _ = segmodel_forward_torch(sd_stu, x_t, layers=LAYERS,
                                           training=True)
    # the reference's no-grad student(tdatav) viz forward (warm_up.py:265-266)
    with torch.no_grad():
        segmodel_forward_torch(sd_stu, t_t, layers=LAYERS, training=True)
    stu_up = upsample_torch(stu_logits, CROP)

    ce = cross_entropy2d_torch(stu_up[:B], s_lbl_t)
    distil = distillation_loss_torch(tea_up, stu_up)
    total = 1.0 * ce + 0.5 * distil
    optim.zero_grad()
    total.backward()
    optim.step()

    print(f"RESULT loss_jax={float(metrics['loss']):.6f} loss_torch={float(total):.6f}")
    print(f"RESULT ce_jax={float(metrics['loss_semseg']):.6f} ce_torch={float(ce):.6f}")
    print(f"RESULT distil_jax={float(metrics['loss_distil']):.6f} "
          f"distil_torch={float(distil):.6f}")
    _delta_metrics("param", old_params, new_state.params, sd_stu, sd_stu_old)
    _stats_metrics("stu_stats", new_state.batch_stats, sd_stu)
    _stats_metrics("tea_stats", new_state.teacher_batch_stats, sd_tea)
    # teacher params: pure linear EMA, must agree tightly
    from diga_tpu.models.convert import segmodel_to_torch

    tea_jax = segmodel_to_torch(
        jax.tree_util.tree_map(np.asarray, new_state.teacher_params),
        _zero_stats(None), layers=LAYERS)
    d_tea = max(float(np.max(np.abs(np.asarray(tea_jax[k])
                                    - sd_tea[k].detach().numpy())))
                for k in tea_jax if not _is_buffer(k))
    print(f"RESULT tea_param_absdiff={d_tea:.3e}")


# ---------------------------------------------------------------- selftrain

def run_selftrain():
    import torch

    from diga_tpu.models.torch_replay import segmodel_forward_torch
    from diga_tpu.ops import mixing
    from diga_tpu.train.steps import StepConfig, build_selftrain_step

    model, opt, state, translator_apply = build_jax("selftrain")
    batch = make_batch("selftrain")
    cfg = StepConfig(crop_hw=CROP, beta=0.0, lambda_distil=0.25)
    step = jax.jit(build_selftrain_step(model, translator_apply, opt, cfg))

    # the step's exact key derivation (steps.py self-training: split 9)
    (_, k_aug_s, k_aug_t, k_mix1, k_mix2,
     k_sdrop, k_tdrop, k_tdrop2, k_cdrop) = jax.random.split(state.rng, 9)
    s_img_j = jnp.asarray(batch["s_img"])
    s_lbl_j = jnp.asarray(batch["s_lbl"])
    rec_s2t = translator_apply(state.frozen, s_img_j)
    s_view2 = np.asarray(mixing.crdomix(rec_s2t, s_img_j, s_lbl_j, k_mix1, NCLS))
    dacs_sel = mixing.sample_half_classes(s_lbl_j, k_mix2, NCLS)
    dacs_mask = np.asarray(
        mixing.selection_to_pixel_mask(s_lbl_j, dacs_sel, NCLS))

    old_params = state.params
    new_state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    # ---- torch replay ----
    sd_stu = to_torch_sd(state.params, state.batch_stats)
    sd_tea = to_torch_sd(state.teacher_params, state.teacher_batch_stats)
    sd_stu_old = {k: v.clone() for k, v in sd_stu.items()}
    alpha = min(1 - 1 / (ITER + 1), 0.999)
    ema_update_torch(sd_tea, sd_stu, alpha)
    optim = make_sgd(sd_stu)

    s_cat = np.concatenate([batch["s_img"], s_view2], 0)
    x_t = torch.from_numpy(s_cat.transpose(0, 3, 1, 2))
    t_t = torch.from_numpy(batch["t_img"].transpose(0, 3, 1, 2))
    s_lbl_t = torch.from_numpy(batch["s_lbl"]).long()
    t_pseudo_t = torch.from_numpy(batch["t_pseudo"]).long()
    centroids = torch.from_numpy(np.asarray(state.centroids.vectors).copy())
    counts = np.asarray(state.centroids.counts).copy()

    # teacher forwards: s_cat then t (running stats sequential,
    # .._self_training.py:286,299)
    with torch.no_grad():
        st_logits, st_feat = segmodel_forward_torch(sd_tea, x_t, layers=LAYERS,
                                                    training=True)
        tt_logits, tt_feat = segmodel_forward_torch(sd_tea, t_t, layers=LAYERS,
                                                    training=True)
        st_up = upsample_torch(st_logits, CROP)
        consensus = consensus_torch(tt_feat, centroids, t_pseudo_t)

    # DACS crossmix with the injected class-selection mask (:306-325)
    mask_t = torch.from_numpy(dacs_mask)
    cross_img = t_t * (1 - mask_t[:, None]) + torch.from_numpy(
        batch["s_img"].transpose(0, 3, 1, 2)) * mask_t[:, None]
    cross_lbl = torch.where(mask_t > 0, s_lbl_t, consensus)

    # online centroid updates: target first, then the source AUG half
    # (:327-341; feats/logits at feature resolution)
    with torch.no_grad():
        centroid_update_torch(centroids, counts, tt_feat, tt_logits, consensus)
        centroid_update_torch(centroids, counts, st_feat[B:], st_logits[B:],
                              s_lbl_t)

    # student forwards: s_cat (grads) then crossmix (grads, stats sequential)
    stu_logits, _ = segmodel_forward_torch(sd_stu, x_t, layers=LAYERS,
                                           training=True)
    cross_logits, _ = segmodel_forward_torch(sd_stu, cross_img, layers=LAYERS,
                                             training=True)
    stu_up = upsample_torch(stu_logits, CROP)
    cross_up = upsample_torch(cross_logits, CROP)

    ce = cross_entropy2d_torch(stu_up[:B], s_lbl_t)
    ce_cross = cross_entropy2d_torch(cross_up, cross_lbl)
    distil = distillation_loss_torch(st_up, stu_up)
    total = 1.0 * (ce + ce_cross) + 0.25 * distil
    optim.zero_grad()
    total.backward()
    optim.step()

    print(f"RESULT loss_jax={float(metrics['loss']):.6f} loss_torch={float(total):.6f}")
    print(f"RESULT ce_jax={float(metrics['loss_semseg']):.6f} ce_torch={float(ce):.6f}")
    print(f"RESULT cross_jax={float(metrics['loss_crossmix']):.6f} "
          f"cross_torch={float(ce_cross):.6f}")
    print(f"RESULT distil_jax={float(metrics['loss_distil']):.6f} "
          f"distil_torch={float(distil):.6f}")
    kept_t = float((consensus != 255).float().mean())
    print(f"RESULT kept_jax={float(metrics['consensus_kept']):.6f} "
          f"kept_torch={kept_t:.6f}")
    _delta_metrics("param", old_params, new_state.params, sd_stu, sd_stu_old)
    _stats_metrics("stu_stats", new_state.batch_stats, sd_stu)
    _stats_metrics("tea_stats", new_state.teacher_batch_stats, sd_tea)
    d_cent = float(np.max(np.abs(np.asarray(new_state.centroids.vectors)
                                 - centroids.numpy())))
    d_cnt = float(np.max(np.abs(np.asarray(new_state.centroids.counts) - counts)))
    print(f"RESULT centroid_absdiff={d_cent:.3e} count_absdiff={d_cnt:.3e}")


# ---------------------------------------------------------------- semiseg

TINY_HR = {
    "stem_channels": 8,
    "stage1_blocks": 2,
    "stage1_channels": 8,
    "stages": [
        (1, 2, (8, 16)),
        (2, 1, (8, 16, 32)),
        (1, 1, (8, 16, 32, 64)),
    ],
    "ocr_mid_channels": 32,
    "ocr_key_channels": 16,
}
LR_SS = 1e-3     # semiseg warm_up.py:88 (poly power 1.0, no 10x head)


def run_semiseg():
    """Composed semiseg warm-up step (DG-style + aux loss) vs torch:
    HRNet-W48+OCR (tiny arch), RGB input flip, aux CE + aux distillation
    both 0.1-weighted (semiseg warm_up.py:259-263), single-group SGD
    (every param trains, BN affine included), ramped EMA, and the no-grad
    student(unlabeled) BN-stats forward (warm_up.py:239-240)."""
    import torch

    import diga_tpu.models.hrnet_ocr as H
    from diga_tpu.models.convert_hrnet import hrnet_ocr_to_torch
    from diga_tpu.models.hrnet_ocr import HRNetOCR
    from diga_tpu.models.torch_replay import hrnet_ocr_forward_torch
    from diga_tpu.train.optim import sgd_grouped
    from diga_tpu.train.schedules import poly_schedule
    from diga_tpu.train.state import create_seg_state
    from diga_tpu.train.steps import StepConfig, build_dg_step

    H.W32 = TINY_HR  # arch_name != "w48" resolves W32 at call time
    model = HRNetOCR(num_classes=NCLS, arch_name="tiny", droprate=0.0)
    k = jax.random.PRNGKey(3)
    variables = model.init({"params": k, "dropout": k},
                           jnp.zeros((1, *CROP, 3), jnp.float32), train=False)
    # build_experiment with head_lr_mult=1: every label becomes 'backbone'
    labels = jax.tree_util.tree_map(lambda _: "backbone", variables["params"])
    opt = sgd_grouped(poly_schedule(LR_SS, 1000, power=1.0), labels,
                      momentum=MOM, weight_decay=WD, head_mult=1.0)
    state = create_seg_state(model, opt, k, CROP)

    rr = np.random.default_rng(11)
    stats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rr.normal(size=a.shape).astype(np.float32) * 0.01),
        state.batch_stats)
    tstats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rr.normal(size=a.shape).astype(np.float32) * 0.01),
        state.batch_stats)
    tparams = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rr.normal(size=a.shape).astype(np.float32) * 0.01,
        state.params)
    state = state.replace(batch_stats=stats, teacher_params=tparams,
                          teacher_batch_stats=tstats,
                          step=jnp.asarray(ITER, jnp.int32))

    batch = make_batch("warmup")
    cfg = StepConfig(crop_hw=CROP, beta=0.0, aux_weight=0.1, rgb_input=True,
                     tgt_stats_forward=True)
    step = jax.jit(build_dg_step(model, opt, cfg))
    old_params = state.params
    new_state, metrics = step(state, {kk: jnp.asarray(v) for kk, v in batch.items()})

    # ---- torch replay ----
    def to_sd(params, stts):
        sd_np = hrnet_ocr_to_torch(
            jax.tree_util.tree_map(np.asarray, params),
            jax.tree_util.tree_map(np.asarray, stts), TINY_HR)
        return {kk: torch.from_numpy(np.asarray(v).copy()) for kk, v in sd_np.items()}

    sd_stu = to_sd(state.params, state.batch_stats)
    sd_tea = to_sd(state.teacher_params, state.teacher_batch_stats)
    sd_stu_old = {kk: v.clone() for kk, v in sd_stu.items()}
    alpha = min(1 - 1 / (ITER + 1), 0.999)
    ema_update_torch(sd_tea, sd_stu, alpha)

    # single param group: everything trains (no frozen affine, no 10x head)
    p1 = []
    for kk, v in sd_stu.items():
        if _is_buffer(kk):
            continue
        v.requires_grad_(True)
        p1.append(v)
    optim = torch.optim.SGD(p1, lr=LR_SS, momentum=MOM, weight_decay=WD)

    def flip_rgb(x):  # step does x[..., ::-1] on NHWC == channel flip in NCHW
        return torch.flip(x, dims=[1])

    s_cat = np.concatenate([batch["s_img"], batch["s_img"]], 0)  # beta=0 aug
    x_t = flip_rgb(torch.from_numpy(s_cat.transpose(0, 3, 1, 2)))
    t_t = flip_rgb(torch.from_numpy(batch["t_img"].transpose(0, 3, 1, 2)))
    s_lbl_t = torch.from_numpy(batch["s_lbl"]).long()

    with torch.no_grad():
        _, tea_aux, tea_logits, _ = hrnet_ocr_forward_torch(
            sd_tea, x_t, TINY_HR, num_classes=NCLS, training=True)
        tea_up = upsample_torch(tea_logits, CROP)
        tea_aux_up = upsample_torch(tea_aux, CROP)
    _, stu_aux, stu_logits, _ = hrnet_ocr_forward_torch(
        sd_stu, x_t, TINY_HR, num_classes=NCLS, training=True)
    # the no-grad student(unlabeled) stats forward, after the s_cat stats
    # update (semiseg warm_up.py:239-240)
    with torch.no_grad():
        hrnet_ocr_forward_torch(sd_stu, t_t, TINY_HR, num_classes=NCLS,
                                training=True)
    stu_up = upsample_torch(stu_logits, CROP)
    stu_aux_up = upsample_torch(stu_aux, CROP)

    ce = (cross_entropy2d_torch(stu_up[:B], s_lbl_t)
          + 0.1 * cross_entropy2d_torch(stu_aux_up[:B], s_lbl_t))
    distil = (distillation_loss_torch(tea_up, stu_up)
              + 0.1 * distillation_loss_torch(tea_aux_up, stu_aux_up))
    total = 1.0 * ce + 0.5 * distil
    optim.zero_grad()
    total.backward()
    optim.step()

    print(f"RESULT loss_jax={float(metrics['loss']):.6f} "
          f"loss_torch={float(total.detach()):.6f}")
    print(f"RESULT ce_jax={float(metrics['loss_semseg']):.6f} "
          f"ce_torch={float(ce.detach()):.6f}")
    print(f"RESULT distil_jax={float(metrics['loss_distil']):.6f} "
          f"distil_torch={float(distil.detach()):.6f}")

    def zero_like(tree):
        return jax.tree_util.tree_map(lambda a: np.zeros_like(np.asarray(a)), tree)

    def delta_metrics_hr(old_p, new_p):
        old_sd = hrnet_ocr_to_torch(jax.tree_util.tree_map(np.asarray, old_p),
                                    zero_like(state.batch_stats), TINY_HR)
        new_sd = hrnet_ocr_to_torch(jax.tree_util.tree_map(np.asarray, new_p),
                                    zero_like(state.batch_stats), TINY_HR)
        worst, worst_scale = 0.0, 0.0
        for kk in new_sd:
            if _is_buffer(kk):
                continue
            dj = np.asarray(new_sd[kk]) - np.asarray(old_sd[kk])
            dt = sd_stu[kk].detach().numpy() - sd_stu_old[kk].detach().numpy()
            worst = max(worst, float(np.max(np.abs(dj - dt))))
            worst_scale = max(worst_scale, float(np.max(np.abs(dt))))
        rel = worst / max(worst_scale, 1e-30)
        print(f"RESULT param_delta_rel={rel:.3e} param_delta_scale={worst_scale:.3e}")

    def stats_metrics_hr(tag, new_stats, sd_torch):
        sd_jax = hrnet_ocr_to_torch(zero_like(state.params),
                                    jax.tree_util.tree_map(np.asarray, new_stats),
                                    TINY_HR)
        d_mean, d_var = 0.0, 0.0
        for kk in sd_jax:
            if not _is_buffer(kk):
                continue
            a = np.asarray(sd_jax[kk])
            bb = sd_torch[kk].detach().numpy()
            rel = float(np.max(np.abs(a - bb) / (np.abs(bb) + 1e-3)))
            if kk.endswith("running_mean"):
                d_mean = max(d_mean, rel)
            else:
                d_var = max(d_var, rel)
        print(f"RESULT {tag}_mean_rel={d_mean:.3e} {tag}_var_rel={d_var:.3e}")

    delta_metrics_hr(old_params, new_state.params)
    stats_metrics_hr("stu_stats", new_state.batch_stats, sd_stu)
    stats_metrics_hr("tea_stats", new_state.teacher_batch_stats, sd_tea)
    tea_jax = hrnet_ocr_to_torch(
        jax.tree_util.tree_map(np.asarray, new_state.teacher_params),
        zero_like(state.batch_stats), TINY_HR)
    d_tea = max(float(np.max(np.abs(np.asarray(tea_jax[kk])
                                    - sd_tea[kk].detach().numpy())))
                for kk in tea_jax if not _is_buffer(kk))
    print(f"RESULT tea_param_absdiff={d_tea:.3e}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "warmup"
    if mode == "warmup":
        run_warmup()
    elif mode == "semiseg":
        run_semiseg()
    else:
        run_selftrain()
