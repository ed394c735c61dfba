"""Pure-torch functional replay of the reference forward passes.

Test-only utility: evaluates the reference architectures' math directly
from a role-keyed state_dict with torch ops (eval-mode BN), so our flax
models + weight converters can be diffed against the reference
computation end-to-end WITHOUT the reference codebase.  Architecture
specs: seg_model_noaux.py (Bottleneck :57, ResNetMulti :216,
Classifier_Module2 :140, SEBlock :122) composed as model_noaux.py
SegModel :10-46; translator enc/dec/disc model_noaux.py:80-147 over
model_util.py Conv2dBlock :121-174 / ResBlock :48-61.
"""

from __future__ import annotations


def segmodel_forward_torch(sd: dict, x_nchw, layers=(3, 4, 23, 3), num_classes: int = 19,
                           training: bool = False):
    """Returns (logits, feat) as torch tensors (NCHW).

    ``training=True`` replays the reference's train-mode BN: normalize with
    batch statistics and update the ``running_*`` tensors of ``sd`` IN
    PLACE with torch momentum 0.1 (student.train() — every BN trains;
    only the affine params are gradient-frozen, seg_model_noaux.py:62-76).
    sd values must then be torch tensors.  Differentiable: build sd with
    requires_grad on the trainable leaves and autograd flows through.
    """
    import numpy as np
    import torch
    import torch.nn.functional as F

    def t(key):
        v = sd[key]
        return torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v) else v

    def conv(key, v, stride=1, pad=0, dil=1, bias=False):
        b = t(key + ".bias") if bias and key + ".bias" in sd else None
        return F.conv2d(v, t(key + ".weight"), b, stride=stride, padding=pad, dilation=dil)

    def bn(key, v):
        return F.batch_norm(v, t(key + ".running_mean"), t(key + ".running_var"),
                            t(key + ".weight"), t(key + ".bias"),
                            training=training, momentum=0.1, eps=1e-5)

    def gn(key, v, groups=32):
        return F.group_norm(v, groups, t(key + ".weight"), t(key + ".bias"), eps=1e-5)

    def bottleneck(prefix, v, stride, dil):
        res = v
        y = F.relu(bn(prefix + ".bn1", conv(prefix + ".conv1", v, stride=stride)))
        y = F.relu(bn(prefix + ".bn2", conv(prefix + ".conv2", y, pad=dil, dil=dil)))
        y = bn(prefix + ".bn3", conv(prefix + ".conv3", y))
        if prefix + ".downsample.0.weight" in sd:
            res = bn(prefix + ".downsample.1", conv(prefix + ".downsample.0", v, stride=stride))
        return F.relu(y + res)

    v = F.relu(bn("layer0.1", conv("layer0.0", x_nchw, stride=2, pad=3)))
    v = F.max_pool2d(v, 3, 2, 1, ceil_mode=True)
    stage_cfg = [(1, 1), (2, 1), (1, 2), (1, 4)]  # (stride, dilation) per stage
    for li, n_blocks in enumerate(layers, start=1):
        stride, dil = stage_cfg[li - 1]
        for b in range(n_blocks):
            v = bottleneck(f"layer{li}.{b}", v, stride if b == 0 else 1, dil)

    # ASPP head (Classifier_Module2)
    branches = [F.relu(gn("final.conv2d_list.0.1",
                          conv("final.conv2d_list.0.0", v, bias=True)))]
    for j, d in enumerate((6, 12, 18, 24), start=1):
        branches.append(F.relu(gn(f"final.conv2d_list.{j}.1",
                                  conv(f"final.conv2d_list.{j}.0", v, pad=d, dil=d, bias=True))))
    import torch as _torch

    out = _torch.cat(branches, dim=1)
    # SE block
    s = out.mean(dim=(2, 3))
    s = F.relu(F.linear(s, t("final.bottleneck.0.se.0.weight"), t("final.bottleneck.0.se.0.bias")))
    s = _torch.sigmoid(F.linear(s, t("final.bottleneck.0.se.2.weight"), t("final.bottleneck.0.se.2.bias")))
    out = out * s[:, :, None, None]
    out = gn("final.bottleneck.2", conv("final.bottleneck.1", out, pad=1, bias=True))
    feat = out  # dropout inactive at eval
    logits = conv("final.head.1", feat)
    return logits, feat


def _torch_helpers(sd):
    import numpy as np
    import torch
    import torch.nn.functional as F

    def t(key):
        v = sd[key]
        return torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v) else v

    def conv_block(key, v, stride=1, pad=0, pad_type="reflect", norm="in",
                   act="relu"):
        """Conv2dBlock (model_util.py:121-174): pad -> conv -> IN -> act."""
        if pad:
            v = F.pad(v, (pad,) * 4, mode="reflect" if pad_type == "reflect"
                      else "constant")
        b = t(key + ".conv.bias") if key + ".conv.bias" in sd else None
        v = F.conv2d(v, t(key + ".conv.weight"), b, stride=stride)
        if norm == "in":
            v = F.instance_norm(v, eps=1e-5)
        if act == "relu":
            v = F.relu(v)
        elif act == "lrelu":
            v = F.leaky_relu(v, 0.2)
        elif act == "tanh":
            v = torch.tanh(v)
        return v

    def res_block(key, v):
        y = conv_block(key + ".model.0", v, pad=1)
        y = conv_block(key + ".model.1", y, pad=1, act="none")
        return v + y

    return t, conv_block, res_block


def translator_encoder_forward_torch(sd: dict, x_nchw, n_downsample=2, n_res=4):
    """ImgEncoder forward (model_noaux.py:80-96) from its state_dict."""
    _, conv_block, res_block = _torch_helpers(sd)
    v = conv_block("model.0", x_nchw, pad=3)
    for i in range(n_downsample):
        v = conv_block(f"model.{1 + i}", v, stride=2, pad=1)
    for r in range(n_res):
        v = res_block(f"model.{1 + n_downsample}.model.{r}", v)
    return v


def translator_decoder_forward_torch(sd: dict, z_nchw, n_upsample=2, n_res=4):
    """ImgDecoder forward (model_noaux.py:100-117) from its state_dict."""
    import torch.nn.functional as F

    _, conv_block, res_block = _torch_helpers(sd)
    v = z_nchw
    for r in range(n_res):
        v = res_block(f"model.0.model.{r}", v)
    for i in range(n_upsample):
        v = F.interpolate(v, scale_factor=2, mode="nearest")
        v = conv_block(f"model.{2 + 2 * i}", v, pad=2)
    return conv_block(f"model.{1 + 2 * n_upsample}", v, pad=3, norm="none",
                      act="tanh")


def discriminator_forward_torch(sd: dict, x_nchw, num_scales=3, n_layer=4):
    """3-scale PatchGAN forward (model_noaux.py:119-147) from its state_dict."""
    import torch.nn.functional as F

    t, conv_block, _ = _torch_helpers(sd)
    outputs = []
    v = x_nchw
    for s in range(num_scales):
        y = v
        for j in range(n_layer):
            y = conv_block(f"cnns.{s}.{j}", y, stride=2, pad=1,
                           pad_type="zero", norm="none", act="lrelu")
        y = F.conv2d(y, t(f"cnns.{s}.{n_layer}.weight"),
                     t(f"cnns.{s}.{n_layer}.bias"))
        outputs.append(y)
        v = F.avg_pool2d(v, 3, stride=2, padding=1, count_include_pad=False)
    return outputs


def hrnet_ocr_forward_torch(sd: dict, x_nchw, arch: dict, num_classes: int = 19,
                            training: bool = False):
    """HRNet backbone + OCR head forward from a reference-layout state_dict.

    Math: hrnet_module.py (stem :347-354, Bottleneck :265, BasicBlock :228,
    transitions :427-465, HighResolutionModule fuse :186-226, final concat
    :521-538, ALIGN_CORNERS=True) + ocrnet_module.py:12-252.
    Returns (feats, aux_logits, logits, augmented) as NCHW torch tensors.

    ``training=True`` replays train-mode BN (normalize with batch
    statistics, update the ``running_*`` tensors of ``sd`` IN PLACE with
    torch momentum 0.1 — model.train(); every semiseg BN trains).  sd
    values must then be torch tensors.  Differentiable like the segmodel
    replay above.
    """
    import numpy as np
    import torch
    import torch.nn.functional as F

    def t(key):
        v = sd[key]
        return torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v) else v

    def conv(key, v, stride=1, pad=0):
        b = t(key + ".bias") if key + ".bias" in sd else None
        return F.conv2d(v, t(key + ".weight"), b, stride=stride, padding=pad)

    def bn(key, v):
        return F.batch_norm(v, t(key + ".running_mean"), t(key + ".running_var"),
                            t(key + ".weight"), t(key + ".bias"),
                            training=training, momentum=0.1, eps=1e-5)

    def convbn(ckey, bkey, v, stride=1, pad=0, relu=True):
        v = bn(bkey, conv(ckey, v, stride=stride, pad=pad))
        return F.relu(v) if relu else v

    def up(v, hw):
        return F.interpolate(v, size=hw, mode="bilinear", align_corners=True)

    # stem (stride 4)
    v = convbn("hrnet.conv1", "hrnet.bn1", x_nchw, stride=2, pad=1)
    v = convbn("hrnet.conv2", "hrnet.bn2", v, stride=2, pad=1)

    # stage1 bottlenecks
    for i in range(arch["stage1_blocks"]):
        base = f"hrnet.stage1.{i}"
        res = v
        y = convbn(f"{base}.conv1", f"{base}.bn1", v)
        y = convbn(f"{base}.conv2", f"{base}.bn2", y, pad=1)
        y = convbn(f"{base}.conv3", f"{base}.bn3", y, relu=False)
        if f"{base}.downsample.0.weight" in sd:
            res = convbn(f"{base}.downsample.0", f"{base}.downsample.1", v,
                         relu=False)
        v = F.relu(y + res)

    xs = [v]
    for si, (num_modules, num_blocks, channels) in enumerate(arch["stages"], start=2):
        trans = f"hrnet.transition_stage_{si - 1}_{si}"
        new_xs = []
        for i in range(len(channels)):
            if i < len(xs):
                if f"{trans}.{i}.0.weight" in sd:
                    new_xs.append(convbn(f"{trans}.{i}.0", f"{trans}.{i}.1",
                                         xs[i], pad=1))
                else:
                    new_xs.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - len(xs)):
                    y = convbn(f"{trans}.{i}.{j}.0", f"{trans}.{i}.{j}.1", y,
                               stride=2, pad=1)
                new_xs.append(y)
        xs = new_xs
        for m in range(num_modules):
            mbase = f"hrnet.stage{si}.{m}"
            ys = []
            for bi in range(len(channels)):
                y = xs[bi]
                for k in range(num_blocks):
                    blk = f"{mbase}.branches.{bi}.{k}"
                    res = y
                    z = convbn(f"{blk}.conv1", f"{blk}.bn1", y, pad=1)
                    z = convbn(f"{blk}.conv2", f"{blk}.bn2", z, pad=1, relu=False)
                    if f"{blk}.downsample.0.weight" in sd:
                        res = convbn(f"{blk}.downsample.0", f"{blk}.downsample.1",
                                     y, relu=False)
                    y = F.relu(z + res)
                ys.append(y)
            fused = []
            for i in range(len(channels)):
                acc = None
                for j in range(len(channels)):
                    if j == i:
                        w = ys[j]
                    elif j > i:
                        w = convbn(f"{mbase}.fuse_layers.{i}.{j}.0",
                                   f"{mbase}.fuse_layers.{i}.{j}.1",
                                   ys[j], relu=False)
                        w = up(w, ys[i].shape[2:])
                    else:
                        w = ys[j]
                        for k in range(i - j):
                            last = k == i - j - 1
                            w = convbn(f"{mbase}.fuse_layers.{i}.{j}.{k}.0",
                                       f"{mbase}.fuse_layers.{i}.{j}.{k}.1",
                                       w, stride=2, pad=1, relu=not last)
                    acc = w if acc is None else acc + w
                fused.append(F.relu(acc))
            xs = fused

    hw = xs[0].shape[2:]
    feats = torch.cat([xs[0]] + [up(v, hw) for v in xs[1:]], dim=1)

    # --- OCR head ---
    o = "ocrnet"
    soft = convbn(f"{o}.soft_object_regions.0", f"{o}.soft_object_regions.1", feats)
    aux_logits = conv(f"{o}.soft_object_regions.3", soft)
    pix = convbn(f"{o}.pixel_representations.0", f"{o}.pixel_representations.1",
                 feats, pad=1)

    b, c, h, w = aux_logits.shape
    mid = pix.shape[1]
    probs = F.softmax(aux_logits.view(b, c, -1), dim=2)
    pix_flat = pix.view(b, mid, -1).permute(0, 2, 1)
    region_rep = torch.matmul(probs, pix_flat)                    # b x cls x mid
    region_rep = region_rep.permute(0, 2, 1).unsqueeze(3)         # b x mid x cls x 1

    def double_conv(prefix, v):
        v = convbn(f"{prefix}.0", f"{prefix}.1", v)
        return convbn(f"{prefix}.3", f"{prefix}.4", v)

    key_ch = sd[f"{o}.pixel_region_relations.pixel_rep.0.weight"].shape[0]
    query = double_conv(f"{o}.pixel_region_relations.pixel_rep", pix)
    query = query.view(b, key_ch, -1).permute(0, 2, 1)            # b x hw x key
    key = double_conv(f"{o}.pixel_region_relations.obj_reg_rep", region_rep)
    key = key.view(b, key_ch, -1)                                 # b x key x cls
    rel = F.softmax(torch.matmul(query, key) * key_ch ** -0.5, dim=-1)

    value = convbn(f"{o}.value.0", f"{o}.value.1", region_rep)
    value = value.view(b, key_ch, -1).permute(0, 2, 1)            # b x cls x key
    ocr = torch.matmul(rel, value).permute(0, 2, 1).contiguous().view(b, key_ch, h, w)
    ocr = convbn(f"{o}.ocr_up.0", f"{o}.ocr_up.1", ocr)
    aug = convbn(f"{o}.augmented_rep.0", f"{o}.augmented_rep.1",
                 torch.cat([ocr, pix], dim=1))                    # dropout eval: no-op
    logits = conv(f"{o}.segmentation_classes.0", aug)
    return feats, aux_logits, logits, aug
