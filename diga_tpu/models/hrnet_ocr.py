"""HRNet-W48 backbone + OCR head (flax.linen, NHWC) for the
semi-supervised Cityscapes benchmark.

Architecture parity with the reference
(semi-supervised_segmentation/model/networks/hrnet_module.py and
ocrnet_module.py, composed by model_hr.py:18-33):
  * stem: two 3x3 stride-2 convs to 64ch (stride-4 stem, config
    STEM_STRIDE=4)
  * stage1: 4 Bottlenecks @64 (ch 256 out); stages 2-4: BasicBlocks with
    1/4/3 modules over branch widths (48, 96, 192, 384) (config_default.yaml)
  * exchange units: j>i 1x1 conv+BN then bilinear (align_corners) upsample;
    j<i chains of stride-2 3x3 conv+BN (+ReLU except last) (hrnet_module
    .py:128-185)
  * output: 4 branches upsampled to 1/4 res and concatenated (720 ch)
  * OCR: soft object regions (aux logits), region representations via
    softmax-weighted pooling, pixel-region attention (scaled dot product,
    key 256), augmented 512-d representation + final 1x1 classifier
    (ocrnet_module.py:12-252)

Unlike the DeepLab backbone, all BNs here are trainable (the reference
semiseg model has no BN freezing).  The attention matmuls run on the MXU
as plain einsums over (pixels, channels, classes).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

Dtype = Any

BN_MOMENTUM = 0.9  # flax equivalent of torch momentum 0.1
BN_EPS = 1e-5

# W48 topology from config_default.yaml (W32 = config_lite)
W48 = {
    "stem_channels": 64,
    "stage1_blocks": 4,
    "stage1_channels": 64,
    "stages": [
        # (num_modules, num_blocks_per_branch, branch_channels)
        (1, 4, (48, 96)),
        (4, 4, (48, 96, 192)),
        (3, 4, (48, 96, 192, 384)),
    ],
    "ocr_mid_channels": 512,
    "ocr_key_channels": 256,
}
W32 = {
    "stem_channels": 64,
    "stage1_blocks": 4,
    "stage1_channels": 64,
    "stages": [
        (1, 4, (32, 64)),
        (4, 4, (32, 64, 128)),
        (3, 4, (32, 64, 128, 256)),
    ],
    "ocr_mid_channels": 512,
    "ocr_key_channels": 256,
}


def _padded(f: int, pad_to: int) -> int:
    """Round f up to a multiple of pad_to (0 = no padding)."""
    return -(-f // pad_to) * pad_to if pad_to else f


class ConvBN(nn.Module):
    """conv + BN (+ReLU), with an optional channel-padding compute layout.

    ``pad_to > 0`` (the HRNet branch-padding perf knob — docs/PERF.md):
    activations flow physically zero-padded so the channel (lane) axis is
    a multiple of ``pad_to``; ``in_ch`` is then the LOGICAL input channel
    count.  Params keep their logical shapes — kernels are zero-padded
    functionally at apply (padded-in slices meet all-zero activations,
    padded-out slices are zero kernels), so outputs' valid channels and
    every parameter gradient match the unpadded module exactly and
    checkpoints are layout-independent.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32
    in_ch: int | None = None
    pad_to: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        f_phys = _padded(self.features, self.pad_to)
        if self.pad_to and self.in_ch is None:
            raise ValueError("ConvBN: pad_to requires in_ch (logical input)")
        if self.kernel == 3 and self.stride == 1:
            # fast custom input-gradient path (ops/fastconv.py); the child
            # module keeps nn.Conv's 'conv/kernel' param naming
            x = _FastConvChild(self.features, dtype=self.dtype,
                               in_ch=self.in_ch, out_phys=f_phys,
                               name="conv")(x)
        elif self.pad_to and (self.in_ch != x.shape[-1]
                              or f_phys != self.features):
            x = _PlainConvChild(self.features, self.kernel, self.stride,
                                dtype=self.dtype, in_ch=self.in_ch,
                                out_phys=f_phys, name="conv")(x)
        else:
            p = self.kernel // 2
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=[(p, p), (p, p)], use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        # BatchNorm2D: nn.BatchNorm variable layout, stats without f32
        # activation copies (models/norms.py); logical-width variables
        # when the activation is channel-padded
        from .norms import BatchNorm2D

        x = BatchNorm2D(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                        dtype=self.dtype,
                        features=self.features if f_phys != self.features
                        else None, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


def _pad_kernel(kernel, in_phys: int, out_phys: int):
    """Zero-pad a HWIO kernel's in/out dims to the physical widths."""
    di = in_phys - kernel.shape[2]
    do = out_phys - kernel.shape[3]
    if di or do:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, di), (0, do)))
    return kernel


class _FastConvChild(nn.Module):
    """3x3 s1 conv with fastconv grad; param named 'kernel' like nn.Conv."""

    features: int
    dtype: Dtype = jnp.float32
    in_ch: int | None = None
    out_phys: int | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.fastconv import conv_same_s1

        cin = self.in_ch if self.in_ch is not None else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, cin, self.features))
        kernel = _pad_kernel(kernel, x.shape[-1], self.out_phys or self.features)
        return conv_same_s1(x.astype(self.dtype), kernel.astype(self.dtype), 1)


class _PlainConvChild(nn.Module):
    """nn.Conv-equivalent (no bias) that supports channel-padded layouts;
    param named 'kernel' under the same 'conv' scope as nn.Conv."""

    features: int
    kernel_size: int
    stride: int
    dtype: Dtype = jnp.float32
    in_ch: int | None = None
    out_phys: int | None = None

    @nn.compact
    def __call__(self, x):
        cin = self.in_ch if self.in_ch is not None else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, cin, self.features))
        kernel = _pad_kernel(kernel, x.shape[-1], self.out_phys or self.features)
        p = self.kernel_size // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """3x3+3x3 residual unit (hrnet_module.py:228-262).

    ``in_ch``/``pad_to``: channel-padded compute layout (see ConvBN)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    in_ch: int | None = None
    pad_to: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        in_log = self.in_ch if self.in_ch is not None else x.shape[-1]
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                   in_ch=self.in_ch, pad_to=self.pad_to, name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype,
                   in_ch=self.features if self.pad_to else None,
                   pad_to=self.pad_to, name="conv2")(y, train)
        if self.stride != 1 or in_log != self.features:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype, in_ch=self.in_ch,
                              pad_to=self.pad_to, name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 residual unit, expansion 4 (hrnet_module.py:265-306)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.features * 4
        residual = x
        y = ConvBN(self.features, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype, name="conv2")(y, train)
        y = ConvBN(out_ch, 1, 1, relu=False, dtype=self.dtype, name="conv3")(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBN(out_ch, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class HRModule(nn.Module):
    """One exchange module: per-branch blocks + full cross-branch fusion.

    hrnet_module.py:40-226.
    """

    channels: Sequence[int]
    num_blocks: int
    dtype: Dtype = jnp.float32
    pad_to: int = 0  # channel-padded compute layout (see ConvBN)

    @nn.compact
    def __call__(self, xs: list, train: bool) -> list:
        n = len(self.channels)
        pt = self.pad_to
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[i], dtype=self.dtype,
                               in_ch=self.channels[i] if pt else None,
                               pad_to=pt,
                               name=f"branch{i}_block{b}")(x, train)
            ys.append(x)

        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    v = ys[j]
                elif j > i:
                    # lower-res -> 1x1 conv + BN, bilinear upsample (run in
                    # the compute dtype: backbone-internal, see resize.py)
                    v = ConvBN(self.channels[i], 1, 1, relu=False, dtype=self.dtype,
                               in_ch=self.channels[j] if pt else None, pad_to=pt,
                               name=f"fuse{i}_{j}")(ys[j], train)
                    v = resize_bilinear(v, ys[i].shape[1:3], align_corners=True,
                                        compute_dtype=self.dtype)
                else:
                    # higher-res -> chain of stride-2 3x3s
                    v = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        v = ConvBN(ch, 3, 2, relu=not last, dtype=self.dtype,
                                   in_ch=self.channels[j] if pt else None,
                                   pad_to=pt,
                                   name=f"fuse{i}_{j}_{k}")(v, train)
                acc = v if acc is None else acc + v
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """4-stage HRNet returning the 720-ch concat at 1/4 resolution."""

    arch: dict = None
    dtype: Dtype = jnp.float32
    # rematerialize exchange modules in backward: W48 at 512x1024 batch 6
    # keeps 4 branches of high-res activations and OOMs 16 GB HBM without
    # it (measured: 18.0 GB needed).  True = remat every module, False =
    # none, or a tuple of stage names ("stage2".."stage4") for partial
    # remat — the memory/recompute dial, same scheme as DeepLabV2.remat.
    remat: Any = False
    # remat policy: "bn_stats" saves each train-mode BN's (C,)-sized
    # mean/var across the remat boundary (models/norms.py checkpoint_name)
    # so the backward recompute skips re-reducing the full activations —
    # HRNet has ~470 BN applications/step counting recompute (docs/PERF.md)
    # at trivial memory cost.  None = plain remat.
    remat_policy: str | None = None
    # channel-padded compute layout (docs/PERF.md semiseg attribution):
    # 0 = off; 64 rounds the 48/96-ch branch tensors up to 64/128 physical
    # channels (TPU lane-occupancy / layout-copy experiment).  Math,
    # gradients, and checkpoints are exactly those of the unpadded model
    # (zero-padded kernels/affines — see ConvBN).
    pad_to: int = 0

    def _remat_stage(self, si: int) -> bool:
        if isinstance(self.remat, (tuple, list)):
            return f"stage{si}" in self.remat
        return bool(self.remat)

    def _remat_cls(self):
        kw = {}
        if self.remat_policy == "bn_stats":
            kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                "bn_stats")
        return nn.remat(HRModule, static_argnums=(2,), **kw)

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.arch or W48
        x = x.astype(self.dtype)
        # stride-4 stem (hrnet_module.py:347-354)
        x = ConvBN(a["stem_channels"], 3, 2, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBN(a["stem_channels"], 3, 2, dtype=self.dtype, name="stem2")(x, train)

        # stage1: Bottlenecks
        for b in range(a["stage1_blocks"]):
            x = Bottleneck(a["stage1_channels"], dtype=self.dtype,
                           name=f"stage1_block{b}")(x, train)

        pt = self.pad_to
        xs = [x]
        log_chs = [x.shape[-1]]  # logical channel widths (phys may be padded)
        for si, (num_modules, num_blocks, channels) in enumerate(a["stages"], start=2):
            # transition (hrnet_module.py:427-465)
            new_xs = []
            for i, ch in enumerate(channels):
                if i < len(xs):
                    if log_chs[i] != ch:
                        new_xs.append(ConvBN(ch, 3, 1, dtype=self.dtype,
                                             in_ch=log_chs[i] if pt else None,
                                             pad_to=pt,
                                             name=f"trans{si}_{i}")(xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    v = xs[-1]
                    in_log = log_chs[-1]
                    for j in range(i + 1 - len(xs)):
                        last = j == i - len(xs)
                        out_ch = ch if last else log_chs[-1]
                        v = ConvBN(out_ch, 3, 2, dtype=self.dtype,
                                   in_ch=in_log if pt else None, pad_to=pt,
                                   name=f"trans{si}_{i}_{j}")(v, train)
                        in_log = out_ch
                    new_xs.append(v)
            xs = new_xs
            log_chs = list(channels)
            module_cls = self._remat_cls() if self._remat_stage(si) else HRModule
            for m in range(num_modules):
                xs = module_cls(channels, num_blocks, dtype=self.dtype,
                                pad_to=pt,
                                name=f"stage{si}_module{m}")(xs, train)

        # upsample all to branch-0 resolution and concat (:521-538); slice
        # the channel padding back to logical widths first
        if pt:
            xs = [v[..., :c] for v, c in zip(xs, log_chs)]
        hw = xs[0].shape[1:3]
        ups = [xs[0]] + [resize_bilinear(v, hw, align_corners=True,
                                         compute_dtype=self.dtype)
                         for v in xs[1:]]
        return jnp.concatenate(ups, axis=-1)


class OCRHead(nn.Module):
    """Object-contextual representations head (ocrnet_module.py:103-252).

    Returns (aux_logits, logits, augmented_feats).
    """

    num_classes: int
    mid_channels: int = 512
    key_channels: int = 256
    dtype: Dtype = jnp.float32
    # augmented-rep channel dropout (ocrnet_module.py Dropout2d(0.05));
    # 0.0 makes the train-mode forward deterministic given params — used
    # by the composed train-step parity tests (same knob as
    # DeepLabV2.droprate)
    droprate: float = 0.05

    @nn.compact
    def __call__(self, feats, train: bool = False):
        b, h, w, c = feats.shape
        f32 = jnp.float32
        prec = jax.lax.Precision.DEFAULT

        # soft object regions: 1x1 conv+BN+ReLU then 1x1 classifier (:176-186)
        s = ConvBN(c, 1, 1, dtype=self.dtype, name="region_conv")(feats, train)
        aux_logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                             dtype=self.dtype, name="region_cls")(s)

        # pixel representations: 3x3 conv+BN+ReLU to 512 (:118-123)
        pix = ConvBN(self.mid_channels, 3, 1, dtype=self.dtype, name="pixel_rep")(feats, train)

        # object region representations: softmax(regions over pixels) @ pix (:12-45)
        probs = jax.nn.softmax(
            aux_logits.reshape(b, h * w, self.num_classes).astype(f32), axis=1)
        pix_flat = pix.reshape(b, h * w, self.mid_channels).astype(f32)
        region_rep = jnp.einsum("bpk,bpc->bkc", probs, pix_flat)  # (B, K, C)
        region_rep = region_rep.astype(self.dtype)

        # pixel-region attention (:48-97): query from pixels, key from regions
        def double_conv1x1(x, name):
            x = ConvBN(self.key_channels, 1, 1, dtype=self.dtype, name=name + "_a")(x, train)
            return ConvBN(self.key_channels, 1, 1, dtype=self.dtype, name=name + "_b")(x, train)

        query = double_conv1x1(pix, "query")                      # (B, h, w, key)
        key = double_conv1x1(region_rep[:, None], "key")[:, 0]    # (B, K, key)
        sim = jnp.einsum("bhwc,bkc->bhwk", query.astype(f32), key.astype(f32))
        sim = sim * (self.key_channels ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1)                       # (B, h, w, K)

        # values from region reps, attention-weighted sum, channel upsample
        value = ConvBN(self.key_channels, 1, 1, dtype=self.dtype,
                       name="value")(region_rep[:, None], train)[:, 0]  # (B, K, key)
        ocr = jnp.einsum("bhwk,bkc->bhwc", attn, value.astype(f32)).astype(self.dtype)
        ocr = ConvBN(self.mid_channels, 1, 1, dtype=self.dtype, name="ocr_up")(ocr, train)

        # augmented representation: concat + 1x1 conv + BN + dropout(0.05)
        aug = jnp.concatenate([ocr, pix], axis=-1)
        aug = ConvBN(self.mid_channels, 1, 1, dtype=self.dtype, name="augment")(aug, train)
        aug = nn.Dropout(self.droprate, broadcast_dims=(1, 2),
                         deterministic=not train, name="drop")(aug)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         dtype=self.dtype, name="cls")(aug)
        return aux_logits, logits, aug


class HRNetOCR(nn.Module):
    """SegModel composition (model_hr.py:18-33): returns
    (backbone_feats, aux_logits, logits, 512-d feats) like the reference's
    (shared_shallow, pred1, pred2, shared_seg)."""

    num_classes: int = 19
    arch_name: str = "w48"
    dtype: Dtype = jnp.float32
    remat: Any = False  # True | False | tuple of "stage2".."stage4"
    remat_policy: str | None = None  # see HRNet.remat_policy
    droprate: float = 0.05  # see OCRHead.droprate
    pad_to: int = 0  # see HRNet.pad_to (channel-padded compute layout)

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = W48 if self.arch_name == "w48" else W32
        feats = HRNet(arch=arch, dtype=self.dtype, remat=self.remat,
                      remat_policy=self.remat_policy, pad_to=self.pad_to,
                      name="hrnet")(x, train)
        aux, logits, aug = OCRHead(
            self.num_classes, arch["ocr_mid_channels"], arch["ocr_key_channels"],
            dtype=self.dtype, droprate=self.droprate, name="ocr")(feats, train)
        return feats, aux, logits, aug
