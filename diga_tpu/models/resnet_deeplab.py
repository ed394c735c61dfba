"""DeepLabv2 with a dilated ResNet-101 backbone (flax.linen, NHWC).

Architecture parity with the reference (model/seg_model_noaux.py):
  * Bottleneck with stride on the 1x1 conv (:60-79), BN affine frozen
    (requires_grad False) but batch statistics live in training (:64-76)
  * layer3 dilation 2, layer4 dilation 4, output stride 8 (:230-231)
  * ceil-mode 3x3/2 max pool (:227)
  * ASPP head ``Classifier_Module2`` (:140-214): 1x1 branch + dilated
    3x3 branches (6/12/18/24), each Conv+GroupNorm(32)+ReLU; concat ->
    SEBlock (:122-137) -> 3x3 Conv + GroupNorm bottleneck -> head =
    ChannelDropout(0.1) + 1x1 conv (no bias), returning both the 256-d
    head feature and the logits (:200-211)
  * forward returns (shallow, deep, logits, feat) like SegModel
    (model/model_noaux.py:28-46)

TPU-first choices: NHWC layout, channel-last GroupNorm, bfloat16-friendly
compute dtype knob (params stay fp32), no Python loops over the batch.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# matches torch BN defaults: eps 1e-5; torch momentum 0.1 == flax 0.9
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def conv_init_normal(stddev: float):
    return nn.initializers.normal(stddev=stddev)


kaiming_fan_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class FastConv3x3(nn.Module):
    """3x3 stride-1 'same' conv with the fast custom input-gradient
    (ops/fastconv.py).  Param layout identical to nn.Conv ('kernel',
    optional 'bias') so checkpoints/converters are unaffected.
    """

    features: int
    dilation: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Any = conv_init_normal(0.01)

    @nn.compact
    def __call__(self, x):
        from ..ops.fastconv import conv_same_s1

        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (3, 3, in_ch, self.features))
        y = conv_same_s1(x.astype(self.dtype), kernel.astype(self.dtype), self.dilation)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def max_pool_ceil(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pool with torch ceil_mode=True semantics (NHWC).

    reference: seg_model_noaux.py:227 (MaxPool2d(3, 2, 1, ceil_mode=True))
    """
    _, h, w, _ = x.shape

    def extra(n):
        out = -(-(n + 2 * padding - window) // stride) + 1
        # torch drops the last window if it would start in the padding
        if (out - 1) * stride >= n + padding:
            out -= 1
        return (out - 1) * stride + window - n - padding

    pad_h = (padding, extra(h))
    pad_w = (padding, extra(w))
    # -inf init is required for JAX to recognize this as a differentiable
    # max-pool (finfo.min falls back to a non-differentiable reduce_window)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


class FrozenBatchNorm(nn.Module):
    """BatchNorm whose affine params are frozen in the optimizer.

    The backbone BNs normalize with BATCH statistics during training and
    update running stats, but their scale/bias receive no gradient
    (reference: seg_model_noaux.py:63-76,223-225).  Freezing is enforced
    by the optimizer mask (train/optim.py), which zeroes updates for every
    param whose path contains 'frozen_bn'.  Cross-replica stat syncing is
    implicit: under GSPMD jit the batch mean/var reduce over the full
    logical batch.

    Delegates to models/norms.py BatchNorm2D (stats without f32
    activation copies; optional mask for space-to-batch padded grids) —
    identical variable tree to nn.BatchNorm either way.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask: jnp.ndarray | None = None,
                 n_valid: float | None = None):
        from .norms import BatchNorm2D

        return BatchNorm2D(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                           dtype=self.dtype, name="frozen_bn")(
            x, train, mask, n_valid)


class Bottleneck(nn.Module):
    """ResNet bottleneck, stride on the 1x1 (reference :60-79)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask=None, n_valid=None):
        residual = x
        y = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype,
                    kernel_init=conv_init_normal(0.01), name="conv1")(x)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn1")(y, train, mask, n_valid)
        y = nn.relu(y)
        y = FastConv3x3(self.planes, dilation=self.dilation,
                        dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2")(y, train, mask, n_valid)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=conv_init_normal(0.01), name="conv3")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(y, train, mask, n_valid)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=conv_init_normal(0.01),
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(
                residual, train, mask, n_valid)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    """A ResNet layer of ``blocks`` bottlenecks (reference :246-261)."""

    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask=None, n_valid=None):
        # downsample exists iff stride != 1, channel change, or dilation 2/4
        in_ch = x.shape[-1]
        has_ds = (
            self.stride != 1
            or in_ch != self.planes * 4
            or self.dilation in (2, 4)
        )
        x = Bottleneck(self.planes, self.stride, self.dilation,
                       has_downsample=has_ds, dtype=self.dtype,
                       name="block0")(x, train, mask, n_valid)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, self.dilation,
                           dtype=self.dtype, name=f"block{i}")(x, train, mask, n_valid)
        return x


class FusedGroupNorm(nn.Module):
    """GroupNorm with f32-accumulated stats, compute-dtype arithmetic.

    Drop-in for nn.GroupNorm (same scale/bias param tree) in the bf16
    compute path: flax normalizes in f32, materializing f32 copies of the
    whole activation (measured as a top copy family in the warm-up step
    HLO); here only the per-(image,group) scalars are f32 — the convert
    fuses into the stat reduction and the normalization stays bf16.

    epsilon 1e-5 matches torch nn.GroupNorm (the reference head's GN,
    seg_model_noaux.py:140-214); flax's default is 1e-6.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    # "xla" (default, differentiable) or "pallas" — a forward-only Pallas
    # pair of VMEM passes for the inference path.  Measured SLOWER than
    # the XLA form on the two-scale eval (71.3 vs 62.6 ms/img): the pair
    # re-reads the activation for the normalize pass while XLA fuses the
    # normalize into consumers.  Kept opt-in as the recorded attempt
    # (docs/PERF.md, ops/pallas_gn.py).
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        from ..ops.stats import sums_and_squares

        b, h, w, c = x.shape
        g = self.num_groups
        cg = c // g
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.impl == "pallas":
            from ..ops.pallas_gn import group_norm_pallas

            return group_norm_pallas(x, scale, bias, g, self.epsilon)
        # per-channel sums in native NHWC layout, then the group fold on the
        # tiny [b, c] results (reshaping x before the big reduce puts the
        # reduction across lanes — measured ~3.5 ms per GN site)
        s_c, s2_c = sums_and_squares(x, (1, 2))             # [b, c]
        n = float(h * w * cg)
        mu = jnp.sum(s_c.reshape(b, g, cg), axis=-1) / n    # [b, g]
        var = jnp.maximum(jnp.sum(s2_c.reshape(b, g, cg), axis=-1) / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)             # [b, g]
        mu_c = jnp.repeat(mu, cg, axis=1)                   # [b, c]
        inv_s = jnp.repeat(inv, cg, axis=1) * scale[None]
        mul = inv_s.astype(x.dtype)
        add = (bias[None] - mu_c * inv_s).astype(x.dtype)
        return x * mul[:, None, None, :] + add[:, None, None, :]


class SEBlock(nn.Module):
    """Squeeze-excitation over channels (reference :122-137)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        s = nn.Dense(c // self.reduction, dtype=self.dtype,
                     kernel_init=kaiming_fan_out, name="fc1")(s.astype(self.dtype))
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, kernel_init=kaiming_fan_out, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ASPPHead(nn.Module):
    """Classifier_Module2: multi-dilation ASPP + SE + GN head.

    reference: seg_model_noaux.py:140-214.  Returns (feat_256, logits).
    """

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    droprate: float = 0.1
    use_se: bool = True
    dtype: Dtype = jnp.float32
    gn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool):
        branches = []
        y = nn.Conv(256, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=kaiming_fan_in, name="branch0_conv")(x)
        y = FusedGroupNorm(num_groups=32, dtype=self.dtype, impl=self.gn_impl,
                           name="branch0_gn")(y)
        branches.append(nn.relu(y))
        for bi, d in enumerate(self.dilations, start=1):
            y = FastConv3x3(256, dilation=d, use_bias=True, dtype=self.dtype,
                            kernel_init=kaiming_fan_in, name=f"branch{bi}_conv")(x)
            y = FusedGroupNorm(num_groups=32, dtype=self.dtype, impl=self.gn_impl,
                               name=f"branch{bi}_gn")(y)
            branches.append(nn.relu(y))
        out = jnp.concatenate(branches, axis=-1)
        if self.use_se:
            out = SEBlock(dtype=self.dtype, name="se")(out)
        out = FastConv3x3(256, dilation=1, use_bias=True, dtype=self.dtype,
                          kernel_init=kaiming_fan_in, name="bottleneck_conv")(out)
        out = FusedGroupNorm(num_groups=32, dtype=self.dtype, impl=self.gn_impl,
                             name="bottleneck_gn")(out)
        # head: channel dropout then 1x1 classifier; 'feat' is the 256-d
        # post-dropout tensor the prototype machinery consumes (:205-211)
        feat = nn.Dropout(self.droprate, broadcast_dims=(1, 2),
                          deterministic=not train, name="drop")(out)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         dtype=self.dtype, kernel_init=conv_init_normal(0.001),
                         name="classifier")(feat)
        return feat, logits


class DeepLabV2(nn.Module):
    """ResNet-101 DeepLabv2 returning (shallow, deep, logits, feat).

    reference: model_noaux.py:10-46 (SegModel) over seg_model_noaux.py
    ResNetMulti([3, 4, 23, 3]).
    """

    num_classes: int = 19
    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: Dtype = jnp.float32
    # rematerialize stages in backward: True = all four stages (max memory
    # savings, ~30% extra FLOPs), or a tuple of stage names, e.g.
    # ("layer1", "layer2") — the early stages carry the spatially largest
    # activations but few FLOPs, so partial remat often fits HBM at a
    # fraction of full remat's recompute cost.  Measured (r4, warm-up step
    # @512x896, s2b on, compiled memory_analysis): source batch 3 (=6
    # through the model) needs 11.6 GB temp with NO remat — the shipped
    # gta2city_warmup preset; batch 6 no-remat fails to compile (OOM) but
    # fits at 14.2 GB with remat=("layer1","layer2"); batch 12 needs full
    # remat AND s2b=False (docs/PERF.md tuned configs).
    remat: bool | Sequence[str] = False
    # head channel-dropout rate (seg_model_noaux.py:205 Dropout2d(0.1));
    # 0.0 makes the forward deterministic given params — used by the
    # fused-forwards exactness tests
    droprate: float = 0.1
    # stage-hoisted space-to-batch for the dilated stages: exact same math
    # (ops/space_to_batch.py), but the inner convs become dense so XLA's
    # per-conv SpaceToBatchConverter (and its ~140 tiled-layout copies per
    # step, measured) never fires.  Auto-skipped when H/W aren't /4.
    s2b: bool = True
    # ASPP-head GroupNorm implementation: "xla" (differentiable; training)
    # or "pallas" (forward-only inference path, ops/pallas_gn.py)
    gn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.space_to_batch import batch_to_space, space_to_batch

        remat_stage = nn.remat(ResNetStage, static_argnums=(2,))

        if not isinstance(self.remat, bool):
            valid = {"layer1", "layer2", "layer3", "layer4"}
            unknown = set(self.remat) - valid
            if unknown:
                raise ValueError(
                    f"remat={self.remat!r} names unknown stages {sorted(unknown)} "
                    f"(valid: {sorted(valid)}) — a typo here would silently "
                    "disable remat and surface only as an OOM later")

        def stage(*args, name: str, **kw):
            on = (self.remat is True
                  or (not isinstance(self.remat, bool) and name in tuple(self.remat)))
            cls = remat_stage if on else ResNetStage
            return cls(*args, name=name, **kw)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=conv_init_normal(0.01), name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_ceil(x, window=3, stride=2, padding=1)
        x = stage(64, self.layers[0], dtype=self.dtype, name="layer1")(x, train)
        x = stage(128, self.layers[1], stride=2, dtype=self.dtype, name="layer2")(x, train)
        shallow = x
        if self.s2b and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            # layer3's dilation-2 convs are dense on the 2x2 subgrids;
            # layer4's dilation-4 ones are dense on the nested 2x2 again.
            # Param/batch-stat trees are identical to the dilated path.
            x = space_to_batch(x, 2)
            x = stage(256, self.layers[2], dilation=1, dtype=self.dtype, name="layer3")(x, train)
            x = space_to_batch(x, 2)
            x = stage(512, self.layers[3], dilation=1, dtype=self.dtype, name="layer4")(x, train)
            # nested f=2 transforms permute subgrids differently from a
            # single f=4, so unwind them in reverse order
            deep = batch_to_space(batch_to_space(x, 2), 2)
        elif self.s2b:
            # Odd grids (ceil-mode pooling makes 512->129->65): zero-pad to
            # even at each s2b hop and keep the result EXACT by (a) masked
            # BN batch statistics and (b) re-zeroing pads after every BN,
            # so every 3x3 conv reads zeros at pad taps exactly like the
            # dilated conv's 'same' padding would.
            b, h3, w3 = x.shape[0], x.shape[1], x.shape[2]
            n_valid = float(b * h3 * w3)

            def pad_even(t, m):
                ph, pw = t.shape[1] % 2, t.shape[2] % 2
                if ph or pw:
                    t = jnp.pad(t, ((0, 0), (0, ph), (0, pw), (0, 0)))
                    m = jnp.pad(m, ((0, 0), (0, ph), (0, pw), (0, 0)))
                return t, m

            mask = jnp.ones((1, h3, w3, 1), jnp.float32)
            x, mask = pad_even(x, mask)
            h3e, w3e = x.shape[1], x.shape[2]
            x, mask = space_to_batch(x, 2), space_to_batch(mask, 2)
            x = stage(256, self.layers[2], dilation=1, dtype=self.dtype,
                      name="layer3")(x, train, jnp.tile(mask, (b, 1, 1, 1)), n_valid)
            h4, w4 = x.shape[1], x.shape[2]
            x, mask = pad_even(x, jnp.tile(mask, (b, 1, 1, 1)))
            x, mask = space_to_batch(x, 2), space_to_batch(mask, 2)
            x = stage(512, self.layers[3], dilation=1, dtype=self.dtype,
                      name="layer4")(x, train, mask, n_valid)
            x = batch_to_space(x, 2)[:, :h4, :w4]
            deep = batch_to_space(x, 2)[:, :h3, :w3]
        else:
            x = stage(256, self.layers[2], dilation=2, dtype=self.dtype, name="layer3")(x, train)
            deep = stage(512, self.layers[3], dilation=4, dtype=self.dtype, name="layer4")(x, train)
        feat, logits = ASPPHead(self.num_classes, droprate=self.droprate,
                                dtype=self.dtype, gn_impl=self.gn_impl,
                                name="head")(deep, train)
        return shallow, deep, logits, feat


def head_param_mask(params) -> Any:
    """Pytree of labels: 'head' (10x LR), 'frozen' (BN affine), 'backbone'.

    Mirrors the reference's optimizer groups: get_1x_lr_params_NOscale
    skips frozen BN params; layer5 (the ASPP head) runs at 10x LR
    (seg_model_noaux.py:281-321).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        if any("frozen_bn" in str(k) for k in keys):
            return "frozen"
        if str(keys[0]) == "head":
            return "head"
        return "backbone"

    labels = {tuple(str(getattr(p, "key", p)) for p in path): label_of(path) for path, _ in flat}

    def build(path, _leaf):
        return labels[tuple(str(getattr(p, "key", p)) for p in path)]

    return jax.tree_util.tree_map_with_path(build, params)
