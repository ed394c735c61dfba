"""Image domain translator: per-domain encoder/decoder + multi-scale
PatchGAN discriminator (flax.linen, NHWC).

Architecture parity with the reference (model/model_noaux.py:80-147,
blocks in model/model_util.py:21-174):
  * ImgEncoder: 7x7 conv (reflect, InstanceNorm, ReLU) -> two 4x4/2
    downsamples -> 4 residual blocks; output 256ch at 1/4 res
  * ImgDecoder: 4 residual blocks -> two [2x nearest upsample + 5x5 conv
    IN ReLU] -> 7x7 conv + tanh
  * Discriminator: 3 scales (AvgPool 3/2 count_include_pad=False between
    scales) of 4-layer 4x4/2 LeakyReLU conv stacks + 1x1 score head
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False): per-(image,channel) spatial norm.

    Hand-rolled instead of flax GroupNorm(group_size=1): flax upcasts the
    whole activation to f32 and normalizes in f32, which at bf16 compute
    materializes f32 copies of every translator activation — measured as
    the single largest copy family in the warm-up step HLO (~7.6 GB/step
    of tiled-layout f32 copies).  Here the mean/mean-square reductions
    accumulate in f32 directly off the bf16 tensor (XLA fuses the convert
    into the reduce) and the normalization arithmetic stays in the
    compute dtype, so no f32 activation ever exists.  At f32 compute the
    math is identical to flax's (biased variance, same op order).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from ..ops.stats import sums_and_squares

        n = float(x.shape[1] * x.shape[2])
        s, s2 = sums_and_squares(x, (1, 2))        # [b, c]
        mu = (s / n)[:, None, None, :]
        var = jnp.maximum((s2 / n)[:, None, None, :] - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mu.astype(x.dtype)) * inv.astype(x.dtype)


def instance_norm(name: str, dtype=jnp.float32):
    # parameter-free (affine=False), so the variable tree is unaffected
    return InstanceNorm(name=name)


def reflect_pad(x, p: int):
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ConvBlock(nn.Module):
    """Conv2dBlock: pad -> conv -> (IN) -> activation.

    reference: model_util.py:121-174
    """

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    norm: str = "in"          # 'in' | 'none'
    activation: str = "relu"  # 'relu' | 'lrelu' | 'tanh' | 'none'
    pad_type: str = "reflect"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pad_type == "reflect":
            x = reflect_pad(x, self.padding)
        else:
            p = self.padding
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="VALID",
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        if self.norm == "in":
            x = instance_norm("norm", self.dtype)(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "lrelu":
            x = nn.leaky_relu(x, 0.2)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        return x


class ResBlock(nn.Module):
    """Two 3x3 IN conv blocks + skip (reference: model_util.py:48-61)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.dim, 3, 1, 1, norm="in", activation="relu",
                      dtype=self.dtype, name="conv0")(x)
        y = ConvBlock(self.dim, 3, 1, 1, norm="in", activation="none",
                      dtype=self.dtype, name="conv1")(y)
        return x + y


class ImgEncoder(nn.Module):
    """reference: model_noaux.py:80-96"""

    dim: int = 64
    n_downsample: int = 2
    n_res: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        x = ConvBlock(d, 7, 1, 3, dtype=self.dtype, name="stem")(x)
        for i in range(self.n_downsample):
            x = ConvBlock(2 * d, 4, 2, 1, dtype=self.dtype, name=f"down{i}")(x)
            d *= 2
        for i in range(self.n_res):
            x = ResBlock(d, dtype=self.dtype, name=f"res{i}")(x)
        return x


class _Conv5Params(nn.Module):
    """5x5 conv params with nn.Conv's exact naming/init ('conv' child of a
    SubpixelUpBlock gives the same kernel/bias tree as ConvBlock's)."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SubpixelUpBlock(nn.Module):
    """nearest-2x upsample + 5x5 reflect conv + IN + ReLU as the fused
    subpixel form (ops/subpixel.py) — exact same math and the exact same
    variable tree as [jnp.repeat -> ConvBlock(k=5, pad=2, norm='in')],
    2.8x fewer MACs and no materialized upsampled tensor."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.subpixel import nearest_up2_conv5x5

        kernel, bias = _Conv5Params(self.features, name="conv")(x.shape[-1])
        y = nearest_up2_conv5x5(x.astype(self.dtype), kernel.astype(self.dtype),
                                bias.astype(self.dtype))
        y = instance_norm("norm", self.dtype)(y)
        return nn.relu(y)


class ImgDecoder(nn.Module):
    """reference: model_noaux.py:100-117

    ``subpixel_up`` selects the fused up-block (same params either way);
    the unfused path is kept for A/B and as the numeric reference.
    """

    dim: int = 256
    out_ch: int = 3
    n_upsample: int = 2
    n_res: int = 4
    dtype: Dtype = jnp.float32
    subpixel_up: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dim
        for i in range(self.n_res):
            x = ResBlock(d, dtype=self.dtype, name=f"res{i}")(x)
        for i in range(self.n_upsample):
            if self.subpixel_up:
                x = SubpixelUpBlock(d // 2, dtype=self.dtype, name=f"up{i}")(x)
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
                x = ConvBlock(d // 2, 5, 1, 2, dtype=self.dtype, name=f"up{i}")(x)
            d //= 2
        return ConvBlock(self.out_ch, 7, 1, 3, norm="none", activation="tanh",
                         dtype=self.dtype, name="out")(x)


def avg_pool_3x3s2_no_pad_count(x):
    """torch AvgPool2d(3, 2, padding=1, count_include_pad=False) on NHWC."""
    ones = jnp.ones_like(x[..., :1])
    sum_x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return sum_x / cnt


class Discriminator(nn.Module):
    """3-scale PatchGAN, LSGAN objective (reference: model_noaux.py:119-147)."""

    dim: int = 64
    n_layer: int = 4
    num_scales: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        outputs = []
        for s in range(self.num_scales):
            y = x
            d = self.dim
            y = ConvBlock(d, 4, 2, 1, norm="none", activation="lrelu",
                          pad_type="zero", use_bias=False, dtype=self.dtype,
                          name=f"scale{s}_conv0")(y)
            for i in range(self.n_layer - 1):
                y = ConvBlock(2 * d, 4, 2, 1, norm="none", activation="lrelu",
                              pad_type="zero", use_bias=False, dtype=self.dtype,
                              name=f"scale{s}_conv{i + 1}")(y)
                d *= 2
            y = nn.Conv(1, (1, 1), dtype=self.dtype, name=f"scale{s}_head")(y)
            if y.shape[1] == 0 or y.shape[2] == 0:
                raise ValueError(
                    f"Discriminator scale {s} output is empty {y.shape}: the "
                    f"input crop is too small for num_scales={self.num_scales}"
                    f"/n_layer={self.n_layer} (LSGAN mean over an empty map "
                    "is nan). Use a larger crop or shrink the discriminator."
                )
            outputs.append(y)
            x = avg_pool_3x3s2_no_pad_count(x)
        return outputs
