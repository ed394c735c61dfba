"""VGG19 feature extractor for the perceptual loss (flax, NHWC).

Matches the reference's slice structure (util/loss.py:173-203): five
feature taps after relu1_1, relu2_1, relu3_1, relu4_1, relu5_1
(torchvision vgg19.features indices 2/7/12/21/30).

Pretrained weights must be supplied as a torchvision vgg19 state_dict
(.pth) via ``vgg19_from_torch`` — this image has no torchvision and no
egress, so the translator trainer treats the perceptual term as optional
(lambda_percep=0 disables it; a random-init VGG is statistically useless
as a perceptual metric and is only allowed in tests).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

class VGG19Features(nn.Module):
    """Returns the 5 relu taps used by VGGLoss."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        taps = []
        # torchvision features: [conv,relu]x2, pool, [conv,relu]x2, pool,
        # [conv,relu]x4, pool, [conv,relu]x4, pool, [conv,relu]x4, pool
        plan = [64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P",
                512, 512, 512, 512, "P", 512, 512, 512, 512, "P"]
        # taps after relu #1, #3, #5, #9, #13 (1-indexed relu count)
        tap_after_relu = {1, 3, 5, 9, 13}
        relu_i = 0
        ci = 0
        for item in plan:
            if item == "P":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"conv{ci}")(x)
            x = nn.relu(x)
            ci += 1
            relu_i += 1
            if relu_i in tap_after_relu:
                taps.append(x)
        return taps


def vgg19_from_torch(sd: dict) -> dict:
    """torchvision vgg19 state_dict ('features.N.weight') -> flax params."""
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    params = {}
    for ci, tid in enumerate(conv_ids):
        w = np.asarray(sd[f"features.{tid}.weight"]).transpose(2, 3, 1, 0)
        b = np.asarray(sd[f"features.{tid}.bias"])
        params[f"conv{ci}"] = {"kernel": np.ascontiguousarray(w), "bias": b}
    return params


def vgg_perceptual_loss(vgg_apply, x, y, weights=(1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0),
                        max_w: int = 1024):
    """L1 over the five taps, target detached (util/loss.py:17-25).

    The reference VGGLoss halves both images with AvgPool2d(2) while the
    width exceeds 1024 (util/loss.py:15,19-20) — a no-op at the shipped
    512x896 crop, kept for faithfulness at larger inputs.  Shapes are
    static under jit, so the Python ``while`` resolves at trace time.
    """
    import jax

    while x.shape[2] > max_w:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        y = nn.avg_pool(y, (2, 2), strides=(2, 2))
    fx = vgg_apply(x)
    fy = vgg_apply(y)
    loss = 0.0
    for w, a, b in zip(weights, fx, fy):
        loss += w * jnp.mean(jnp.abs(a.astype(jnp.float32) - jax.lax.stop_gradient(b).astype(jnp.float32)))
    return loss
