"""Torch-functional parity for the translator forward passes.

VERDICT r1 #1/#4: our flax ImgEncoder/ImgDecoder/Discriminator vs a
pure-torch replay of the reference math (model_noaux.py:80-147,
model_util.py:121-174), weights moved through convert_translator — the
same gate style as tests/test_torch_parity_full.py for DeepLab.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.translator import Discriminator, ImgDecoder, ImgEncoder
from diga_tpu.models.convert_translator import (
    decoder_to_torch,
    discriminator_to_torch,
    encoder_to_torch,
)
from diga_tpu.models import torch_replay

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

CROP = (32, 64)
TOL = dict(atol=1e-4, rtol=1e-4)


def _nchw(x):
    import torch

    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(v):
    return v.detach().numpy().transpose(0, 2, 3, 1)


class TestTranslatorTorchParity:
    def test_encoder(self):
        enc = ImgEncoder(dim=8, n_downsample=2, n_res=2)
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, *CROP, 3))
        p = enc.init(k, x)["params"]
        ours = np.asarray(enc.apply({"params": p}, x))

        sd = encoder_to_torch(jax.tree_util.tree_map(np.asarray, p))
        theirs = _nhwc(torch_replay.translator_encoder_forward_torch(
            sd, _nchw(x), n_downsample=2, n_res=2))
        np.testing.assert_allclose(ours, theirs, **TOL)

    @pytest.mark.parametrize("subpixel", [False, True])
    def test_decoder(self, subpixel):
        dec = ImgDecoder(dim=32, n_upsample=2, n_res=2, subpixel_up=subpixel)
        k = jax.random.PRNGKey(0)
        z = jax.random.normal(jax.random.PRNGKey(2), (2, CROP[0] // 4, CROP[1] // 4, 32))
        p = dec.init(k, z)["params"]
        ours = np.asarray(dec.apply({"params": p}, z))

        sd = decoder_to_torch(jax.tree_util.tree_map(np.asarray, p))
        theirs = _nhwc(torch_replay.translator_decoder_forward_torch(
            sd, _nchw(z), n_upsample=2, n_res=2))
        np.testing.assert_allclose(ours, theirs, **TOL)

    def test_discriminator(self):
        dis = Discriminator(dim=8, n_layer=3, num_scales=3)
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, *CROP, 3))
        p = dis.init(k, x)["params"]
        ours = dis.apply({"params": p}, x)

        sd = discriminator_to_torch(jax.tree_util.tree_map(np.asarray, p))
        theirs = torch_replay.discriminator_forward_torch(
            sd, _nchw(x), num_scales=3, n_layer=3)
        assert len(ours) == len(theirs)
        for o, th in zip(ours, theirs):
            np.testing.assert_allclose(np.asarray(o), _nhwc(th), **TOL)
