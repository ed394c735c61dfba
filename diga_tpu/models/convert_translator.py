"""Torch <-> flax conversion for the translator modules.

Reference module layouts (model/model_noaux.py:80-147 over
model_util.py Conv2dBlock/ResBlock):
  ImgEncoder.model = Sequential[ Conv2dBlock(7x7), Conv2dBlock(4x4/2) x2,
                                 ResBlocks(4) ]
  state_dict keys: 'model.0.conv.weight', 'model.1.conv.weight',
                   'model.3.model.{r}.model.{j}.conv.weight', ...
  ImgDecoder.model = Sequential[ ResBlocks(4), (Upsample, Conv2dBlock) x2,
                                 Conv2dBlock(7x7 tanh) ]
  Discriminator.cnns[s] = Sequential[ Conv2dBlock x4, Conv2d 1x1 ]

InstanceNorm has no parameters, so only conv weights/biases move.
"""

from __future__ import annotations

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _conv_block(sd: dict, key: str) -> dict:
    out = {"conv": {"kernel": _t_conv(sd[f"{key}.conv.weight"])}}
    if f"{key}.conv.bias" in sd:
        out["conv"]["bias"] = np.asarray(sd[f"{key}.conv.bias"])
    return out


def _res_block(sd: dict, key: str) -> dict:
    return {
        "conv0": _conv_block(sd, f"{key}.model.0"),
        "conv1": _conv_block(sd, f"{key}.model.1"),
    }


def encoder_from_torch(sd: dict, n_downsample: int = 2, n_res: int = 4) -> dict:
    params = {"stem": _conv_block(sd, "model.0")}
    for i in range(n_downsample):
        params[f"down{i}"] = _conv_block(sd, f"model.{1 + i}")
    res_base = 1 + n_downsample
    for r in range(n_res):
        params[f"res{r}"] = _res_block(sd, f"model.{res_base}.model.{r}")
    return params


def decoder_from_torch(sd: dict, n_upsample: int = 2, n_res: int = 4) -> dict:
    params = {}
    for r in range(n_res):
        params[f"res{r}"] = _res_block(sd, f"model.0.model.{r}")
    # layout: [ResBlocks, Upsample, Conv, Upsample, Conv, Conv]
    for i in range(n_upsample):
        params[f"up{i}"] = _conv_block(sd, f"model.{2 + 2 * i}")
    params["out"] = _conv_block(sd, f"model.{1 + 2 * n_upsample}")
    return params


def discriminator_from_torch(sd: dict, num_scales: int = 3, n_layer: int = 4) -> dict:
    params = {}
    for s in range(num_scales):
        for j in range(n_layer):
            params[f"scale{s}_conv{j}"] = _conv_block(sd, f"cnns.{s}.{j}")
        params[f"scale{s}_head"] = {
            "kernel": _t_conv(sd[f"cnns.{s}.{n_layer}.weight"]),
            "bias": np.asarray(sd[f"cnns.{s}.{n_layer}.bias"]),
        }
    return params


def _conv_block_to_torch(sd: dict, key: str, node: dict):
    sd[f"{key}.conv.weight"] = np.ascontiguousarray(
        np.asarray(node["conv"]["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in node["conv"]:
        sd[f"{key}.conv.bias"] = np.asarray(node["conv"]["bias"])


def encoder_to_torch(params: dict, n_downsample: int | None = None,
                     n_res: int | None = None) -> dict:
    if n_downsample is None:
        n_downsample = sum(1 for k in params if k.startswith("down"))
    if n_res is None:
        n_res = sum(1 for k in params if k.startswith("res"))
    sd: dict = {}
    _conv_block_to_torch(sd, "model.0", params["stem"])
    for i in range(n_downsample):
        _conv_block_to_torch(sd, f"model.{1 + i}", params[f"down{i}"])
    for r in range(n_res):
        _conv_block_to_torch(sd, f"model.{1 + n_downsample}.model.{r}.model.0", params[f"res{r}"]["conv0"])
        _conv_block_to_torch(sd, f"model.{1 + n_downsample}.model.{r}.model.1", params[f"res{r}"]["conv1"])
    return sd


def decoder_to_torch(params: dict, n_upsample: int | None = None,
                     n_res: int | None = None) -> dict:
    if n_upsample is None:
        n_upsample = sum(1 for k in params if k.startswith("up"))
    if n_res is None:
        n_res = sum(1 for k in params if k.startswith("res"))
    sd: dict = {}
    for r in range(n_res):
        _conv_block_to_torch(sd, f"model.0.model.{r}.model.0", params[f"res{r}"]["conv0"])
        _conv_block_to_torch(sd, f"model.0.model.{r}.model.1", params[f"res{r}"]["conv1"])
    for i in range(n_upsample):
        _conv_block_to_torch(sd, f"model.{2 + 2 * i}", params[f"up{i}"])
    _conv_block_to_torch(sd, f"model.{1 + 2 * n_upsample}", params["out"])
    return sd


def discriminator_to_torch(params: dict, num_scales: int | None = None,
                           n_layer: int | None = None) -> dict:
    if num_scales is None:
        num_scales = sum(1 for k in params if k.endswith("_head"))
    if n_layer is None:
        n_layer = sum(1 for k in params if k.startswith("scale0_conv"))
    sd: dict = {}
    for s in range(num_scales):
        for j in range(n_layer):
            _conv_block_to_torch(sd, f"cnns.{s}.{j}", params[f"scale{s}_conv{j}"])
        sd[f"cnns.{s}.{n_layer}.weight"] = np.ascontiguousarray(
            np.asarray(params[f"scale{s}_head"]["kernel"]).transpose(3, 2, 0, 1))
        sd[f"cnns.{s}.{n_layer}.bias"] = np.asarray(params[f"scale{s}_head"]["bias"])
    return sd
