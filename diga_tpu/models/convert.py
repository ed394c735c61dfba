"""PyTorch <-> JAX weight conversion for checkpoint interop.

The reference ships role-keyed torch ``state_dict`` files
(student.pth/teacher.pth/enc_s.pth/dec_s2t.pth — util/utils.py:83-91) and
initializes the backbone from a Caffe-converted ResNet-101 .pth
(seg_model_noaux.py:7).  These converters let our flax models load those
artifacts (and export back), so mIoU parity can be checked against
reference-trained weights.

torch is used here for (de)serialization only — never for compute.

Layout rules:
  conv   torch (O, I, kh, kw)  ->  flax kernel (kh, kw, I, O)
  linear torch (O, I)          ->  flax kernel (I, O)
  BN     weight/bias -> scale/bias (params); running_mean/var ->
         mean/var (batch_stats)
  GN     weight/bias -> scale/bias
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _t_linear(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # SimCLRv2/ProDA-style checkpoints wrap the weights in a 'state_dict'
    # entry (reference seg_model_noaux.py:339 loads them for backbone init)
    if isinstance(sd, dict) and "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# SegModel (DeepLabv2-R101) conversion
# ---------------------------------------------------------------------------

def _bn(params: dict, stats: dict, prefix: tuple[str, ...], sd: dict, key: str):
    _set(params, prefix + ("frozen_bn", "scale"), np.asarray(sd[key + ".weight"]))
    _set(params, prefix + ("frozen_bn", "bias"), np.asarray(sd[key + ".bias"]))
    _set(stats, prefix + ("frozen_bn", "mean"), np.asarray(sd[key + ".running_mean"]))
    _set(stats, prefix + ("frozen_bn", "var"), np.asarray(sd[key + ".running_var"]))


def segmodel_from_torch(sd: dict, layers=(3, 4, 23, 3)) -> tuple[dict, dict]:
    """Convert a reference SegModel state_dict to (params, batch_stats).

    Handles both namings: the SegModel wrapper ('layer0.0.weight', ...,
    'final.*' — model_noaux.py:19-26) and raw ResNetMulti ('conv1.weight',
    'layer5.*').
    """
    wrapper = any(k.startswith("layer0.") for k in sd)
    stem_conv = "layer0.0" if wrapper else "conv1"
    stem_bn = "layer0.1" if wrapper else "bn1"
    head = "final" if wrapper else "layer5"

    params: dict = {}
    stats: dict = {}
    _set(params, ("conv1", "kernel"), _t_conv(sd[stem_conv + ".weight"]))
    _bn(params, stats, ("bn1",), sd, stem_bn)

    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            t = f"layer{li}.{bi}"
            o = (f"layer{li}", f"block{bi}")
            for ci in (1, 2, 3):
                _set(params, o + (f"conv{ci}", "kernel"), _t_conv(sd[f"{t}.conv{ci}.weight"]))
                _bn(params, stats, o + (f"bn{ci}",), sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                _set(params, o + ("downsample_conv", "kernel"), _t_conv(sd[f"{t}.downsample.0.weight"]))
                _bn(params, stats, o + ("downsample_bn",), sd, f"{t}.downsample.1")

    # ASPP head (Classifier_Module2): conv2d_list[j] = Sequential(conv, gn, relu)
    if f"{head}.conv2d_list.0.0.weight" in sd:
        for j in range(5):
            _set(params, ("head", f"branch{j}_conv", "kernel"), _t_conv(sd[f"{head}.conv2d_list.{j}.0.weight"]))
            _set(params, ("head", f"branch{j}_conv", "bias"), np.asarray(sd[f"{head}.conv2d_list.{j}.0.bias"]))
            _set(params, ("head", f"branch{j}_gn", "scale"), np.asarray(sd[f"{head}.conv2d_list.{j}.1.weight"]))
            _set(params, ("head", f"branch{j}_gn", "bias"), np.asarray(sd[f"{head}.conv2d_list.{j}.1.bias"]))
        # bottleneck: [SEBlock, conv3x3, GN]
        _set(params, ("head", "se", "fc1", "kernel"), _t_linear(sd[f"{head}.bottleneck.0.se.0.weight"]))
        _set(params, ("head", "se", "fc1", "bias"), np.asarray(sd[f"{head}.bottleneck.0.se.0.bias"]))
        _set(params, ("head", "se", "fc2", "kernel"), _t_linear(sd[f"{head}.bottleneck.0.se.2.weight"]))
        _set(params, ("head", "se", "fc2", "bias"), np.asarray(sd[f"{head}.bottleneck.0.se.2.bias"]))
        _set(params, ("head", "bottleneck_conv", "kernel"), _t_conv(sd[f"{head}.bottleneck.1.weight"]))
        _set(params, ("head", "bottleneck_conv", "bias"), np.asarray(sd[f"{head}.bottleneck.1.bias"]))
        _set(params, ("head", "bottleneck_gn", "scale"), np.asarray(sd[f"{head}.bottleneck.2.weight"]))
        _set(params, ("head", "bottleneck_gn", "bias"), np.asarray(sd[f"{head}.bottleneck.2.bias"]))
        _set(params, ("head", "classifier", "kernel"), _t_conv(sd[f"{head}.head.1.weight"]))
    return params, stats


def segmodel_to_torch(params: dict, stats: dict, layers=(3, 4, 23, 3)) -> dict:
    """Export our params back to the reference SegModel state_dict naming."""
    sd: dict = {}

    def put_conv(tkey, node):
        sd[tkey + ".weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
        if "bias" in node:
            sd[tkey + ".bias"] = np.asarray(node["bias"])

    def put_bn(tkey, pnode, snode):
        sd[tkey + ".weight"] = np.asarray(pnode["frozen_bn"]["scale"])
        sd[tkey + ".bias"] = np.asarray(pnode["frozen_bn"]["bias"])
        sd[tkey + ".running_mean"] = np.asarray(snode["frozen_bn"]["mean"])
        sd[tkey + ".running_var"] = np.asarray(snode["frozen_bn"]["var"])

    put_conv("layer0.0", params["conv1"])
    put_bn("layer0.1", params["bn1"], stats["bn1"])
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            p = params[f"layer{li}"][f"block{bi}"]
            s = stats[f"layer{li}"][f"block{bi}"]
            for ci in (1, 2, 3):
                put_conv(f"layer{li}.{bi}.conv{ci}", p[f"conv{ci}"])
                put_bn(f"layer{li}.{bi}.bn{ci}", p[f"bn{ci}"], s[f"bn{ci}"])
            if "downsample_conv" in p:
                put_conv(f"layer{li}.{bi}.downsample.0", p["downsample_conv"])
                put_bn(f"layer{li}.{bi}.downsample.1", p["downsample_bn"], s["downsample_bn"])
    h = params["head"]
    for j in range(5):
        put_conv(f"final.conv2d_list.{j}.0", h[f"branch{j}_conv"])
        sd[f"final.conv2d_list.{j}.1.weight"] = np.asarray(h[f"branch{j}_gn"]["scale"])
        sd[f"final.conv2d_list.{j}.1.bias"] = np.asarray(h[f"branch{j}_gn"]["bias"])
    sd["final.bottleneck.0.se.0.weight"] = _t_linear(h["se"]["fc1"]["kernel"])
    sd["final.bottleneck.0.se.0.bias"] = np.asarray(h["se"]["fc1"]["bias"])
    sd["final.bottleneck.0.se.2.weight"] = _t_linear(h["se"]["fc2"]["kernel"])
    sd["final.bottleneck.0.se.2.bias"] = np.asarray(h["se"]["fc2"]["bias"])
    put_conv("final.bottleneck.1", h["bottleneck_conv"])
    sd["final.bottleneck.2.weight"] = np.asarray(h["bottleneck_gn"]["scale"])
    sd["final.bottleneck.2.bias"] = np.asarray(h["bottleneck_gn"]["bias"])
    put_conv("final.head.1", h["classifier"])
    return sd


def merge_pretrained_backbone(params: dict, stats: dict, new_params: dict, new_stats: dict):
    """Overlay converted backbone weights onto freshly-initialized params
    (keeping the head random when class counts differ — the reference's
    DeeplabMulti load rule, seg_model_noaux.py:330-335)."""
    import jax

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                assert dst[k].shape == v.shape, f"{k}: {dst[k].shape} vs {v.shape}"
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    params = jax.tree_util.tree_map(np.asarray, params)
    stats = jax.tree_util.tree_map(np.asarray, stats)
    overlay(params, new_params)
    overlay(stats, new_stats)
    return params, stats
