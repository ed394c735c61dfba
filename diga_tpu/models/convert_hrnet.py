"""Torch <-> flax conversion for the HRNet-W48 + OCR SegModel.

Reference module naming (semi-supervised_segmentation/model/model_hr.py
composes 'hrnet.*' + 'ocrnet.*'; layouts in networks/hrnet_module.py and
networks/ocrnet_module.py):

  hrnet.conv1/bn1/conv2/bn2                       stem
  hrnet.stage1.{b}.conv{1,2,3}/bn{1,2,3}[/downsample.{0,1}]
  hrnet.transition_stage_{s}_{s+1}.{i}.{0,1}      (or .{i}.{j}.{0,1} chains)
  hrnet.stage{s}.{m}.branches.{b}.{k}.conv{1,2}/bn{1,2}
  hrnet.stage{s}.{m}.fuse_layers.{i}.{j}.{0,1}    (or .{i}.{j}.{k}.{0,1})
  ocrnet.pixel_representations.{0,1}
  ocrnet.soft_object_regions.{0,1,3}
  ocrnet.pixel_region_relations.{pixel_rep,obj_reg_rep}.{0,1,3,4}
  ocrnet.value.{0,1} / ocr_up.{0,1} / augmented_rep.{0,1}
  ocrnet.segmentation_classes.0

Note: the reference initializes from the ImageNet hrnetv2 checkpoint by
positional zip over state_dict items (hrnet_module.py:573-584); loading
that official file through this converter therefore requires the same
key order, which torch dicts preserve — handled by iterating our
canonical order.
"""

from __future__ import annotations

import numpy as np

from .hrnet_ocr import W32, W48


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _f_conv(k):
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


class _Builder:
    def __init__(self):
        self.params: dict = {}
        self.stats: dict = {}

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def convbn(self, sd, tkey_conv, tkey_bn, fpath):
        self._set(self.params, fpath + ("conv", "kernel"), _t_conv(sd[tkey_conv + ".weight"]))
        self._set(self.params, fpath + ("bn", "scale"), np.asarray(sd[tkey_bn + ".weight"]))
        self._set(self.params, fpath + ("bn", "bias"), np.asarray(sd[tkey_bn + ".bias"]))
        mean = np.asarray(sd[tkey_bn + ".running_mean"])
        # a conv bias before eval-mode BN is equivalent to shifting the
        # running mean: BN(conv+b) == BN'(conv) with mean' = mean - b.  The
        # reference leaves default bias=True on two OCR convs
        # (ocrnet_module.py:120-122,178-180); our ConvBN is bias-free.
        if tkey_conv + ".bias" in sd:
            mean = mean - np.asarray(sd[tkey_conv + ".bias"])
        self._set(self.stats, fpath + ("bn", "mean"), mean)
        self._set(self.stats, fpath + ("bn", "var"), np.asarray(sd[tkey_bn + ".running_var"]))

    def conv(self, sd, tkey, fpath, bias=True):
        self._set(self.params, fpath + ("kernel",), _t_conv(sd[tkey + ".weight"]))
        if bias and tkey + ".bias" in sd:
            self._set(self.params, fpath + ("bias",), np.asarray(sd[tkey + ".bias"]))


def hrnet_ocr_from_torch(sd: dict, arch: dict = None) -> tuple[dict, dict]:
    """Reference SegModel (hrnet.*/ocrnet.*) state_dict -> (params, batch_stats)."""
    a = arch or W48
    b = _Builder()

    # stem
    b.convbn(sd, "hrnet.conv1", "hrnet.bn1", ("hrnet", "stem1"))
    b.convbn(sd, "hrnet.conv2", "hrnet.bn2", ("hrnet", "stem2"))

    # stage1 bottlenecks
    for i in range(a["stage1_blocks"]):
        base = f"hrnet.stage1.{i}"
        fb = ("hrnet", f"stage1_block{i}")
        for c in (1, 2, 3):
            b.convbn(sd, f"{base}.conv{c}", f"{base}.bn{c}", fb + (f"conv{c}",))
        if f"{base}.downsample.0.weight" in sd:
            b.convbn(sd, f"{base}.downsample.0", f"{base}.downsample.1", fb + ("downsample",))

    prev_branches = 1
    for si, (num_modules, num_blocks, channels) in enumerate(a["stages"], start=2):
        trans = f"hrnet.transition_stage_{si - 1}_{si}"
        for i in range(len(channels)):
            if i < prev_branches:
                if f"{trans}.{i}.0.weight" in sd:
                    b.convbn(sd, f"{trans}.{i}.0", f"{trans}.{i}.1",
                             ("hrnet", f"trans{si}_{i}"))
            else:
                for j in range(i + 1 - prev_branches):
                    b.convbn(sd, f"{trans}.{i}.{j}.0", f"{trans}.{i}.{j}.1",
                             ("hrnet", f"trans{si}_{i}_{j}"))
        for m in range(num_modules):
            mbase = f"hrnet.stage{si}.{m}"
            fmod = ("hrnet", f"stage{si}_module{m}")
            for bi in range(len(channels)):
                for k in range(num_blocks):
                    blk = f"{mbase}.branches.{bi}.{k}"
                    fblk = fmod + (f"branch{bi}_block{k}",)
                    for c in (1, 2):
                        b.convbn(sd, f"{blk}.conv{c}", f"{blk}.bn{c}", fblk + (f"conv{c}",))
                    if f"{blk}.downsample.0.weight" in sd:
                        b.convbn(sd, f"{blk}.downsample.0", f"{blk}.downsample.1",
                                 fblk + ("downsample",))
            for i in range(len(channels)):
                for j in range(len(channels)):
                    if j > i:
                        b.convbn(sd, f"{mbase}.fuse_layers.{i}.{j}.0",
                                 f"{mbase}.fuse_layers.{i}.{j}.1",
                                 fmod + (f"fuse{i}_{j}",))
                    elif j < i:
                        for k in range(i - j):
                            b.convbn(sd, f"{mbase}.fuse_layers.{i}.{j}.{k}.0",
                                     f"{mbase}.fuse_layers.{i}.{j}.{k}.1",
                                     fmod + (f"fuse{i}_{j}_{k}",))
        prev_branches = len(channels)

    # OCR head
    if "ocrnet.pixel_representations.0.weight" in sd:
        o = "ocrnet"
        b.convbn(sd, f"{o}.pixel_representations.0", f"{o}.pixel_representations.1",
                 ("ocr", "pixel_rep"))
        b.convbn(sd, f"{o}.soft_object_regions.0", f"{o}.soft_object_regions.1",
                 ("ocr", "region_conv"))
        b.conv(sd, f"{o}.soft_object_regions.3", ("ocr", "region_cls"))
        for tname, fname in (("pixel_rep", "query"), ("obj_reg_rep", "key")):
            b.convbn(sd, f"{o}.pixel_region_relations.{tname}.0",
                     f"{o}.pixel_region_relations.{tname}.1", ("ocr", f"{fname}_a"))
            b.convbn(sd, f"{o}.pixel_region_relations.{tname}.3",
                     f"{o}.pixel_region_relations.{tname}.4", ("ocr", f"{fname}_b"))
        b.convbn(sd, f"{o}.value.0", f"{o}.value.1", ("ocr", "value"))
        b.convbn(sd, f"{o}.ocr_up.0", f"{o}.ocr_up.1", ("ocr", "ocr_up"))
        b.convbn(sd, f"{o}.augmented_rep.0", f"{o}.augmented_rep.1", ("ocr", "augment"))
        b.conv(sd, f"{o}.segmentation_classes.0", ("ocr", "cls"))
    return b.params, b.stats


def hrnet_imagenet_init(params: dict, stats: dict, pretrained_sd: dict,
                        arch: dict = None) -> tuple[dict, dict]:
    """Initialize the HRNet backbone from the ImageNet hrnetv2 checkpoint.

    The reference loads that checkpoint by POSITIONAL zip of state_dict
    items, accepting each pair whose shapes match and raising otherwise
    (hrnet_module.py:573-584); the ImageNet classifier head trails the
    backbone keys so the zip truncates there.  We reproduce that: list our
    backbone tensors in reference torch registration order (the order
    hrnet_ocr_to_torch emits), pair them positionally with the checkpoint's
    tensors (minus num_batches_tracked bookkeeping, absent on our side),
    and rebuild the flax trees.  OCR-head params are left at their current
    (random) values, as in the reference.
    """
    full = hrnet_ocr_to_torch(params, stats, arch)
    back_keys = [k for k in full if k.startswith("hrnet.")]
    # DataParallel dumps carry a 'module.' prefix — strip before zipping
    # (the key TEXT is otherwise unused: pairing is positional)
    pre_items = [(k[7:] if k.startswith("module.") else k, np.asarray(v))
                 for k, v in pretrained_sd.items()
                 if "num_batches_tracked" not in k]
    # landmark assertions for real (standard-named) hrnetv2 checkpoints
    # (docs/PARITY_RUNBOOK.md): the zip must start at the stem and cover
    # the whole backbone before the ImageNet cls-head keys begin
    if pre_items and pre_items[0][0].split(".")[0].startswith("conv"):
        if pre_items[0][0] != "conv1.weight":
            raise RuntimeError(
                "hrnet ImageNet init: checkpoint's first tensor is "
                f"{pre_items[0][0]!r}, expected 'conv1.weight' — wrong or "
                "reordered checkpoint")
        if len(pre_items) < len(back_keys):
            raise RuntimeError(
                f"hrnet ImageNet init: checkpoint has {len(pre_items)} "
                f"tensors < backbone's {len(back_keys)} — truncated dump")
    for ours, (pk, pv) in zip(back_keys, pre_items):
        if tuple(full[ours].shape) != tuple(pv.shape):
            raise RuntimeError(
                f"hrnet ImageNet init: shape mismatch at {ours} <- {pk}: "
                f"{tuple(full[ours].shape)} vs {tuple(pv.shape)} — "
                "pretrained weights could not be correctly loaded")
        # positional zips can silently pair equal-shaped tensors wrongly
        # (bn.weight vs bn.bias, sibling blocks).  The real hrnetv2
        # checkpoint uses standard torch naming, where every tensor carries
        # a semantic suffix; any off-by-one or intra-BN swap flips it, so
        # when the checkpoint key has a recognizable suffix, require
        # agreement.  Opaquely-named checkpoints keep the reference's pure
        # positional behavior (hrnet_module.py:573-584 checks nothing).
        suffix = pk.rsplit(".", 1)[-1]
        if (suffix in ("weight", "bias", "running_mean", "running_var")
                and suffix != ours.rsplit(".", 1)[-1]):
            raise RuntimeError(
                f"hrnet ImageNet init: positional pairing misaligned at "
                f"{ours} <- {pk} (tensor-kind suffix mismatch)")
        full[ours] = pv
    return hrnet_ocr_from_torch(full, arch)


def hrnet_ocr_to_torch(params: dict, stats: dict, arch: dict = None) -> dict:
    """Export our flax HRNet+OCR to the reference SegModel naming."""
    a = arch or W48
    sd: dict = {}

    def put_convbn(tkey_conv, tkey_bn, pnode, snode):
        sd[tkey_conv + ".weight"] = _f_conv(pnode["conv"]["kernel"])
        sd[tkey_bn + ".weight"] = np.asarray(pnode["bn"]["scale"])
        sd[tkey_bn + ".bias"] = np.asarray(pnode["bn"]["bias"])
        sd[tkey_bn + ".running_mean"] = np.asarray(snode["bn"]["mean"])
        sd[tkey_bn + ".running_var"] = np.asarray(snode["bn"]["var"])

    hp, hs = params["hrnet"], stats["hrnet"]
    put_convbn("hrnet.conv1", "hrnet.bn1", hp["stem1"], hs["stem1"])
    put_convbn("hrnet.conv2", "hrnet.bn2", hp["stem2"], hs["stem2"])
    for i in range(a["stage1_blocks"]):
        base, fb = f"hrnet.stage1.{i}", f"stage1_block{i}"
        for c in (1, 2, 3):
            put_convbn(f"{base}.conv{c}", f"{base}.bn{c}", hp[fb][f"conv{c}"], hs[fb][f"conv{c}"])
        if "downsample" in hp[fb]:
            put_convbn(f"{base}.downsample.0", f"{base}.downsample.1",
                       hp[fb]["downsample"], hs[fb]["downsample"])

    prev = 1
    for si, (num_modules, num_blocks, channels) in enumerate(a["stages"], start=2):
        trans = f"hrnet.transition_stage_{si - 1}_{si}"
        for i in range(len(channels)):
            if i < prev:
                key = f"trans{si}_{i}"
                if key in hp:
                    put_convbn(f"{trans}.{i}.0", f"{trans}.{i}.1", hp[key], hs[key])
            else:
                for j in range(i + 1 - prev):
                    key = f"trans{si}_{i}_{j}"
                    put_convbn(f"{trans}.{i}.{j}.0", f"{trans}.{i}.{j}.1", hp[key], hs[key])
        for m in range(num_modules):
            mbase, fmod = f"hrnet.stage{si}.{m}", f"stage{si}_module{m}"
            for bi in range(len(channels)):
                for k in range(num_blocks):
                    blk, fblk = f"{mbase}.branches.{bi}.{k}", f"branch{bi}_block{k}"
                    for c in (1, 2):
                        put_convbn(f"{blk}.conv{c}", f"{blk}.bn{c}",
                                   hp[fmod][fblk][f"conv{c}"], hs[fmod][fblk][f"conv{c}"])
                    if "downsample" in hp[fmod][fblk]:
                        put_convbn(f"{blk}.downsample.0", f"{blk}.downsample.1",
                                   hp[fmod][fblk]["downsample"], hs[fmod][fblk]["downsample"])
            for i in range(len(channels)):
                for j in range(len(channels)):
                    if j > i:
                        key = f"fuse{i}_{j}"
                        put_convbn(f"{mbase}.fuse_layers.{i}.{j}.0",
                                   f"{mbase}.fuse_layers.{i}.{j}.1",
                                   hp[fmod][key], hs[fmod][key])
                    elif j < i:
                        for k in range(i - j):
                            key = f"fuse{i}_{j}_{k}"
                            put_convbn(f"{mbase}.fuse_layers.{i}.{j}.{k}.0",
                                       f"{mbase}.fuse_layers.{i}.{j}.{k}.1",
                                       hp[fmod][key], hs[fmod][key])
        prev = len(channels)

    op, os_ = params["ocr"], stats["ocr"]
    put_convbn("ocrnet.pixel_representations.0", "ocrnet.pixel_representations.1",
               op["pixel_rep"], os_["pixel_rep"])
    put_convbn("ocrnet.soft_object_regions.0", "ocrnet.soft_object_regions.1",
               op["region_conv"], os_["region_conv"])
    # these two reference convs carry (redundant, BN-absorbed) biases —
    # emit zeros so the exported dict strict-loads into the reference model
    sd["ocrnet.pixel_representations.0.bias"] = np.zeros(
        op["pixel_rep"]["conv"]["kernel"].shape[-1], np.float32)
    sd["ocrnet.soft_object_regions.0.bias"] = np.zeros(
        op["region_conv"]["conv"]["kernel"].shape[-1], np.float32)
    sd["ocrnet.soft_object_regions.3.weight"] = _f_conv(op["region_cls"]["kernel"])
    sd["ocrnet.soft_object_regions.3.bias"] = np.asarray(op["region_cls"]["bias"])
    for tname, fname in (("pixel_rep", "query"), ("obj_reg_rep", "key")):
        put_convbn(f"ocrnet.pixel_region_relations.{tname}.0",
                   f"ocrnet.pixel_region_relations.{tname}.1",
                   op[f"{fname}_a"], os_[f"{fname}_a"])
        put_convbn(f"ocrnet.pixel_region_relations.{tname}.3",
                   f"ocrnet.pixel_region_relations.{tname}.4",
                   op[f"{fname}_b"], os_[f"{fname}_b"])
    put_convbn("ocrnet.value.0", "ocrnet.value.1", op["value"], os_["value"])
    put_convbn("ocrnet.ocr_up.0", "ocrnet.ocr_up.1", op["ocr_up"], os_["ocr_up"])
    put_convbn("ocrnet.augmented_rep.0", "ocrnet.augmented_rep.1",
               op["augment"], os_["augment"])
    sd["ocrnet.segmentation_classes.0.weight"] = _f_conv(op["cls"]["kernel"])
    sd["ocrnet.segmentation_classes.0.bias"] = np.asarray(op["cls"]["bias"])
    return sd
