"""Dump two-scale max-merged pseudo-labels as palette PNGs.

Mirrors reference pseudolabel_generator.py:52-105: for every target train
image, argmax of max(upsample(f(x)), upsample(f(x_down))) saved as a
P-mode PNG with the Cityscapes palette, so the files round-trip through
the reference loaders (CityLoader.py:130-132).

The forward runs batched and jitted; only the final uint8 label map
crosses to the host.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .common import base_parser, get_config
from ..data import cityscapes_dataset
from ..data.label_maps import CITYSCAPES_COLORS_19, SYNTHIA_COLORS_16, make_png_palette
from ..eval.evaluator import two_scale_logits
from ..train.build import build_experiment


def main(argv=None):
    p = base_parser("DiGA-TPU pseudo-label generation")
    p.add_argument("--weight_dir", type=str, required=False, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    cfg = get_config(args)

    import jax
    import jax.numpy as jnp

    state, _, eval_apply, _ = build_experiment(cfg, load_weight_dir=args.weight_dir)

    ds = cityscapes_dataset(
        cfg.data.target_root, cfg.data.target_img_list, cfg.data.target_lbl_list,
        split="train", resize_hw=cfg.eval.out_hw,
    )

    @jax.jit
    def predict(image):
        merged = two_scale_logits(lambda x: eval_apply(state, x),
                                  image, cfg.eval.out_hw, cfg.eval.ds_hw)
        return jnp.argmax(merged, axis=-1).astype(jnp.uint8)

    colors = CITYSCAPES_COLORS_19 if cfg.eval.num_classes == 19 else SYNTHIA_COLORS_16
    palette = make_png_palette(colors)
    os.makedirs(args.output_dir, exist_ok=True)

    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    for i in range(n):
        s = ds[i]
        label = np.asarray(predict(s["image"][None]))[0]
        img = Image.fromarray(label).convert("P")
        img.putpalette(palette)
        name = os.path.basename(s["name"])
        img.save(os.path.join(args.output_dir, name))
        if i % 100 == 0:
            print(f"{i} processed", flush=True)
    print(f"wrote {n} pseudo-labels to {args.output_dir}")


if __name__ == "__main__":
    main()
