"""Compute class feature centroids (prototypes) for self-training.

Mirrors reference calc_centroids.py:17-81: several epochs over the target
train set (default; the reference recommends target after warm-up) or the
CrDoMix'd source set, accumulating per-class masked feature means with
'mean' updates.  The entire per-image computation (forward + masked means)
is one jitted program; only scalar progress leaves the device each step.

Saves centroids as .npy and (for reference interop) a torch .pth tensor.
"""

from __future__ import annotations

import os

import numpy as np

from .common import base_parser, get_config
from ..data import cityscapes_dataset, gta5_dataset, synthia_dataset
from ..ops.prototypes import Centroids, masked_class_means, update_centroids
from ..train.build import build_experiment, make_translator_modules


def main(argv=None):
    p = base_parser("DiGA-TPU class centroid computation")
    p.add_argument("--weight_dir", type=str, default=None)
    p.add_argument("--centroid_dir", type=str, required=True)
    p.add_argument("--source", action="store_true",
                   help="compute on CrDoMix'd source (reference --source)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    cfg = get_config(args)

    import jax
    import jax.numpy as jnp

    state, _, _, model = build_experiment(cfg, load_weight_dir=args.weight_dir)
    feat_dim = cfg.extra.get("feat_dim", 256)
    cents = Centroids.create(cfg.train.num_classes, feat_dim)

    def forward(image):
        _, _, logits, feat = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, train=False,
        )
        return logits, feat

    if args.source:
        from ..ops.mixing import crdomix
        from ..models.translator import ImgDecoder, ImgEncoder

        _, _, translator_apply = make_translator_modules(cfg)
        frozen = state.frozen

        @jax.jit
        def accumulate(cents, image, label, key):
            rec = translator_apply(frozen, image)
            mixed = crdomix(rec, image, label, key, cfg.train.num_classes)
            logits, feat = forward(mixed)
            vec, ok = masked_class_means(feat, logits, label)
            return update_centroids(cents, vec, ok, start_mean=True)

        kind = cfg.data.source_streams[0].kind
        resize = cfg.data.source_streams[0].resize_hw
        if kind == "synthia":
            ds = synthia_dataset(cfg.data.source_root, cfg.data.source_list,
                                 resize_hw=resize)
        elif kind == "cityscapes":
            # semiseg labeled split is the "source" domain
            # (semi-supervised_segmentation/calc_centroids.py:19,26-46)
            ds = cityscapes_dataset(
                cfg.data.source_root, cfg.data.source_list,
                cfg.data.source_lbl_list or cfg.data.target_lbl_list,
                split="train", resize_hw=resize)
        else:
            ds = gta5_dataset(cfg.data.source_root, cfg.data.source_list,
                              resize_hw=resize)
    else:
        @jax.jit
        def accumulate(cents, image, label, key):
            logits, feat = forward(image)
            # prediction-masked means (labels_val=None path, reference :120-126)
            vec, ok = masked_class_means(feat, logits, None)
            return update_centroids(cents, vec, ok, start_mean=True)

        ds = cityscapes_dataset(
            cfg.data.target_root, cfg.data.target_img_list, cfg.data.target_lbl_list,
            split="train", resize_hw=cfg.data.target_streams[0].resize_hw,
        )

    import jax.random as jr

    key = jr.PRNGKey(cfg.train.seed)
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    for epoch in range(args.epochs):
        for i in range(n):
            s = ds[i]
            key, sub = jr.split(key)
            cents = accumulate(
                cents,
                jnp.asarray(s["image"][None]),
                jnp.asarray(s["label"][None].astype(np.int32)),
                sub,
            )
            if i % 100 == 0:
                print(f"epoch {epoch}: {i} processed", flush=True)

    os.makedirs(args.centroid_dir, exist_ok=True)
    vectors = np.asarray(cents.vectors)
    np.save(os.path.join(args.centroid_dir, "feat_centroids.npy"), vectors)
    try:
        import torch

        torch.save(torch.from_numpy(vectors),
                   os.path.join(args.centroid_dir, "feat_centroids"))
    except ImportError:
        pass
    print(f"saved centroids {vectors.shape} to {args.centroid_dir}")


if __name__ == "__main__":
    main()
