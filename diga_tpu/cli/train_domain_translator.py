"""Train the CycleGAN-style image domain translator.

Mirrors reference train_domain_translator.py: six Adam(0.5, 0.999)
optimizers at lr 1e-4, each poly-decayed (power 0.9) every iteration
(reference :156-170 appends all six to enc/dec/dis opt lists, :210-214
calls adjust_learning_rate on them each step), with 1 small + 1
full-resize image per domain (:73-79,105-115,235-238).

python -m diga_tpu.cli.train_domain_translator --preset gta2city_translator \
    --source_root ./data/GTA5 --target_root ./data/Cityscapes
"""

from __future__ import annotations

import os

import numpy as np

from .common import base_parser, get_config
from ..models.translator import Discriminator, ImgDecoder, ImgEncoder
from ..train.loop import make_train_iterator
from ..train.steps_translator import (
    TranslatorConfig,
    build_translator_step,
    create_translator_state,
)
from ..utils.checkpoint import export_role_keyed, save_train_state
from ..utils.logging import MetricLogger


def build_translator_experiment(cfg, vgg_weights: str | None = None,
                                num_steps: int | None = None):
    """Modules + state + jitted step for the translator stage.

    Shared by this CLI and cli/soak.py's translator mode, so the soak
    exercises the exact shipped program.  Returns (modules, state, step).
    """
    import jax
    import jax.numpy as jnp
    import optax

    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    # module sizes overridable via preset extras (defaults = reference arch)
    ex = cfg.extra.get
    enc_kw = dict(dim=ex("enc_dim", 64), n_downsample=ex("n_downsample", 2),
                  n_res=ex("n_res", 4), dtype=dtype)
    dec_kw = dict(dim=ex("dec_dim", 256), n_upsample=ex("n_downsample", 2),
                  n_res=ex("n_res", 4), dtype=dtype,
                  subpixel_up=ex("subpixel_up", True))
    dis_kw = dict(dim=ex("dis_dim", 64), n_layer=ex("dis_layers", 4),
                  num_scales=ex("dis_scales", 3), dtype=dtype)
    modules = {
        "enc_s": ImgEncoder(**enc_kw), "enc_t": ImgEncoder(**enc_kw),
        "dec_s2t": ImgDecoder(**dec_kw), "dec_t2s": ImgDecoder(**dec_kw),
        "dis_s2t": Discriminator(**dis_kw), "dis_t2s": Discriminator(**dis_kw),
    }
    tcfg = TranslatorConfig(
        lambda_adv=cfg.extra.get("lambda_adv", 0.5),
        lambda_cyc=cfg.extra.get("lambda_cyc", 10.0),
        lambda_seg_edge=cfg.extra.get("lambda_seg_edge", 20.0),
        lambda_percep=cfg.extra.get("lambda_percep", 0.1) if vgg_weights else 0.0,
        lambda_self=cfg.extra.get("lambda_self", 0.001),
        remat=cfg.extra.get("translator_remat", None),  # None = auto
    )

    vgg_apply, vgg_params = None, None
    if vgg_weights:
        from ..models.convert import load_torch_state_dict
        from ..models.vgg import VGG19Features, vgg19_from_torch

        vgg = VGG19Features(dtype=dtype)
        vgg_params = vgg19_from_torch(load_torch_state_dict(vgg_weights))
        vgg_apply = lambda params, x: vgg.apply({"params": params}, x)

    # reference: Adam(0.5, 0.999), lr 1e-4 poly-decayed power 0.9 per iter
    # (train_domain_translator.py:210-214 -> util/utils.py:36-41); one
    # optax schedule per module optimizer state steps exactly once per
    # iteration, so the schedule count == i_iter for all six.
    from ..train.schedules import poly_schedule

    steps_total = num_steps or cfg.train.num_steps
    opt = optax.adam(poly_schedule(cfg.train.learning_rate, steps_total),
                     b1=0.5, b2=0.999)
    state = create_translator_state(modules, opt, jax.random.PRNGKey(cfg.train.seed),
                                    cfg.train.crop_hw, vgg_params=vgg_params)
    step = jax.jit(build_translator_step(modules, opt, tcfg, vgg_apply),
                   donate_argnums=(0,))
    return modules, state, step


def main(argv=None):
    p = base_parser("DiGA-TPU domain translator training")
    p.add_argument("--vgg_weights", type=str, default=None,
                   help="torchvision vgg19 state_dict (.pth) for the "
                        "perceptual loss; omitting disables that term")
    p.add_argument("--save_every", type=int, default=2000)
    args = p.parse_args(argv)
    cfg = get_config(args)

    _, state, step = build_translator_experiment(
        cfg, vgg_weights=args.vgg_weights, num_steps=args.num_steps)

    it, src, tgt = make_train_iterator_translator(cfg)
    logger = MetricLogger(args.work_dir)
    weight_dir = os.path.join(args.work_dir, "weights")
    steps = args.num_steps or cfg.train.num_steps

    for i in range(steps):
        batch = next(it)
        state, metrics = step(state, batch)
        if i % 50 == 0:
            host = {k: float(v) for k, v in metrics.items()}
            logger.log(i, host)
            logger.print(i, host)
        if i > 0 and i % args.save_every == 0:
            export_translator(state, weight_dir)
    export_translator(state, weight_dir)
    save_train_state(os.path.join(args.work_dir, "ckpt_final"), state)
    src.stop()
    tgt.stop()
    logger.close()
    print(f"translator training done ({steps} steps); weights in {weight_dir}")


def make_train_iterator_translator(cfg):
    """Translator consumes source+target small streams (it needs t_img)."""
    from ..train.loop import MultiStreamLoader, build_dataset

    crop = cfg.train.crop_hw
    src = MultiStreamLoader(
        [(build_dataset(s, cfg.data, crop, True), s.batch) for s in cfg.data.source_streams],
        seed=cfg.train.seed, num_workers=cfg.data.num_workers,
    )
    tgt = MultiStreamLoader(
        [(build_dataset(s, cfg.data, crop, False), s.batch) for s in cfg.data.target_streams],
        seed=cfg.train.seed + 1000, num_workers=cfg.data.num_workers,
    )

    def gen():
        s_it, t_it = iter(src), iter(tgt)
        while True:
            s, t = next(s_it), next(t_it)
            yield {"s_img": s["image"], "s_lbl": s["label"].astype("int32"),
                   "t_img": t["image"]}

    return gen(), src, tgt


def export_translator(state, weight_dir):
    import jax

    from ..models.convert_translator import (
        decoder_to_torch,
        discriminator_to_torch,
        encoder_to_torch,
    )

    p = jax.tree_util.tree_map(np.asarray, state.params)
    export_role_keyed(weight_dir, {
        "enc_s": encoder_to_torch(p["enc_s"]),
        "enc_t": encoder_to_torch(p["enc_t"]),
        "dec_s2t": decoder_to_torch(p["dec_s2t"]),
        "dec_t2s": decoder_to_torch(p["dec_t2s"]),
        "dis_s2t": discriminator_to_torch(p["dis_s2t"]),
        "dis_t2s": discriminator_to_torch(p["dis_t2s"]),
    })


if __name__ == "__main__":
    main()
