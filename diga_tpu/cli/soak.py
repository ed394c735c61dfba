"""Long-horizon convergence soak (VERDICT r1 #10).

Two modes:

  fixtures (default) — CLI-driven training on synthetic image fixtures
      through the REAL harness (loaders -> jitted step -> periodic eval ->
      checkpoints), asserting (a) the trailing-window loss mean improves
      over the leading window, (b) val mIoU at the end >= at the start,
      and (c) an exact checkpoint-resume mid-run continues bit-for-bit.
      Runs at production scale by default; --tiny shrinks the model/crop
      for CPU CI.

  onchip — device-generated batches (host->device over the axon tunnel is
      ~14 MB/s, a tunnel artifact) with image-derived labels so the task
      is learnable; production scale; asserts finite + decreasing loss.
      This is the promoted _soak.py from round 1.

Artifacts: <work_dir>/metrics.jsonl + <work_dir>/curves.png (the recorded
loss/mIoU curve).

Usage:
  python -m diga_tpu.cli.soak --preset gta2city_warmup --steps 2000 \
      --work_dir work/soak [--tiny] [--mode onchip]
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from .common import base_parser, get_config


def main(argv=None):
    p = base_parser("DiGA-TPU convergence soak")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--mode", choices=["fixtures", "onchip"], default="fixtures")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + crop (CPU-runnable CI configuration)")
    p.add_argument("--resume_at", type=int, default=None,
                   help="simulate a failure: checkpoint + rebuild + exact "
                        "resume at this step (default: steps // 2)")
    args = p.parse_args(argv)
    from ..configs.presets import get_preset

    if args.mode == "onchip":
        return soak_onchip(args)
    if get_preset(args.preset).stage == "translator":
        return soak_translator(args)
    return soak_fixtures(args)


def soak_fixtures(args):
    import jax

    from ..configs import presets
    from ..data import synthetic
    from ..train.build import build_experiment
    from ..train.loop import run_training
    from ..utils.checkpoint import restore_train_state, save_train_state

    cfg = get_config(args)
    work = args.work_dir
    os.makedirs(work, exist_ok=True)

    # self-contained: generate fixtures unless real lists were passed
    if not (cfg.data.source_list and os.path.exists(cfg.data.source_list)):
        fh, fw = (48, 96) if args.tiny else (96, 160)
        root = os.path.join(work, "data")
        gta_list = synthetic.make_gta5_fixture(
            os.path.join(root, "gta"), n=8, h=fh, w=fw)
        img_list, lbl_list = synthetic.make_cityscapes_fixture(
            os.path.join(root, "city"), n=6, h=fh, w=fw, split="train")
        val_img, val_lbl = synthetic.make_cityscapes_fixture(
            os.path.join(root, "city"), n=4, h=fh, w=fw, split="val")
        # self-training presets additionally need pseudo-label triples
        # (reference-format palette PNGs) — the consensus/centroid path
        # then runs end to end on fixtures
        pseudo_dir = cfg.data.pseudo_dir
        if cfg.stage == "selftrain":
            pseudo_dir = synthetic.make_pseudo_fixture(
                os.path.join(root, "city"), img_list, fh, fw)
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data,
            source_root=os.path.join(root, "gta"),
            target_root=os.path.join(root, "city"),
            source_list=gta_list, target_img_list=img_list,
            target_lbl_list=lbl_list, val_img_list=val_img,
            val_lbl_list=val_lbl, pseudo_dir=pseudo_dir,
            source_streams=tuple(dataclasses.replace(s, resize_hw=(fh, fw))
                                 for s in cfg.data.source_streams),
            target_streams=tuple(dataclasses.replace(s, resize_hw=(fh, fw))
                                 for s in cfg.data.target_streams),
        ))
        cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
            cfg.eval, out_hw=(fh, fw), ds_hw=(fh // 2, fw // 2)))
        if args.tiny:
            cfg = dataclasses.replace(
                cfg,
                train=dataclasses.replace(cfg.train, crop_hw=(32, 64),
                                          compute_dtype="float32", remat=False),
                extra={**cfg.extra, "layers": (1, 1, 1, 1)},
            )
        else:
            cfg = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, crop_hw=(64, 128)))

    eval_every = max(args.steps // 4, 1)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, num_steps=args.steps, eval_every=eval_every))

    resume_at = args.resume_at if args.resume_at is not None else args.steps // 2
    ckpt = os.path.join(work, "ckpt_soak")
    # scale the metric cadence to the budget: the head/tail window
    # assertion needs >=~10 samples in phase 2 alone (steps - resume_at
    # iterations); a fixed cadence starved short CI runs down to ONE
    # sample, making head == tail vacuously
    log_every = max(1, (args.steps - resume_at) // 20)

    # ---- phase 1: run to resume_at, checkpoint, throw the state away ----
    state, step, eval_apply, _ = build_experiment(cfg)
    result1, state = run_training(
        cfg, state, step, eval_apply, work_dir=os.path.join(work, "phase1"),
        num_steps=resume_at, eval_limit=4, log_every=log_every)
    save_train_state(ckpt, state)
    mid_loss = result1.last_metrics["loss"]

    # ---- phase 2: exact restore, run to completion.  The compiled step is
    # REUSED: re-jitting the whole experiment in the same long process is
    # the known XLA-CPU compile-ballooning pathology (NOTES_r1.md); the
    # cold-process restore path is covered by test_checkpoint / the CLI
    # --resume test, while this asserts the restored state continues the
    # schedule exactly (step counter, loss continuity).
    state2 = restore_train_state(ckpt, jax.tree_util.tree_map(lambda x: x, state))
    assert int(state2.step) == resume_at, (int(state2.step), resume_at)
    result2, state2 = run_training(
        cfg, state2, step, eval_apply, work_dir=work,
        num_steps=args.steps, eval_limit=4, log_every=log_every)

    # ---- assertions over the recorded trajectory ----
    head, tail = _loss_windows(os.path.join(work, "metrics.jsonl"))
    print(f"soak: loss window means head={head:.4f} tail={tail:.4f} "
          f"(mid-run resume at {resume_at}: loss {mid_loss:.4f})")
    assert np.isfinite(tail), "non-finite trailing loss"
    assert tail < head, f"loss did not decrease: head {head:.4f} -> tail {tail:.4f}"
    mious = _series(os.path.join(work, "metrics.jsonl"), "val/miou")
    m0, m1 = mious[0], result2.best_miou
    print(f"soak: mIoU first={m0:.4f} best={m1:.4f}")
    assert m1 >= m0, f"val mIoU degraded: {m0:.4f} -> {m1:.4f}"
    print(f"soak ok: {args.steps} steps, curves (loss.png, val_miou.png) in {work}")
    return {"head": head, "tail": tail, "first_miou": m0, "best_miou": m1}


def soak_translator(args):
    """Long-horizon GAN soak (VERDICT r3 #3): run the translator stage on
    fixtures through the SHIPPED builder (build_translator_experiment),
    asserting (a) every D/G loss stays finite and bounded, (b) the
    self-reconstruction L1 decreases (the GAN's non-adversarial anchor —
    adversarial terms oscillate by design), and (c) a mid-run role-keyed
    export -> converter reload -> continue round-trip works.  Reference
    budget: 50k steps (train_domain_translator.py:78-83); fixture-scale
    runs use --steps with --tiny module sizes."""
    from ..data import synthetic
    from .train_domain_translator import (
        build_translator_experiment,
        export_translator,
        make_train_iterator_translator,
    )

    cfg = get_config(args)
    work = args.work_dir
    os.makedirs(work, exist_ok=True)

    if not (cfg.data.source_list and os.path.exists(cfg.data.source_list)):
        fh, fw = (48, 96) if args.tiny else (96, 160)
        root = os.path.join(work, "data")
        gta_list = synthetic.make_gta5_fixture(os.path.join(root, "gta"),
                                               n=8, h=fh, w=fw)
        img_list, lbl_list = synthetic.make_cityscapes_fixture(
            os.path.join(root, "city"), n=6, h=fh, w=fw, split="train")
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data,
            source_root=os.path.join(root, "gta"),
            target_root=os.path.join(root, "city"),
            source_list=gta_list, target_img_list=img_list,
            target_lbl_list=lbl_list,
            source_streams=tuple(dataclasses.replace(s, resize_hw=(fh, fw))
                                 for s in cfg.data.source_streams),
            target_streams=tuple(dataclasses.replace(s, resize_hw=(fh, fw))
                                 for s in cfg.data.target_streams),
        ))
        if args.tiny:
            cfg = dataclasses.replace(
                cfg,
                train=dataclasses.replace(cfg.train, crop_hw=(32, 64),
                                          compute_dtype="float32"),
                extra={**cfg.extra, "enc_dim": 8, "dec_dim": 32, "n_res": 1,
                       "dis_dim": 8, "dis_layers": 2, "dis_scales": 2},
            )
        else:
            cfg = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, crop_hw=(64, 128)))

    _, state, step = build_translator_experiment(cfg, num_steps=args.steps)
    it, src, tgt = make_train_iterator_translator(cfg)

    resume_at = args.resume_at if args.resume_at is not None else args.steps // 2
    weight_dir = os.path.join(work, "weights_mid")
    log_path = os.path.join(work, "metrics.jsonl")
    log = open(log_path, "w")
    self_losses, d_losses, g_losses = [], [], []
    try:
        for i in range(args.steps):
            batch = next(it)
            state, m = step(state, batch)
            rec = {k: float(v) for k, v in m.items()}
            for v in rec.values():
                assert np.isfinite(v), f"non-finite metric at step {i}: {rec}"
            self_losses.append(rec["loss_self"])
            d_losses.append(max(rec["loss_d_s2t"], rec["loss_d_t2s"]))
            g_losses.append(rec["loss_g"])
            if i % 25 == 0:
                log.write(json.dumps({"step": i, **rec}) + "\n")
                log.flush()
            if i == resume_at:
                # mid-run role-keyed export -> converter reload -> continue:
                # the stage-chaining path warm-up consumes (enc_s/dec_s2t)
                export_translator(state, weight_dir)
                state = _reload_translator_params(state, weight_dir, cfg)
    finally:
        src.stop()
        tgt.stop()
        log.close()

    k = max(len(self_losses) // 5, 1)
    head = float(np.mean(self_losses[:k]))
    tail = float(np.mean(self_losses[-k:]))
    d_max = float(np.max(d_losses))
    print(f"translator soak: self-recon L1 head={head:.4f} tail={tail:.4f}, "
          f"max D loss={d_max:.4f}, final G loss={g_losses[-1]:.4f}")
    assert tail < head, f"self-recon did not improve: {head:.4f} -> {tail:.4f}"
    # LSGAN D loss is bounded by construction near init (real/fake scored
    # ~0 -> loss ~1); a diverged D saturates toward (1-(-big))^2.  4.0 is
    # far above any healthy trajectory at this scale.
    assert d_max < 4.0, f"D loss diverged: {d_max}"
    print(f"translator soak ok: {args.steps} steps "
          f"(export/reload/continue at {resume_at}); metrics in {log_path}")
    return {"head": head, "tail": tail, "d_max": d_max}


def _reload_translator_params(state, weight_dir, cfg):
    """Role-keyed .pth -> converters -> fresh param tree (optimizer state
    kept: the reference's reload path also only restores weights)."""
    import jax

    from ..models.convert import load_torch_state_dict
    from ..models.convert_translator import (
        decoder_from_torch,
        discriminator_from_torch,
        encoder_from_torch,
    )

    nd = cfg.extra.get("n_downsample", 2)
    nr = cfg.extra.get("n_res", 4)
    nl = cfg.extra.get("dis_layers", 4)
    ns = cfg.extra.get("dis_scales", 3)
    sd = {role: load_torch_state_dict(os.path.join(weight_dir, role + ".pth"))
          for role in ("enc_s", "enc_t", "dec_s2t", "dec_t2s",
                       "dis_s2t", "dis_t2s")}
    params = {
        "enc_s": encoder_from_torch(sd["enc_s"], n_downsample=nd, n_res=nr),
        "enc_t": encoder_from_torch(sd["enc_t"], n_downsample=nd, n_res=nr),
        "dec_s2t": decoder_from_torch(sd["dec_s2t"], n_upsample=nd, n_res=nr),
        "dec_t2s": decoder_from_torch(sd["dec_t2s"], n_upsample=nd, n_res=nr),
        "dis_s2t": discriminator_from_torch(sd["dis_s2t"], num_scales=ns, n_layer=nl),
        "dis_t2s": discriminator_from_torch(sd["dis_t2s"], num_scales=ns, n_layer=nl),
    }
    # exact round-trip check before continuing
    for role in params:
        for a, b in zip(jax.tree_util.tree_leaves(state.params[role]),
                        jax.tree_util.tree_leaves(params[role])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return state.replace(params=params)


def _series(metrics_path, key):
    vals = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                vals.append(rec[key])
    assert vals, f"no '{key}' entries recorded in {metrics_path}"
    return vals


def _loss_windows(metrics_path, frac=0.2):
    losses = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                losses.append(rec["loss"])
    k = max(int(len(losses) * frac), 1)
    return float(np.mean(losses[:k])), float(np.mean(losses[-k:]))


def soak_onchip(args):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import time

    from ..train.build import build_experiment, wants_target

    # the soak runs the SAME program the CLI/bench run: the preset is the
    # benched config (VERDICT r3 #1)
    cfg = get_config(args)
    if cfg.stage == "translator":
        return _soak_onchip_translator(args, cfg)
    state, step, _, _ = build_experiment(cfg)
    batch_n = sum(s.batch for s in cfg.data.source_streams)
    batch_t = sum(s.batch for s in cfg.data.target_streams)
    with_target = wants_target(cfg)
    crop = cfg.train.crop_hw
    ncls = cfg.train.num_classes
    selftrain = cfg.stage == "selftrain"

    @jax.jit
    def make_batch(i):
        k, kt = jax.random.split(jax.random.PRNGKey(i))
        img = 0.5 * jax.random.normal(k, (batch_n, *crop, 3), jnp.float32)
        bands = jnp.clip((img.mean(-1) * 8 + ncls / 2).astype(jnp.int32),
                         0, ncls - 1)
        batch = {"s_img": img, "s_lbl": bands}
        if with_target:
            t_img = 0.5 * jax.random.normal(kt, (batch_t, *crop, 3), jnp.float32)
            batch["t_img"] = t_img
        if selftrain:
            # banded pseudo labels with ~10% ignore, like real dumps
            tp = jnp.clip((t_img.mean(-1) * 8 + ncls / 2).astype(jnp.int32),
                          0, ncls - 1)
            batch["t_pseudo"] = jnp.where(t_img[..., 0] > 0.64, 255, tp)
        return batch

    os.makedirs(args.work_dir, exist_ok=True)
    log = open(os.path.join(args.work_dir, "soak_onchip.jsonl"), "w")
    state, m = step(state, make_batch(0))
    first = float(m["loss"])
    print(f"step 0: loss={first:.4f}", flush=True)
    t0 = time.perf_counter()
    last = first
    for i in range(1, args.steps):
        state, m = step(state, make_batch(i))
        if i % 100 == 0 or i == args.steps - 1:
            last = float(m["loss"])
            assert np.isfinite(last), f"non-finite loss at step {i}"
            rate = batch_n * i / (time.perf_counter() - t0)
            print(f"step {i}: loss={last:.4f} ({rate:.2f} imgs/s sustained)",
                  flush=True)
            log.write(json.dumps({"step": i, "loss": last,
                                  "imgs_per_sec": rate}) + "\n")
    log.close()
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"
    print(f"soak ok: {args.steps} steps, {first:.4f} -> {last:.4f}")
    return {"first": first, "last": last}


def _soak_onchip_translator(args, cfg):
    """Production-scale on-chip GAN soak: the exact shipped translator
    program (single-pass vjp-shared step, 6 Adams) on synthetic batches;
    asserts the same health invariants as the fixture soak."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import time

    from .train_domain_translator import build_translator_experiment

    _, state, step = build_translator_experiment(cfg, num_steps=args.steps)
    batch_n = sum(s.batch for s in cfg.data.source_streams)
    batch_t = sum(s.batch for s in cfg.data.target_streams)
    crop = cfg.train.crop_hw
    ncls = cfg.train.num_classes

    @jax.jit
    def make_batch(i):
        k, kt = jax.random.split(jax.random.PRNGKey(i))
        img = 0.5 * jax.random.normal(k, (batch_n, *crop, 3), jnp.float32)
        bands = jnp.clip((img.mean(-1) * 8 + ncls / 2).astype(jnp.int32),
                         0, ncls - 1)
        t_img = 0.5 * jax.random.normal(kt, (batch_t, *crop, 3), jnp.float32)
        return {"s_img": img, "s_lbl": bands, "t_img": t_img}

    os.makedirs(args.work_dir, exist_ok=True)
    log = open(os.path.join(args.work_dir, "soak_onchip_translator.jsonl"), "w")
    self_losses, d_max, g_last = [], 0.0, 0.0
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, make_batch(i))
        if i % 25 == 0 or i == args.steps - 1:
            rec = {k: float(v) for k, v in m.items()}
            for v in rec.values():
                assert np.isfinite(v), f"non-finite metric at step {i}: {rec}"
            self_losses.append(rec["loss_self"])
            d_max = max(d_max, rec["loss_d_s2t"], rec["loss_d_t2s"])
            g_last = rec["loss_g"]
            rate = batch_n * (i + 1) / (time.perf_counter() - t0)
            log.write(json.dumps({"step": i, **rec,
                                  "imgs_per_sec": rate}) + "\n")
            log.flush()
            if i % 100 == 0:
                print(f"step {i}: self={rec['loss_self']:.4f} "
                      f"g={rec['loss_g']:.4f} dmax={d_max:.4f} "
                      f"({rate:.2f} imgs/s)", flush=True)
    log.close()
    k = max(len(self_losses) // 5, 1)
    head, tail = float(np.mean(self_losses[:k])), float(np.mean(self_losses[-k:]))
    assert tail < head, f"self-recon did not improve: {head:.4f} -> {tail:.4f}"
    assert d_max < 4.0, f"D loss diverged: {d_max}"
    print(f"translator onchip soak ok: {args.steps} steps, self-recon "
          f"{head:.4f} -> {tail:.4f}, max D {d_max:.4f}, final G {g_last:.4f}")
    return {"head": head, "tail": tail, "d_max": d_max}


if __name__ == "__main__":
    main()
