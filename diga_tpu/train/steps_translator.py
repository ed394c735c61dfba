"""Compiled CycleGAN-style translator train step.

One jitted program per iteration, faithful to the reference's update
order (train_domain_translator.py:240-337): forward both directions, take
the discriminator gradient step FIRST (on detached fakes), then the
generator step against the UPDATED discriminators.  Six Adam(0.5, 0.999)
optimizers with poly-decayed LR (reference :149-155,210-212).

G loss = 0.5*adv + 10*cycle + 20*seg_edge + 0.1*perceptual + 0.001*self
(reference :320-325); the perceptual term needs pretrained VGG19 weights
and is skipped when lambda_percep == 0 (see models/vgg.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import losses as L


@dataclasses.dataclass(frozen=True)
class TranslatorConfig:
    lambda_adv: float = 0.5
    lambda_cyc: float = 10.0
    lambda_seg_edge: float = 20.0
    lambda_percep: float = 0.1
    lambda_self: float = 0.001
    # rematerialize each enc/dec/dis apply in the generator backward.
    # None = auto: off unless the VGG perceptual term is active.  The
    # round-1 measurement (G residuals 19.4 GB at 512x896) predates the
    # subpixel decoder and the single-pass vjp-shared forward; with both,
    # the no-remat step fits 15.75 GB HBM and runs 966 -> 764 ms/step.
    # The VGG19 forwards add full-res residual stacks back, so auto
    # re-enables remat when lambda_percep > 0 with a vgg_apply.
    remat: bool | None = None
    # single-pass step: compute the generator fakes ONCE via jax.vjp and
    # reuse them for the D update (detached) and the G update (through
    # the saved vjp), instead of the reference's two full generator
    # forwards; also batch each discriminator's real+fake applies and
    # each decoder's two same-param applies into one call.  EXACT: the
    # translator has no batch-coupled op (InstanceNorm is per-sample,
    # the PatchGAN has no norm), and the update order — D first on
    # detached fakes, G against the UPDATED D — is unchanged
    # (train_domain_translator.py:240-337).
    fuse: bool = True


@flax.struct.dataclass
class TranslatorState:
    step: jnp.ndarray
    params: Any          # {enc_s, enc_t, dec_s2t, dec_t2s, dis_s2t, dis_t2s}
    opt_state: Any       # same keys
    rng: jax.Array
    vgg_params: Any = None


def create_translator_state(modules: dict, optimizer, rng, crop_hw,
                            vgg_params=None) -> TranslatorState:
    k_init, k_state = jax.random.split(rng)
    x = jnp.zeros((1, *crop_hw, 3), jnp.float32)
    enc_p = modules["enc_s"].init(k_init, x)["params"]
    z = modules["enc_s"].apply({"params": enc_p}, x)
    params = {
        "enc_s": enc_p,
        "enc_t": modules["enc_t"].init(k_init, x)["params"],
        "dec_s2t": modules["dec_s2t"].init(k_init, z)["params"],
        "dec_t2s": modules["dec_t2s"].init(k_init, z)["params"],
        "dis_s2t": modules["dis_s2t"].init(k_init, x)["params"],
        "dis_t2s": modules["dis_t2s"].init(k_init, x)["params"],
    }
    opt_state = {k: optimizer.init(v) for k, v in params.items()}
    return TranslatorState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state, rng=k_state, vgg_params=vgg_params)


def build_translator_step(modules: dict, optimizer, cfg: TranslatorConfig,
                          vgg_apply: Callable | None = None):
    enc_s_m, enc_t_m = modules["enc_s"], modules["enc_t"]
    dec_s2t_m, dec_t2s_m = modules["dec_s2t"], modules["dec_t2s"]
    dis_s2t_m, dis_t2s_m = modules["dis_s2t"], modules["dis_t2s"]

    do_remat = (cfg.remat if cfg.remat is not None
                else (vgg_apply is not None and cfg.lambda_percep > 0))

    def apply(m, p, x):
        fn = lambda p, x: m.apply({"params": p}, x)
        if do_remat:
            fn = jax.checkpoint(fn)
        return fn(p, x)

    gen_keys = ("enc_s", "enc_t", "dec_s2t", "dec_t2s")

    def _g_losses(r_s2t, r_t2s, r_s, r_t, r_s_cyc, r_t_cyc,
                  s_img, s_lbl, t_img, dis_params, vgg_params):
        loss_self = L.l1_loss(r_s, s_img) + L.l1_loss(r_t, t_img)
        loss_cyc = L.l1_loss(r_s_cyc, s_img) + L.l1_loss(r_t_cyc, t_img)
        loss_edge = L.seg_edge_loss(r_s2t, s_img, s_lbl)
        loss_adv = (
            L.lsgan_g_loss(apply(dis_s2t_m, jax.lax.stop_gradient(dis_params["dis_s2t"]), r_s2t))
            + L.lsgan_g_loss(apply(dis_t2s_m, jax.lax.stop_gradient(dis_params["dis_t2s"]), r_t2s))
        )
        total = (cfg.lambda_adv * loss_adv + cfg.lambda_cyc * loss_cyc
                 + cfg.lambda_seg_edge * loss_edge + cfg.lambda_self * loss_self)
        if cfg.lambda_percep > 0 and vgg_apply is not None:
            from ..models.vgg import vgg_perceptual_loss

            va = lambda x: vgg_apply(vgg_params, x)
            total = total + cfg.lambda_percep * (
                vgg_perceptual_loss(va, r_s2t, s_img)
                + vgg_perceptual_loss(va, r_t2s, t_img)
            )
        aux = {"loss_adv": loss_adv, "loss_cyc": loss_cyc,
               "loss_edge": loss_edge, "loss_self": loss_self}
        return total, aux

    def step(state: TranslatorState, batch: dict):
        if cfg.fuse:
            return _step_fused(state, batch)
        return _step_reference(state, batch)

    def _update(new_p, new_opt, opt_ref, key, g):
        upd, new_opt[key] = optimizer.update(g, opt_ref[key], new_p[key])
        new_p[key] = jax.tree_util.tree_map(lambda a, b: a + b, new_p[key], upd)

    def _step_fused(state: TranslatorState, batch: dict):
        s_img, s_lbl, t_img = batch["s_img"], batch["s_lbl"], batch["t_img"]
        p = state.params
        ns, nt = s_img.shape[0], t_img.shape[0]

        # ---- ONE generator forward, residuals saved for the G update ----
        def gen_fwd(gp):
            fs = apply(enc_s_m, gp["enc_s"], s_img)
            ft = apply(enc_t_m, gp["enc_t"], t_img)
            # dec_s2t on [fs;ft] -> [translated source; self-recon target]
            d1 = apply(dec_s2t_m, gp["dec_s2t"], jnp.concatenate([fs, ft], 0))
            r_s2t, r_t = d1[:ns], d1[ns:]
            d2 = apply(dec_t2s_m, gp["dec_t2s"], jnp.concatenate([ft, fs], 0))
            r_t2s, r_s = d2[:nt], d2[nt:]
            f_s2t = apply(enc_t_m, gp["enc_t"], r_s2t)   # cycle re-encode
            f_t2s = apply(enc_s_m, gp["enc_s"], r_t2s)
            r_s_cyc = apply(dec_t2s_m, gp["dec_t2s"], f_s2t)
            r_t_cyc = apply(dec_s2t_m, gp["dec_s2t"], f_t2s)
            return (r_s2t, r_t2s, r_s, r_t, r_s_cyc, r_t_cyc)

        gen_params = {k: p[k] for k in gen_keys}
        outs, gen_vjp = jax.vjp(gen_fwd, gen_params)
        r_s2t, r_t2s = jax.lax.stop_gradient(outs[0]), jax.lax.stop_gradient(outs[1])

        # ---- discriminator updates on detached fakes (reference :262-282),
        # real+fake batched into one PatchGAN apply per direction ----
        def d_loss(dp, m, real, fake):
            nr = real.shape[0]
            outs_d = apply(m, dp, jnp.concatenate([real, fake], 0))
            return L.lsgan_d_loss([o[:nr] for o in outs_d],
                                  [o[nr:] for o in outs_d])

        ds2t_loss, g_ds2t = jax.value_and_grad(d_loss)(p["dis_s2t"], dis_s2t_m, t_img, r_s2t)
        dt2s_loss, g_dt2s = jax.value_and_grad(d_loss)(p["dis_t2s"], dis_t2s_m, s_img, r_t2s)

        new_p = dict(p)
        new_opt = dict(state.opt_state)
        _update(new_p, new_opt, state.opt_state, "dis_s2t", g_ds2t)
        _update(new_p, new_opt, state.opt_state, "dis_t2s", g_dt2s)

        # ---- generator update against the UPDATED discriminators, grads
        # pulled back through the saved forward ----
        def g_loss_of_outs(o):
            return _g_losses(*o, s_img, s_lbl, t_img, new_p, state.vgg_params)

        (g_total, aux), out_grads = jax.value_and_grad(
            g_loss_of_outs, has_aux=True)(outs)
        grads = gen_vjp(out_grads)[0]
        for key in gen_keys:
            _update(new_p, new_opt, state.opt_state, key, grads[key])

        metrics = {"loss_g": g_total, "loss_d_s2t": ds2t_loss, "loss_d_t2s": dt2s_loss}
        metrics.update(aux)
        new_state = state.replace(step=state.step + 1, params=new_p,
                                  opt_state=new_opt, rng=state.rng)
        return new_state, metrics

    def _step_reference(state: TranslatorState, batch: dict):
        s_img, s_lbl, t_img = batch["s_img"], batch["s_lbl"], batch["t_img"]
        p = state.params

        # ---- shared forwards for the D step (fakes detached) ----
        feat_s = apply(enc_s_m, p["enc_s"], s_img)
        feat_t = apply(enc_t_m, p["enc_t"], t_img)
        rec_s2t = jax.lax.stop_gradient(apply(dec_s2t_m, p["dec_s2t"], feat_s))
        rec_t2s = jax.lax.stop_gradient(apply(dec_t2s_m, p["dec_t2s"], feat_t))

        # ---- discriminator updates (reference :262-282) ----
        def d_loss(dp, m, real, fake):
            return L.lsgan_d_loss(apply(m, dp, real), apply(m, dp, fake))

        ds2t_loss, g_ds2t = jax.value_and_grad(d_loss)(p["dis_s2t"], dis_s2t_m, t_img, rec_s2t)
        dt2s_loss, g_dt2s = jax.value_and_grad(d_loss)(p["dis_t2s"], dis_t2s_m, s_img, rec_t2s)

        new_p = dict(p)
        new_opt = dict(state.opt_state)
        _update(new_p, new_opt, state.opt_state, "dis_s2t", g_ds2t)
        _update(new_p, new_opt, state.opt_state, "dis_t2s", g_dt2s)

        # ---- generator update against the UPDATED discriminators ----
        def g_loss(gen_params):
            fs = apply(enc_s_m, gen_params["enc_s"], s_img)
            ft = apply(enc_t_m, gen_params["enc_t"], t_img)
            r_s2t = apply(dec_s2t_m, gen_params["dec_s2t"], fs)
            r_t2s = apply(dec_t2s_m, gen_params["dec_t2s"], ft)
            r_s = apply(dec_t2s_m, gen_params["dec_t2s"], fs)   # self-recon
            r_t = apply(dec_s2t_m, gen_params["dec_s2t"], ft)
            f_s2t = apply(enc_t_m, gen_params["enc_t"], r_s2t)  # cycle
            f_t2s = apply(enc_s_m, gen_params["enc_s"], r_t2s)
            r_s_cyc = apply(dec_t2s_m, gen_params["dec_t2s"], f_s2t)
            r_t_cyc = apply(dec_s2t_m, gen_params["dec_s2t"], f_t2s)
            return _g_losses(r_s2t, r_t2s, r_s, r_t, r_s_cyc, r_t_cyc,
                             s_img, s_lbl, t_img, new_p, state.vgg_params)

        gen_params = {k: new_p[k] for k in gen_keys}
        (g_total, aux), grads = jax.value_and_grad(g_loss, has_aux=True)(gen_params)
        for key in gen_keys:
            _update(new_p, new_opt, state.opt_state, key, grads[key])

        metrics = {"loss_g": g_total, "loss_d_s2t": ds2t_loss, "loss_d_t2s": dt2s_loss}
        metrics.update(aux)
        new_state = state.replace(step=state.step + 1, params=new_p,
                                  opt_state=new_opt, rng=state.rng)
        return new_state, metrics

    return step
