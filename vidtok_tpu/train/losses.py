"""Training losses: L1 + LPIPS + PatchGAN with adaptive weight + LeCAM.

Functional port of the semantics of reference vidtok/modules/losses.py
(GeneralLPIPSWithDiscriminator, :73-262), restructured for JAX:

* optimizer_idx dispatch becomes two pure functions ``generator_loss`` /
  ``discriminator_loss`` used inside one jitted train step.
* the adaptive discriminator weight — torch autograd.grad of nll/g_loss
  w.r.t. the decoder's last-layer weight (losses.py:137-148) — becomes two
  ``jax.grad`` calls through a closure that re-applies only the final conv
  to the (stop-gradient) pre-features. XLA CSEs the duplicated loss
  subgraphs, so the extra cost is two small backward passes through the
  loss heads, same as torch's retain_graph trick.
* LeCAM's EMA of discriminator logits (losses.py:54-70) lives in the train
  state as two scalars instead of host-side floats.

All image tensors here are channels-last video [B, T, H, W, C] in [-1,1].
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..modules.discriminator import NLayerDiscriminator, NLayerDiscriminator3D
from ..modules.lpips import LPIPS


class LossConfig(NamedTuple):
    disc_start: int = 20001
    logvar_init: float = 0.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    disc_type: str = "3d"
    use_actnorm: bool = False
    perceptual_weight: float = 1.0
    lecam_loss_weight: float = 0.0
    disc_loss: str = "hinge"
    learn_logvar: bool = False
    gen_loss_cross_entropy: bool = False
    regularization_weights: Optional[Dict[str, float]] = None
    # reference global_step counts both optimizer steps per batch (Lightning
    # manual optimization); our `step` counts batches -> gate on 2*step.
    step_scale: int = 2
    # rematerialize the VGG trunk in the backward pass (exact math, frees
    # the LPIPS tap activations — the largest single block of train-step
    # HBM at 256p). Off only for ablation.
    lpips_remat: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "LossConfig":
        d = dict(d or {})
        d.pop("dims", None)  # we are always video
        d.pop("scale_input_to_tgt_size", None)
        known = cls._fields
        return cls(**{k: v for k, v in d.items() if k in known})


def make_discriminator(cfg: LossConfig):
    if cfg.disc_type == "2d":
        return NLayerDiscriminator(input_nc=cfg.disc_in_channels,
                                   n_layers=cfg.disc_num_layers,
                                   use_actnorm=cfg.use_actnorm)
    return NLayerDiscriminator3D(input_nc=cfg.disc_in_channels,
                                 n_layers=cfg.disc_num_layers,
                                 use_actnorm=cfg.use_actnorm)


def _fold_frames(x):
    """[B,T,H,W,C] -> [B*T,H,W,C]."""
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:])


def _apply_disc(disc, d_vars, x, use_batch_stats, cfg: LossConfig,
                compute_dtype=None):
    """Run the discriminator; 2d variant folds frames first.

    ``use_batch_stats=True`` mirrors torch train-mode BatchNorm (batch
    statistics; the reference keeps the discriminator in train mode for the
    generator pass too). ``compute_dtype`` casts the input for bf16-mixed
    training (the caller casts d_vars); logits always return fp32 so the
    GAN loss arithmetic is precision-stable. Returns
    (logits, updated_batch_stats | None)."""
    inp = _fold_frames(x) if cfg.disc_type == "2d" else x
    if compute_dtype is not None:
        inp = inp.astype(compute_dtype)
    if use_batch_stats:
        out, updated = disc.apply(d_vars, inp, train=True,
                                  mutable=["batch_stats"])
        return out.astype(jnp.float32), updated["batch_stats"]
    return disc.apply(d_vars, inp, train=False).astype(jnp.float32), None


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def non_saturate_gen_loss(logits_fake):
    """Per-sample mean logit -> BCE toward 'real' (reference :43-51)."""
    b = logits_fake.shape[0]
    lf = jnp.mean(logits_fake.reshape(b, -1), axis=-1)
    # sigmoid cross entropy with labels=1: softplus(-x)
    return jnp.mean(jax.nn.softplus(-lf))


def adopt_weight(weight, global_step, threshold):
    return jnp.where(global_step < threshold, 0.0, weight)


def lecam_reg(logits_real, logits_fake, ema_real, ema_fake):
    return (jnp.mean(jnp.square(jax.nn.relu(logits_real - ema_fake)))
            + jnp.mean(jnp.square(jax.nn.relu(ema_real - logits_fake))))


def perceptual_loss(lpips: LPIPS, lpips_params, x_frames, y_frames):
    """Per-frame LPIPS, broadcast back over pixels (reference adds p_loss to
    the elementwise rec_loss, losses.py:174-176)."""
    return lpips.apply({"params": lpips_params}, x_frames, y_frames)


def generator_loss(
    *, cfg: LossConfig, lpips: LPIPS, lpips_params, disc, disc_vars,
    last_layer_params, apply_last_layer, logvar, x, xrec, pre_features,
    reg_log, global_step, split="train", compute_dtype=None,
):
    """Returns (loss, logs, new_batch_stats).

    ``pre_features`` are the decoder's pre-last-layer activations and
    ``apply_last_layer(last_layer_params, pre) -> xrec`` re-applies only the
    final projection — the closure the adaptive weight differentiates
    (reference losses.py:137-148 takes autograd.grad w.r.t. the last-layer
    weight only).

    ``new_batch_stats`` is the discriminator's BN running stats after the
    generator pass (the reference keeps the discriminator in train mode
    there, so its running stats update on the fake batch); the adaptive-
    weight closure's extra disc application does NOT update stats (the
    reference reuses the main pass's graph for those grads)."""
    xf = _fold_frames(x)
    rf = _fold_frames(xrec)

    def _ploss(a, b):
        """LPIPS in the compute dtype (VGG is conv-heavy), fp32 result.
        ``lpips_remat`` recomputes the trunk in the backward pass instead
        of keeping five tap activations live per frame."""
        if compute_dtype is not None:
            a, b = a.astype(compute_dtype), b.astype(compute_dtype)
        fn = lambda u, v: perceptual_loss(lpips, lpips_params, u, v)
        if cfg.lpips_remat:
            fn = jax.checkpoint(fn)
        return fn(a, b).astype(jnp.float32)

    rec = jnp.abs(xf.astype(jnp.float32) - rf.astype(jnp.float32))
    if cfg.perceptual_weight > 0:
        p = _ploss(xf, rf)
        rec = rec + cfg.perceptual_weight * p
        p_mean = jnp.mean(p)
    else:
        p_mean = jnp.float32(0.0)

    nll = rec / jnp.exp(logvar) + logvar
    nll_loss = jnp.sum(nll) / nll.shape[0]
    weighted_nll = nll_loss

    logits_fake, new_bs = _apply_disc(disc, disc_vars, xrec, True, cfg,
                                      compute_dtype)
    if new_bs is not None:
        new_bs = jax.lax.stop_gradient(new_bs)
    if cfg.gen_loss_cross_entropy:
        g_loss = non_saturate_gen_loss(logits_fake)
    else:
        g_loss = -jnp.mean(logits_fake)

    lightning_step = global_step * cfg.step_scale
    disc_factor = adopt_weight(cfg.disc_factor, lightning_step, cfg.disc_start)

    # ---- adaptive weight (reference losses.py:137-148) -------------------
    # Chain rule split: d loss/d W_conv_out = conv_vjp(d loss/d xrec).
    # Taking the xrec-cotangent first lets XLA CSE the loss FORWARD passes
    # with the main nll/g_loss computation above (same expressions on the
    # same xrec), so the adaptive weight costs one LPIPS vjp + one disc
    # vjp + one (linear) conv_out vjp — the same work torch's
    # retain_graph backward does (the previous formulation re-ran the
    # LPIPS and disc forwards from pre_features).
    if cfg.disc_factor > 0.0:
        pre_sg = jax.lax.stop_gradient(pre_features)

        def apply_k(cop):
            xr = apply_last_layer(cop, pre_sg)
            if xr.shape[1] != x.shape[1]:
                xr = xr[:, -x.shape[1]:]
            return xr

        def nll_of_xr(xr):
            xrf = _fold_frames(xr)
            r = jnp.abs(xf.astype(jnp.float32) - xrf.astype(jnp.float32))
            if cfg.perceptual_weight > 0:
                r = r + cfg.perceptual_weight * _ploss(xf, xrf)
            n = r / jnp.exp(logvar) + logvar
            return jnp.sum(n) / n.shape[0]

        def g_of_xr(xr):
            lf, _ = _apply_disc(disc, disc_vars, xr, True, cfg, compute_dtype)
            if cfg.gen_loss_cross_entropy:
                return non_saturate_gen_loss(lf)
            return -jnp.mean(lf)

        xr0 = jax.lax.stop_gradient(xrec)
        g_nll = jax.grad(nll_of_xr)(xr0)
        g_gan = jax.grad(g_of_xr)(xr0)
        _, kvjp = jax.vjp(apply_k, last_layer_params)
        nll_grads = kvjp(g_nll.astype(xr0.dtype))[0]["kernel"]
        g_grads = kvjp(g_gan.astype(xr0.dtype))[0]["kernel"]
        d_weight = jnp.linalg.norm(
            nll_grads.astype(jnp.float32).reshape(-1)) / (
            jnp.linalg.norm(g_grads.astype(jnp.float32).reshape(-1)) + 1e-4)
        d_weight = jnp.clip(d_weight, 0.0, 1e4)
        d_weight = jax.lax.stop_gradient(d_weight) * cfg.disc_weight
    else:
        d_weight = jnp.float32(0.0)

    loss = weighted_nll + d_weight * disc_factor * g_loss

    logs = {
        f"{split}/total_loss": loss,
        f"{split}/logvar": logvar,
        f"{split}/nll_loss": nll_loss,
        f"{split}/rec_loss": jnp.mean(rec),
        f"{split}/p_loss": p_mean,
        f"{split}/d_weight": d_weight,
        f"{split}/disc_factor": disc_factor,
        f"{split}/g_loss": g_loss,
    }
    rw = cfg.regularization_weights or {}
    for k, w in rw.items():
        if k in reg_log:
            loss = loss + w * reg_log[k].astype(jnp.float32)
            logs[f"{split}/{k}"] = reg_log[k].astype(jnp.float32)
    logs[f"{split}/total_loss"] = loss
    return loss, logs, new_bs


def discriminator_loss(
    *, cfg: LossConfig, disc, disc_vars, x, xrec, global_step,
    lecam_ema_real, lecam_ema_fake, split="train", compute_dtype=None,
):
    """Returns (d_loss, logs, new_batch_stats, new_lecam_emas)."""
    x = jax.lax.stop_gradient(x)
    xrec = jax.lax.stop_gradient(xrec)
    logits_real, bs1 = _apply_disc(disc, disc_vars, x, True, cfg,
                                   compute_dtype)
    if bs1 is not None:
        disc_vars = {**disc_vars, "batch_stats": bs1}
    logits_fake, bs2 = _apply_disc(disc, disc_vars, xrec, True, cfg,
                                   compute_dtype)
    new_bs = bs2 if bs2 is not None else disc_vars.get("batch_stats")

    lightning_step = global_step * cfg.step_scale
    disc_factor = adopt_weight(cfg.disc_factor, lightning_step, cfg.disc_start)

    loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    non_sat = loss_fn(logits_real, logits_fake)

    if cfg.lecam_loss_weight > 0:
        decay = 0.999
        new_real = lecam_ema_real * decay + jnp.mean(logits_real) * (1 - decay)
        new_fake = lecam_ema_fake * decay + jnp.mean(logits_fake) * (1 - decay)
        lecam = lecam_reg(logits_real, logits_fake,
                          jax.lax.stop_gradient(new_real),
                          jax.lax.stop_gradient(new_fake))
        d_loss = disc_factor * (lecam * cfg.lecam_loss_weight + non_sat)
    else:
        new_real, new_fake = lecam_ema_real, lecam_ema_fake
        lecam = jnp.float32(0.0)
        d_loss = disc_factor * non_sat

    logs = {
        f"{split}/disc_loss": d_loss,
        f"{split}/logits_real": jnp.mean(logits_real),
        f"{split}/logits_fake": jnp.mean(logits_fake),
        f"{split}/disc_factor": disc_factor,
        f"{split}/non_saturated_d_loss": non_sat,
        f"{split}/lecam_loss": lecam,
    }
    return d_loss, logs, new_bs, (new_real, new_fake)
