"""VidTwin training engine (reference VidAutoEncoderQformerBase
training_step, vidtwin_ae.py:86-137: GAN dual-optimizer with per-step LR
schedules, AdamW (betas (0,0.99)/(0,0.9), weight decay), adaptive disc
weight on the final linear layer, val PSNR/SSIM)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...config import load_config
from ...modules.lpips import LPIPS, init_lpips_params, load_lpips_params
from ...parallel.mesh import make_mesh, replicate, shard_batch
from ...train.losses import (LossConfig, discriminator_loss, generator_loss,
                             make_discriminator)
from ...train.state import TrainState, ema_update
from . import schedules
from .vidtwin_ae import VidTwinVAE, build_vidtwin_from_config


class VidTwinTrainer:
    def __init__(self, config, mesh=None, lpips_weights: Optional[str] = None,
                 seed: int = 23, total_steps: int = 100000):
        cfg = load_config(config)
        self.cfg = cfg
        model_cfg = cfg.get("model", cfg)
        p = model_cfg.get("params", {})
        self.model, self.meta = build_vidtwin_from_config(model_cfg)
        self.loss_cfg = LossConfig.from_dict(
            (p.get("loss_config") or {}).get("params"))
        self.disc = make_discriminator(self.loss_cfg)
        self.lpips = LPIPS()
        base_lr = float(model_cfg.get("base_learning_rate", 1.6e-4))
        self.sched_g = schedules.from_config(p.get("lr_scheduler_config_g"),
                                             base_lr, total_steps)
        self.sched_d = schedules.from_config(p.get("lr_scheduler_config_d"),
                                             base_lr, total_steps)
        opt_cfg = p.get("optimizer_config") or {}
        op = opt_cfg.get("params", {}) or {}
        betas = tuple(op.get("betas", (0.0, 0.99)))
        wd = float(op.get("weight_decay", p.get("weight_decay", 1e-5)))
        self.grad_clip = 20.0

        def make_opt(sched):
            return optax.chain(
                optax.clip_by_global_norm(self.grad_clip),
                optax.adamw(sched, b1=betas[0], b2=betas[1], weight_decay=wd),
            )

        self.opt_g = make_opt(self.sched_g)
        self.opt_d = make_opt(self.sched_d)
        # bf16-mixed: same seam as VidTokTrainer (fp32 master params, bf16
        # forward/backward, fp32 loss arithmetic) — the shipped config's
        # training.precision
        self.precision = str((cfg.get("training", {}) or {})
                             .get("precision", "fp32"))
        self.seed = seed
        self.mesh = mesh if mesh is not None else make_mesh()
        lp = load_lpips_params(lpips_weights) if lpips_weights else load_lpips_params()
        self.lpips_params = lp if lp is not None else init_lpips_params()
        self.lpips_pretrained = lp is not None
        self._train_step = None

    # ------------------------------------------------------------------

    def init_state(self, example_x) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        r_m, r_d, r_s = jax.random.split(rng, 3)
        x = jnp.zeros(example_x.shape, jnp.float32)
        mvars = self.model.init({"params": r_m, "sample": r_s}, x,
                                sample_override=False)
        disc_in = (x.reshape((-1,) + x.shape[2:])
                   if self.loss_cfg.disc_type == "2d" else x)
        dvars = self.disc.init(r_d, disc_in, train=False)
        params_g = {"core": mvars["params"],
                    "logvar": jnp.float32(self.loss_cfg.logvar_init)}
        params_d = dvars["params"]
        return TrainState(
            step=jnp.int32(0), params_g=params_g, params_d=params_d,
            batch_stats_d=dvars.get("batch_stats", {}),
            opt_state_g=self.opt_g.init(params_g),
            opt_state_d=self.opt_d.init(params_d),
            lecam_ema_real=jnp.float32(0.0), lecam_ema_fake=jnp.float32(0.0),
            ema_params=None,
        )

    def build_train_step(self):
        model, disc, lpips = self.model, self.disc, self.lpips
        loss_cfg = self.loss_cfg
        opt_g, opt_d = self.opt_g, self.opt_d
        half = jnp.bfloat16 if self.precision.startswith("bf16") else None

        def hcast(t):
            if half is None:
                return t
            return jax.tree_util.tree_map(
                lambda a: a.astype(half)
                if getattr(a, "dtype", None) == jnp.float32 else a, t)

        def f32cast(t):
            if half is None or t is None:
                return t
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if getattr(a, "dtype", None) == jnp.bfloat16 else a, t)

        def apply_last_layer(linear_params, pre):
            y = pre @ linear_params["kernel"] + linear_params["bias"]
            return model.decoder.unpatchify(y)

        def train_step(state: TrainState, x, lpips_params, rng):
            step = state.step
            lpips_h = hcast(lpips_params)

            def g_loss_fn(params_g):
                core_h = hcast(params_g["core"])
                z, xrec, pre, reg_log, _ = model.apply(
                    {"params": core_h},
                    x if half is None else x.astype(half),
                    return_features=True, rngs={"sample": rng})
                disc_vars = {"params": hcast(state.params_d),
                             "batch_stats": hcast(state.batch_stats_d)}
                loss, logs, bs_g = generator_loss(
                    cfg=loss_cfg, lpips=lpips, lpips_params=lpips_h,
                    disc=disc, disc_vars=disc_vars,
                    last_layer_params=core_h["decoder"]["final_layer"]["linear"],
                    apply_last_layer=apply_last_layer,
                    logvar=params_g["logvar"], x=x, xrec=xrec,
                    pre_features=pre, reg_log=reg_log, global_step=step,
                    compute_dtype=half)
                return loss, (xrec, logs, bs_g)

            (aeloss, (xrec, logs_g, bs_g)), grads_g = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params_g)
            if not loss_cfg.learn_logvar:
                grads_g["logvar"] = jnp.zeros_like(grads_g["logvar"])
            updates_g, new_opt_g = opt_g.update(grads_g, state.opt_state_g,
                                                state.params_g)
            new_params_g = optax.apply_updates(state.params_g, updates_g)

            def d_loss_fn(params_d):
                disc_vars = {"params": hcast(params_d),
                             "batch_stats": hcast(bs_g) if bs_g is not None
                             else hcast(state.batch_stats_d)}
                d_loss, logs_d, new_bs, lecam = discriminator_loss(
                    cfg=loss_cfg, disc=disc, disc_vars=disc_vars, x=x,
                    xrec=xrec, global_step=step,
                    lecam_ema_real=state.lecam_ema_real,
                    lecam_ema_fake=state.lecam_ema_fake,
                    compute_dtype=half)
                return d_loss, (logs_d, new_bs, lecam)

            (discloss, (logs_d, new_bs, lecam)), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d)
            updates_d, new_opt_d = opt_d.update(grads_d, state.opt_state_d,
                                                state.params_d)
            new_params_d = optax.apply_updates(state.params_d, updates_d)

            new_state = state.replace(
                step=step + 1, params_g=new_params_g, params_d=new_params_d,
                batch_stats_d=(f32cast(new_bs) if new_bs is not None
                               else state.batch_stats_d),
                opt_state_g=new_opt_g, opt_state_d=new_opt_d,
                lecam_ema_real=lecam[0], lecam_ema_fake=lecam[1])
            logs = {"train/aeloss": aeloss, "train/discloss": discloss,
                    "train/lr_g": self.sched_g(step),
                    "train/lr_d": self.sched_d(step)}
            logs.update(logs_g)
            logs.update(logs_d)
            return new_state, logs

        return train_step

    def jitted_train_step(self):
        if self._train_step is None:
            self._train_step = jax.jit(self.build_train_step(),
                                       donate_argnums=(0,))
        return self._train_step

    def fit_step(self, state, x, rng):
        return self.jitted_train_step()(
            state, shard_batch(self.mesh, jnp.asarray(x)),
            self.lpips_params, rng)

    def shard_state(self, state):
        return replicate(self.mesh, state)
