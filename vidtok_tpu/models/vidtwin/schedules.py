"""LR schedules used by VidTwin training (reference
vidtwin/models/vidtwin_ae.py:1504-1567 + HF inverse_sqrt). All return optax
schedule callables step -> lr."""

from __future__ import annotations

import jax.numpy as jnp


def lambda_warmup_cosine(lr_min, lr_max, lr_start, warmup_steps, total_steps):
    """Linear lr_start->lr_max over warmup, then cosine lr_max->lr_min
    (reference LambdaWarmUpCosineScheduler, :1536-1567)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (lr_max - lr_start) / max(warmup_steps, 1) * step + lr_start
        t = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1),
                     0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warmup_steps, warm, cos)

    return sched


def linear_warmup(target_lr, warmup_steps, total_steps):
    """Linear warmup then linear decay (reference LinearWarmupScheduler,
    :1504-1519: base_lr * (1 - step/total))."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = target_lr * step / max(warmup_steps, 1)
        decay = target_lr * (1.0 - step / max(total_steps, 1))
        return jnp.where(step < warmup_steps, warm, jnp.maximum(decay, 0.0))

    return sched


def constant_warmup(base_lr, warmup_steps):
    """Linear warmup then constant (reference ConstantWarmupScheduler,
    :1521-1534)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_steps,
                         base_lr * step / max(warmup_steps, 1), base_lr)

    return sched


def inverse_sqrt(base_lr, num_warmup_steps):
    """HF get_inverse_sqrt_schedule: linear warmup then
    base_lr * sqrt(warmup / step)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(num_warmup_steps, 1)
        decay = base_lr * jnp.sqrt(num_warmup_steps / jnp.maximum(step, 1.0))
        return jnp.where(step < num_warmup_steps, warm, decay)

    return sched


def from_config(cfg: dict, base_lr: float, total_steps: int):
    """Build a schedule from a reference-style lr_scheduler_config."""
    if cfg is None:
        return constant_warmup(base_lr, 500)
    target = cfg.get("target", "")
    p = cfg.get("params", {}) or {}
    if "inverse_sqrt" in target:
        return inverse_sqrt(base_lr, p.get("num_warmup_steps", 2000))
    if "LambdaWarmUpCosineScheduler" in target:
        return lambda_warmup_cosine(
            p.get("lr_min", 0.0), p.get("lr_max", base_lr),
            p.get("lr_start", 0.0), p.get("warmup_steps", 0), total_steps)
    if "LinearWarmupScheduler" in target:
        return linear_warmup(p.get("target_lr", base_lr),
                             p.get("warmup_steps", 0), total_steps)
    return constant_warmup(base_lr, 500)
