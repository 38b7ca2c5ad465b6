"""Train state: generator + discriminator params, two optax chains, EMA,
LeCAM scalars — one pytree, donated through the jitted train step."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray            # int32 scalar — counts batches
    params_g: Any                # {'core': ..., 'logvar': scalar}
    params_d: Any
    batch_stats_d: Any
    opt_state_g: Any
    opt_state_d: Any
    lecam_ema_real: jnp.ndarray
    lecam_ema_fake: jnp.ndarray
    ema_params: Optional[Any] = None   # EMA shadow of (params_g, params_d)


def make_optimizer(lr: float, grad_clip: float = 20.0):
    """Adam with global-norm clipping (reference training_step clips at 20.0,
    autoencoder.py:259; torch.optim.Adam defaults)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


def ema_update(shadow, params, step, decay):
    """LitEma semantics (reference ema.py:34-36): effective decay =
    min(decay, (1+n)/(10+n)), shadow -= (1-d)*(shadow-param)."""
    n = step.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p), shadow, params)
