"""User-facing VidTwin engine (NCTHW API, mirrors the reference scripts'
usage of the Lightning module: encode -> (z, u_S, u_Dx, u_Dy), decode,
cross-reenactment)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import load_config
from .convert import convert_vidtwin_state_dict
from .vidtwin_ae import VidTwinVAE, build_vidtwin_from_config


def _to_nthwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))


def _to_ncthw(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class VidTwinTokenizer:
    def __init__(self, model: VidTwinVAE, params, seed: int = 0):
        self.model = model
        self.params = params
        self._rng = jax.random.PRNGKey(seed)
        self._cache = {}

    @classmethod
    def from_config(cls, config, ckpt: Optional[str] = None, seed: int = 0):
        cfg = load_config(config)
        model_cfg = cfg.get("model", cfg)
        model, meta = build_vidtwin_from_config(model_cfg)
        t, h, w = model.encoder.input_size
        if ckpt:
            if ckpt.endswith((".ckpt", ".safetensors")):
                from ...utils.checkpoint import load_torch_state_dict

                params = convert_vidtwin_state_dict(load_torch_state_dict(ckpt))
                params = jax.tree_util.tree_map(jnp.asarray, params)
            else:
                from ...utils.checkpoint import load_params

                params = load_params(ckpt)
        else:
            # init on the host CPU backend: the init program is one-shot,
            # and on the axon TPU relay its compile+execute costs minutes
            # per fresh process (same pattern as VideoTokenizer.from_config)
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                x = jnp.zeros((1, t, h, w, model.encoder.in_channels))
                params = model.init({"params": jax.random.PRNGKey(seed),
                                     "sample": jax.random.PRNGKey(0)}, x,
                                    sample_override=False)["params"]
        return cls(model, params, seed=seed)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def encode(self, x, sample: bool = False):
        """x: [B,C,T,H,W] -> (u_S [B,Fq,h,w,c], u_Dx, u_Dy [B,d,F,S])."""
        key = ("encode", jnp.asarray(x).shape, sample)
        if key not in self._cache:
            def fn(params, xx, rng):
                z, u_s, u_dx, u_dy, log = self.model.apply(
                    {"params": params}, _to_nthwc(xx), sample_override=sample,
                    method=VidTwinVAE.encode, rngs={"sample": rng})
                return u_s, u_dx, u_dy, log
            self._cache[key] = jax.jit(fn)
        return self._cache[key](self.params, jnp.asarray(x), self._next_rng())

    def decode(self, u_s, u_dx, u_dy, only_part: Optional[str] = None):
        """-> x_rec [B,C,T,H,W]."""
        key = ("decode", u_s.shape, u_dx.shape, only_part)
        if key not in self._cache:
            def fn(params, a, b, c):
                dec = self.model.apply(
                    {"params": params}, a, b, c, only_part=only_part,
                    method=VidTwinVAE.decode,
                    rngs={"sample": jax.random.PRNGKey(0)})
                return _to_ncthw(dec)
            self._cache[key] = jax.jit(fn)
        return self._cache[key](self.params, u_s, u_dx, u_dy)

    def forward(self, x, sample: bool = False):
        key = ("forward", jnp.asarray(x).shape, sample)
        if key not in self._cache:
            def fn(params, xx, rng):
                z, dec, log, lat = self.model.apply(
                    {"params": params}, _to_nthwc(xx), sample_override=sample,
                    rngs={"sample": rng})
                return _to_ncthw(z), _to_ncthw(dec), log
            self._cache[key] = jax.jit(fn)
        return self._cache[key](self.params, jnp.asarray(x), self._next_rng())

    __call__ = forward

    def cross_reenact(self, x_structure, x_dynamics):
        """Decode structure of video A with dynamics of video B (reference
        inference_vidtwin_cross_reconstruct.py:232-239)."""
        u_s_a, _, _, _ = self.encode(x_structure)
        _, u_dx_b, u_dy_b, _ = self.encode(x_dynamics)
        return self.decode(u_s_a, u_dx_b, u_dy_b)
