"""Latent regularizers: diagonal-Gaussian KL and Finite Scalar Quantization.

Channels-last: latents are [B, T', H', W', D]. All quantization math runs in
fp32 (the reference forces fp32 via autocast guards, regularizers.py:206,225).

Distributed note: the reference all-reduces the FSQ codebook probability
mean across DDP ranks (reference regularizers.py:49-54). Under pjit with a
batch-sharded mesh, ``jnp.mean`` over the batch axis *is* the global mean —
XLA inserts the collective — so no explicit communication code exists here.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class DiagonalGaussian:
    """Posterior math (reference distributions.py:5-49). Pure functions over
    channels-last parameter tensors [..., 2*C]."""

    def __init__(self, parameters):
        c = parameters.shape[-1] // 2
        self.mean = parameters[..., :c]
        self.logvar = jnp.clip(parameters[..., c:], -30.0, 20.0)

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar.astype(jnp.float32))

    @property
    def var(self):
        return jnp.exp(self.logvar.astype(jnp.float32))

    def sample(self, rng):
        eps = jax.random.normal(rng, self.mean.shape, jnp.float32)
        return (self.mean.astype(jnp.float32) + self.std * eps).astype(self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        """0.5 * sum(mean^2 + var - 1 - logvar) over all non-batch dims."""
        m = self.mean.astype(jnp.float32)
        lv = self.logvar.astype(jnp.float32)
        axes = tuple(range(1, m.ndim))
        return 0.5 * jnp.sum(jnp.square(m) + jnp.exp(lv) - 1.0 - lv, axis=axes)

    def nll(self, sample):
        m = self.mean.astype(jnp.float32)
        lv = self.logvar.astype(jnp.float32)
        axes = tuple(range(1, m.ndim))
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(
            logtwopi + lv + jnp.square(sample - m) / jnp.exp(lv), axis=axes
        )


class DiagonalGaussianRegularizer(nn.Module):
    """Reference regularizers.py:74-92. ``sample=True`` draws from the
    posterior (training); otherwise uses the mode."""

    sample: bool = True

    @nn.compact
    def __call__(self, z, *, sample_override: Optional[bool] = None,
                 n_steps=None) -> Tuple[jnp.ndarray, dict]:
        do_sample = self.sample if sample_override is None else sample_override
        posterior = DiagonalGaussian(z)
        if do_sample:
            rng = self.make_rng("sample")
            out = posterior.sample(rng)
        else:
            out = posterior.mode()
        kl = posterior.kl()
        kl_loss = jnp.sum(kl) / kl.shape[0]
        return out, {"kl_loss": kl_loss}


def _round_ste(z):
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQ:
    """Finite Scalar Quantization math (reference regularizers.py:95-268,
    after lucidrains). Static level structure; fp32 throughout."""

    def __init__(self, levels: Sequence[int], num_codebooks: int = 1):
        self.levels = tuple(int(l) for l in levels)
        self.num_codebooks = num_codebooks
        self.codebook_dim = len(self.levels)
        size = 1
        for l in self.levels:
            size *= l
        self.codebook_size = size
        self._levels = jnp.array(self.levels, jnp.int32)
        basis = [1]
        for l in self.levels[:-1]:
            basis.append(basis[-1] * l)
        self._basis = jnp.array(basis, jnp.int32)

    def bound(self, z, eps: float = 1e-3):
        levels = self._levels.astype(jnp.float32)
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(self._levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        quantized = _round_ste(self.bound(z))
        half_width = (self._levels // 2).astype(jnp.float32)
        return quantized / half_width

    def codes_to_indices(self, codes):
        half_width = (self._levels // 2).astype(jnp.float32)
        scaled = codes * half_width + half_width
        return jnp.sum(scaled * self._basis.astype(jnp.float32), axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        codes_non_centered = (indices[..., None] // self._basis) % self._levels
        half_width = (self._levels // 2).astype(jnp.float32)
        return (codes_non_centered.astype(jnp.float32) - half_width) / half_width

    def implicit_codebook(self):
        idx = jnp.arange(self.codebook_size)
        return self.indices_to_codes(idx)


class FSQRegularizer(nn.Module):
    """Reference regularizers.py:95-268. Latent z: [B,T',H',W',dim].

    Returns (quantized, {'indices': [B,T',H',W'] int32, 'aux_loss': scalar}).
    """

    levels: Sequence[int]
    dim: Optional[int] = None
    num_codebooks: int = 1
    entropy_loss_weight: float = 0.0
    entropy_loss_annealing_steps: int = 0
    entropy_loss_annealing_factor: float = 1.0
    commitment_loss_weight: float = 0.0
    diversity_gamma: float = 1.0
    inv_temperature: float = 100.0

    @property
    def fsq(self) -> FSQ:
        return FSQ(self.levels, self.num_codebooks)

    @property
    def effective_dim(self) -> int:
        return len(self.levels) * self.num_codebooks

    @property
    def has_projections(self) -> bool:
        d = self.dim if self.dim is not None else self.effective_dim
        return d != self.effective_dim

    def _entropy_weight(self, n_steps):
        if self.entropy_loss_annealing_steps == 0:
            return jnp.float32(self.entropy_loss_weight)
        start = self.entropy_loss_annealing_factor * self.entropy_loss_weight
        w = start - (n_steps / self.entropy_loss_annealing_steps) * (
            start - self.entropy_loss_weight
        )
        return jnp.where(
            n_steps >= self.entropy_loss_annealing_steps,
            self.entropy_loss_weight, w,
        ).astype(jnp.float32)

    def setup(self):
        if self.has_projections:
            self.project_in = nn.Dense(self.effective_dim)
            self.project_out = nn.Dense(self.dim)

    def __call__(self, z, *, n_steps=0, sample_override=None) -> Tuple[jnp.ndarray, dict]:
        fsq = self.fsq
        c = self.num_codebooks
        d = fsq.codebook_dim
        in_dtype = z.dtype

        if self.has_projections:
            z = self.project_in(z)
        lead = z.shape[:-1]

        zf = z.astype(jnp.float32).reshape(lead + (c, d))
        codes = fsq.quantize(zf)
        indices = fsq.codes_to_indices(codes)

        if self.entropy_loss_weight > 0 or self.commitment_loss_weight > 0:
            codebook = fsq.implicit_codebook()  # [K, d]
            distance = -2.0 * jnp.einsum("...cd,kd->...ck", zf, codebook)
            prob = jax.nn.softmax(-distance * self.inv_temperature, axis=-1)
            logp = jnp.log(jnp.clip(prob, 1e-5))
            per_sample_entropy = jnp.mean(jnp.sum(-prob * logp, axis=-1))
            # mean over every sample position; under a batch-sharded mesh this
            # is already the global mean (XLA collective)
            avg_prob = jnp.mean(prob.reshape(-1, prob.shape[-2], prob.shape[-1]), axis=0)
            avg_logp = jnp.log(jnp.clip(avg_prob, 1e-5))
            codebook_entropy = jnp.mean(jnp.sum(-avg_prob * avg_logp, axis=-1))
            entropy_aux_loss = per_sample_entropy - self.diversity_gamma * codebook_entropy
            commit_loss = jnp.mean(
                jnp.square(zf - jax.lax.stop_gradient(codes))
            )
        else:
            entropy_aux_loss = jnp.float32(0.0)
            commit_loss = jnp.float32(0.0)

        out = codes.reshape(lead + (c * d,)).astype(in_dtype)
        if self.has_projections:
            out = self.project_out(out)

        if c == 1:
            indices = indices.reshape(lead)

        aux_loss = (
            entropy_aux_loss * self._entropy_weight(n_steps)
            + commit_loss * self.commitment_loss_weight
        )
        return out, {"indices": indices, "aux_loss": aux_loss}

    def decode_indices(self, indices):
        """indices [B,T',H',W'] -> latent [B,T',H',W',dim] (reference
        ``indices_to_latent``, autoencoder.py:205-213)."""
        fsq = self.fsq
        codes = fsq.indices_to_codes(indices)  # [..., d]
        if self.num_codebooks == 1:
            out = codes
        else:
            out = codes.reshape(codes.shape[:-2] + (-1,))
        if self.has_projections:
            out = self.project_out(out)
        return out
