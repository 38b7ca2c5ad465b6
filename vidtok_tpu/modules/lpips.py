"""LPIPS perceptual loss — frozen VGG16 features + learned 1x1 heads.

Reference: vidtok/modules/lpips.py:61-172 (torchvision VGG16 at 5 relu taps,
unit-normalized feature diffs, 1x1 linear heads, spatial mean). The
pretrained weights (torchvision VGG16 + the vgg.pth LPIPS heads) are
converted once with tools/convert_lpips.py into ``checkpoints/lpips/
vgg_lpips.npz``; if absent the module runs with its random init (training
still functions — quality of the perceptual term differs until real weights
are provided).

Images are channels-last [N, H, W, 3] in [-1, 1].
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 'features' conv plan: (out_channels, pool_before)
_VGG16_PLAN = [
    (64, False), (64, False),          # relu1_2   (tap 0)
    (128, True), (128, False),         # relu2_2   (tap 1)
    (256, True), (256, False), (256, False),   # relu3_3 (tap 2)
    (512, True), (512, False), (512, False),   # relu4_3 (tap 3)
    (512, True), (512, False), (512, False),   # relu5_3 (tap 4)
]
_TAPS = [1, 3, 6, 9, 12]  # conv indices whose relu output is tapped
_CHNS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = "checkpoints/lpips/vgg_lpips.npz"


class VGG16Features(nn.Module):
    """VGG16 feature trunk returning the 5 LPIPS tap activations."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, pool) in enumerate(_VGG16_PLAN):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in _TAPS:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """LPIPS distance; returns per-image [N,1,1,1]-shaped mean (reference
    keeps spatial_average keepdim=True then sums taps)."""

    @nn.compact
    def __call__(self, x, y):
        # constants in the input dtype: f32 constants would silently
        # promote the whole VGG trunk to f32 under bf16-mixed training
        # (measured 768 MB/tap-activation in the train-step HBM dump)
        net = VGG16Features(name="vgg")
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        xs = (x - shift) / scale
        ys = (y - shift) / scale
        fx = net(xs)
        fy = net(ys)
        val = 0.0
        for k in range(len(_CHNS)):
            # tap normalization stats in f32 (fused converts, no f32
            # residency), activations stay in the compute dtype
            def _unit(f):
                s = jnp.sqrt(jnp.sum(jnp.square(f.astype(jnp.float32)),
                                     axis=-1, keepdims=True))
                return (f.astype(jnp.float32) / (s + 1e-10)).astype(f.dtype)

            diff = jnp.square(_unit(fx[k]) - _unit(fy[k]))
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")(diff)
            val = val + jnp.mean(lin.astype(jnp.float32), axis=(1, 2),
                                 keepdims=True)
        return val  # [N, 1, 1, 1] f32


def load_lpips_params(path: str = DEFAULT_WEIGHTS):
    """Load converted LPIPS weights; returns None if unavailable."""
    if not os.path.exists(path):
        return None
    from ..utils.checkpoint import unflatten_params

    flat = dict(np.load(path))
    return unflatten_params(flat)


def init_lpips_params(rng=None):
    m = LPIPS()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return m.init(rng, x, x)["params"]
