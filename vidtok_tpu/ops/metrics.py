"""Quality metrics (PSNR / SSIM) — semantics of reference
vidtok/modules/util.py:146-231 (inputs in [0,1], video tensors
[B,C,T,H,W] folded to frames before averaging)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fold_video(x):
    if x.ndim == 5:
        b, c, t, h, w = x.shape
        return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
    return x


def compute_psnr(x, y):
    """Mean per-frame PSNR (reference util.py:146-154)."""
    x = _fold_video(jnp.asarray(x, jnp.float32))
    y = _fold_video(jnp.asarray(y, jnp.float32))
    mse = jnp.mean(jnp.square(x - y), axis=(1, 2, 3))
    psnr = -10.0 * jnp.log10(mse + 1e-8)
    return jnp.mean(psnr)


def _gaussian_kernel(kernel_size: int = 11, sigma: float = 1.5):
    coords = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(coords[None, :] ** 2 + coords[:, None] ** 2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(g, jnp.float32)


def _blur(x, kernel):
    """Depthwise VALID conv of [N,C,H,W] with a 2D kernel."""
    n, c, h, w = x.shape
    k = kernel.shape[0]
    kern = jnp.broadcast_to(kernel[None, None], (c, 1, k, k))
    dn = lax.conv_dimension_numbers(x.shape, kern.shape, ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        x, kern, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def _avg_pool2d(x, f):
    n, c, h, w = x.shape
    x = x[:, :, : h // f * f, : w // f * f]
    x = x.reshape(n, c, h // f, f, w // f, f)
    return x.mean(axis=(3, 5))


def compute_ssim(x, y):
    """Mean per-frame SSIM, 11x11 gaussian window, auto-downscale to ~256
    (reference util.py:157-231)."""
    x = _fold_video(jnp.asarray(x, jnp.float32))
    y = _fold_video(jnp.asarray(y, jnp.float32))

    f = max(1, round(min(x.shape[-2:]) / 256))
    if f > 1:
        x = _avg_pool2d(x, f)
        y = _avg_pool2d(y, f)

    kernel = _gaussian_kernel(11, 1.5)
    c1, c2 = 0.01**2, 0.03**2

    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    mu_xx, mu_yy, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
    sigma_xx = _blur(x * x, kernel) - mu_xx
    sigma_yy = _blur(y * y, kernel) - mu_yy
    sigma_xy = _blur(x * y, kernel) - mu_xy

    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ss = (2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1) * cs
    ssim_val = ss.mean(axis=(-1, -2)).mean(axis=1)  # per-frame, channel mean
    return jnp.mean(ssim_val)
