"""PatchGAN discriminators (reference vidtok/modules/discriminator.py).

* ``NLayerDiscriminator`` — pix2pix 2D PatchGAN: 4x4 stride-2 conv stack +
  BatchNorm + LeakyReLU(0.2) (reference :88-137). Operates per frame on
  channels-last [N, H, W, C].
* ``NLayerDiscriminator3D`` — Open-Sora-Plan-style 3D PatchGAN, 3x3x3
  kernels, temporal stride 2 only at layer 1 (reference :140-201). Operates
  on [B, T, H, W, C].

torch asymmetric padding note: Conv2d(k=4, stride=2, padding=1) on even
inputs == pad 1 on every side; we replicate with explicit padding. BatchNorm
uses batch statistics in training (torch default), with running averages
tracked in the flax ``batch_stats`` collection.

Init matches reference ``weights_init`` (:7-13): conv weights ~ N(0, 0.02),
norm scale ~ N(1, 0.02), norm bias 0.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.normal(stddev=0.02)
bn_scale_init = lambda key, shape, dtype=jnp.float32: (  # noqa: E731
    1.0 + nn.initializers.normal(stddev=0.02)(key, shape, dtype)
)


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (reference
    discriminator.py:16-85), channels-last.

    torch initializes ``loc``/``scale`` from the first *training* batch by
    mutating the parameters in place; the functional equivalent here is
    data-dependent flax init — ``.init`` with a real batch computes the same
    ``loc = -mean`` / ``scale = 1/(std+1e-6)`` (per-channel, unbiased std),
    after which they are ordinary trainable parameters. The reference's
    ``allow_reverse_init`` gate is an artifact of that in-place scheme and
    has no functional counterpart.
    """

    logdet: bool = False

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        squeeze = x.ndim == 2
        if squeeze:  # [N, C] -> [N, 1, 1, C] (reference :39-43)
            x = x[:, None, None, :]
        red = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        loc = self.param(
            "loc", lambda rng: -jnp.mean(xf, axis=red))
        scale = self.param(
            "scale", lambda rng: 1.0 / (jnp.std(xf, axis=red, ddof=1) + 1e-6))
        if reverse:
            h = x / scale - loc
        else:
            h = scale * (x + loc)
        if squeeze:
            h = h[:, 0, 0, :]
        if self.logdet and not reverse:  # reverse never returns logdet (:64-85)
            # height*width*sum(log|scale|), broadcast per batch element
            # (reference :56-60; generalized to all non-batch/channel dims)
            n_pos = 1
            for d in x.shape[1:-1]:
                n_pos *= d
            logdet = n_pos * jnp.sum(jnp.log(jnp.abs(scale)))
            return h, logdet * jnp.ones(x.shape[0], x.dtype)
        return h


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    # ActNorm instead of BatchNorm; middle convs then keep their bias
    # (reference discriminator.py:99-106 use_bias rule)
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [N, H, W, C] -> logits [N, H', W', 1]."""
        if self.use_actnorm:
            norm = ActNorm
        else:
            norm = partial(nn.BatchNorm, use_running_average=not train,
                           momentum=0.9, epsilon=1e-5,
                           scale_init=bn_scale_init)
        use_bias = self.use_actnorm
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                    kernel_init=conv_init, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=2, padding=1,
                        use_bias=use_bias, kernel_init=conv_init,
                        name=f"conv{n}")(h)
            h = norm(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=use_bias, kernel_init=conv_init,
                    name=f"conv{self.n_layers}")(h)
        h = norm(name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4), strides=1, padding=1, kernel_init=conv_init,
                    name="conv_out")(h)
        return h


class NLayerDiscriminator3D(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    # The reference's use_actnorm flag on the 3D variant is dead code (its
    # torch ActNorm unpacks a 4D shape and crashes on 5D input); ours works
    # on any rank, so the flag is functional here.
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, T, H, W, C] -> logits [B, T', H', W', 1]."""
        if self.use_actnorm:
            norm = ActNorm
        else:
            norm = partial(nn.BatchNorm, use_running_average=not train,
                           momentum=0.9, epsilon=1e-5,
                           scale_init=bn_scale_init)
        use_bias = self.use_actnorm
        h = nn.Conv(self.ndf, (3, 3, 3), strides=2, padding=1,
                    kernel_init=conv_init, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            st = (2 if n == 1 else 1, 2, 2)
            h = nn.Conv(self.ndf * nf, (3, 3, 3), strides=st, padding=1,
                        use_bias=use_bias, kernel_init=conv_init,
                        name=f"conv{n}")(h)
            h = norm(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (3, 3, 3), strides=1, padding=1,
                    use_bias=use_bias, kernel_init=conv_init,
                    name=f"conv{self.n_layers}")(h)
        h = norm(name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (3, 3, 3), strides=1, padding=1,
                    kernel_init=conv_init, name="conv_out")(h)
        return h
