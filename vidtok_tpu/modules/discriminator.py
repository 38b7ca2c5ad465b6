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


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [N, H, W, C] -> logits [N, H', W', 1]."""
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       scale_init=bn_scale_init)
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                    kernel_init=conv_init, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=2, padding=1,
                        use_bias=False, kernel_init=conv_init,
                        name=f"conv{n}")(h)
            h = norm(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=False, kernel_init=conv_init,
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

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, T, H, W, C] -> logits [B, T', H', W', 1]."""
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       scale_init=bn_scale_init)
        h = nn.Conv(self.ndf, (3, 3, 3), strides=2, padding=1,
                    kernel_init=conv_init, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            st = (2 if n == 1 else 1, 2, 2)
            h = nn.Conv(self.ndf * nf, (3, 3, 3), strides=st, padding=1,
                        use_bias=False, kernel_init=conv_init,
                        name=f"conv{n}")(h)
            h = norm(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (3, 3, 3), strides=1, padding=1,
                    use_bias=False, kernel_init=conv_init,
                    name=f"conv{self.n_layers}")(h)
        h = norm(name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (3, 3, 3), strides=1, padding=1,
                    kernel_init=conv_init, name="conv_out")(h)
        return h
