"""Discriminators for GAN training (videoseal/modules/discriminator.py:89-209).

NLayerDiscriminator: PatchGAN with GroupNorm(4) (the training default).
UNetDiscriminatorSN exists in the reference but is unused by default; the
spectral-norm variant is provided without SN power iteration (documented
deviation — reference default never instantiates it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.color import rgb_to_yuv


class NLayerDiscriminator(nn.Module):
    """PatchGAN (discriminator.py:89-148). Input NHWC in [0,1]-ish."""
    input_nc: int = 3
    ndf: int = 32
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.input_nc == 1 and x.shape[-1] == 3:
            x = rgb_to_yuv(x)[..., 0:1]  # Y-mode (discriminator.py:143-148)
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="conv0")(x)
        x = lrelu(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=True, name=f"conv{n}")(x)
            x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"norm{n}")(x)
            x = lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=True, name=f"conv{self.n_layers}")(x)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"norm{self.n_layers}")(x)
        x = lrelu(x)
        return nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)], name="conv_out")(x)
