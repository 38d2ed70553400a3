"""RealNVP two-scale bijector.

Re-design of /root/reference/flow_models/flow_real_nvp.py:9-79:
preprocessing -> 3 checkerboard couplings -> squeeze -> 3 channel couplings
-> factor out half the channels -> 4 checkerboard couplings on the rest.
Coupling nets are weight-norm ResNets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bijectors import (Bijector, Chain, ImgPreprocessing,
                         ShiftAndLogScaleResNet, Squeeze,
                         stacked_masked_couplings)


class RealNVP(Bijector):
    name = "realnvp"

    def __init__(self, n_filters: int = 32, n_blocks: int = 4,
                 alpha: float = 0.05, preprocess: bool = True):
        def net(f):
            return lambda: ShiftAndLogScaleResNet(f, n_blocks)

        layers = []
        if preprocess:
            layers.append(ImgPreprocessing(alpha=alpha))
        layers += [
            stacked_masked_couplings(3, net(n_filters), "checkerboard",
                                     name="stack1"),
            Squeeze(),
            stacked_masked_couplings(3, net(2 * n_filters), "channel",
                                     name="stack2"),
        ]
        self.scale1 = Chain(layers, name="scale1")
        self.scale2 = stacked_masked_couplings(4, net(2 * n_filters),
                                               "checkerboard", name="scale2")

    def _rngs(self, rng):
        return (None, None) if rng is None else tuple(jax.random.split(rng))

    def init(self, key, x):
        k1, k2 = jax.random.split(key)
        p1, out = self.scale1.init(k1, x)
        z1, h1 = jnp.split(out, 2, axis=-1)
        p2, z2 = self.scale2.init(k2, h1)
        return ({"scale1": p1, "scale2": p2},
                jnp.concatenate([z1, z2], axis=-1))

    def init_params(self, key, x):
        return self.init(key, x)[0]

    def forward(self, params, x, rng=None):
        r1, r2 = self._rngs(rng)
        out, ld1 = self.scale1.forward(params["scale1"], x, r1)
        z1, h1 = jnp.split(out, 2, axis=-1)
        z2, ld2 = self.scale2.forward(params["scale2"], h1, r2)
        return jnp.concatenate([z1, z2], axis=-1), ld1 + ld2

    def inverse(self, params, y, rng=None):
        r1, r2 = self._rngs(rng)
        z1, z2 = jnp.split(y, 2, axis=-1)
        h1, ld2 = self.scale2.inverse(params["scale2"], z2, r2)
        out = jnp.concatenate([z1, h1], axis=-1)
        x, ld1 = self.scale1.inverse(params["scale1"], out, r1)
        return x, ld1 + ld2
