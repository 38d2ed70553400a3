"""Affine coupling bijectors (Glow split-style and RealNVP masked-style).

Re-designs of /root/reference/flow_models/flow_tfp_bijectors.py:11-153.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import Bijector, Chain, sum_event
from .basic import ActNorm


class AffineCouplingSplit(Bijector):
    """Glow-style coupling: split channels, ``ya = exp(log_s(xb))*xa + t(xb)``.

    log-det = sum(log_s). Reference flow_tfp_bijectors.py:124-153.
    """

    name = "coupling_split"

    def __init__(self, net):
        self.net = net

    def init_params(self, key, x):
        return {"net": self.net.init_params(key, x.shape[-1] // 2)}

    def forward(self, params, x, rng=None):
        xa, xb = jnp.split(x, 2, axis=-1)
        log_s, t = self.net.apply(params["net"], xb)
        ya = jnp.exp(log_s) * xa + t
        return jnp.concatenate([ya, xb], axis=-1), sum_event(log_s)

    def inverse(self, params, y, rng=None):
        ya, yb = jnp.split(y, 2, axis=-1)
        log_s, t = self.net.apply(params["net"], yb)
        xa = (ya - t) * jnp.exp(-log_s)
        return jnp.concatenate([xa, yb], axis=-1), sum_event(log_s)


def binary_mask(shape, masking: str, mask_state: int) -> jnp.ndarray:
    """Binary coupling mask of event shape (H, W, C).

    ``masking='channel'``: first half of channels = 1. ``'checkerboard'``:
    ``(i + j) % 2`` spatially, replicated over channels — equal to the
    reference's construction (flow_tfp_bijectors.py:72-84) for square inputs
    and well-defined (unlike it) for H != W. ``mask_state`` selects the mask
    or its complement.
    """
    H, W, C = shape
    if masking == "channel":
        assert C % 2 == 0
        m = jnp.concatenate(
            [jnp.ones((H, W, C // 2)), jnp.zeros((H, W, C // 2))], axis=-1)
    elif masking == "checkerboard":
        ij = (jnp.arange(H)[:, None] + jnp.arange(W)[None, :]) % 2
        m = jnp.repeat(ij[:, :, None].astype(jnp.float32), C, axis=-1)
    else:
        raise ValueError("masking should be 'channel' or 'checkerboard'")
    return m if mask_state else 1.0 - m


class AffineCouplingMasked(Bijector):
    """RealNVP-style masked coupling.

    forward: ``y = b*x + (1-b) * (x*exp(log_s) + t)`` with
    ``(log_s, t) = net(x*b)``; log-det = sum(log_s * (1-b)).
    Reference flow_tfp_bijectors.py:36-52.
    """

    name = "coupling_masked"

    def __init__(self, net, masking: str = "channel", mask_state: int = 0):
        self.net = net
        self.masking = masking
        self.mask_state = mask_state

    def _mask(self, x):
        return binary_mask(x.shape[1:], self.masking,
                           self.mask_state).astype(x.dtype)

    def init_params(self, key, x):
        return {"net": self.net.init_params(key, x.shape[-1])}

    def forward(self, params, x, rng=None):
        b = self._mask(x)
        log_s, t = self.net.apply(params["net"], x * b)
        y = b * x + (1.0 - b) * (x * jnp.exp(log_s) + t)
        return y, sum_event(log_s * (1.0 - b))

    def inverse(self, params, y, rng=None):
        b = self._mask(y)
        log_s, t = self.net.apply(params["net"], y * b)
        x = b * y + (1.0 - b) * ((y - t) * jnp.exp(-log_s))
        return x, sum_event(log_s * (1.0 - b))


def stacked_masked_couplings(n_layers: int, make_net, masking: str,
                             name: str = "stacked_couplings") -> Chain:
    """``n_layers`` masked couplings with alternating masks, each followed by
    an ActNorm.

    The reference interleaves TFP BatchNormalization bijectors
    (flow_tfp_bijectors.py:104-112) whose moving statistics never update in
    its training loops, i.e. effectively learnable per-channel affines;
    ActNorm (with data-dependent init) is the well-posed functional
    equivalent.
    """
    layers = []
    for i in range(n_layers):
        layers.append(AffineCouplingMasked(make_net(), masking, i % 2))
        layers.append(ActNorm())
    return Chain(layers, name=name)
