"""Priors and the transformed-distribution flow model.

Equivalent of the reference's ``tfd.TransformedDistribution(prior,
Invert(chain))`` (flow_builder.py:100-113): ``log_prob(x) =
prior.log_prob(chain.forward(x)) + chain.forward_log_det(x)``;
``sample = chain.inverse(prior.sample())``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .core import Bijector

Array = jax.Array
_LOG_2PI = math.log(2.0 * math.pi)


class IsotropicNormalPrior:
    """Standard normal over a fixed event shape."""

    def __init__(self, event_shape):
        self.event_shape = tuple(event_shape)

    def init_params(self, key):
        return ()

    def log_prob(self, params, z: Array) -> Array:
        d = math.prod(self.event_shape)
        sq = jnp.sum(jnp.square(z), axis=tuple(range(1, z.ndim)))
        return -0.5 * (sq + d * _LOG_2PI)

    def sample(self, params, key: Array, n: int, dtype=jnp.float32) -> Array:
        return jax.random.normal(key, (n, *self.event_shape), dtype)


class LearnableDiagNormalPrior:
    """Diag-normal with trainable loc and (exp-parameterised) scale.

    Reference "learntop" prior: flow_builder.py:100-113 (loc Variable +
    TransformedVariable scale through an Exp bijector).
    """

    def __init__(self, event_shape):
        self.event_shape = tuple(event_shape)

    def init_params(self, key):
        return {"loc": jnp.zeros(self.event_shape),
                "log_scale": jnp.zeros(self.event_shape)}

    def log_prob(self, params, z: Array) -> Array:
        loc = params["loc"].astype(z.dtype)
        log_scale = params["log_scale"].astype(z.dtype)
        u = (z - loc) * jnp.exp(-log_scale)
        elem = -0.5 * (jnp.square(u) + _LOG_2PI) - log_scale
        return jnp.sum(elem, axis=tuple(range(1, z.ndim)))

    def sample(self, params, key: Array, n: int, dtype=jnp.float32) -> Array:
        eps = jax.random.normal(key, (n, *self.event_shape), dtype)
        return params["loc"].astype(dtype) + eps * jnp.exp(
            params["log_scale"]).astype(dtype)


class FlowModel:
    """A normalizing flow: chain (data -> latent) + prior over the latent."""

    def __init__(self, bijector: Bijector, prior):
        self.bijector = bijector
        self.prior = prior

    def init(self, key: Array, minibatch: Array):
        kb, kp = jax.random.split(key)
        bij_params, z = self.bijector.init(kb, minibatch)
        return {"bijector": bij_params, "prior": self.prior.init_params(kp)}

    def reinit_data_dependent(self, params, minibatch: Array):
        """Re-anchor data-dependent stats (ActNorm) on ``minibatch``,
        keeping all trained weights. Used by the noisy-Glow chain to
        recalibrate each sigma level's flow to its noised input
        distribution (see Bijector.reinit)."""
        bij, _ = self.bijector.reinit(params["bijector"], minibatch)
        return {"bijector": bij, "prior": params["prior"]}

    def log_prob(self, params, x: Array, rng: Optional[Array] = None) -> Array:
        z, fldj = self.bijector.forward(params["bijector"], x, rng)
        return self.prior.log_prob(params["prior"], z) + fldj

    def score(self, params, x: Array) -> Array:
        """``grad_x log p(x)`` — the Glow-prior score used by BASIS
        (reference run_basis_sep.py:73-79)."""
        return jax.grad(
            lambda v: jnp.sum(self.log_prob(params, v)))(x)

    def sample(self, params, key: Array, n: int,
               dtype=jnp.float32) -> Array:
        kz, kb = jax.random.split(key)
        z = self.prior.sample(params["prior"], kz, n, dtype)
        x, _ = self.bijector.inverse(params["bijector"], z, kb)
        return x

    def bits_per_dim(self, params, x: Array,
                     rng: Optional[Array] = None) -> Array:
        d = math.prod(x.shape[1:])
        return -self.log_prob(params, x, rng) / (d * math.log(2.0))
