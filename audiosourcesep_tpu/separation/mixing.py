"""Mixing models g(x1..xK) and their gradients for BASIS.

Re-design of /root/reference/run_basis_sep.py:106-149. Sources are stacked
on a leading axis ``[K, ...]`` so the math vectorises over sources (and the
stacked axis can double as extra batch for the score networks).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
_LN10 = math.log(10.0)


def mixing_process(data_type: str, scale: str = "dB"
                   ) -> Tuple[Callable, Callable]:
    """Return ``(g, grad_g)`` operating on stacked sources ``[K, ...]``.

    * ``data_type='image'``: mixture is the mean of sources; gradient 1/K.
    * power scale: ``g = (mean sqrt(s))^2``; the gradient follows the
      reference's expression (run_basis_sep.py:124-129) for behavioural
      parity (note it differs from the analytic d g/d s_i by a constant
      factor — BASIS treats it as a direction).
    * dB scale: mixture adds in the power domain —
      ``g = 10/ln10 * (logsumexp(x * ln10/10) - ln K)``; gradient is the
      softmax over sources (run_basis_sep.py:131-147).
    """
    if data_type == "image":
        def g(sources: Array) -> Array:
            return jnp.mean(sources, axis=0)

        def grad_g(sources: Array) -> Array:
            K = sources.shape[0]
            return jnp.ones_like(sources) / float(K)

    elif scale == "power":
        def g(sources: Array) -> Array:
            return jnp.square(jnp.mean(jnp.sqrt(sources), axis=0))

        def grad_g(sources: Array) -> Array:
            mean_sqrt = jnp.mean(jnp.sqrt(sources), axis=0, keepdims=True)
            return jnp.square(mean_sqrt) / (jnp.sqrt(sources) + 1e-8)

    else:  # dB
        def g(sources: Array) -> Array:
            K = sources.shape[0]
            return (10.0 / _LN10) * (
                jax.scipy.special.logsumexp(sources * (_LN10 / 10.0), axis=0)
                - math.log(float(K)))

        def grad_g(sources: Array) -> Array:
            return jax.nn.softmax(sources * (_LN10 / 10.0), axis=0)

    return g, grad_g
