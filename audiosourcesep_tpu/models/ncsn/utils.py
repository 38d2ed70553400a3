"""NCSN utilities: sigma schedules, DSM loss, annealed Langevin dynamics.

Re-designs of /root/reference/ncsn/utils.py and the training-loss math of
train_ncsn.py:26-46. The Langevin sampler is a jitted double ``lax.scan``
(noise levels x steps) instead of the reference's eager Python loop
(ncsn/utils.py:28-31) — the whole anneal compiles to a single XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_sigmas(sigma1: float, sigmaL: float, num_classes: int,
               progression: str = "geometric") -> np.ndarray:
    """Noise schedule (ncsn/utils.py:7-14). Both progressions produce the
    same geometric sequence; kept for CLI compatibility."""
    if progression == "geometric":
        sigmas = np.exp(np.linspace(np.log(sigma1), np.log(sigmaL),
                                    num=num_classes))
    elif progression == "logarithmic":
        sigmas = np.logspace(np.log10(sigma1), np.log10(sigmaL),
                             num=num_classes)
    else:
        raise ValueError("progression should be geometric or logarithmic")
    return sigmas.astype(np.float32)


def dsm_loss(score_apply: Callable, params, X: Array, sigmas: Array,
             rng: Array, per_sample_sigma: bool = True) -> Array:
    """Denoising score-matching loss (train_ncsn.py:26-46).

    ``loss = mean_i  sigma_i^2 * 0.5 * || s(x_i + sigma_i*eps, i)
    + eps/sigma_i ||^2`` — the mean is over examples, matching the
    reference's ``compute_average_loss`` over the global batch so loss
    magnitudes (val ~343 for piano, BASELINE.md) are comparable.

    ``per_sample_sigma=False`` reproduces the reference quirk of drawing
    one sigma index per *channel-count* (train_ncsn.py:37 uses
    ``X.shape[-1]`` as the local batch size, i.e. effectively one noise
    level per batch).
    """
    n = X.shape[0]
    k_idx, k_noise = jax.random.split(rng)
    if per_sample_sigma:
        sigma_idx = jax.random.randint(k_idx, (n,), 0, sigmas.shape[0])
    else:
        sigma_idx = jnp.broadcast_to(
            jax.random.randint(k_idx, (), 0, sigmas.shape[0]), (n,))
    used_sigma = sigmas[sigma_idx][:, None, None, None].astype(X.dtype)
    noise = jax.random.normal(k_noise, X.shape, X.dtype) * used_sigma
    perturbed = X + noise
    target = -noise / jnp.square(used_sigma)
    scores = score_apply(params, perturbed, sigma_idx)
    per_example = 0.5 * jnp.sum(jnp.square(scores - target), axis=(1, 2, 3))
    per_example = per_example * jnp.square(used_sigma[:, 0, 0, 0])
    return jnp.mean(per_example)


def anneal_langevin_dynamics(score_apply: Callable, params, x_init: Array,
                             sigmas: Array, rng: Array,
                             n_steps_each: int = 100,
                             step_lr: float = 2e-5,
                             return_arr: bool = False):
    """Annealed Langevin sampler as a jitted scan over (level, step).

    Per level i: ``alpha = step_lr * (sigma_i / sigma_L)^2``; per step:
    ``x <- x + alpha * s(x, i) + sqrt(2 alpha) * eps``
    (ncsn/utils.py:17-38).

    Returns final ``x`` or, with ``return_arr``, the per-level trajectory
    ``[L+1, n, ...]`` including the init (matching the reference layout).
    """
    sigmas = jnp.asarray(sigmas)
    L = sigmas.shape[0]
    n = x_init.shape[0]

    # jit with params as an ARGUMENT: a closure would embed the weights as
    # constants in the compiled program (hundreds of MB for real models)
    @jax.jit
    def _run(params, x_init, levels):
        def level_body(x, level):
            sigma_idx, key = level
            alpha = step_lr * jnp.square(sigmas[sigma_idx] / sigmas[-1])
            labels = jnp.full((n,), sigma_idx, jnp.int32)

            def step_body(x, k):
                noise = (jax.random.normal(k, x.shape, x.dtype)
                         * jnp.sqrt(2.0 * alpha).astype(x.dtype))
                grad = score_apply(params, x, labels)
                return x + alpha.astype(x.dtype) * grad + noise, None

            x, _ = jax.lax.scan(step_body, x,
                                jax.random.split(key, n_steps_each))
            return x, x

        return jax.lax.scan(level_body, x_init, levels)

    levels = (jnp.arange(L), jax.random.split(rng, L))
    x_final, x_per_level = _run(params, x_init, levels)
    if return_arr:
        return jnp.concatenate([x_init[None], x_per_level], axis=0)
    return x_final
