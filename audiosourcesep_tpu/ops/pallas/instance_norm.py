"""Fused InstanceNorm2d+ Pallas TPU kernel.

InstanceNorm2d+ (models/ncsn/layers.py) appears ~100 times per score-network
forward in the BASIS hot loop. This kernel computes

    out = scale * (x - mean_hw) * rsqrt(var_hw + eps)
          + alpha * norm_c(mean_hw) + bias

in a two-phase tiled pass per sample (full activations do not fit VMEM):
phase 0 streams H-tiles and accumulates per-channel sum/sum-of-squares in a
VMEM scratch; phase 1 finalises the statistics (including the cross-channel
standardisation of the per-channel means, the "+" part of InstanceNorm2d+)
and streams the tiles again to produce the normalised output. The TPU grid
executes sequentially, so the scratch accumulator carries across grid steps.

The per-sample ``scale/alpha/bias`` rows fold the tfa instance-norm affine
and the (conditional) gamma/alpha/beta embeddings:

    scale = gamma_embed * gamma_in
    bias  = gamma_embed * beta_in + beta_embed
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, scale_ref, alpha_ref, bias_ref, o_ref,
            acc_ref, stat_ref, *, hw: int, eps_in: float, eps_means: float):
    n = pl.program_id(0)
    phase = pl.program_id(1)
    h = pl.program_id(2)

    x = x_ref[0].astype(jnp.float32)                    # [TH, W, C]

    @pl.when((phase == 0) & (h == 0))
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _accumulate():
        acc_ref[0, :] += jnp.sum(x, axis=(0, 1))
        acc_ref[1, :] += jnp.sum(x * x, axis=(0, 1))
        # passthrough write keeps the output block defined in phase 0
        o_ref[0] = x_ref[0]

    @pl.when((phase == 1) & (h == 0))
    def _finalise_stats():
        mean = acc_ref[0, :] / hw                       # [C]
        var = acc_ref[1, :] / hw - mean * mean
        m = jnp.mean(mean)
        v = jnp.mean(mean * mean) - m * m
        means_n = (mean - m) * jax.lax.rsqrt(v + eps_means)
        rstd = jax.lax.rsqrt(var + eps_in)
        # fold everything into one multiply-add per element:
        # out = x * (scale*rstd) + (alpha*means_n + bias - scale*rstd*mean)
        a = scale_ref[n] * rstd
        b = alpha_ref[n] * means_n + bias_ref[n] - a * mean
        stat_ref[0, :] = a
        stat_ref[1, :] = b

    @pl.when(phase == 1)
    def _normalise():
        o_ref[0] = (x * stat_ref[0, :] + stat_ref[1, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps_in", "eps_means",
                                             "tile_h", "interpret"))
def instance_norm_2dplus(x: Array, scale: Array, alpha: Array, bias: Array,
                         eps_in: float = 1e-3, eps_means: float = 1e-5,
                         tile_h: int = 8, interpret: bool = False) -> Array:
    """Fused InstanceNorm2d+.

    Args:
        x: ``[N, H, W, C]`` with ``H`` divisible by ``tile_h``.
        scale, alpha, bias: ``[N, C]`` per-sample affine rows.
    """
    N, H, W, C = x.shape
    while H % tile_h:
        tile_h //= 2
    nh = H // tile_h
    kernel = functools.partial(_kernel, hw=H * W, eps_in=eps_in,
                               eps_means=eps_means)
    vec = pl.BlockSpec((1, tile_h, W, C), lambda n, p, h: (n, h, 0, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec(memory_space=pltpu.VMEM)   # small [N, C] tables
    return pl.pallas_call(
        kernel,
        grid=(N, 2, nh),
        in_specs=[vec, row, row, row],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32),
                        pltpu.VMEM((2, C), jnp.float32)],
        interpret=interpret,
    )(x, scale.astype(jnp.float32), alpha.astype(jnp.float32),
      bias.astype(jnp.float32))


def instance_norm_2dplus_reference(x: Array, scale: Array, alpha: Array,
                                   bias: Array, eps_in: float = 1e-3,
                                   eps_means: float = 1e-5) -> Array:
    """Plain-XLA reference implementation (same math)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)           # [N,1,1,C]
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    m = jnp.mean(mean, axis=-1, keepdims=True)
    v = jnp.var(mean, axis=-1, keepdims=True)
    means_n = (mean - m) * jax.lax.rsqrt(v + eps_means)
    h = (xf - mean) * jax.lax.rsqrt(var + eps_in)
    out = (scale[:, None, None, :] * h
           + alpha[:, None, None, :] * means_n
           + bias[:, None, None, :])
    return out.astype(x.dtype)
