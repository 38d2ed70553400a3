#!/usr/bin/env python
"""Grouped-conv formulation test: can the two stacked score models run as
one feature_group_count=2 conv, and is that faster than two dense convs?

At 192 output channels a dense conv pads N to 256 MXU lanes (75% waste
ceiling); two models grouped give per-group N=192 but XLA may lower the
pair as one block-diagonal matmul with N=384 = 3x128 (no padding).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.utils.profiling import enable_compilation_cache, fence

enable_compilation_cache()

from benchmarks.profile_basis4 import scan_time_max

ITERS = 30
LOAD_S = 0.030   # per-dispatch executable-load overhead to subtract


def report(name, dt, fl):
    net = dt - LOAD_S / ITERS
    print(f"{name}: {dt*1e3:.3f} ms raw / {net*1e3:.3f} ms net  "
          f"{fl/net/1e12:.1f} TFLOP/s", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    kx, kk = jax.random.split(jax.random.PRNGKey(3))
    FL = 2 * 60 * 96 * 64 * 9 * 192 * 192   # useful FLOPs, both models

    xb = jax.random.normal(kx, (60, 96, 64, 192), jnp.bfloat16)
    kern = jax.random.normal(kk, (3, 3, 192, 192), jnp.bfloat16)
    dt = scan_time_max(
        lambda k, v: jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        kern, xb, iters=ITERS)
    report("dense b60 192->192   ", dt, FL)

    xg = jax.random.normal(kx, (30, 96, 64, 384), jnp.bfloat16)
    kg = jax.random.normal(kk, (3, 3, 192, 384), jnp.bfloat16)
    dt = scan_time_max(
        lambda k, v: jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME", feature_group_count=2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        kg, xg, iters=ITERS)
    report("grouped b30 g2 384   ", dt, FL)

    # dense 384->384 at batch 30 (2x FLOPs: what block-diagonalising costs)
    kd = jax.random.normal(kk, (3, 3, 384, 384), jnp.bfloat16)
    dt = scan_time_max(
        lambda k, v: jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        kd, xg, iters=ITERS)
    report("dense b30 384->384   ", dt, 2 * FL)

    # half-res class grouped: b30 768ch g2 (vs dense b60 384)
    xh = jax.random.normal(kx, (60, 48, 32, 384), jnp.bfloat16)
    kh = jax.random.normal(kk, (3, 3, 384, 384), jnp.bfloat16)
    FLH = 2 * 60 * 48 * 32 * 9 * 384 * 384
    dt = scan_time_max(
        lambda k, v: jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        kh, xh, iters=ITERS)
    report("dense b60 384->384 hr", dt, FLH)

    xgh = jax.random.normal(kx, (30, 48, 32, 768), jnp.bfloat16)
    kgh = jax.random.normal(kk, (3, 3, 384, 768), jnp.bfloat16)
    dt = scan_time_max(
        lambda k, v: jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME", feature_group_count=2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        kgh, xgh, iters=ITERS)
    report("grouped b30 g2 768 hr", dt, FLH)


if __name__ == "__main__":
    main()
