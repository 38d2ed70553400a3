"""Winograd Pallas kernel vs XLA conv at the separation model's two
dominant conv classes (docs/DESIGN.md round-3 decomposition):

    96x64 @ 192->192, batch 60   (27% of forward FLOPs, ~50% MXU peak)
    48x32 @ 384->384, batch 60   (49% of forward FLOPs, ~84% MXU peak)

Winograd F(2x2,3x3) computes each with 2.25x fewer MXU FLOPs; the
question this script answers is how much of that shows up end-to-end
once the in-VMEM transforms are paid. Timing uses the scan-amortized
harness with a jnp.max feedback (CLAUDE.md timing rules).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.utils.profiling import enable_compilation_cache, fence

enable_compilation_cache()

from audiosourcesep_tpu.ops.winograd import (transform_weights,
                                             winograd_conv2d,
                                             winograd_eligible)


def scan_time_max(fn, x, iters=10, reps=3):
    """Amortized per-iteration time; feedback via jnp.max (safe against
    strength reduction, see benchmarks/profile_basis4.py)."""
    @jax.jit
    def loop(x0):
        def body(carry, _):
            y = fn(carry)
            return carry + 0.001 * jnp.max(y), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(out)

    fence(loop(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    cases = [
        ("96x64 192->192 b60", (60, 96, 64, 192), (3, 3, 192, 192)),
        ("48x32 384->384 b60", (60, 48, 32, 384), (3, 3, 384, 384)),
        ("96x64 192->384 b60", (60, 96, 64, 192), (3, 3, 192, 384)),
        ("48x32 192->192 b60", (60, 48, 32, 192), (3, 3, 192, 192)),
    ]
    for name, xshape, kshape in cases:
        k1, k2, key = jax.random.split(key, 3)
        x = (jax.random.normal(k1, xshape) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(k2, kshape) * 0.05).astype(jnp.bfloat16)
        conv_flop = 2 * xshape[0] * xshape[1] * xshape[2] \
            * kshape[0] * kshape[1] * kshape[2] * kshape[3]

        def xla_conv(xx):
            return jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def wino(xx):
            return winograd_conv2d(xx, w)

        assert winograd_eligible(xshape, kshape)
        # numerics vs the XLA conv at bf16
        d = jnp.max(jnp.abs(wino(x).astype(jnp.float32)
                            - xla_conv(x).astype(jnp.float32)))
        scale = jnp.max(jnp.abs(xla_conv(x).astype(jnp.float32)))
        t_xla = scan_time_max(xla_conv, x)
        t_win = scan_time_max(wino, x)
        print(f"{name}: xla {t_xla*1e3:7.3f} ms ({conv_flop/t_xla/1e12:6.1f}"
              f" TF/s)  wino {t_win*1e3:7.3f} ms "
              f"(x{t_xla/t_win:4.2f}, {conv_flop/t_win/1e12:6.1f} conv-TF/s)"
              f"  maxdiff {float(d):.4f} (scale {float(scale):.1f})")


if __name__ == "__main__":
    main()
