"""Winograd vs XLA conv with SLOPE timing: per-iteration cost from
(t(N2) - t(N1)) / (N2 - N1) over scan-amortized loops, so constant
dispatch/feedback overheads cancel exactly (an identity-baseline
subtraction harness over-subtracted: it reported XLA conv above
hardware peak and negative Winograd nets). Both variants carry the
same jnp.max feedback, which is included in the slope but identical
across variants of the same shape.

Measured verdict (v5e, bf16): see ops/winograd.py docstring and
docs/DESIGN.md "Winograd verdict" — XLA's conv wins every melspec
separation class (it runs at 88-100% of peak); the kernel wins 1.67x
on the image path's 32x32@128 class.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.utils.profiling import enable_compilation_cache, fence

enable_compilation_cache()

import audiosourcesep_tpu.ops.winograd as W

N1, N2 = 4, 20


def slope_time(fn, w, x, reps=3):
    # the weight enters the jit as an ARGUMENT — a closure would bake it
    # into the HLO as a constant (breaks remote compile; CLAUDE.md)
    def make(n):
        @jax.jit
        def loop(w0, x0):
            def body(carry, _):
                y = fn(w0, carry)
                return carry + (0.001 * jnp.max(y)).astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
        return loop

    def best_of(loop):
        fence(loop(w, x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(loop(w, x))
            best = min(best, time.perf_counter() - t0)
        return best

    l1, l2 = make(N1), make(N2)
    return (best_of(l2) - best_of(l1)) / (N2 - N1)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    for name, xshape, cout, dil in [
        ("48x32 384->384 b60      ", (60, 48, 32, 384), 384, 1),
        ("96x64 192->384 b60      ", (60, 96, 64, 192), 384, 1),
        ("48x32 384->384 b60 dil=2", (60, 48, 32, 384), 384, 2),
        ("48x32 384->384 b60 dil=4", (60, 48, 32, 384), 384, 4),
        ("32x32 128->128 b20      ", (20, 32, 32, 128), 128, 1),
    ]:
        bsz, h, w, cin = xshape
        k1, k2, key = jax.random.split(key, 3)
        x = (jax.random.normal(k1, xshape) * 0.1).astype(jnp.bfloat16)
        wk = (jax.random.normal(k2, (3, 3, cin, cout)) * 0.05
              ).astype(jnp.bfloat16)
        conv_flop = 2 * bsz * h * w * 9 * cin * cout

        def xla_conv(w0, xx):
            return jax.lax.conv_general_dilated(
                xx, w0, (1, 1), "SAME", rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if dil == 1:
            def wino(w0, xx):
                return W.winograd_conv2d(xx, w0)
        else:
            def wino(w0, xx):
                return W.dilated_winograd_conv2d(xx, w0, dil)

        t_x = slope_time(xla_conv, wk, x)
        t_w = slope_time(wino, wk, x)
        print(f"{name}: xla {t_x*1e3:7.3f} ms ({conv_flop/t_x/1e12:6.1f} "
              f"TF/s)  wino {t_w*1e3:7.3f} ms "
              f"({conv_flop/t_w/1e12:6.1f} conv-TF/s)  x{t_x/t_w:5.2f}")


if __name__ == "__main__":
    main()
