"""Winograd kernel component analysis: baseline-subtracted timings of
the raw Pallas kernel (pre-padded input, phased output) vs the XLA conv,
sweeping tile-rows-per-block to find the DMA-amortization sweet spot.
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


def scan_net(fn, x, iters=8, reps=3):
    """Per-iteration time net of the feedback baseline (carry add +
    jnp.max consume), measured with an identity body."""
    def make(f):
        @jax.jit
        def loop(x0):
            def body(carry, _):
                y = f(carry)
                return carry + 0.001 * jnp.max(y).astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))
        return loop

    def best_of(loop):
        fence(loop(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(loop(x))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    t_base = best_of(make(lambda z: z))
    t_full = best_of(make(fn))
    return t_full - t_base, t_base


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    for name, xshape, cout in [
        ("48x32 384->384 b60", (60, 48, 32, 384), 384),
        ("96x64 192->384 b60", (60, 96, 64, 192), 384),
        ("32x32 128->128 b20", (20, 32, 32, 128), 128),
    ]:
        bsz, h, w, cin = xshape
        k1, k2, key = jax.random.split(key, 3)
        x = (jax.random.normal(k1, xshape) * 0.1).astype(jnp.bfloat16)
        wk = (jax.random.normal(k2, (3, 3, cin, cout)) * 0.05
              ).astype(jnp.bfloat16)
        conv_flop = 2 * bsz * h * w * 9 * cin * cout

        def xla_conv(xx):
            return jax.lax.conv_general_dilated(
                xx, wk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t, tb = scan_net(xla_conv, x)
        print(f"{name}: xla {t*1e3:7.3f} ms net ({conv_flop/t/1e12:6.1f} "
              f"TF/s)   [baseline {tb*1e3:.3f} ms]")

        # full dispatch path (pad + kernel + de-interleave)
        t, _ = scan_net(lambda xx: W.winograd_conv2d(xx, wk), x)
        print(f"{name}: wino-full {t*1e3:7.3f} ms net "
              f"({conv_flop/t/1e12:6.1f} conv-TF/s)")

        # raw kernel on pre-phased input, phased output
        th, tw = h // 2, w // 2
        cp = -(-cin // 128) * 128
        twp = -(-(tw + 1) // 8) * 8
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, cp - cin)))
        xph = (xpad.reshape(bsz, th + 1, 2, tw + 1, 2, cp)
               .transpose(0, 2, 4, 1, 3, 5))
        xph = jnp.pad(xph, ((0, 0), (0, 0), (0, 0), (0, 0),
                            (0, twp - tw - 1), (0, 0)))
        u = W.transform_weights(wk).astype(x.dtype)
        if cp != cin:
            u = jnp.pad(u, ((0, 0), (0, cp - cin), (0, 0)))
        for tr in sorted({t_ for t_ in (4, 8, 12, 16, 24, th)
                          if th % t_ == 0}):
            orig = W._pick_tile_rows
            W._pick_tile_rows = lambda *a, _tr=tr: _tr
            try:
                def raw(xx):
                    return W._winograd_pallas(xx, u, h, w)
                t, _ = scan_net(raw, xph)
            finally:
                W._pick_tile_rows = orig
            print(f"{name}: raw-kernel tr={tr:3d} (T={tr*tw:5d}) "
                  f"{t*1e3:7.3f} ms net ({conv_flop/t/1e12:6.1f} conv-TF/s)")


if __name__ == "__main__":
    main()
