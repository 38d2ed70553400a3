#!/usr/bin/env python
"""Scan-amortized profile of the BASIS hot path.

Dispatch through the remote tunnel costs ~30 ms, so every op is timed
inside a lax.scan (many iterations per dispatch). Params cross the jit
boundary as ARGUMENTS — closures bake 540 MB of weight constants into the
HLO and break the remote-compile tunnel (CLAUDE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.utils.profiling import enable_compilation_cache, fence

enable_compilation_cache()

from audiosourcesep_tpu.models.ncsn import get_score_model
from audiosourcesep_tpu.separation import ncsn_score_fn, stack_pytrees

N_FRAMES = 30
DATA_SHAPE = (96, 64, 1)
N_FILTERS = 192
NUM_CLASSES = 10
FLOPS_1FWD = 7.728e12  # XLA cost analysis, 1-model fwd @ batch 30


def scan_time(fn, params, x, iters=10, reps=2, feedback=None):
    """Time fn(params, x) applied iters times inside one dispatch.

    The iterate must be carried through the scan — a loop-invariant body
    gets hoisted by XLA and the "measurement" collapses to one evaluation.
    ``feedback(y, x) -> x_next`` maps the output back to the input shape
    (default: y itself, valid when fn is shape-preserving).
    """
    if feedback is None:
        feedback = lambda y, x0: y.astype(x0.dtype)

    @jax.jit
    def loop(p, x0):
        def body(carry, _):
            y = fn(p, carry)
            return feedback(y, carry), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out
    fence(loop(params, x))   # host fetch = reliable completion fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(loop(params, x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", action="store_true")
    ap.add_argument("--vmap", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.uniform(k2, (2, N_FRAMES, *DATA_SHAPE))
    labels = jnp.zeros((N_FRAMES,), jnp.int32)

    def build(name, score_mode="sequential", **kw):
        model = get_score_model("v1", DATA_SHAPE, N_FILTERS, NUM_CLASSES,
                                compute_dtype=jnp.bfloat16, **kw)
        p1, p2 = model.init_params(k0), model.init_params(k1)
        stacked = stack_pytrees(p1, p2)
        score = ncsn_score_fn(model.apply, mode=score_mode)
        dt = scan_time(lambda p, v: score(p, v, labels, jnp.asarray(0)),
                       stacked, x,
                       feedback=lambda y, x0: 0.01 * y.astype(x0.dtype))
        print(f"2-model fwd [{name}]: {dt*1e3:.2f} ms  "
              f"{2*FLOPS_1FWD/dt/1e12:.1f} TFLOP/s "
              f"({2*FLOPS_1FWD/dt/1e12/1.97:.1f}% of v5e bf16 peak)",
              flush=True)
        return dt

    build("baseline")
    if args.vmap:
        build("vmap-score", score_mode="vmap")

    if not args.convs:
        return

    def conv_case(name, shape, co, dil):
        kx, kk = jax.random.split(jax.random.PRNGKey(abs(hash(name)) % 2**31))
        xb = jax.random.normal(kx, shape, jnp.bfloat16)
        kern = jax.random.normal(kk, (3, 3, shape[-1], co), jnp.bfloat16)
        fl = 2 * shape[0] * shape[1] * shape[2] * 9 * shape[3] * co
        dt = scan_time(
            lambda k, v: jax.lax.conv_general_dilated(
                v, k, (1, 1), "SAME", rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC")), kern, xb,
            iters=30)
        print(f"conv {name}: {dt*1e3:.3f} ms  {fl/dt/1e12:.1f} TFLOP/s",
              flush=True)
        return xb, kern, fl

    conv_case("96x64x192->192", (60, 96, 64, 192), 192, 1)
    conv_case("48x32x384->384", (60, 48, 32, 384), 384, 1)
    xb2, kern2, fl2 = conv_case("48x32x384->384 dil2", (60, 48, 32, 384),
                                384, 2)
    conv_case("48x32x384->384 dil4", (60, 48, 32, 384), 384, 4)

    def s2b(k, v, d=2, co=384):
        n, h, w, c = v.shape
        x4 = v.reshape(n, h // d, d, w // d, d, c)
        x4 = x4.transpose(0, 2, 4, 1, 3, 5).reshape(n * d * d, h // d,
                                                    w // d, c)
        y = jax.lax.conv_general_dilated(
            x4, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(n, d, d, h // d, w // d, co)
        return y.transpose(0, 3, 1, 4, 2, 5).reshape(n, h, w, co)

    dt = scan_time(s2b, kern2, xb2, iters=30)
    print(f"conv dil2 space-to-batch: {dt*1e3:.3f} ms  "
          f"{fl2/dt/1e12:.1f} TFLOP/s", flush=True)

    # norm / pool / resize at the hot shape
    from audiosourcesep_tpu import nn
    p_in = nn.instance_norm_init(384)
    xb = jax.random.normal(jax.random.PRNGKey(5), (60, 48, 32, 384),
                           jnp.bfloat16)
    dt = scan_time(lambda p, v: nn.instance_norm(p, v), p_in, xb, iters=30)
    print(f"instance_norm 60x48x32x384: {dt*1e3:.3f} ms", flush=True)

    dt = scan_time(lambda p, v: nn.avg_pool_same(v, 5), p_in, xb, iters=30)
    print(f"avg_pool_same 5x5: {dt*1e3:.3f} ms", flush=True)

    dt = scan_time(lambda p, v: nn.resize_bilinear(v, (96, 64)), p_in, xb,
                   iters=30, feedback=lambda y, x0: y[:, ::2, ::2, :])
    print(f"resize_bilinear 48x32->96x64 @384: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
