#!/usr/bin/env python
"""Decomposition profile of the NCSNv1 score forward (the BASIS hot op).

Isolates where the per-step ~111 ms goes by stubbing components to
identity (norms, activations) and measuring matmul/conv upper bounds at
the hot shapes. Timing methodology: scan-amortized (see profile_basis2).
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
from audiosourcesep_tpu.models.ncsn import layers as ncsn_layers
from audiosourcesep_tpu.separation import ncsn_score_fn, stack_pytrees
from benchmarks.profile_basis2 import scan_time

N_FRAMES = 30
DATA_SHAPE = (96, 64, 1)
N_FILTERS = 192
NUM_CLASSES = 10
FLOPS_1FWD = 7.728e12


def build_and_time(name, k0, k1, x, labels):
    model = get_score_model("v1", DATA_SHAPE, N_FILTERS, NUM_CLASSES,
                            compute_dtype=jnp.bfloat16)
    p1, p2 = model.init_params(k0), model.init_params(k1)
    stacked = stack_pytrees(p1, p2)
    score = ncsn_score_fn(model.apply)
    dt = scan_time(lambda p, v: score(p, v, labels, jnp.asarray(0)),
                   stacked, x,
                   feedback=lambda y, x0: 0.01 * y.astype(x0.dtype))
    print(f"fwd [{name}]: {dt*1e3:.2f} ms  "
          f"{2*FLOPS_1FWD/dt/1e12:.1f} TFLOP/s-nominal", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stubs", action="store_true")
    ap.add_argument("--mm", action="store_true")
    ap.add_argument("--pad", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.uniform(k2, (2, N_FRAMES, *DATA_SHAPE))
    labels = jnp.zeros((N_FRAMES,), jnp.int32)

    base = build_and_time("baseline", k0, k1, x, labels)

    if args.stubs:
        orig_norm = ncsn_layers._norm2dplus
        orig_elu = jax.nn.elu

        ncsn_layers._norm2dplus = lambda x_, s, a, b, **kw: x_
        no_norm = build_and_time("no-norm", k0, k1, x, labels)
        ncsn_layers._norm2dplus = orig_norm
        print(f"  -> norm cost in context: {(base-no_norm)*1e3:.2f} ms",
              flush=True)

    if args.mm:
        def mm_case(name, M, K, N):
            ka, kb = jax.random.split(jax.random.PRNGKey(7))
            a = jax.random.normal(ka, (M, K), jnp.bfloat16)
            b = jax.random.normal(kb, (K, N), jnp.bfloat16)
            fl = 2 * M * K * N
            dt = scan_time(
                lambda w, v: jax.lax.dot_general(
                    v, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16),
                b, a, iters=30,
                # full-output feedback XLA cannot strength-reduce (a
                # column slice turns the matmul into a GEMV; see CLAUDE.md
                # and profile_basis4.scan_time_max)
                feedback=lambda y, x0: x0 + 1e-6 * jnp.max(y))
            print(f"matmul {name} [{M}x{K}]x[{K}x{N}]: {dt*1e3:.3f} ms  "
                  f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)

        # hot conv shapes as pure matmuls (im2col-free upper bound)
        mm_case("fullres-192", 60 * 96 * 64, 9 * 192, 192)
        mm_case("halfres-384", 60 * 48 * 32, 9 * 384, 384)
        mm_case("square-4k", 4096, 4096, 4096)

    if args.pad:
        def conv_case(name, shape, ci, co, dil=1):
            kx, kk = jax.random.split(
                jax.random.PRNGKey(abs(hash(name)) % 2**31))
            xb = jax.random.normal(kx, shape[:-1] + (ci,), jnp.bfloat16)
            kern = jax.random.normal(kk, (3, 3, ci, co), jnp.bfloat16)
            # nominal FLOPs of the UNPADDED conv (192ch), for comparison
            fl = 2 * shape[0] * shape[1] * shape[2] * 9 * 192 * 192
            dt = scan_time(
                lambda k, v: jax.lax.conv_general_dilated(
                    v, k, (1, 1), "SAME", rhs_dilation=(dil, dil),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16),
                kern, xb, iters=30,
                # jnp.max consumes the FULL conv output; a channel slice
                # would be strength-reduced to a sliced-kernel conv
                feedback=lambda y, x0: x0 + 0.01 * jnp.max(y))
            print(f"conv {name}: {dt*1e3:.3f} ms  "
                  f"{fl/dt/1e12:.1f} TFLOP/s-of-nominal", flush=True)

        conv_case("96x64 192->192 (ref)", (60, 96, 64, 0), 192, 192)
        conv_case("96x64 192->256 padN", (60, 96, 64, 0), 192, 256)
        conv_case("96x64 256->256 padKN", (60, 96, 64, 0), 256, 256)
        conv_case("96x64 128->128", (60, 96, 64, 0), 128, 128)


if __name__ == "__main__":
    main()
