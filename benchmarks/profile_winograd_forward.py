"""A/B the full NCSNv1 score forward (separation config: 192f, 96x64,
batch 60, bf16) with and without the Winograd conv routing — the
end-to-end evidence for what --winograd buys the separation loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.utils.profiling import enable_compilation_cache, fence

enable_compilation_cache()

import audiosourcesep_tpu.nn as nn
from audiosourcesep_tpu.models.ncsn import get_score_model, get_sigmas


def scan_time_max(fn, params, x, iters=10, reps=3):
    # params enter the jit as an ARGUMENT — a closure would bake the
    # weights into the HLO as constants (breaks remote compile; CLAUDE.md)
    @jax.jit
    def loop(p, x0):
        def body(carry, _):
            y = fn(p, carry)
            return carry + (0.001 * jnp.max(y)).astype(carry.dtype), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    fence(loop(params, x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(loop(params, x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    sigmas = get_sigmas(1.0, 0.01, 10)
    model = get_score_model("v1", (96, 64, 1), 192, 10, sigmas=sigmas,
                            compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(1), (60, 96, 64, 1))
         ).astype(jnp.float32)
    idx = jnp.zeros((60,), jnp.int32)

    def fwd(p, xx):
        return model.apply(p, xx, idx)

    results = {}
    for label, enable in [("xla", False), ("winograd", True)]:
        nn.set_winograd(enable)
        try:
            t = scan_time_max(fwd, params, x)
        finally:
            nn.set_winograd(False)
        results[label] = t
        print(f"score fwd b60 [{label:8s}]: {t*1e3:8.3f} ms")

    # numerics: relative error of the winograd-routed forward
    nn.set_winograd(False)
    y0 = jax.jit(fwd)(params, x).astype(jnp.float32)
    nn.set_winograd(True)
    try:
        y1 = jax.jit(lambda p, z: model.apply(p, z, idx))(params, x)
        y1 = y1.astype(jnp.float32)
    finally:
        nn.set_winograd(False)
    num = float(jnp.max(jnp.abs(y1 - y0)))
    den = float(jnp.max(jnp.abs(y0)))
    print(f"speedup x{results['xla']/results['winograd']:.3f}   "
          f"maxdiff {num:.4f} (scale {den:.1f}, rel {num/den:.4f})")


if __name__ == "__main__":
    main()
