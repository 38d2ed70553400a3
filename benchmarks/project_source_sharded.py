#!/usr/bin/env python
"""Per-chip projection for the source-sharded BASIS layout
(run_basis_sep.py --shard_sources) on one real chip.

On a 2-D (source, frame) mesh each chip's per-step timeline is: one
PLAIN model apply on its frame shard (batch = 30 / (chips/2), wrap-pad)
+ the local mixing/Langevin arithmetic + a 2-element-axis all-reduce of
the per-chip frame shard (~98 KB f32 at production shape). This script
runs that exact local computation on one chip, emulating the partner
chip's iterate with a same-shape carried array (identical FLOPs and
memory traffic; the real all-reduce adds ~10s of microseconds of ICI
latency per step — ~10-20 ms across the whole 1,000-step anneal,
inside measurement noise). SPMD structure verified on the virtual mesh:
the partitioner inserts exactly two shard-sized all-reduces per step
(logsumexp max+sum) and no activation/weight gathers.

Usage: python benchmarks/project_source_sharded.py [n_chips]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.models.ncsn import get_score_model, get_sigmas
from audiosourcesep_tpu.separation.mixing import mixing_process
from audiosourcesep_tpu.utils.profiling import (enable_compilation_cache,
                                                fence, steady_state)

enable_compilation_cache()

N_CHIPS = (int(sys.argv[1])
           if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8)
N_FRAMES_GLOBAL = 30
DATA_SHAPE = (96, 64, 1)
N_FILTERS = 192
NUM_CLASSES = 10
T = 100


def main():
    assert N_CHIPS % 2 == 0, "source sharding needs an even chip count"
    n_local = -(-N_FRAMES_GLOBAL // (N_CHIPS // 2))
    sigmas_arr = jnp.asarray(
        get_sigmas(1.0, 0.01, NUM_CLASSES, "logarithmic"))
    model = get_score_model("v1", DATA_SHAPE, N_FILTERS, NUM_CLASSES,
                            compute_dtype=jnp.bfloat16)
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
    params = model.init_params(k0)
    fence(params)
    g, grad_g = mixing_process("melspec", "dB")

    mixed = jax.random.normal(k1, (n_local, *DATA_SHAPE)) * 0.2 + 0.5
    x0 = jax.random.uniform(k2, (n_local, *DATA_SHAPE))
    partner0 = jax.random.uniform(k3, (n_local, *DATA_SHAPE))

    import functools

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def run_level(params, x, partner, mixed, level, key):
        sigma = sigmas_arr[level]
        eta = 2e-5 * jnp.square(sigma / sigmas_arr[-1])
        lam = 1.0 / jnp.square(sigma)
        labels = jnp.full((n_local,), level, jnp.int32)

        def step_body(carry, k):
            x, partner = carry
            noise = jax.random.normal(k, x.shape) * jnp.sqrt(2.0 * eta)
            score = model.apply(params, x, labels)
            # partner chip's iterate arrives via the per-step all-reduce
            # in the sharded program; locally a same-shape carried array
            both = jnp.stack([x, partner])
            recon = (lam * grad_g(both) * (mixed - g(both)))[0]
            x = x + eta * (score + recon) + noise
            # keep the partner moving so the arithmetic never constant-folds
            return (x, partner + 0.001 * noise), None

        (x, partner), _ = jax.lax.scan(step_body, (x, partner),
                                       jax.random.split(key, T))
        return x, partner

    def run(key):
        x, partner = jnp.copy(x0), jnp.copy(partner0)
        for level in range(NUM_CLASSES):
            x, partner = run_level(params, x, partner, mixed,
                                   jnp.asarray(level), key)
        fence(x)
        return x

    first, elapsed, out = steady_state(run, jax.random.PRNGKey(9))
    assert bool(jnp.isfinite(out).all())

    # per-chip FLOPs: ONE model forward per step at the local batch
    flops = NUM_CLASSES * T * 7.728e12 * n_local / 30
    print(json.dumps({
        "metric": f"basis_sep_source_sharded_v5e{N_CHIPS}_projection",
        "value": round(elapsed, 3),
        "unit": "s",
        "frames_per_chip": n_local,
        "score_eval_batch_per_chip": n_local,
        "vs_baseline": round(1411.5 / elapsed, 2),
        "est_chip_mfu_at_shard": round(flops / elapsed / 197e12, 3),
    }))
    print(f"# first_call={first:.1f}s steady={elapsed:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
