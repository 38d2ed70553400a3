#!/usr/bin/env python
"""Measured v5e-8 projection for the headline separation benchmark.

The BASIS separation is frame-independent (SURVEY.md §5 long-context:
chunking into 2.04 s windows), so the sharded multi-chip program
(bench.py / run_basis_sep.py shard the frame batch over the mesh) runs
with ZERO collectives inside the anneal — each chip executes the same
per-level scans on its frame shard. The v5e-8 wall-clock therefore equals
one chip's wall-clock at the per-chip shard size, plus only program
launch/broadcast overheads already amortised per level.

This script runs the REAL anneal (same models, levels, T) on one chip at
the 8-chip shard size — 30 frames wrap-padded to 32 -> 4 frames/chip,
score-eval batch 2 models x 4 frames = 8 — and prints the measured
steady-state, which is the defensible v5e-8 projection for the north-star
"<60 s on a v5e-8" (BASELINE.md).

Usage: python benchmarks/project_v5e8.py [n_chips]  (on the accelerator)

``n_chips`` (default 8) sets the simulated pod size: the script runs at
the per-chip shard for that mesh, so sweeping 1/2/4/8 traces the whole
scaling curve (measured round 4: per-chip MFU falls as the shard
shrinks, so the curve is sublinear — see docs/DESIGN.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiosourcesep_tpu.models.ncsn import get_score_model, get_sigmas
from audiosourcesep_tpu.utils.profiling import (enable_compilation_cache,
                                                fence, steady_state)

enable_compilation_cache()
from audiosourcesep_tpu.separation import (BasisConfig,
                                           basis_separate_per_level,
                                           ncsn_score_fn, stack_pytrees)

# guarded parse: this module is also imported by tests/test_bench.py,
# where sys.argv holds pytest arguments
N_CHIPS = (int(sys.argv[1])
           if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8)
N_FRAMES_GLOBAL = 30                      # the 1-min mix (bench.py)
DATA_SHAPE = (96, 64, 1)
N_FILTERS = 192
NUM_CLASSES = 10
T = 100


def main():
    n_frames = -(-N_FRAMES_GLOBAL // N_CHIPS)  # per-chip shard (wrap-pad)
    sigmas = get_sigmas(1.0, 0.01, NUM_CLASSES, "logarithmic")
    model = get_score_model("v1", DATA_SHAPE, N_FILTERS, NUM_CLASSES,
                            compute_dtype=jnp.bfloat16)
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 5)
    p1 = model.init_params(k0)
    p2 = model.init_params(k1)
    stacked = stack_pytrees(p1, p2)
    fence(stacked)

    mixed = jax.random.normal(k2, (n_frames, *DATA_SHAPE)) * 0.2 + 0.5
    x_init = jax.random.uniform(k3, (2, n_frames, *DATA_SHAPE))
    cfg = BasisConfig(T=T, delta=2e-5, data_type="melspec", scale="dB",
                      collect_trajectory=False)
    score = ncsn_score_fn(model.apply)

    def run(key):
        out, _ = basis_separate_per_level(score, stacked, mixed, x_init,
                                          sigmas, key, cfg)
        fence(out)
        return out

    first, elapsed, out = steady_state(run, k4)
    assert bool(jnp.isfinite(out).all())

    # per-chip FLOPs at the shard size (7.728 TFLOP per 1-model forward
    # at batch 30, linear in batch -> x N_FRAMES/30)
    flops = 2 * NUM_CLASSES * T * 7.728e12 * n_frames / 30
    print(json.dumps({
        "metric": f"basis_separation_1min_mix_v5e{N_CHIPS}_projection",
        "value": round(elapsed, 3),
        "unit": "s",
        "per_chip_frames": n_frames,
        "score_eval_batch_per_chip": 2 * n_frames,
        "vs_baseline": round(1411.5 / elapsed, 2),
        "est_chip_mfu_at_shard": round(flops / elapsed / 197e12, 3),
    }))
    print(f"# first_call={first:.1f}s steady={elapsed:.3f}s "
          f"(single-chip full batch: see BENCH_r*.json)", file=sys.stderr)


if __name__ == "__main__":
    main()
