#!/usr/bin/env python
"""Micro-benchmark: fused Pallas InstanceNorm2d+ vs XLA at BASIS hot shapes.

Round-1 result on TPU v5e (see ops/pallas/instance_norm.py): XLA is already
at the HBM roofline for this op (~17us for 28 MB of traffic at the
(60,96,64,192) shape); the Pallas kernel ties it (0.73-0.95x). The score
network is compute-bound in its convs (~60%% MXU at bf16), so the norm is
not on the critical path -- the kernel is kept as the starting point for
deeper fusion work (norm+conv epilogues), not wired in by default.
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from audiosourcesep_tpu.ops.pallas import (instance_norm_2dplus,
                                           instance_norm_2dplus_reference)
def timeit(f, *a, n=50):
    jax.block_until_ready(f(*a))
    t0=time.time()
    for _ in range(n): out=f(*a)
    jax.block_until_ready(out)
    return (time.time()-t0)/n*1e6  # us
for (N,H,W,C) in [(60,96,64,192),(60,48,32,384)]:
    for dt in (jnp.float32, jnp.bfloat16):
        k = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(k[0],(N,H,W,C),dt)
        s = jnp.ones((N,C)); al = 0.1*jnp.ones((N,C)); b = jnp.zeros((N,C))
        tk = timeit(jax.jit(instance_norm_2dplus), x, s, al, b)
        tr = timeit(jax.jit(instance_norm_2dplus_reference), x, s, al, b)
        print(f"{(N,H,W,C)} {dt.__name__}: pallas {tk:.0f}us  xla {tr:.0f}us  speedup {tr/tk:.2f}x", flush=True)
