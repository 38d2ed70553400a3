import time, sys, jax, jax.numpy as jnp
def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)
from audiosourcesep_tpu.models.ncsn import get_score_model, get_sigmas
from audiosourcesep_tpu.separation import (BasisConfig, basis_separate,
                                           make_stacked_ncsn_score, stack_pytrees)
log(f"devices {jax.devices()}")
model = get_score_model("v1", (96,64,1), 192, 10)
k = jax.random.split(jax.random.PRNGKey(0), 4)
p1 = model.init_params(k[0]); p2 = model.init_params(k[1])
log("params done")
stacked = stack_pytrees(p1, p2)
score = make_stacked_ncsn_score(model.apply, stacked)
x = jnp.zeros((2,30,96,64,1)); lab = jnp.zeros((30,),jnp.int32)
f = jax.jit(lambda x: score(x, lab, 0))
t0=time.time(); out = jax.block_until_ready(f(x)); log(f"stacked vmap compile+first {time.time()-t0:.1f}s")
t0=time.time()
for _ in range(10): out = f(x)
jax.block_until_ready(out); log(f"10 stacked fwd {time.time()-t0:.3f}s")

sig = get_sigmas(1.0,0.01,10,'logarithmic')
mixed = jnp.zeros((30,96,64,1))
for T in (1, 2):
    cfg = BasisConfig(T=T, collect_trajectory=False)
    run = jax.jit(lambda m,x,key: basis_separate(score, m, x, sig, key, cfg)[0])
    t0=time.time(); out = jax.block_until_ready(run(mixed, x, k[2])); log(f"T={T} scan compile+run {time.time()-t0:.1f}s")
    t0=time.time(); out = jax.block_until_ready(run(mixed, x, k[2])); log(f"T={T} steady {time.time()-t0:.3f}s")
