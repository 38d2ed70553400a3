import time, jax, jax.numpy as jnp, sys
def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
from audiosourcesep_tpu.models.ncsn import get_score_model, get_sigmas
from audiosourcesep_tpu.separation import (BasisConfig, basis_separate,
                                           make_stacked_ncsn_score, stack_pytrees)
log(f"devices {jax.devices()}")
model = get_score_model("v1", (96,64,1), 192, 10)
k = jax.random.split(jax.random.PRNGKey(0), 4)
stacked = stack_pytrees(model.init_params(k[0]), model.init_params(k[1]))
x = jnp.zeros((2,30,96,64,1)); mixed = jnp.zeros((30,96,64,1))
sig = get_sigmas(1.0,0.01,10,'logarithmic')
for T in (1, 5, 20, 100):
    cfg = BasisConfig(T=T, collect_trajectory=False)
    @jax.jit
    def run(params, m, xx, key):
        return basis_separate(make_stacked_ncsn_score(model.apply, params), m, xx, sig, key, cfg)[0]
    t0=time.time(); out = jax.block_until_ready(run(stacked, mixed, x, k[2]))
    fin = bool(jnp.isfinite(out).all())
    log(f"T={T} compile+run {time.time()-t0:.1f}s finite={fin}")
    t0=time.time(); out = jax.block_until_ready(run(stacked, mixed, x, k[2]))
    log(f"T={T} steady {time.time()-t0:.3f}s ({2*10*T*30} evals)")
