#!/usr/bin/env python
"""Low-variance NCSN validation loss for a trained checkpoint.

The training loop's per-validation DSM loss draws one random sigma
assignment — fine at the reference's 1,209 test patches, but with a
handful of val windows the draw dominates (observed swings 185..1494 on 6
windows). This evaluator averages the DSM loss over --n_draws independent
sigma/noise draws for a stable estimate comparable to the reference's
val ~343/362 (BASELINE.md, trained_ncsn/.../out.log).

Usage: python benchmarks/eval_ncsn_val.py RUN_DIR DATASET_DIR [--ema] ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="training output dir (with ckpts/)")
    ap.add_argument("dataset", help="melspec dataset dir (train/ test/)")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--n_draws", type=int, default=64)
    ap.add_argument("--n_filters", type=int, default=192)
    ap.add_argument("--num_classes", type=int, default=10)
    ap.add_argument("--version", type=str, default="v1")
    ap.add_argument("--sigma1", type=float, default=1.0)
    ap.add_argument("--sigmaL", type=float, default=0.01)
    ap.add_argument("--progression", type=str, default="logarithmic")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from audiosourcesep_tpu.data import load_melspec_ds
    from audiosourcesep_tpu.models.ncsn import get_score_model, get_sigmas
    from audiosourcesep_tpu.models.ncsn.utils import dsm_loss
    from run_basis_sep import restore_ncsn_params

    _, ds_test, minibatch, n_train, n_test = load_melspec_ds(
        os.path.join(args.dataset, "train"),
        os.path.join(args.dataset, "test"), batch_size=None, shuffle=False)
    X = jnp.asarray(ds_test.data)
    # rescale to [0,1] as the NCSN trainer does (train_ncsn.py preprocess)
    X = (X - (-100.0)) / (20.0 - (-100.0))

    sigmas = get_sigmas(args.sigma1, args.sigmaL, args.num_classes,
                        args.progression)
    # v1 conditions on the class index, v2 on the sigma values themselves
    # (output divided by sigma[y], refinenet.py:140-143)
    model = get_score_model(
        args.version, X.shape[1:], args.n_filters, args.num_classes,
        sigmas=jnp.asarray(sigmas) if args.version == "v2" else None)
    template = model.init_params(jax.random.PRNGKey(0))
    params = restore_ncsn_params(args.run_dir, template, ema=args.ema)

    loss_fn = jax.jit(lambda p, x, k: dsm_loss(model.apply, p, x,
                                               jnp.asarray(sigmas), k))
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.n_draws)
    losses = [float(loss_fn(params, X, k)) for k in keys]
    print(f"val windows: {X.shape[0]} (n_test={n_test}), "
          f"draws: {args.n_draws}"
          + (", EMA weights" if args.ema else ""))
    print(f"val DSM loss: mean {np.mean(losses):.2f}  "
          f"std {np.std(losses):.2f}  min {np.min(losses):.2f}  "
          f"max {np.max(losses):.2f}")


if __name__ == "__main__":
    main()
