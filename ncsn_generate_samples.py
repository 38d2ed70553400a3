#!/usr/bin/env python
"""Generate samples from a trained NCSN via annealed Langevin dynamics.

CLI contract follows /root/reference/ncsn_generate_samples.py:24-117; the
full anneal runs as one jitted scan.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from audiosourcesep_tpu import cli
from audiosourcesep_tpu.models.ncsn import (anneal_langevin_dynamics,
                                            get_score_model, get_sigmas)
from run_basis_sep import restore_ncsn_params


def main(args):
    abs_restore = os.path.abspath(args.RESTORE)
    args = cli.apply_config_override(args)

    if args.dataset == "mnist":
        data_shape = [32, 32, 1]
    elif args.dataset == "cifar10":
        data_shape = [32, 32, 3]
    else:
        data_shape = [args.height, args.width, 1]

    sigmas = get_sigmas(args.sigma1, args.sigmaL, args.num_classes,
                        args.progression)
    model = get_score_model(args.version, data_shape, args.n_filters,
                            args.num_classes, sigmas=sigmas,
                            logit_transform=args.use_logit)
    rng = jax.random.PRNGKey(args.seed)
    rng, k_init = jax.random.split(rng)
    template = model.init_params(k_init)
    params = restore_ncsn_params(abs_restore, template, ema=args.ema)
    if args.ema:
        print(f"Restored EMA weights from {abs_restore}")

    log_file = cli.setup_output_dir(args.output, args.debug)
    cli.print_params(args)

    alpha = args.alpha or 1e-6
    rng, k_x, k_langevin = jax.random.split(rng, 3)
    x_mod = jax.random.uniform(k_x, (args.n_samples, *data_shape))
    if args.use_logit:
        x_mod = (1.0 - 2 * alpha) * x_mod + alpha
        x_mod = jnp.log(x_mod) - jnp.log1p(-x_mod)

    samples = anneal_langevin_dynamics(
        model.apply, params, x_mod, sigmas, k_langevin,
        n_steps_each=args.T, step_lr=args.step_lr,
        return_arr=args.return_arr)
    samples = np.asarray(samples)

    # post-process back to data scale (run_basis_sep.py:82-96)
    if args.use_logit:
        samples = 1.0 / (1.0 + np.exp(-samples))
        samples = (samples - alpha) / (1.0 - 2.0 * alpha)
    if args.dataset == "melspec":
        minval, maxval = (-100.0, 20.0) if args.scale == "dB" \
            else (1e-10, 100.0)
        samples = samples * (maxval - minval) + minval
        samples = np.clip(samples, minval, maxval)
    np.save("generated_samples", samples)
    print(f"Saved {args.n_samples} samples to generated_samples.npy "
          f"(shape {samples.shape})")
    log_file.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Generate NCSN samples")
    parser.add_argument("RESTORE", type=str, help="saved model directory")
    parser.add_argument("--output", type=str, default="ncsn_samples")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--config", type=str)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dataset", type=str, default="melspec")
    parser.add_argument("--version", type=str, default="v1")
    parser.add_argument("--ema", action="store_true",
                        help="restore EMA weights (reference "
                             "ncsn_generate_samples.py:88-89,142)")
    parser.add_argument("--n_samples", type=int, default=32)
    parser.add_argument("--return_arr", action="store_true",
                        help="save the full per-level trajectory")
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--width", type=int, default=64)
    parser.add_argument("--scale", type=str, default="dB")
    parser.add_argument("--n_filters", type=int, default=192)
    parser.add_argument("--sigma1", type=float, default=1.0)
    parser.add_argument("--sigmaL", type=float, default=0.01)
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--progression", type=str, default="logarithmic")
    parser.add_argument("--T", type=int, default=100)
    parser.add_argument("--step_lr", type=float, default=2e-5)
    parser.add_argument("--use_logit", action="store_true")
    parser.add_argument("--alpha", type=float, default=None)
    main(parser.parse_args())
