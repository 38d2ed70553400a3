#!/usr/bin/env python
"""Fine-tune a trained Glow at each noise level (noise-conditioned family).

CLI contract follows /root/reference/train_noisy_glow.py:187-360: restores
the clean model, then for each sigma in the schedule fine-tunes on
``X + sigma * eps`` and saves under ``sigma_{s}/ckpts`` — the layout
run_basis_sep.py consumes for Glow priors.
"""

import argparse
import os

import jax
import jax.numpy as jnp

from audiosourcesep_tpu import cli
from audiosourcesep_tpu.models import build_glow
from audiosourcesep_tpu.models.ncsn import get_sigmas
from audiosourcesep_tpu.parallel import make_mesh
from audiosourcesep_tpu.training import (CheckpointManager,
                                         setup_tensorboard,
                                         train_noisy_glow_chain)
from audiosourcesep_tpu.utils import total_trainable_variables


def main(args):
    cli.maybe_init_multihost(args)
    restore_root = os.path.abspath(args.RESTORE) if args.RESTORE else None
    args = cli.apply_config_override(args)
    data = cli.resolve_dataset(args)
    sigmas = get_sigmas(args.sigma1, args.sigmaL, args.num_classes,
                        args.progression)

    log_file = cli.setup_output_dir(args.output, args.debug)
    cli.print_params(args)

    rng = jax.random.PRNGKey(args.seed)
    rng, init_key = jax.random.split(rng)
    model, params = build_glow(
        init_key, jnp.asarray(data["minibatch"], jnp.float32),
        data["data_shape"], L=args.L, K=args.K, n_filters=args.n_filters,
        learntop=args.learntop, data_type=data["data_type"],
        use_logit=args.use_logit, alpha=args.alpha or 1e-6,
        minval=data["minval"], maxval=data["maxval"])
    print(f"Total Trainable Variables: "
          f"{total_trainable_variables(params):,}")

    restore_dir = (os.path.join(restore_root, "ckpts")
                   if restore_root else None)
    mesh = make_mesh() if jax.device_count() > 1 else None
    dirs = train_noisy_glow_chain(
        model, params, sigmas, data["ds_train"], data["ds_test"],
        optimizer_name=args.optimizer, learning_rate=args.learning_rate,
        clipnorm=getattr(args, "clipnorm", None),
        n_epochs_per_sigma=args.n_epochs, batch_size=args.batch_size,
        output_dir=".", restore_path=restore_dir, rng=rng, mesh=mesh,
        reinit_actnorm=getattr(args, "reinit_actnorm", False),
        reinit_minibatch=data["minibatch"])
    print(f"Noise-conditioned checkpoints: {dirs}")
    if getattr(args, "multihost", False):
        # orderly multi-process teardown: a process exiting while peers are
        # still running trips the coordination-service heartbeat
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("end_of_training")
        jax.distributed.shutdown()
    log_file.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train noisy Glow chain")
    parser.add_argument("RESTORE", type=str, nargs="?", default=None,
                        help="directory of the trained clean Glow model")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--output", type=str, default="trained_noisy_glow")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--config", type=str)
    parser.add_argument("--seed", type=int, default=0)
    # spectrograms
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--width", type=int, default=64)
    parser.add_argument("--scale", type=str, default="dB")
    # model
    parser.add_argument("--L", type=int, default=3)
    parser.add_argument("--K", type=int, default=32)
    parser.add_argument("--n_filters", type=int, default=512)
    parser.add_argument("--learntop", action="store_true")
    # sigma schedule
    parser.add_argument("--sigma1", type=float, default=1.0)
    parser.add_argument("--sigmaL", type=float, default=0.01)
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--progression", type=str, default="logarithmic")
    # optimization (per sigma level)
    parser.add_argument("--n_epochs", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--optimizer", type=str, default="adamax")
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--clipnorm", type=float, default=None,
                        help="optional global-norm gradient clip")
    # preprocessing
    parser.add_argument("--reinit_actnorm", action="store_true",
                        help="re-anchor ActNorm data-dependent stats on a "
                             "sigma-noised minibatch before each level's "
                             "fine-tune (extension beyond the reference: "
                             "restores score calibration at large sigma "
                             "in one pass; see trainers.py)")
    parser.add_argument("--use_logit", action="store_true")
    parser.add_argument("--alpha", type=float, default=None)
    cli.add_multihost_flags(parser)
    main(parser.parse_args())
