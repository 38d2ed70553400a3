#!/usr/bin/env python
"""Train RealNVP on toy data (the reference's minimal smoke-test trainer,
train_realnvp.py:22-65) — here with checkpointing included."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from audiosourcesep_tpu import cli
from audiosourcesep_tpu.models import build_realnvp
from audiosourcesep_tpu.training import (LoopConfig, init_train_state,
                                         make_flow_train_step, run_training,
                                         setup_optimizer, setup_tensorboard)
from audiosourcesep_tpu.utils import total_trainable_variables


def main(args):
    data = cli.resolve_dataset(args)
    log_file = cli.setup_output_dir(args.output, args.debug)
    train_writer, test_writer = setup_tensorboard()

    rng = jax.random.PRNGKey(args.seed)
    rng, init_key = jax.random.split(rng)
    model, params = build_realnvp(
        init_key, jnp.asarray(data["minibatch"], jnp.float32),
        data["data_shape"], n_filters=args.n_filters,
        n_blocks=args.n_blocks, learntop=args.learntop)
    print(f"Total Trainable Variables: "
          f"{total_trainable_variables(params):,}")

    optimizer = setup_optimizer(args.optimizer, args.learning_rate)
    state = init_train_state(params, optimizer)
    step, eval_loss = make_flow_train_step(model, optimizer)

    cli.print_params(args, train_writer)
    cfg = LoopConfig(n_epochs=args.n_epochs, batch_size=args.batch_size)
    result = run_training(state, step, eval_loss, data["ds_train"],
                          data["ds_test"], cfg, rng,
                          train_writer=train_writer,
                          test_writer=test_writer)
    # bits/dim on the validation set (Thesis Table 3.1 parity metric)
    d = float(np.prod(data["data_shape"]))
    for batch in data["ds_test"]:
        bpd = float(jnp.mean(model.bits_per_dim(
            result.state["params"], jnp.asarray(batch),
            jax.random.PRNGKey(1))))
        print(f"Validation bits/dim: {bpd:.4f}")
        break
    log_file.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train RealNVP")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--output", type=str, default="trained_realnvp")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n_filters", type=int, default=32)
    parser.add_argument("--n_blocks", type=int, default=4)
    parser.add_argument("--learntop", action="store_true")
    parser.add_argument("--n_epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--optimizer", type=str, default="adam")
    parser.add_argument("--learning_rate", type=float, default=0.001)
    main(parser.parse_args())
