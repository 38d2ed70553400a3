#!/usr/bin/env python
"""Build a local ``cifar10.npz`` cache from the standard CIFAR-10 python
batches (the ``cifar-10-batches-py`` directory of
https://www.cs.toronto.edu/~kriz/cifar.html).

The reference loads CIFAR-10 through tfds (datasets/data_loader.py:10-38);
this environment has no network, so ``load_toydata("cifar10")`` reads this
npz (``ASR_CIFAR10_NPZ`` env var or ``~/.keras/datasets/cifar10.npz``).

Usage: python scripts/build_cifar10_cache.py /path/to/cifar-10-batches-py
"""

import argparse
import os
import pickle

import numpy as np


def load_batch(path):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return data, np.asarray(d[b"labels"], np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batches_dir",
                    help="the extracted cifar-10-batches-py directory")
    ap.add_argument("--out", type=str,
                    default=os.path.expanduser(
                        "~/.keras/datasets/cifar10.npz"))
    args = ap.parse_args()

    xs, ys = zip(*(load_batch(os.path.join(args.batches_dir,
                                           f"data_batch_{i}"))
                   for i in range(1, 6)))
    x_train = np.concatenate(xs)
    y_train = np.concatenate(ys)
    x_test, y_test = load_batch(os.path.join(args.batches_dir, "test_batch"))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, x_train=x_train, y_train=y_train,
                        x_test=x_test, y_test=y_test)
    print(f"wrote {args.out}: x_train {x_train.shape}, "
          f"x_test {x_test.shape}")


if __name__ == "__main__":
    main()
