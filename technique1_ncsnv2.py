#!/usr/bin/env python
"""Compute sigma_1 for NCSNv2 (max pairwise training-set distance).

CLI contract follows /root/reference/technique1_ncsnv2.py:43-52; the O(n^2)
distance search runs as blocked Gram matmuls on device.
"""

import argparse
import os

from audiosourcesep_tpu.data import load_melspec_ds
from audiosourcesep_tpu.utils import technique1_sigma1


def main(args):
    ds_train, _, _, n_train, _ = load_melspec_ds(
        os.path.join(args.dataset, "train"),
        os.path.join(args.dataset, "test"), batch_size=None)
    print("Data Loaded")
    print(f"Number of spectrograms in training set: {min(n_train, 2000)}")
    sigma1 = technique1_sigma1(ds_train.data, minval=-100.0, maxval=20.0,
                               max_samples=2000)
    print(f"Max Euclidean Distance: {sigma1}")
    with open(os.path.join(args.dataset, "max_norm.txt"), "w") as f:
        f.write("Max Euclidean Distance between all pairs of samples in "
                f"the training set = {sigma1}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute Sigma1 for NCSNv2")
    parser.add_argument("dataset", type=str, help="dirpath of the dataset")
    main(parser.parse_args())
