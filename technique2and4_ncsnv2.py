#!/usr/bin/env python
"""Compute the NCSNv2 noise-schedule ratio (technique 2) and Langevin step
size (technique 4). CLI contract follows
/root/reference/technique2and4_ncsnv2.py:69-81."""

import argparse

import numpy as np

from audiosourcesep_tpu.utils import technique2_gamma, technique4_epsilon


def main(args):
    assert args.sigma1 > args.sigmaL
    try:
        D = int(np.prod([int(i) for i in args.D.split(",")]))
    except (ValueError, TypeError):
        print("ERROR: D should be in the form: H,W,C")
        return 1

    template = "".join(f"{k} = {v} \n" for k, v in vars(args).items())
    print(template)

    gamma, _ = technique2_gamma(D, args.sigma1, args.sigmaL)
    technique4_epsilon(args.T, args.sigmaL, gamma)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute num_classes and epsilon for NCSNv2")
    parser.add_argument("--D", type=str, default="96,64,1")
    parser.add_argument("--T", type=float, default=5.0)
    parser.add_argument("--sigma1", type=float, default=55.0)
    parser.add_argument("--sigmaL", type=float, default=0.01)
    main(parser.parse_args())
