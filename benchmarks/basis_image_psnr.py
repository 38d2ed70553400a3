#!/usr/bin/env python
"""BASIS image-mixture separation PSNR (thesis Table 3.2 analog).

Trains an NCSNv1 prior on the image/toy dataset through the real CLIs, runs
BASIS on ``--n_mixed`` mixed pairs, and reports mean PSNR of the recovered
sources (best per-pair permutation), the metric of thesis Table 3.2
(MNIST: Glow prior 21.2 dB / NCSN prior 28.5 dB over 1000 pairs).

With the offline digits stand-in cache (scripts/build_mnist_cache.py
--synthetic-digits) the number is NOT comparable to the MNIST baselines —
it evidences the pipeline; run against a real mnist.npz for parity.

Usage: python benchmarks/basis_image_psnr.py /path/workdir [--n_mixed 20]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


DEVICE = "cpu"


def run(script, *args, env_extra=None):
    env = dict(os.environ)
    if DEVICE == "cpu":
        env.setdefault("JAX_PLATFORMS", "cpu")
    else:
        env.pop("JAX_PLATFORMS", None)   # the real accelerator
    env.update(env_extra or {})
    r = subprocess.run([sys.executable, os.path.join(REPO, script), *args],
                      cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + "\n" + r.stderr[-3000:] + "\n")
        raise SystemExit(f"{script} failed")
    return r


def psnr_pairs(x1, x2, gt1, gt2, peak=255.0):
    """Mean PSNR over pairs, best per-pair source permutation."""
    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2,
                      axis=tuple(range(1, a.ndim)))
        return 10 * np.log10(peak ** 2 / np.maximum(mse, 1e-12))

    direct = (psnr(x1, gt1) + psnr(x2, gt2)) / 2
    swapped = (psnr(x1, gt2) + psnr(x2, gt1)) / 2
    return np.maximum(direct, swapped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--n_mixed", type=int, default=20)
    ap.add_argument("--n_filters", type=int, default=64)
    ap.add_argument("--n_epochs", type=int, default=60)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--device", choices=["cpu", "native"], default="cpu",
                    help="cpu: force JAX_PLATFORMS=cpu in the child CLIs; "
                         "native: let them use the real accelerator")
    args = ap.parse_args()
    global DEVICE
    DEVICE = args.device

    w = os.path.abspath(args.workdir)
    os.makedirs(w, exist_ok=True)
    prior = os.path.join(w, "ncsn_image")
    if not os.path.exists(os.path.join(prior, "ckpts", "checkpoint.json")):
        run("train_ncsn.py", "--dataset", "mnist", "--output", prior,
            "--debug", "--version", "v1", "--n_filters",
            str(args.n_filters), "--num_classes", "10",
            "--sigma1", "1.0", "--sigmaL", "0.01",
            "--progression", "logarithmic", "--n_epochs",
            str(args.n_epochs), "--batch_size", "64", "--T", "1",
            "--sample_every", "10000", "--ema")

    sep = os.path.join(w, "basis_sep")
    run("run_basis_sep.py", prior, prior, "--output", sep, "--debug",
        "--dataset", "mnist", "--model_type", "ncsn", "--version", "v1",
        "--n_filters", str(args.n_filters), "--num_classes", "10",
        "--sigma1", "1.0", "--sigmaL", "0.01",
        "--progression", "logarithmic", "--T", str(args.T),
        "--n_mixed", str(args.n_mixed), "--ema")

    res = np.load(os.path.join(sep, "results.npz"))
    x1, x2 = res["x1"], res["x2"]
    gt1 = np.round(np.clip(res["gt1"], 0, 255))
    gt2 = np.round(np.clip(res["gt2"], 0, 255))
    p = psnr_pairs(x1, x2, gt1, gt2)
    mix_psnr = psnr_pairs(res["mixed"], res["mixed"], gt1, gt2)

    cache = os.environ.get("ASR_MNIST_NPZ",
                           os.path.expanduser("~/.keras/datasets/mnist.npz"))
    prov = "unknown"
    try:
        with np.load(cache) as d:
            prov = str(d.get("provenance", "mnist-unverified"))
    except Exception:
        pass
    print(json.dumps({
        "metric": "basis_image_separation_psnr",
        "value": round(float(np.mean(p)), 2),
        "unit": "dB",
        "n_pairs": int(len(p)),
        "mixture_psnr": round(float(np.mean(mix_psnr)), 2),
        "dataset_provenance": prov,
        "mnist_baselines_dB": {"glow": 21.2, "ncsn": 28.5},
    }))


if __name__ == "__main__":
    main()
