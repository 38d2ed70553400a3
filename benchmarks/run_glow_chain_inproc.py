"""One-process driver for the Glow-prior Beethoven quality chain.

Same stages and hyperparameters as benchmarks/quality_sdr_beethoven_glow.sh
(base Glow at melspec_glow.yml scale -> --reinit_actnorm noisy sigma chain
-> data-scale Glow-prior BASIS), but every TPU stage runs inside a SINGLE
process via runpy: this backend charges a one-off 170-915 s warm-up per
process even on persistent-cache hits (CLAUDE.md / docs/DESIGN.md cold-start
notes), so the shell script's five TPU processes pay it five times —
in-process chaining pays it once. Each stage is checkpoint-guarded, so a
killed run resumes by re-running the driver.

Datasets are expected pre-built at <workdir>/{piano,violin}_ds (the shell
runner's wav_to_spec recipe); the separation + inversion + BSS-Eval protocol
is identical to the shell script. Reference bar: the chain
train_noisy_glow.py:187-360 -> run_basis_sep.py:217-260 exists to deliver.

Usage: python benchmarks/run_glow_chain_inproc.py WORKDIR [base_epochs]
           [epochs_per_sigma] [--skip_train]
"""
import os
import runpy
import shutil
import sys
import time

# This file lives in benchmarks/, so sys.path[0] is benchmarks/ — the CLI
# scripts expect to run from the repo root with the package importable.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

SONG = "/root/reference/basis_sep_results/beethoven_sonata_1_sep_1min"
TINY = bool(os.environ.get("ASR_CHAIN_TINY"))  # CPU smoke-test mode
GLOW_HP = (["--L", "2", "--K", "2", "--n_filters", "8"] if TINY else
           ["--L", "3", "--K", "40", "--n_filters", "512"]) + [
    "--learntop", "--optimizer", "adamax", "--learning_rate", "0.001",
    "--clipnorm", "1000", "--batch_size", "4" if TINY else "32",
    "--scale", "dB"]
# Reference [0.01, 1] schedule mapped to the dB span 120 (see the shell
# runner's header for the exact-invariance argument).
SIG = ["--sigma1", "120.0", "--sigmaL", "1.2",
       "--num_classes", "2" if TINY else "10",
       "--progression", "logarithmic"]
SEP = (["--n_mixed", "2", "--T", "2"] if TINY else
       ["--n_mixed", "28", "--T", "100"])


def run_stage(script, argv):
    print(f"\n===== STAGE {script} {' '.join(argv)}", flush=True)
    t = time.time()
    old_argv = sys.argv
    # The CLI scripts chdir into their output dir (reference out.log
    # convention) — restore the repo root before each stage.
    os.chdir(_ROOT)
    try:
        sys.argv = [script] + argv
        runpy.run_path(os.path.join(_ROOT, script), run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(_ROOT)
    print(f"===== STAGE DONE {script} in {time.time() - t:.1f}s", flush=True)


def main():
    r = sys.argv[1]
    base_epochs = sys.argv[2] if len(sys.argv) > 2 else "120"
    sigma_epochs = sys.argv[3] if len(sys.argv) > 3 else "8"
    skip_train = "--skip_train" in sys.argv

    if not skip_train:
        for inst in ("piano", "violin"):
            if not os.path.exists(f"{r}/glow_{inst}/ckpts/checkpoint.json"):
                run_stage("train_glow.py", [
                    "--dataset", f"{r}/{inst}_ds", "--output",
                    f"{r}/glow_{inst}", "--debug", "--n_epochs", base_epochs,
                ] + GLOW_HP)
        for inst in ("piano", "violin"):
            if not os.path.exists(
                    f"{r}/noisy_glow_{inst}/sigma_1.2/ckpts/checkpoint.json"):
                run_stage("train_noisy_glow.py", [
                    f"{r}/glow_{inst}", "--dataset", f"{r}/{inst}_ds",
                    "--output", f"{r}/noisy_glow_{inst}", "--debug",
                    "--reinit_actnorm", "--n_epochs", sigma_epochs,
                ] + GLOW_HP + SIG)

    os.makedirs(f"{r}/song", exist_ok=True)
    shutil.copy(f"{SONG}/mix.wav", f"{r}/song/mix.wav")
    shutil.copy(f"{SONG}/gt1.wav", f"{r}/song/piano.wav")
    shutil.copy(f"{SONG}/gt2.wav", f"{r}/song/violin.wav")
    run_stage("run_basis_sep.py", [
        f"{r}/noisy_glow_piano", f"{r}/noisy_glow_violin",
        "--output", f"{r}/basis", "--debug", "--dataset", "melspec",
        "--song_dir", f"{r}/song", "--model_type", "glow", "--scale", "dB",
        "--step_lr", "0.288", "--score_clip", "5.0",
    ] + SEP + SIG + GLOW_HP[:GLOW_HP.index("--learntop") + 1])


if __name__ == "__main__":
    main()
