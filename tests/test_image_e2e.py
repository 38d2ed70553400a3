"""End-to-end image/toy-data path at tiny scale (CPU).

Covers the reference's MNIST branch (run_basis_sep.py:263-450 image path,
train_realnvp.py:22-65, data_loader.py:10-66) using the offline digits
stand-in cache built by scripts/build_mnist_cache.py. The thesis's
MNIST-parity numbers (Tables 3.1/3.2) need the real MNIST IDX files; this
suite proves the pipeline itself — loader, RealNVP training, NCSN training
on images, image-mixture BASIS separation, PSNR computation — executes and
produces the reference's output contracts.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mnist_cache(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cache") / "mnist.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/build_mnist_cache.py"),
         "--synthetic-digits", "--out", path],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return path


def run_cli(mnist_cache, script, *args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["ASR_MNIST_NPZ"] = mnist_cache
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, cwd=cwd or REPO, timeout=1200,
        env=env)
    assert result.returncode == 0, (
        f"{script} failed:\nSTDOUT:\n{result.stdout[-3000:]}\n"
        f"STDERR:\n{result.stderr[-3000:]}")
    return result


def test_load_toydata_shapes(mnist_cache, monkeypatch):
    monkeypatch.setenv("ASR_MNIST_NPZ", mnist_cache)
    from audiosourcesep_tpu.data import load_toydata, get_mixture_toydata

    ds_train, ds_test, minibatch = load_toydata("mnist", batch_size=16)
    assert minibatch.shape == (16, 32, 32, 1)     # padded 28 -> 32
    assert minibatch.dtype == np.float32
    assert 0.0 <= minibatch.min() and minibatch.max() < 256.0

    # multi-host: eval batch is per-host so small shards still yield
    # batches, and the reported counts stay GLOBAL
    tr2, te2, _ = load_toydata("mnist", batch_size=16,
                               num_hosts=2, host_id=0)
    assert te2.batch_size == min(5000, te2.n_global) // 2
    assert len(te2) >= 1
    assert tr2.n_global == ds_train.n_global
    assert te2.n_global == ds_test.n_global

    mixed, gt1, gt2, mb = get_mixture_toydata("mnist", n_mixed=4)
    assert mixed.shape == (4, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(mixed),
                               (np.asarray(gt1) + np.asarray(gt2)) / 2.0,
                               rtol=1e-6)


def test_train_realnvp(mnist_cache, tmp_path):
    out = str(tmp_path / "realnvp_tiny")
    r = run_cli(mnist_cache, "train_realnvp.py", "--output", out, "--debug",
                "--n_filters", "4", "--n_blocks", "1", "--n_epochs", "1",
                "--batch_size", "64")
    assert "Validation bits/dim" in r.stdout
    bpd = float(r.stdout.split("Validation bits/dim:")[1].split()[0])
    assert np.isfinite(bpd)


@pytest.fixture(scope="module")
def trained_image_ncsn(mnist_cache, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("runs") / "ncsn_image_tiny")
    run_cli(mnist_cache, "train_ncsn.py", "--dataset", "mnist",
            "--output", out, "--debug", "--n_filters", "4",
            "--num_classes", "2", "--n_epochs", "1", "--batch_size", "16",
            "--T", "1", "--version", "v1")
    assert os.path.exists(os.path.join(out, "ckpts", "checkpoint.json"))
    return out


def test_basis_image_separation(mnist_cache, trained_image_ncsn, tmp_path):
    """Image-mixture BASIS (reference run_basis_sep.py image branch) with a
    PSNR check on the results.npz contract."""
    out = str(tmp_path / "basis_image")
    run_cli(mnist_cache, "run_basis_sep.py", trained_image_ncsn,
            trained_image_ncsn, "--output", out, "--debug",
            "--dataset", "mnist", "--model_type", "ncsn",
            "--n_filters", "4", "--num_classes", "2", "--T", "3",
            "--n_mixed", "2")
    res = np.load(os.path.join(out, "results.npz"))
    for key in ("x1", "x2", "gt1", "gt2", "mixed"):
        assert key in res, f"missing {key}"
    x1, gt1 = res["x1"], res["gt1"]
    assert x1.shape == gt1.shape == (2, 32, 32)
    assert np.isfinite(x1).all()
    # image postprocess quantises to integers in [0, 255]
    assert x1.min() >= 0.0 and x1.max() <= 255.0
    np.testing.assert_array_equal(x1, np.round(x1))
    # PSNR machinery (thesis Table 3.2 metric) — finite, not a quality claim
    # at this toy scale
    mse = np.mean((x1 - gt1) ** 2, axis=(1, 2))
    psnr = 10 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-12))
    assert np.isfinite(psnr).all()


def test_glow_basis_image_end_to_end(mnist_cache, tmp_path):
    """Glow-prior image BASIS: base Glow -> noisy-Glow sigma chain ->
    separation in DATA scale with span-scaled sigmas/step_lr (the
    [0,1]-schedule equivalence documented in benchmarks/basis_image_psnr.py;
    reference run_basis_sep.py:386-390 glow branch never ran as written)."""
    glow_hp = ["--L", "2", "--K", "1", "--n_filters", "8",
               "--batch_size", "64"]
    sig = ["--sigma1", "256.0", "--sigmaL", "2.56", "--num_classes", "2",
           "--progression", "logarithmic"]
    base = str(tmp_path / "glow_image_tiny")
    run_cli(mnist_cache, "train_glow.py", "--dataset", "mnist",
            "--output", base, "--debug", "--n_epochs", "1", *glow_hp)
    noisy = str(tmp_path / "noisy_glow_image_tiny")
    run_cli(mnist_cache, "train_noisy_glow.py", base, "--dataset", "mnist",
            "--output", noisy, "--debug", "--n_epochs", "1",
            *glow_hp, *sig)
    assert os.path.exists(os.path.join(noisy, "sigma_2.56", "ckpts",
                                       "checkpoint.json"))
    out = str(tmp_path / "basis_glow_image_tiny")
    run_cli(mnist_cache, "run_basis_sep.py", noisy, noisy, "--output", out,
            "--debug", "--dataset", "mnist", "--model_type", "glow",
            "--L", "2", "--K", "1", "--n_filters", "8",
            "--T", "2", "--step_lr", str(2e-5 * 256.0 * 256.0),
            "--n_mixed", "2", *sig)
    res = np.load(os.path.join(out, "results.npz"))
    x1 = res["x1"]
    assert x1.shape == (2, 32, 32)
    assert np.isfinite(x1).all()
    assert x1.min() >= 0.0 and x1.max() <= 255.0


def test_cifar10_cache_roundtrip(tmp_path, monkeypatch):
    """build_cifar10_cache.py on synthetic standard-format batches ->
    load_toydata('cifar10') shapes/range."""
    import pickle

    batches = tmp_path / "cifar-10-batches-py"
    batches.mkdir()
    rng = np.random.RandomState(0)

    def write_batch(name, n):
        with open(batches / name, "wb") as f:
            pickle.dump({b"data": rng.randint(
                0, 256, size=(n, 3072), dtype=np.uint8).astype(np.uint8),
                b"labels": list(rng.randint(0, 10, size=n))}, f)

    for i in range(1, 6):
        write_batch(f"data_batch_{i}", 20)
    write_batch("test_batch", 10)

    out = str(tmp_path / "cifar10.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/build_cifar10_cache.py"),
         str(batches), "--out", out],
        capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    monkeypatch.setenv("ASR_CIFAR10_NPZ", out)
    from audiosourcesep_tpu.data import load_toydata
    ds_train, ds_test, minibatch = load_toydata("cifar10", batch_size=10)
    assert minibatch.shape == (10, 32, 32, 3)
    assert ds_train.n_examples == 100 and ds_test.n_examples == 10
    assert minibatch.min() >= 0.0 and minibatch.max() < 256.0
