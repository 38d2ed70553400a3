"""NCSN score network tests: shapes, parameter parity, Langevin, DSM loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiosourcesep_tpu.models.ncsn import (RefineNetDilated,
                                            anneal_langevin_dynamics,
                                            dsm_loss, get_score_model,
                                            get_sigmas)


class TestSigmas:
    def test_geometric(self):
        s = get_sigmas(1.0, 0.01, 10, "geometric")
        assert s.shape == (10,)
        np.testing.assert_allclose(s[0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(s[-1], 0.01, rtol=1e-5)
        ratios = s[1:] / s[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)

    def test_logarithmic_matches_reference_values(self):
        # np.logspace(log10(1), log10(0.01), 10) from ncsn/utils.py:11
        s = get_sigmas(1.0, 0.01, 10, "logarithmic")
        ref = np.logspace(0, -2, 10)
        np.testing.assert_allclose(s, ref, rtol=1e-5)


class TestRefineNet:
    def test_v1_shape_and_param_parity(self):
        # reference piano run: 67,464,769 params (BASELINE.md; 192 filters,
        # (96,64,1), 10 classes)
        m = RefineNetDilated((96, 64, 1), 192, num_classes=10)
        p = m.init_params(jax.random.PRNGKey(0))
        assert m.count_params(p) == 67_464_769
        x = jnp.zeros((2, 96, 64, 1))
        out = m.apply(p, x, jnp.zeros((2,), jnp.int32))
        assert out.shape == (2, 96, 64, 1)

    def test_v1_conditioning_changes_output(self):
        m = RefineNetDilated((32, 32, 1), 16, num_classes=4)
        p = m.init_params(jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 1))
        o0 = m.apply(p, x, jnp.zeros((2,), jnp.int32))
        o3 = m.apply(p, x, 3 * jnp.ones((2,), jnp.int32))
        assert float(jnp.max(jnp.abs(o0 - o3))) > 1e-6

    def test_v2_sigma_division(self):
        sig = get_sigmas(1.0, 0.1, 4)
        m = RefineNetDilated((16, 16, 1), 8, sigmas=sig)
        p = m.init_params(jax.random.PRNGKey(3))
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 1))
        o0 = m.apply(p, x, jnp.zeros((2,), jnp.int32))
        o3 = m.apply(p, x, 3 * jnp.ones((2,), jnp.int32))
        # v2 conditions only through the sigma division
        np.testing.assert_allclose(np.asarray(o0 * sig[0]),
                                   np.asarray(o3 * sig[3]), rtol=1e-4,
                                   atol=1e-5)

    def test_v2_deeper_builds(self):
        sig = get_sigmas(1.0, 0.1, 3)
        m = get_score_model("v2", (32, 32, 1), 8, 3, sigmas=sig, deeper=True)
        p = m.init_params(jax.random.PRNGKey(5))
        out = m.apply(p, jnp.zeros((1, 32, 32, 1)),
                      jnp.zeros((1,), jnp.int32))
        assert out.shape == (1, 32, 32, 1)

    def test_odd_spatial_dims(self):
        # (96, 64) halves to (48, 32); refine path must resize back exactly
        m = RefineNetDilated((96, 64, 1), 8, num_classes=2)
        p = m.init_params(jax.random.PRNGKey(6))
        out = m.apply(p, jnp.zeros((1, 96, 64, 1)),
                      jnp.zeros((1,), jnp.int32))
        assert out.shape == (1, 96, 64, 1)


class TestInstanceNormPlus:
    def test_one_pass_variance_no_nan_on_large_means(self):
        # one-pass E[x^2]-E[x]^2 cancels catastrophically when means are
        # large relative to spread; unclamped it can go negative -> NaN
        # from rsqrt (advisor round-2 low finding)
        from audiosourcesep_tpu.models.ncsn.layers import _norm2dplus

        # per-channel constants with large magnitude: within-instance
        # variance ~0 with heavy cancellation, channel means far apart
        x = jnp.broadcast_to(
            jnp.asarray([1e4, -1e4, 3e4, 1.0])[None, None, None, :],
            (2, 8, 8, 4)) + 1e-2 * jax.random.normal(
                jax.random.PRNGKey(0), (2, 8, 8, 4))
        scale = jnp.ones((2, 4))
        alpha = jnp.ones((2, 4))
        bias = jnp.zeros((2, 4))
        out = _norm2dplus(x, scale, alpha, bias)
        assert np.isfinite(np.asarray(out)).all()


class TestDSMLoss:
    def _model(self):
        m = RefineNetDilated((16, 16, 1), 8, num_classes=4)
        p = m.init_params(jax.random.PRNGKey(7))
        return m, p

    def test_finite_and_scalar(self):
        m, p = self._model()
        sig = jnp.asarray(get_sigmas(1.0, 0.01, 4))
        X = jax.random.normal(jax.random.PRNGKey(8), (4, 16, 16, 1))
        loss = dsm_loss(m.apply, p, X, sig, jax.random.PRNGKey(9))
        assert loss.shape == ()
        assert bool(jnp.isfinite(loss))

    def test_matches_manual_computation(self):
        m, p = self._model()
        sig = jnp.asarray(get_sigmas(1.0, 0.01, 4))
        X = jax.random.normal(jax.random.PRNGKey(10), (4, 16, 16, 1))
        rng = jax.random.PRNGKey(11)
        loss = dsm_loss(m.apply, p, X, sig, rng)
        # manual recomputation with the same rng draws
        k_idx, k_noise = jax.random.split(rng)
        idx = jax.random.randint(k_idx, (4,), 0, 4)
        s = sig[idx][:, None, None, None]
        noise = jax.random.normal(k_noise, X.shape) * s
        scores = m.apply(p, X + noise, idx)
        target = -noise / s ** 2
        per_ex = 0.5 * jnp.sum((scores - target) ** 2, axis=(1, 2, 3))
        manual = jnp.mean(per_ex * s[:, 0, 0, 0] ** 2)
        np.testing.assert_allclose(float(loss), float(manual), rtol=1e-5)


class TestLangevin:
    def test_scan_matches_python_loop(self):
        sig = get_sigmas(1.0, 0.1, 3)
        m = RefineNetDilated((8, 8, 1), 4, num_classes=3)
        p = m.init_params(jax.random.PRNGKey(12))
        x0 = jax.random.uniform(jax.random.PRNGKey(13), (2, 8, 8, 1))
        rng = jax.random.PRNGKey(14)
        out = anneal_langevin_dynamics(m.apply, p, x0, sig, rng,
                                       n_steps_each=2, step_lr=1e-4)
        assert out.shape == x0.shape
        # python-loop oracle with identical rng folding
        x = x0
        level_keys = jax.random.split(rng, 3)
        for i in range(3):
            alpha = 1e-4 * (sig[i] / sig[-1]) ** 2
            labels = jnp.full((2,), i, jnp.int32)
            for k in jax.random.split(level_keys[i], 2):
                noise = jax.random.normal(k, x.shape) * jnp.sqrt(2 * alpha)
                x = x + alpha * m.apply(p, x, labels) + noise
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_return_arr_layout(self):
        sig = get_sigmas(1.0, 0.1, 3)
        m = RefineNetDilated((8, 8, 1), 4, num_classes=3)
        p = m.init_params(jax.random.PRNGKey(15))
        x0 = jnp.zeros((2, 8, 8, 1))
        arr = anneal_langevin_dynamics(m.apply, p, x0, sig,
                                       jax.random.PRNGKey(16),
                                       n_steps_each=1, return_arr=True)
        assert arr.shape == (4, 2, 8, 8, 1)
        np.testing.assert_allclose(np.asarray(arr[0]), 0.0)


class TestBF16Compute:
    def test_bf16_scores_close_to_f32(self):
        m32 = RefineNetDilated((16, 16, 1), 8, num_classes=4)
        m16 = RefineNetDilated((16, 16, 1), 8, num_classes=4,
                               compute_dtype=jnp.bfloat16)
        p = m32.init_params(jax.random.PRNGKey(30))
        x = jax.random.normal(jax.random.PRNGKey(31), (2, 16, 16, 1))
        idx = jnp.zeros((2,), jnp.int32)
        s32 = np.asarray(m32.apply(p, x, idx))
        s16 = np.asarray(m16.apply(p, x, idx))
        assert s16.dtype == np.float32  # output restored to input dtype
        denom = np.abs(s32).mean()
        assert np.abs(s16 - s32).mean() / denom < 0.05
