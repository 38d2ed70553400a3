"""Bijector correctness: exact invertibility + analytic log-dets.

Extends the reference's parameterized bijector test factory
(unittest_flow_models.py:25-51): every bijector must satisfy
``inverse(forward(x)) == x`` and, with a constant stub coupling net
(log_s = log 2, t = 1), match a hand-computed log-det. Additionally checks
gradient/log-det consistency of ``FlowModel.score`` against finite
differences.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiosourcesep_tpu.bijectors import (
    ActNorm, AffineCouplingMasked, AffineCouplingSplit, Chain,
    ConstantShiftAndLogScale, FlowModel, ImgPreprocessing, Invert,
    Invertible1x1Conv, IsotropicNormalPrior, LearnableDiagNormalPrior,
    ShiftAndLogScaleConvNet, ShiftAndLogScaleResNet, SpecPreprocessing,
    Squeeze, binary_mask, stacked_masked_couplings)
from audiosourcesep_tpu.models import GlowMultiScale, RealNVP, glow_step

LOG2 = math.log(2.0)


def check_roundtrip_and_logdet(bij, params, x, expected_fldj=None, atol=1e-4):
    y, fldj = bij.forward(params, x)
    x_rec, fldj_inv = bij.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=atol,
                               rtol=1e-4)
    # forward log-det reported by inverse must agree with forward's
    np.testing.assert_allclose(np.asarray(fldj), np.asarray(fldj_inv),
                               atol=atol, rtol=1e-4)
    if expected_fldj is not None:
        np.testing.assert_allclose(np.asarray(fldj),
                                   np.full(x.shape[0], expected_fldj),
                                   atol=atol, rtol=1e-4)
    return y, fldj


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


class TestMaskedCoupling:
    def test_channel_mask_logdet(self):
        # (2,2,2) event, channel mask state 0: (1-b) covers half the elems
        bij = AffineCouplingMasked(ConstantShiftAndLogScale(), "channel", 0)
        x = rand(0, (3, 2, 2, 2))
        params = bij.init_params(jax.random.PRNGKey(1), x)
        # 2*2 spatial * 1 channel masked-out => 4 elements * log2
        check_roundtrip_and_logdet(bij, params, x, 4 * LOG2)

    def test_checkerboard_mask_logdet(self):
        bij = AffineCouplingMasked(ConstantShiftAndLogScale(),
                                   "checkerboard", 0)
        x = rand(2, (3, 2, 2, 1))
        params = bij.init_params(jax.random.PRNGKey(1), x)
        # half of 2*2*1 elements transformed (reference: 2*log2,
        # unittest_flow_models.py:122-128)
        check_roundtrip_and_logdet(bij, params, x, 2 * LOG2)

    def test_mask_states_complementary(self):
        m0 = binary_mask((4, 6, 2), "checkerboard", 0)
        m1 = binary_mask((4, 6, 2), "checkerboard", 1)
        np.testing.assert_allclose(np.asarray(m0 + m1), 1.0)

    def test_real_net_roundtrip(self):
        bij = AffineCouplingMasked(ShiftAndLogScaleConvNet(8),
                                   "checkerboard", 1)
        x = rand(3, (2, 4, 4, 2))
        params = bij.init_params(jax.random.PRNGKey(4), x)
        check_roundtrip_and_logdet(bij, params, x)


class TestSplitCoupling:
    def test_constant_logdet(self):
        bij = AffineCouplingSplit(ConstantShiftAndLogScale())
        x = rand(5, (3, 2, 2, 2))
        params = bij.init_params(jax.random.PRNGKey(1), x)
        # xa half transformed: 2*2*1 = 4 elements * log2
        check_roundtrip_and_logdet(bij, params, x, 4 * LOG2)

    def test_conv_net_roundtrip(self):
        bij = AffineCouplingSplit(ShiftAndLogScaleConvNet(8))
        x = rand(6, (2, 4, 4, 4))
        params = bij.init_params(jax.random.PRNGKey(2), x)
        check_roundtrip_and_logdet(bij, params, x)

    def test_resnet_roundtrip(self):
        bij = AffineCouplingSplit(ShiftAndLogScaleResNet(8, 2))
        x = rand(7, (2, 4, 4, 4))
        params = bij.init_params(jax.random.PRNGKey(3), x)
        check_roundtrip_and_logdet(bij, params, x)


class TestActNorm:
    def test_data_dependent_init(self):
        bij = ActNorm()
        x = 3.0 + 2.0 * rand(8, (16, 4, 4, 3))
        params, y = bij.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))),
                                   0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))),
                                   1.0, atol=1e-3)

    def test_crafted_minibatch_logdet(self):
        # minibatch with per-channel std 2, mean 0 => log_scale = -log2,
        # log-det = -H*W*C*log2 (reference: 4*log2 magnitude on (2,2,1),
        # unittest_flow_models.py:149-154)
        bij = ActNorm(eps=0.0)
        base = jnp.array([1.0, -1.0, 1.0, -1.0] * 4).reshape(8, 2, 1, 1)
        x = 2.0 * base
        params = bij.init_params(jax.random.PRNGKey(0), x)
        check_roundtrip_and_logdet(bij, params, x, -2 * 1 * LOG2)

    def test_normalize_all(self):
        bij = ActNorm(normalize="all")
        x = rand(9, (8, 2, 2, 2))
        params = bij.init_params(jax.random.PRNGKey(0), x)
        check_roundtrip_and_logdet(bij, params, x)


class TestInvertible1x1Conv:
    def test_roundtrip_and_logdet_vs_slogdet(self):
        bij = Invertible1x1Conv()
        x = rand(10, (3, 4, 4, 6))
        params = bij.init_params(jax.random.PRNGKey(5), x)
        y, fldj = check_roundtrip_and_logdet(bij, params, x)
        # analytic log-det equals H*W*log|det W|
        L, U, _ = bij._assemble(params)
        W = params["P"] @ (L @ U)
        _, logdet = jnp.linalg.slogdet(W)
        np.testing.assert_allclose(np.asarray(fldj[0]),
                                   16 * float(logdet), atol=1e-4)


class TestSqueeze:
    def test_roundtrip_and_order(self):
        bij = Squeeze()
        x = jnp.arange(2 * 4 * 4 * 2, dtype=jnp.float32).reshape(2, 4, 4, 2)
        params = bij.init_params(jax.random.PRNGKey(0), x)
        y, fldj = bij.forward(params, x)
        assert y.shape == (2, 2, 2, 8)
        np.testing.assert_allclose(np.asarray(fldj), 0.0)
        x_rec, _ = bij.inverse(params, y)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x))
        # channel ordering matches reference transpose [0,1,3,5,2,4]:
        # output channels iterate (c, di, dj) with c outermost
        expected_first = [x[0, 0, 0, 0], x[0, 0, 1, 0], x[0, 1, 0, 0],
                          x[0, 1, 1, 0], x[0, 0, 0, 1], x[0, 0, 1, 1],
                          x[0, 1, 0, 1], x[0, 1, 1, 1]]
        np.testing.assert_allclose(np.asarray(y[0, 0, 0]),
                                   np.asarray(jnp.stack(expected_first)))


class TestPreprocessing:
    def test_img_logit_roundtrip(self):
        bij = ImgPreprocessing(alpha=0.05, use_logit=True)
        x = jnp.linspace(0.0, 255.0, 3 * 4 * 4).reshape(3, 4, 4, 1)
        params = ()
        y, fldj = bij.forward(params, x)
        x_rec, fldj_inv = bij.inverse(params, y)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(fldj), np.asarray(fldj_inv),
                                   rtol=1e-5)

    def test_img_dequant_consistent_logdet(self):
        bij = ImgPreprocessing(alpha=0.05, use_logit=True)
        x = jnp.full((2, 2, 2, 1), 100.0)
        rng = jax.random.PRNGKey(7)
        y1, f1 = bij.forward((), x, rng)
        y2, f2 = bij.forward((), x, rng)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))

    def test_spec_roundtrip_both_branches(self):
        for use_logit in (True, False):
            bij = SpecPreprocessing(minval=-100.0, maxval=20.0,
                                    alpha=1e-6, use_logit=use_logit)
            x = jnp.linspace(-99.0, 19.0, 2 * 4 * 4).reshape(2, 4, 4, 1)
            y, fldj = bij.forward((), x)
            x_rec, fldj_inv = bij.inverse((), y)
            np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(fldj),
                                       np.asarray(fldj_inv), rtol=1e-5)

    def test_spec_rescale_logdet_value(self):
        bij = SpecPreprocessing(minval=-100.0, maxval=20.0, use_logit=False)
        x = jnp.zeros((1, 2, 2, 1))
        _, fldj = bij.forward((), x)
        np.testing.assert_allclose(np.asarray(fldj[0]),
                                   -4 * math.log(120.0), rtol=1e-6)


class TestGlow:
    def test_glow_step_constant_net(self):
        step = glow_step(lambda: ConstantShiftAndLogScale())
        x = rand(11, (4, 2, 2, 2))
        params, _ = step.init(jax.random.PRNGKey(6), x)
        check_roundtrip_and_logdet(step, params, x)

    @pytest.mark.parametrize("L", [2, 3])
    def test_multiscale_roundtrip(self, L):
        H = W = 2 ** (L + 1)
        glow = GlowMultiScale(L, 2, lambda: ShiftAndLogScaleConvNet(4))
        x = rand(12 + L, (2, H, W, 1))
        params, z = glow.init(jax.random.PRNGKey(8), x)
        assert z.shape == (2, *glow.base_event_shape((H, W, 1)))
        check_roundtrip_and_logdet(glow, params, x, atol=1e-3)

    def test_multiscale_volume_preserved(self):
        glow = GlowMultiScale(2, 1, lambda: ShiftAndLogScaleConvNet(4))
        x = rand(15, (3, 8, 8, 1))
        params, z = glow.init(jax.random.PRNGKey(9), x)
        assert z.size == x.size


class TestRealNVP:
    def test_roundtrip(self):
        nvp = RealNVP(n_filters=4, n_blocks=1, preprocess=False)
        x = rand(16, (2, 4, 4, 1))
        params, z = nvp.init(jax.random.PRNGKey(10), x)
        assert z.shape == (2, 2, 2, 4)
        check_roundtrip_and_logdet(nvp, params, x, atol=1e-3)


class TestFlowModel:
    def _model(self, learntop):
        bij = Chain([
            ActNorm(),
            AffineCouplingMasked(ShiftAndLogScaleConvNet(4),
                                 "checkerboard", 0),
        ], name="toy")
        prior = (LearnableDiagNormalPrior((4, 4, 1)) if learntop
                 else IsotropicNormalPrior((4, 4, 1)))
        return FlowModel(bij, prior)

    @pytest.mark.parametrize("learntop", [False, True])
    def test_log_prob_matches_change_of_variables(self, learntop):
        model = self._model(learntop)
        x = rand(17, (8, 4, 4, 1))
        params = model.init(jax.random.PRNGKey(11), x)
        lp = model.log_prob(params, x)
        z, fldj = model.bijector.forward(params["bijector"], x)
        lp_manual = model.prior.log_prob(params["prior"], z) + fldj
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_manual),
                                   rtol=1e-5)

    def test_reinit_data_dependent_reanchors_actnorm_only(self):
        """reinit recomputes ONLY ActNorm stats against the new minibatch,
        keeps every trained weight, and preserves exact invertibility —
        the noisy-Glow recalibration pass (trainers.train_noisy_glow_chain
        reinit_actnorm; measured rationale in docs/DESIGN.md)."""
        model = self._model(False)
        x = rand(19, (8, 4, 4, 1))
        params = model.init(jax.random.PRNGKey(13), x)
        x_shift = x * 50.0 + 20.0     # far outside the fitted range
        p2 = model.reinit_data_dependent(params, x_shift)
        # actnorm leaves re-anchored: post-actnorm stats normalised again
        an = model.bijector.names[0]
        y, _ = ActNorm().forward(p2["bijector"][an], x_shift)
        np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))),
                                   0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))),
                                   1.0, atol=1e-3)
        # every non-actnorm leaf untouched
        cp = model.bijector.names[1]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            params["bijector"][cp], p2["bijector"][cp])
        # still an exact bijection with the re-anchored params
        z, fldj = model.bijector.forward(p2["bijector"], x_shift)
        back, ildj = model.bijector.inverse(p2["bijector"], z)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x_shift),
                                   rtol=1e-4, atol=1e-3)
        # protocol: inverse also returns the FORWARD log-det
        np.testing.assert_allclose(np.asarray(fldj), np.asarray(ildj),
                                   rtol=1e-5)

    def test_score_matches_finite_difference(self):
        model = self._model(False)
        x = rand(18, (2, 4, 4, 1))
        params = model.init(jax.random.PRNGKey(12), x)
        score = model.score(params, x)
        eps = 1e-3
        e = jnp.zeros_like(x).at[0, 1, 2, 0].set(eps)
        fd = (model.log_prob(params, x + e)[0]
              - model.log_prob(params, x - e)[0]) / (2 * eps)
        np.testing.assert_allclose(np.asarray(score[0, 1, 2, 0]),
                                   np.asarray(fd), rtol=1e-2, atol=1e-3)

    def test_sample_shape_and_finite(self):
        model = self._model(True)
        x = rand(19, (4, 4, 4, 1))
        params = model.init(jax.random.PRNGKey(13), x)
        s = model.sample(params, jax.random.PRNGKey(14), 5)
        assert s.shape == (5, 4, 4, 1)
        assert bool(jnp.all(jnp.isfinite(s)))

    def test_invert_wrapper(self):
        bij = ActNorm()
        x = rand(20, (4, 2, 2, 2))
        params = bij.init_params(jax.random.PRNGKey(15), x)
        inv = Invert(bij)
        y, fldj = inv.forward(params, x)
        x2, fldj2 = bij.inverse(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x2))
        np.testing.assert_allclose(np.asarray(fldj), -np.asarray(fldj2))


class TestStackedCouplings:
    def test_roundtrip(self):
        stack = stacked_masked_couplings(
            3, lambda: ShiftAndLogScaleConvNet(4), "checkerboard")
        x = rand(21, (2, 4, 4, 2))
        params, _ = stack.init(jax.random.PRNGKey(16), x)
        check_roundtrip_and_logdet(stack, params, x, atol=1e-3)
