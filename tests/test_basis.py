"""BASIS separation tests: mixing math, scan-vs-oracle, multi-chip sharding."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from audiosourcesep_tpu.models.ncsn import RefineNetDilated, get_sigmas
from audiosourcesep_tpu.parallel import (batch_sharding, make_mesh,
                                         make_source_mesh, params_by_source,
                                         replicate, shard_batch,
                                         source_sharding)
from audiosourcesep_tpu.separation import (BasisConfig, basis_separate,
                                           make_stacked_ncsn_score,
                                           mixing_process, postprocess,
                                           preprocess_mixture,
                                           source_sharded_ncsn_score,
                                           stack_pytrees)


class TestMixing:
    def test_image_mean(self):
        g, gg = mixing_process("image")
        s = jnp.stack([jnp.ones((2, 3)), 3 * jnp.ones((2, 3))])
        np.testing.assert_allclose(np.asarray(g(s)), 2.0)
        np.testing.assert_allclose(np.asarray(gg(s)), 0.5)

    def test_db_logsumexp_and_softmax(self):
        g, gg = mixing_process("melspec", "dB")
        x = jnp.asarray([[-20.0], [-10.0]])
        # mixture in power domain: mean of powers, back to dB
        expected = 10 * math.log10((10 ** -2 + 10 ** -1) / 2)
        np.testing.assert_allclose(float(g(x)[0]), expected, rtol=1e-5)
        grads = np.asarray(gg(x))
        np.testing.assert_allclose(grads.sum(axis=0), 1.0, rtol=1e-5)
        # softmax weights proportional to linear powers
        np.testing.assert_allclose(grads[1] / grads[0], 10.0, rtol=1e-4)

    def test_power_scale_reference_expression(self):
        g, gg = mixing_process("melspec", "power")
        x = jnp.asarray([[4.0], [16.0]])
        np.testing.assert_allclose(float(g(x)[0]), 9.0, rtol=1e-6)
        ref = (math.sqrt(9.0) / np.sqrt([4.0, 16.0])) * 3.0
        np.testing.assert_allclose(np.asarray(gg(x))[:, 0], ref, rtol=1e-4)


class TestBasisCore:
    def test_matches_numpy_oracle_with_analytic_score(self):
        """Gaussian prior score; BASIS scan must equal an explicit loop."""
        sigmas = get_sigmas(1.0, 0.1, 3)
        mu = jnp.asarray([0.7])

        def score_fn(x, labels, level):
            return -(x - mu)

        mixed = 0.5 * jnp.ones((4, 2, 2, 1))
        x0 = jnp.zeros((2, 4, 2, 2, 1))
        rng = jax.random.PRNGKey(0)
        cfg = BasisConfig(T=3, delta=1e-3, data_type="melspec", scale="dB")
        out, traj = basis_separate(score_fn, mixed, x0, sigmas, rng, cfg)
        assert out.shape == x0.shape
        assert traj.shape == (4, 2, 4, 2, 2, 1)

        # oracle loop with identical rng folding
        from audiosourcesep_tpu.separation.mixing import mixing_process as mp
        g, gg = mp("melspec", "dB")
        x = x0
        lkeys = jax.random.split(rng, 3)
        for lvl in range(3):
            sigma = sigmas[lvl]
            eta = 1e-3 * (sigma / sigmas[-1]) ** 2
            lam = 1.0 / sigma ** 2
            for k in jax.random.split(lkeys[lvl], 3):
                noise = jax.random.normal(k, x.shape) * np.sqrt(2 * eta)
                s = score_fn(x, None, lvl)
                x = x + eta * (s + lam * gg(x) * (mixed - g(x))) + noise
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_ncsn_stacked_score_equals_separate_models(self):
        sigmas = get_sigmas(1.0, 0.1, 3)
        model = RefineNetDilated((8, 8, 1), 4, num_classes=3)
        p1 = model.init_params(jax.random.PRNGKey(1))
        p2 = model.init_params(jax.random.PRNGKey(2))
        stacked = stack_pytrees(p1, p2)
        score = make_stacked_ncsn_score(model.apply, stacked)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8, 1))
        labels = jnp.zeros((4,), jnp.int32)
        out = score(x, labels, 0)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(model.apply(p1, x[0], labels)),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   np.asarray(model.apply(p2, x[1], labels)),
                                   rtol=2e-4, atol=2e-5)

    def test_pre_post_processing_roundtrip(self):
        x = jnp.linspace(-99.0, 19.0, 16).reshape(1, 4, 4, 1)
        pre = preprocess_mixture(x, -100.0, 20.0)
        post = postprocess(pre, -100.0, 20.0)
        np.testing.assert_allclose(np.asarray(post), np.asarray(x),
                                   atol=1e-3)


class TestMultiChip:
    def test_basis_sharded_matches_single_device(self):
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
        sigmas = get_sigmas(1.0, 0.1, 2)
        model = RefineNetDilated((8, 8, 1), 4, num_classes=2)
        p1 = model.init_params(jax.random.PRNGKey(4))
        p2 = model.init_params(jax.random.PRNGKey(5))
        stacked = stack_pytrees(p1, p2)
        score = make_stacked_ncsn_score(model.apply, stacked)
        mixed = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 1))
        x0 = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 8, 8, 1))
        rng = jax.random.PRNGKey(8)
        cfg = BasisConfig(T=2, delta=1e-4, collect_trajectory=False)

        ref, _ = basis_separate(score, mixed, x0, sigmas, rng, cfg)

        mesh = make_mesh()
        # shard the frame batch (axis 1 of x, axis 0 of mixed)
        x0_s = shard_batch(x0, mesh, batch_axis=1)
        mixed_s = shard_batch(mixed, mesh, batch_axis=0)
        stacked_r = replicate(stacked, mesh)
        score_s = make_stacked_ncsn_score(model.apply, stacked_r)
        out, _ = jax.jit(
            lambda m, x: basis_separate(score_s, m, x, sigmas, rng, cfg)
        )(mixed_s, x0_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_source_sharded_matches_single_device(self):
        """(source, frame) 2-D mesh path == unsharded math.

        The source-sharded layout (one model per chip row, shard_map'd
        plain-conv score eval, mixing softmax all-reduced by XLA) must be
        numerically the sequential/stacked computation; rng draws are over
        the logical arrays so noise matches bit-for-bit."""
        from audiosourcesep_tpu.separation import (basis_separate_per_level,
                                                   ncsn_score_fn)
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
        sigmas = get_sigmas(1.0, 0.1, 2)
        model = RefineNetDilated((8, 8, 1), 4, num_classes=2)
        p1 = model.init_params(jax.random.PRNGKey(14))
        p2 = model.init_params(jax.random.PRNGKey(15))
        stacked = stack_pytrees(p1, p2)
        mixed = jax.random.normal(jax.random.PRNGKey(16), (8, 8, 8, 1))
        x0 = jax.random.uniform(jax.random.PRNGKey(17), (2, 8, 8, 8, 1))
        rng = jax.random.PRNGKey(18)
        cfg = BasisConfig(T=2, delta=1e-4, collect_trajectory=False)

        ref, _ = basis_separate_per_level(
            ncsn_score_fn(model.apply), stacked, mixed, x0, sigmas, rng,
            cfg)

        mesh = make_source_mesh(2)
        assert mesh.devices.shape == (2, 4)
        x0_s = jax.device_put(x0, source_sharding(mesh))
        mixed_s = shard_batch(mixed, mesh, batch_axis=0)
        params_s = params_by_source(stacked, mesh)
        score_s = source_sharded_ncsn_score(model.apply, mesh)
        out, _ = basis_separate_per_level(score_s, params_s, mixed_s,
                                          x0_s, sigmas, rng, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_source_sharded_glow_matches_single_device(self):
        """Glow-prior (source, frame) mesh path == unsharded math.

        Each chip row holds ONE source's sigma-stacked flow params and
        grads through its own flow on its frame shard; the level index is
        a replicated scalar selected inside the shard. Must equal the
        level-major glow_score_fn path bit-closely."""
        from audiosourcesep_tpu.models import build_glow
        from audiosourcesep_tpu.separation import (
            basis_separate_per_level, glow_score_fn,
            source_sharded_glow_score)
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
        minibatch = jax.random.normal(
            jax.random.PRNGKey(30), (16, 8, 8, 1)) * 20.0 - 60.0
        model, p_a = build_glow(jax.random.PRNGKey(31), minibatch,
                                (8, 8, 1), L=2, K=2, n_filters=8,
                                learntop=True, data_type="melspec",
                                minval=-100.0, maxval=20.0)
        _, p_b = build_glow(jax.random.PRNGKey(32), minibatch,
                            (8, 8, 1), L=2, K=2, n_filters=8,
                            learntop=True, data_type="melspec",
                            minval=-100.0, maxval=20.0)
        sigmas = get_sigmas(1.0, 0.1, 2)
        mixed = jax.random.normal(jax.random.PRNGKey(33), (8, 8, 8, 1))
        x0 = (jax.random.uniform(jax.random.PRNGKey(34), (2, 8, 8, 8, 1))
              * 120.0 - 100.0)
        rng = jax.random.PRNGKey(35)
        cfg = BasisConfig(T=2, delta=1e-4, collect_trajectory=False,
                          score_clip=5.0)

        # level-major [L_sigma, K, ...] reference (same params each level)
        level_major = stack_pytrees(*[stack_pytrees(p_a, p_b)
                                      for _ in sigmas])
        ref, _ = basis_separate_per_level(
            glow_score_fn(model.log_prob), level_major, mixed, x0, sigmas,
            rng, cfg)

        # source-major [K, L_sigma, ...] sharded run
        mesh = make_source_mesh(2)
        source_major = stack_pytrees(
            *[stack_pytrees(*[p for _ in sigmas]) for p in (p_a, p_b)])
        params_s = params_by_source(source_major, mesh)
        x0_s = jax.device_put(x0, source_sharding(mesh))
        mixed_s = shard_batch(mixed, mesh, batch_axis=0)
        score_s = source_sharded_glow_score(model.log_prob, mesh)
        out, _ = basis_separate_per_level(score_s, params_s, mixed_s,
                                          x0_s, sigmas, rng, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestPerLevelDispatch:
    def test_matches_single_program(self):
        from audiosourcesep_tpu.separation import (basis_separate_per_level,
                                                   ncsn_score_fn)
        sigmas = get_sigmas(1.0, 0.1, 3)
        model = RefineNetDilated((8, 8, 1), 4, num_classes=3)
        p1 = model.init_params(jax.random.PRNGKey(20))
        p2 = model.init_params(jax.random.PRNGKey(21))
        stacked = stack_pytrees(p1, p2)
        mixed = jax.random.normal(jax.random.PRNGKey(22), (4, 8, 8, 1))
        x0 = jax.random.uniform(jax.random.PRNGKey(23), (2, 4, 8, 8, 1))
        rng = jax.random.PRNGKey(24)
        cfg = BasisConfig(T=2, delta=1e-4)

        score_bound = make_stacked_ncsn_score(model.apply, stacked)
        ref, ref_traj = basis_separate(score_bound, mixed, x0, sigmas, rng,
                                       cfg)
        out, traj = basis_separate_per_level(
            ncsn_score_fn(model.apply), stacked, mixed, x0, sigmas, rng,
            cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(traj), np.asarray(ref_traj),
                                   rtol=2e-4, atol=2e-5)

    def test_score_clip_tames_exploding_scores(self):
        """score_clip bounds a pathological score at +-clip/sigma (the
        smoothed-score scale); without it the same run diverges. Guards
        the grad-through-flow (Glow) separation path."""
        from audiosourcesep_tpu.separation import basis_separate_per_level
        sigmas = get_sigmas(1.0, 0.1, 2)

        def exploding_score(params, x, labels, level):
            return jnp.full_like(x, 1e12)

        mixed = jnp.full((2, 8, 8, 1), 0.5)
        x0 = jnp.full((2, 2, 8, 8, 1), 0.5)
        rng = jax.random.PRNGKey(30)
        base = dict(T=3, delta=1e-2, data_type="image", scale="dB")
        out_clip, _ = basis_separate_per_level(
            exploding_score, (), mixed, x0, sigmas, rng,
            BasisConfig(**base, score_clip=5.0))
        out_raw, _ = basis_separate_per_level(
            exploding_score, (), mixed, x0, sigmas, rng,
            BasisConfig(**base))
        assert bool(jnp.isfinite(out_clip).all())
        # clipped drift per step is at most eta * (clip/sigma + recon)
        assert float(jnp.max(jnp.abs(out_clip))) < 10.0
        assert float(jnp.max(jnp.abs(out_raw))) > 1e6

    def test_callback_invoked(self):
        from audiosourcesep_tpu.separation import (basis_separate_per_level,
                                                   ncsn_score_fn)
        sigmas = get_sigmas(1.0, 0.1, 2)
        model = RefineNetDilated((8, 8, 1), 4, num_classes=2)
        stacked = stack_pytrees(model.init_params(jax.random.PRNGKey(25)),
                                model.init_params(jax.random.PRNGKey(26)))
        levels = []
        basis_separate_per_level(
            ncsn_score_fn(model.apply), stacked,
            jnp.zeros((2, 8, 8, 1)), jnp.zeros((2, 2, 8, 8, 1)), sigmas,
            jax.random.PRNGKey(27), BasisConfig(T=1),
            callback=lambda lvl, x: levels.append(lvl))
        assert levels == [0, 1]


class TestGlowPriorPath:
    def test_per_level_glow_score_selects_level_params(self):
        from audiosourcesep_tpu.separation import glow_score_fn
        # analytic "flow": log p(x) = -0.5 * sum((x - mu)^2) with per-level,
        # per-source mu stored as stacked params [L, K, 1]
        mus = jnp.asarray([[[0.0], [1.0]], [[2.0], [3.0]]])  # [L=2, K=2, 1]

        def log_prob(params, x):
            return -0.5 * jnp.sum((x - params) ** 2, axis=(1, 2, 3))

        score = glow_score_fn(log_prob)
        x = jnp.zeros((2, 3, 2, 2, 1))
        s0 = np.asarray(score(mus, x, jnp.zeros((3,), jnp.int32), 0))
        s1 = np.asarray(score(mus, x, jnp.zeros((3,), jnp.int32), 1))
        # score = -(x - mu) = mu at x=0
        np.testing.assert_allclose(s0[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(s0[1], 1.0, atol=1e-6)
        np.testing.assert_allclose(s1[0], 2.0, atol=1e-6)
        np.testing.assert_allclose(s1[1], 3.0, atol=1e-6)

    def test_frame_chunked_glow_score_matches_full_batch(self):
        """--score_chunk (HBM bound for the production-scale VJP) is
        exact: frames are independent, so lax.map over frame chunks must
        reproduce the full-batch score bit-for-bit, including the
        pad-to-multiple path (n not divisible by the chunk)."""
        from audiosourcesep_tpu.models.flow_builder import build_glow
        from audiosourcesep_tpu.separation import glow_score_fn

        key = jax.random.PRNGKey(3)
        mb = jax.random.normal(key, (2, 8, 8, 1)) * 20.0 - 60.0
        model, params = build_glow(key, mb, (8, 8, 1), L=2, K=2,
                                   n_filters=8, learntop=True,
                                   data_type="melspec", use_logit=False,
                                   minval=-100.0, maxval=20.0)
        stacked = stack_pytrees(stack_pytrees(params, params),
                                stack_pytrees(params, params))  # [L=2, K=2]
        x = jax.random.normal(jax.random.PRNGKey(4),
                              (2, 7, 8, 8, 1)) * 20.0 - 60.0
        labels = jnp.zeros((7,), jnp.int32)
        full = glow_score_fn(model.log_prob)
        for chunk in (3, 7, 16):
            chunked = glow_score_fn(model.log_prob, frame_chunk=chunk)
            for level in (0, 1):
                np.testing.assert_allclose(
                    np.asarray(chunked(stacked, x, labels, level)),
                    np.asarray(full(stacked, x, labels, level)),
                    rtol=1e-6, atol=1e-6)


class TestGlowSeparationQuality:
    """Separation *quality* (not just finiteness) for the Glow-prior path.

    Glow priors are trained on raw dB-scale data (their SpecPreprocessing
    bijector rescales internally), so BASIS must run in data scale. Two
    tiny Glow priors are trained on structurally distinct dB 'spectrogram'
    distributions (tone rows at different mel bins); after separation each
    estimate must adopt its own prior's structure. Running the glow path
    at the wrong scale (e.g. the round-1 [0,1] preprocessing) makes the
    prior gradient meaningless and this test fails.
    """

    H = W = 8
    MINV, MAXV = -100.0, 20.0

    def _make_source(self, rng, rows, n):
        x = rng.normal(-80.0, 2.0, size=(n, self.H, self.W, 1))
        for r in rows:
            x[:, r, :, 0] = rng.normal(0.0, 2.0, size=(n, self.W))
        return np.clip(x, self.MINV, self.MAXV).astype(np.float32)

    def _train_prior(self, key, data, steps=350):
        import optax
        from audiosourcesep_tpu.models import build_glow
        model, params = build_glow(key, jnp.asarray(data[:32]),
                                   (self.H, self.W, 1), L=2, K=2,
                                   n_filters=16, learntop=True,
                                   data_type="melspec", minval=self.MINV,
                                   maxval=self.MAXV)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, batch, k):
            loss, g = jax.value_and_grad(
                lambda p: -jnp.mean(model.log_prob(p, batch, k)))(params)
            up, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, up), opt_state, loss

        k = jax.random.PRNGKey(1)
        data = jnp.asarray(data)
        for _ in range(steps):
            k, k1, k2 = jax.random.split(k, 3)
            idx = jax.random.randint(k1, (32,), 0, data.shape[0])
            params, opt_state, _ = step(params, opt_state, data[idx], k2)
        return model, params

    def test_data_scale_glow_basis_separates_structure(self):
        from audiosourcesep_tpu.models.ncsn import get_sigmas
        from audiosourcesep_tpu.separation import (basis_separate_per_level,
                                                   glow_score_fn)
        rng = np.random.RandomState(0)
        rows_a, rows_b = (1, 2), (5, 6)
        data_a = self._make_source(rng, rows_a, 256)
        data_b = self._make_source(rng, rows_b, 256)
        model, p_a = self._train_prior(jax.random.PRNGKey(0), data_a)
        _, p_b = self._train_prior(jax.random.PRNGKey(3), data_b)

        g, _ = mixing_process("melspec", "dB")
        gt_a, gt_b = jnp.asarray(data_a[:4]), jnp.asarray(data_b[:4])
        mixed = g(jnp.stack([gt_a, gt_b]))

        sigmas = get_sigmas(1.0, 0.01, 5)
        per_level = stack_pytrees(
            *[stack_pytrees(p_a, p_b) for _ in sigmas])
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        # data-scale uniform init, as the driver does for glow priors
        x0 = jnp.stack([
            jax.random.uniform(k1, gt_a.shape, minval=self.MINV,
                               maxval=self.MAXV),
            jax.random.uniform(k2, gt_a.shape, minval=self.MINV,
                               maxval=self.MAXV)])
        cfg = BasisConfig(T=50, delta=2e-5, data_type="melspec",
                          scale="dB", collect_trajectory=False)
        out, _ = basis_separate_per_level(
            glow_score_fn(model.log_prob), per_level, mixed, x0, sigmas,
            k3, cfg)
        x1, x2 = np.asarray(out[0]), np.asarray(out[1])

        def row_energy(x, rows):
            return float(np.mean([x[:, r].mean() for r in rows]))

        # each estimate adopts its own prior's tone rows (>= 5 dB margin)
        assert row_energy(x1, rows_a) > row_energy(x1, rows_b) + 5.0
        assert row_energy(x2, rows_b) > row_energy(x2, rows_a) + 5.0
        # and the mixture constraint is satisfied in the dB mixing model
        err = np.abs(np.asarray(g(out)) - np.asarray(mixed)).mean()
        assert err < 1.0, err


class TestBasisConvergence:
    def test_separates_toward_prior_means_under_mixture_constraint(self):
        """With sharp Gaussian priors at mu1/mu2 and mixed = mean(mu1, mu2)
        (image mixing), BASIS must drive x1 -> mu1, x2 -> mu2."""
        from audiosourcesep_tpu.separation import basis_separate_per_level
        mu = jnp.asarray([0.8, -0.4]).reshape(2, 1, 1, 1, 1)  # [K, n, h, w, c]

        def score_fn(params, x, labels, level):
            return -(x - mu) * 5.0                       # moderate priors

        sigmas = get_sigmas(1.0, 0.01, 8)
        mixed = jnp.full((4, 2, 2, 1), float((0.8 - 0.4) / 2))
        x0 = jnp.zeros((2, 4, 2, 2, 1))
        cfg = BasisConfig(T=100, delta=2e-5, data_type="image",
                          collect_trajectory=False)
        out, _ = basis_separate_per_level(score_fn, None, mixed, x0, sigmas,
                                          jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(np.asarray(out[0]).mean(), 0.8, atol=0.2)
        np.testing.assert_allclose(np.asarray(out[1]).mean(), -0.4,
                                   atol=0.2)
        # mixture constraint satisfied
        np.testing.assert_allclose(np.asarray(out.mean(axis=0)),
                                   np.asarray(mixed), atol=0.2)
