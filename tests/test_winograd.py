"""Winograd F(2x2,3x3) conv: reference-composite and Pallas-kernel
(interpret mode) equivalence with the XLA conv, VJP equivalence, and
dispatcher routing (ops/winograd.py, nn.conv2d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiosourcesep_tpu.nn as nn
from audiosourcesep_tpu.ops.winograd import (transform_weights,
                                             winograd_conv2d,
                                             winograd_conv2d_reference,
                                             winograd_eligible,
                                             _pick_tile_rows)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestWinogradMath:
    def test_weight_transform_shape(self):
        w = jnp.ones((3, 3, 5, 7))
        assert transform_weights(w).shape == (16, 5, 7)

    @pytest.mark.parametrize("shape,cout", [((2, 8, 12, 5), 7),
                                            ((1, 4, 4, 3), 2),
                                            ((3, 10, 6, 4), 4)])
    def test_reference_matches_xla_conv(self, shape, cout):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, shape)
        w = jax.random.normal(k2, (3, 3, shape[-1], cout)) * 0.3
        np.testing.assert_allclose(winograd_conv2d_reference(x, w),
                                   xla_conv(x, w), atol=2e-5)

    def test_pallas_interpret_matches_xla_conv(self):
        # shape chosen so the grid has >1 row-block and >1 batch entry
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(k1, (2, 12, 8, 64))
        w = jax.random.normal(k2, (3, 3, 64, 64)) * 0.1
        np.testing.assert_allclose(winograd_conv2d(x, w, True),
                                   xla_conv(x, w), atol=2e-4)

    def test_vjp_matches_xla_conv(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(k1, (1, 4, 4, 64))
        w = jax.random.normal(k2, (3, 3, 64, 64)) * 0.1

        gx1, gw1 = jax.grad(
            lambda a, b: jnp.sum(winograd_conv2d(a, b, True) ** 2),
            argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(
            lambda a, b: jnp.sum(xla_conv(a, b) ** 2), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(gx1, gx2, atol=1e-3)
        np.testing.assert_allclose(gw1, gw2, atol=1e-3)


class TestDilatedPhases:
    @pytest.mark.parametrize("d", [2, 4])
    def test_matches_xla_dilated_conv(self, d):
        from audiosourcesep_tpu.ops.winograd import dilated_winograd_conv2d
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (1, 8 * d, 4 * d, 64))
        w = jax.random.normal(k2, (3, 3, 64, 64)) * 0.1
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = dilated_winograd_conv2d(x, w, d, True)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_dilated_eligibility(self):
        from audiosourcesep_tpu.ops.winograd import dilated_eligible
        # the cascade's dilated convs (score_network.py:121-178)
        assert dilated_eligible((60, 48, 32, 384), (3, 3, 384, 384),
                                dilation=2, itemsize=2)
        assert dilated_eligible((60, 48, 32, 384), (3, 3, 384, 384),
                                dilation=4, itemsize=2)
        assert not dilated_eligible((60, 48, 32, 384), (3, 3, 384, 384),
                                    dilation=1, itemsize=2)
        # phase grid must stay even
        assert not dilated_eligible((60, 42, 32, 384), (3, 3, 384, 384),
                                    dilation=2, itemsize=2)
        # itemsize is required so VMEM fit is always judged at the true
        # element width: this shape fits the tile budget at bf16 but not
        # at f32 — a bf16 default would approve the f32 conv and trip
        # the kernel's trace-time assert
        assert dilated_eligible((8, 32, 32, 512), (3, 3, 512, 512),
                                dilation=2, itemsize=2)
        assert not dilated_eligible((8, 32, 32, 512), (3, 3, 512, 512),
                                    dilation=2, itemsize=4)


class TestEligibility:
    def test_image_path_shapes_eligible(self):
        # the kernel wins only where XLA's conv underperforms: the
        # small-spatial 128-multiple-channel image path (32x32@128)
        assert winograd_eligible((20, 32, 32, 128), (3, 3, 128, 128))
        assert winograd_eligible((20, 16, 16, 256), (3, 3, 256, 256))

    def test_ineligible_cases(self):
        # separation model classes: XLA's conv runs at 88-100% of bf16
        # peak there and the kernel measured slower (benchmarks/profile_winograd.py)
        assert not winograd_eligible((60, 48, 32, 384), (3, 3, 384, 384))
        assert not winograd_eligible((60, 96, 64, 192), (3, 3, 192, 384))
        # cout=192: XLA's conv lowering beats the padded-N matmul ceiling
        assert not winograd_eligible((20, 32, 32, 192), (3, 3, 192, 192))
        assert not winograd_eligible((2, 32, 32, 128), (3, 3, 128, 128),
                                     stride=2)
        assert not winograd_eligible((2, 32, 32, 128), (3, 3, 128, 128),
                                     dilation=2)
        assert not winograd_eligible((2, 31, 32, 128), (3, 3, 128, 128))
        assert not winograd_eligible((2, 32, 32, 1), (3, 3, 1, 128))
        assert not winograd_eligible((2, 32, 32, 128), (1, 1, 128, 128))

    def test_tile_rows_divide_and_fit(self):
        for (h, w, cin, cout) in [(96, 64, 192, 192), (48, 32, 384, 384),
                                  (48, 32, 192, 192), (32, 32, 128, 128)]:
            tr = _pick_tile_rows(h // 2, w // 2, cin, cout)
            assert tr is not None and (h // 2) % tr == 0
            assert tr * (w // 2) <= 256


class TestDispatcher:
    def test_conv2d_routes_when_enabled(self, monkeypatch):
        calls = []

        def spy(x, kernel, interpret=False):
            calls.append(x.shape)
            return xla_conv(x, kernel.astype(x.dtype))

        import audiosourcesep_tpu.ops.winograd as wino
        monkeypatch.setattr(wino, "winograd_conv2d", spy)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        params = {"kernel": jnp.ones((3, 3, 64, 128)) * 0.01,
                  "bias": jnp.zeros(128)}
        x = jnp.ones((1, 4, 4, 64))
        try:
            nn.set_winograd(True)
            y = nn.conv2d(params, x)
            assert calls == [(1, 4, 4, 64)]
            # ineligible (dilated) falls back to XLA without routing
            nn.conv2d(params, x, dilation=2)
            assert len(calls) == 1
        finally:
            nn.set_winograd(False)
        np.testing.assert_allclose(
            y, xla_conv(x, params["kernel"]) + params["bias"], atol=1e-5)

    def test_conv2d_default_off(self, monkeypatch):
        def boom(*a, **k):
            raise AssertionError("winograd must not route when disabled")

        import audiosourcesep_tpu.ops.winograd as wino
        monkeypatch.setattr(wino, "winograd_conv2d", boom)
        params = {"kernel": jnp.ones((3, 3, 64, 64)) * 0.01}
        nn.conv2d(params, jnp.ones((1, 4, 4, 64)))
