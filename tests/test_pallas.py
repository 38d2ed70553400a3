"""Pallas kernel tests (interpret mode on CPU) vs XLA reference and the
layer implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from audiosourcesep_tpu.models.ncsn.layers import InstanceNorm2dPlus
from audiosourcesep_tpu.ops.pallas import (instance_norm_2dplus,
                                           instance_norm_2dplus_reference)


class TestInstanceNormKernel:
    def _data(self, N=3, H=8, W=8, C=16, seed=0):
        k = jax.random.split(jax.random.PRNGKey(seed), 4)
        x = jax.random.normal(k[0], (N, H, W, C))
        scale = 1.0 + 0.1 * jax.random.normal(k[1], (N, C))
        alpha = 0.1 * jax.random.normal(k[2], (N, C))
        bias = 0.1 * jax.random.normal(k[3], (N, C))
        return x, scale, alpha, bias

    def test_kernel_matches_reference(self):
        x, scale, alpha, bias = self._data()
        out_k = instance_norm_2dplus(x, scale, alpha, bias, interpret=True)
        out_r = instance_norm_2dplus_reference(x, scale, alpha, bias)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_reference_matches_layer(self):
        """The fused math must equal the InstanceNorm2dPlus layer with
        folded affines."""
        C = 12
        layer = InstanceNorm2dPlus(C)
        p = layer.init_params(jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, C))
        expected = layer.apply(p, x)
        # fold: scale = gamma*g_in, bias = gamma*b_in + beta
        g_in, b_in = p["in"]["gamma"], p["in"]["beta"]
        scale = (p["gamma"] * g_in)[None].repeat(2, 0)
        bias = (p["gamma"] * b_in + p["beta"])[None].repeat(2, 0)
        alpha = p["alpha"][None].repeat(2, 0)
        out = instance_norm_2dplus_reference(x, scale, alpha, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_input(self):
        x, scale, alpha, bias = self._data(seed=3)
        x16 = x.astype(jnp.bfloat16)
        out_k = instance_norm_2dplus(x16, scale, alpha, bias,
                                     interpret=True)
        assert out_k.dtype == jnp.bfloat16
        out_r = instance_norm_2dplus_reference(x16, scale, alpha, bias)
        np.testing.assert_allclose(
            np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
            rtol=2e-2, atol=2e-2)
