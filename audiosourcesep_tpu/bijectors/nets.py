"""Coupling networks: shift-and-log-scale conv / resnet nets.

Functional re-designs of /root/reference/flow_models/flow_tfk_layers.py:31-166.
Each net is a static object with ``init_params(key, in_ch) -> params`` and
``apply(params, x) -> (log_s, t)``; ``tanh`` is applied to ``log_s`` (the
reference notes NaNs without it, flow_tfk_layers.py:81-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn


class ShiftAndLogScaleConvNet:
    """conv3(relu) - norm - conv1(relu) - norm - conv3(zero-init) -> split.

    The zero-initialised last conv makes each coupling start as the identity
    (Glow). The inter-conv "batch norms" are frozen-statistics affines — see
    ``nn.frozen_batchnorm`` for why this matches the reference's effective
    computation (flow_tfk_layers.py:56-84).
    """

    def __init__(self, n_filters: int, out_ch_factor: int = 2):
        self.n_filters = n_filters
        self.out_ch_factor = out_ch_factor

    def init_params(self, key, in_ch: int):
        k1, k2, k3 = jax.random.split(key, 3)
        f = self.n_filters
        return {
            "conv1": nn.conv2d_init(k1, in_ch, f, 3),
            "bn1": nn.frozen_batchnorm_init(f),
            "conv2": nn.conv2d_init(k2, f, f, 1),
            "bn2": nn.frozen_batchnorm_init(f),
            "conv3": nn.conv2d_init(k3, f, self.out_ch_factor * in_ch, 3,
                                    zero_init=True),
        }

    def apply(self, params, x):
        h = jax.nn.relu(nn.conv2d(params["conv1"], x))
        h = nn.frozen_batchnorm(params["bn1"], h)
        h = jax.nn.relu(nn.conv2d(params["conv2"], h))
        h = nn.frozen_batchnorm(params["bn2"], h)
        h = nn.conv2d(params["conv3"], h)
        log_s, t = jnp.split(h, 2, axis=-1)
        return jnp.tanh(log_s), t


class ShiftAndLogScaleResNet:
    """RealNVP coupling net: weight-norm convs + residual blocks + skip sums.

    Mirrors flow_tfk_layers.py:122-166: norm, concat(x, -x), relu, conv;
    ``n_blocks`` residual blocks whose outputs accumulate into a skip path;
    zero-initialised output conv; tanh on log_s.
    """

    def __init__(self, n_filters: int, n_blocks: int = 4):
        self.n_filters = n_filters
        self.n_blocks = n_blocks

    def init_params(self, key, in_ch: int):
        f = self.n_filters
        keys = jax.random.split(key, 3 + 3 * self.n_blocks)
        params = {
            "bn_in": nn.frozen_batchnorm_init(in_ch),
            "conv_in": nn.wnconv2d_init(keys[0], 2 * in_ch, f, 3),
            "skip_in": nn.wnconv2d_init(keys[1], f, f, 3),
            "bn_out": nn.frozen_batchnorm_init(f),
            "conv_out": nn.wnconv2d_init(keys[2], f, 2 * in_ch, 3,
                                         zero_init=True),
        }
        for i in range(self.n_blocks):
            ka, kb, kc = keys[3 + 3 * i: 6 + 3 * i]
            params[f"block_{i}"] = {
                "bn1": nn.frozen_batchnorm_init(f),
                "conv1": nn.wnconv2d_init(ka, f, f, 3, use_bias=False),
                "bn2": nn.frozen_batchnorm_init(f),
                "conv2": nn.wnconv2d_init(kb, f, f, 3),
            }
            params[f"skip_{i}"] = nn.wnconv2d_init(kc, f, f, 3)
        return params

    def _res_block(self, p, x):
        h = nn.frozen_batchnorm(p["bn1"], x)
        h = nn.wnconv2d(p["conv1"], jax.nn.relu(h))
        h = nn.frozen_batchnorm(p["bn2"], h)
        h = nn.wnconv2d(p["conv2"], jax.nn.relu(h))
        return x + h

    def apply(self, params, x):
        h = nn.frozen_batchnorm(params["bn_in"], x)
        h = jax.nn.relu(jnp.concatenate([h, -h], axis=-1))
        h = nn.wnconv2d(params["conv_in"], h)
        skip = nn.wnconv2d(params["skip_in"], h)
        for i in range(self.n_blocks):
            h = self._res_block(params[f"block_{i}"], h)
            skip = skip + nn.wnconv2d(params[f"skip_{i}"], h)
        out = nn.frozen_batchnorm(params["bn_out"], skip)
        out = nn.wnconv2d(params["conv_out"], jax.nn.relu(out))
        log_s, t = jnp.split(out, 2, axis=-1)
        return jnp.tanh(log_s), t


class ConstantShiftAndLogScale:
    """Deterministic test stub: ``log_s = log(2)``, ``t = 1`` everywhere.

    Mirrors the reference's unit-test toy function
    (unittest_flow_models.py:76-83) so analytic log-dets are exactly
    predictable.
    """

    def __init__(self, log_scale: float = 0.6931471805599453,
                 shift: float = 1.0):
        self.log_scale = log_scale
        self.shift = shift

    def init_params(self, key, in_ch: int):
        return ()

    def apply(self, params, x):
        return (jnp.full_like(x, self.log_scale),
                jnp.full_like(x, self.shift))


class ShiftAndLogScaleDenseNet:
    """4 relu dense layers + linear head -> (log_s, t) for 1-D events
    (reference flow_tfk_layers.py:7-28)."""

    def __init__(self, units: int):
        self.units = units

    def init_params(self, key, in_dim: int):
        keys = jax.random.split(key, 5)
        from .. import nn as _nn
        dims = [in_dim] + [self.units] * 4
        params = {f"dense{i+1}": _nn.dense_init(keys[i], dims[i], dims[i + 1])
                  for i in range(4)}
        params["dense5"] = _nn.dense_init(keys[4], self.units, 2 * in_dim)
        return params

    def apply(self, params, x):
        h = x
        for i in range(4):
            h = jax.nn.relu(nn.dense(params[f"dense{i+1}"], h))
        h = nn.dense(params["dense5"], h)
        log_s, t = jnp.split(h, 2, axis=-1)
        return jnp.tanh(log_s), t
