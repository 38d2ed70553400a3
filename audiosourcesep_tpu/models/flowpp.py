"""Flow++ model: coupling layers, blocks, CIFAR-10 topology, variational
dequantisation.

Re-design of /root/reference/flow_models/flow_flowpp.py. The reference's
Flow++ path is explicitly untested (README.md:127) and its coupling layer
drops the actnorm/1x1 outputs (flow_flowpp.py:26-34); this implementation
composes them correctly and alternates split parity per layer (the
reference's ``split_state + 1 % 2`` never wraps, flow_flowpp.py:63).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..bijectors import (ActNorm, Bijector, Chain, FlowModel,
                         ImgPreprocessing, Invertible1x1Conv,
                         IsotropicNormalPrior, Squeeze)
from ..bijectors.flowpp_nets import ConvAttnNet, ShallowProcessor
from ..bijectors.mixlogcdf import MixLogisticCDFCoupling

_LOG_2PI = math.log(2.0 * math.pi)


class FlowppCouplingLayer(Bijector):
    """actnorm('all') -> invertible 1x1 -> MixLogCDF coupling, with a
    context pass-through for the dequantisation flow."""

    name = "flowpp_coupling"

    def __init__(self, input_shape, split="channel", split_state=0,
                 n_components=32, n_blocks=10, filters=96, heads=4,
                 context=False):
        H, W, C = input_shape
        if split == "channel":
            nn_shape = (H, W, C // 2)
        else:
            nn_shape = (H, W // 2, C)
        self.actnorm = ActNorm(normalize="all")
        self.inv1x1 = Invertible1x1Conv()
        net = ConvAttnNet(nn_shape, n_components, n_blocks, filters,
                          context, heads)
        self.coupling = MixLogisticCDFCoupling(net, split, split_state)
        self.context = context

    def init(self, key, x, context_ch: int = 0):
        k1, k2, k3 = jax.random.split(key, 3)
        p_act, x = self.actnorm.init(k1, x)
        p_inv, x = self.inv1x1.init(k2, x)
        p_c = {"net": self.coupling.net.init_params(k3, context_ch)}
        x, _ = self.coupling.forward(p_c, x)
        return {"actnorm": p_act, "inv1x1": p_inv, "coupling": p_c}, x

    def init_params(self, key, x):
        return self.init(key, x)[0]

    def forward(self, params, x, rng=None, context=None):
        x, ld1 = self.actnorm.forward(params["actnorm"], x)
        x, ld2 = self.inv1x1.forward(params["inv1x1"], x)
        x, ld3 = self.coupling.forward(params["coupling"], x,
                                       context=context)
        return x, ld1 + ld2 + ld3

    def inverse(self, params, y, rng=None, context=None):
        y, ld3 = self.coupling.inverse(params["coupling"], y,
                                       context=context)
        y, ld2 = self.inv1x1.inverse(params["inv1x1"], y)
        y, ld1 = self.actnorm.inverse(params["actnorm"], y)
        return y, ld1 + ld2 + ld3


class FlowppBlock(Bijector):
    """n_layers Flow++ couplings with alternating split parity
    (flow_flowpp.py:44-83)."""

    name = "flowpp_block"

    def __init__(self, input_shape, n_layers, split="channel",
                 n_components=32, n_blocks=10, filters=96, heads=4,
                 context=False):
        self.layers = [
            FlowppCouplingLayer(input_shape, split, i % 2, n_components,
                                n_blocks, filters, heads, context)
            for i in range(n_layers)]

    def init(self, key, x, context_ch: int = 0):
        keys = jax.random.split(key, len(self.layers))
        params = {}
        for i, (k, layer) in enumerate(zip(keys, self.layers)):
            p, x = layer.init(k, x, context_ch)
            params[f"layer_{i}"] = p
        return params, x

    def init_params(self, key, x):
        return self.init(key, x)[0]

    def forward(self, params, x, rng=None, context=None):
        total = jnp.zeros(x.shape[0], x.dtype)
        for i, layer in enumerate(self.layers):
            x, ld = layer.forward(params[f"layer_{i}"], x, context=context)
            total = total + ld
        return x, total

    def inverse(self, params, y, rng=None, context=None):
        total = jnp.zeros(y.shape[0], y.dtype)
        for i in reversed(range(len(self.layers))):
            y, ld = self.layers[i].inverse(params[f"layer_{i}"], y,
                                           context=context)
            total = total + ld
        return y, total


class FlowppCifar10(Bijector):
    """Flow++ CIFAR-10 topology: preprocessing -> 4 checkerboard couplings
    -> squeeze -> 2 channel couplings -> 3 checkerboard couplings
    (flow_flowpp.py:86-146)."""

    name = "flowpp_cifar10"

    def __init__(self, input_shape, n_components=32, n_blocks=10,
                 filters=96, heads=4, alpha=0.05):
        H, W, C = input_shape
        self.preprocessing = ImgPreprocessing(alpha=alpha, use_logit=True)
        self.block1 = FlowppBlock(input_shape, 4, "checkerboard",
                                  n_components, n_blocks, filters, heads)
        self.squeeze = Squeeze()
        squeezed = (H // 2, W // 2, 4 * C)
        self.block2 = FlowppBlock(squeezed, 2, "channel", n_components,
                                  n_blocks, filters, heads)
        self.block3 = FlowppBlock(squeezed, 3, "checkerboard",
                                  n_components, n_blocks, filters, heads)
        self._stages = [("prep", self.preprocessing),
                        ("block1", self.block1),
                        ("squeeze", self.squeeze),
                        ("block2", self.block2),
                        ("block3", self.block3)]

    def init(self, key, x):
        keys = jax.random.split(key, len(self._stages))
        params = {}
        for k, (name, stage) in zip(keys, self._stages):
            p, x = stage.init(k, x)
            params[name] = p
        return params, x

    def init_params(self, key, x):
        return self.init(key, x)[0]

    def forward(self, params, x, rng=None):
        # stages are deterministic: the variational dequant upstream already
        # made the input continuous, so ImgPreprocessing gets no noise rng
        total = jnp.zeros(x.shape[0], jnp.result_type(float))
        for name, stage in self._stages:
            x, ld = stage.forward(params[name], x)
            total = total + ld
        return x, total

    def inverse(self, params, y, rng=None):
        total = jnp.zeros(y.shape[0], jnp.result_type(float))
        for name, stage in reversed(self._stages):
            y, ld = stage.inverse(params[name], y)
            total = total + ld
        return y, total


class VariationalDequant(Bijector):
    """Flow-based variational dequantisation (flow_flowpp.py:149-186).

    forward: sample ``eps ~ N(0,1)``, transform through a context-conditioned
    Flow++ block (context = shallow conv processing of the data), squash to
    ``u in (0, 1)`` with a sigmoid, and add to ``x``; the reported log-det is
    ``logdet(flow) + logdet(sigmoid) - log N(eps)``, so the composed
    ``log_prob`` is exactly the Flow++ variational dequantisation lower
    bound. Requires ``rng`` in forward.

    The sigmoid squash is the original Flow++ design (Ho et al. 2019: the
    dequantisation noise lives inside the quantisation bin, ``x + u in
    [x, x+1]``); the reference's untested dequant omits it
    (flow_flowpp.py:165-177, raw flow output added to x), which lets the
    dequantised input leave ``[0, 256]`` and NaN the downstream
    ``ImgPreprocessing`` logit — measured: an unsquashed tiny Flow++ NLL
    descent emits ``u ~ -43`` and NaNs after ~50 adam steps
    (tests/test_flowpp.py trains through this point).
    """

    name = "variational_dequant"

    def __init__(self, input_shape, n_components=32, n_blocks=2, filters=96,
                 heads=4):
        H, W, C = input_shape
        self.input_shape = tuple(input_shape)
        self.processor = ShallowProcessor(filters=32)
        self.block = FlowppBlock(input_shape, 4, "checkerboard",
                                 n_components, n_blocks, filters, heads,
                                 context=True)
        self.context_in_ch = 2 * C

    def init(self, key, x):
        k1, k2, k3 = jax.random.split(key, 3)
        p_proc = self.processor.init_params(k1, self.context_in_ch)
        eps = jax.random.normal(k2, x.shape)
        p_block, _ = self.block.init(k3, eps, context_ch=32)
        params = {"processor": p_proc, "block": p_block}
        y, _ = self.forward(params, x, rng=key)
        return params, y

    def init_params(self, key, x):
        return self.init(key, x)[0]

    def _context(self, params, x):
        N, H, W, C = x.shape
        r = x.reshape(N, H, W // 2, 2, C)
        ctx = jnp.concatenate([r[:, :, :, 0], r[:, :, :, 1]], axis=-1)
        return self.processor.apply(params["processor"], ctx)

    def forward(self, params, x, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        context = self._context(params, x)
        eps = jax.random.normal(rng, x.shape, x.dtype)
        log_det_eps = jnp.sum(-0.5 * (jnp.square(eps) + _LOG_2PI),
                              axis=(1, 2, 3))
        v, ld = self.block.forward(params["block"], eps, context=context)
        u = jax.nn.sigmoid(v)
        # d sigmoid(v)/dv = sigmoid(v) * sigmoid(-v)
        ld_sig = jnp.sum(jax.nn.log_sigmoid(v) + jax.nn.log_sigmoid(-v),
                         axis=(1, 2, 3))
        return x + u, ld + ld_sig - log_det_eps

    def inverse(self, params, y, rng=None):
        # dequantisation is not exactly invertible; drop the noise (the
        # reference's inverse likewise does not recover x exactly,
        # flow_flowpp.py:177-178)
        return y, jnp.zeros(y.shape[0], y.dtype)


def build_flowpp(key, minibatch, data_shape, n_components=32,
                 n_blocks_flow=10, n_blocks_dequant=2, filters=96, heads=4):
    """Compose variational dequant + Flow++ CIFAR-10 bijector over an
    isotropic prior (reference flow_builder.py:149-189)."""
    H, W, C = data_shape
    base_shape = (H // 2, W // 2, 4 * C)
    dequant = VariationalDequant(data_shape, n_components, n_blocks_dequant,
                                 filters, heads)
    flow = FlowppCifar10(data_shape, n_components, n_blocks_flow, filters,
                         heads)
    bijector = Chain([dequant, flow], name="flowpp")
    model = FlowModel(bijector, IsotropicNormalPrior(base_shape))
    params = model.init(key, minibatch)
    return model, params
