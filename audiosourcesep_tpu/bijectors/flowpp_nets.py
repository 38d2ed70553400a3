"""Flow++ conv-attention coupling networks (functional, NHWC).

Re-designs of /root/reference/flow_models/flow_tfk_layers.py:169-362:
GLU gates, gated convs (PixelCNN++-style), gated multi-head self-attention
with a shared position embedding, and the ConvAttnNet head emitting
(log_s, t, mixture-logistic params).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn

Array = jax.Array


def concat_elu(x: Array) -> Array:
    """elu(concat(-x, x)) (flow_tfk_layers.py:169-170)."""
    return jax.nn.elu(jnp.concatenate([-x, x], axis=-1))


class GLU:
    """Gated linear unit: dense -> split -> a * sigmoid(b)
    (flow_tfk_layers.py:173-192)."""

    def __init__(self, filters: int, use_nin: bool = True):
        assert filters % 2 == 0
        self.filters = filters
        self.use_nin = use_nin

    def init_params(self, key, in_ch: int):
        if self.use_nin:
            return {"layer": nn.dense_init(key, in_ch, self.filters)}
        return {"layer": nn.conv2d_init(key, in_ch, self.filters, 3)}

    def apply(self, params, x):
        h = (nn.dense(params["layer"], x) if self.use_nin
             else nn.conv2d(params["layer"], x))
        a, b = jnp.split(h, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


class GatedConv:
    """x + GLU(conv(concat_elu(x)) [+ dense(context)])
    (flow_tfk_layers.py:195-227)."""

    def __init__(self, filters: int, context: bool = False,
                 use_nin: bool = True):
        self.filters = filters
        self.context = context
        self.glu = GLU(2 * filters, use_nin)

    def init_params(self, key, in_ch: int, context_ch: int = 0):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"conv1": nn.conv2d_init(k1, 2 * in_ch, self.filters, 3),
             "glu": self.glu.init_params(k2, 2 * self.filters)}
        if self.context:
            p["ctx"] = nn.dense_init(k3, context_ch, self.filters)
        return p

    def apply(self, params, x, a: Optional[Array] = None):
        c = concat_elu(x)
        c = nn.conv2d(params["conv1"], c)
        if a is not None and "ctx" in params:
            c = c + nn.dense(params["ctx"], a)
        c = concat_elu(c)
        return x + self.glu.apply(params["glu"], c)


class GatedAttn:
    """x + GLU(MHSA(x + pos_emb)) (flow_tfk_layers.py:230-276)."""

    def __init__(self, channels: int, heads: int = 4):
        assert channels % heads == 0
        self.channels = channels
        self.heads = heads
        self.dim = channels // heads
        self.glu = GLU(2 * channels)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {"qkv": nn.dense_init(k1, self.channels, 3 * self.channels),
                "glu": self.glu.init_params(k2, self.channels)}

    def apply(self, params, x, pos_emb):
        N, H, W, C = x.shape
        T = H * W
        c = x + pos_emb[None]
        c = nn.dense(params["qkv"], c).reshape(N, T, 3, self.heads, self.dim)
        q, k, v = jnp.moveaxis(c, 2, 0)                  # [N, T, h, d]
        w = jnp.einsum("nqhd,nkhd->nhqk", q, k) / math.sqrt(self.dim)
        w = jax.nn.softmax(w, axis=-1)
        a = jnp.einsum("nhqk,nkhd->nqhd", w, v).reshape(N, H, W, C)
        return x + self.glu.apply(params["glu"], a)


class ConvAttnBlock:
    """GatedConv -> LN -> GatedAttn -> LN (flow_tfk_layers.py:279-299)."""

    def __init__(self, filters: int, context: bool = False, heads: int = 4):
        self.conv = GatedConv(filters, context)
        self.attn = GatedAttn(filters, heads)
        self.filters = filters

    def init_params(self, key, context_ch: int = 0):
        k1, k2 = jax.random.split(key)
        return {"conv": self.conv.init_params(k1, self.filters, context_ch),
                "ln1": nn.layer_norm_init(self.filters),
                "attn": self.attn.init_params(k2),
                "ln2": nn.layer_norm_init(self.filters)}

    def apply(self, params, x, pos_emb, a=None):
        x = self.conv.apply(params["conv"], x, a)
        x = nn.layer_norm(params["ln1"], x)
        x = self.attn.apply(params["attn"], x, pos_emb)
        return nn.layer_norm(params["ln2"], x)


class ConvAttnNet:
    """Flow++ coupling head -> (log_s, t, ml_logits, ml_means,
    ml_logscales) (flow_tfk_layers.py:302-345)."""

    def __init__(self, input_shape, n_components: int = 32,
                 n_blocks: int = 10, filters: int = 96,
                 context: bool = False, heads: int = 4):
        self.H, self.W, self.C = input_shape
        self.n_components = n_components
        self.n_blocks = n_blocks
        self.filters = filters
        self.context = context
        self.blocks = [ConvAttnBlock(filters, context, heads)
                       for _ in range(n_blocks)]

    def init_params(self, key, context_ch: int = 0):
        keys = jax.random.split(key, self.n_blocks + 3)
        p = {
            "pos_emb": jax.random.normal(
                keys[0], (self.H, self.W, self.filters)),
            "conv_in": nn.conv2d_init(keys[1], self.C, self.filters, 3),
            "conv_out": nn.conv2d_init(
                keys[2], self.filters,
                self.C * (2 + 3 * self.n_components), 3),
        }
        for i, b in enumerate(self.blocks):
            p[f"block_{i}"] = b.init_params(keys[3 + i], context_ch)
        return p

    def apply(self, params, x, context=None):
        h = nn.conv2d(params["conv_in"], x)
        for i, b in enumerate(self.blocks):
            h = b.apply(params[f"block_{i}"], h, params["pos_emb"], context)
        h = nn.conv2d(params["conv_out"], h)
        N, H, W = h.shape[0], h.shape[1], h.shape[2]
        h = h.reshape(N, H, W, self.C, 2 + 3 * self.n_components)
        log_s = jnp.tanh(h[..., 0])
        t = h[..., 1]
        ml_logits, ml_means, ml_logscales = jnp.split(h[..., 2:], 3,
                                                      axis=-1)
        return log_s, t, ml_logits, ml_means, ml_logscales


class ShallowProcessor:
    """Context processor for variational dequantisation
    (flow_tfk_layers.py:348-362)."""

    def __init__(self, filters: int = 32):
        self.filters = filters
        self.convs = [GatedConv(filters, use_nin=False) for _ in range(3)]

    def init_params(self, key, in_ch: int):
        keys = jax.random.split(key, 4)
        p = {"conv": nn.conv2d_init(keys[0], in_ch, self.filters, 3)}
        for i, gc in enumerate(self.convs):
            p[f"gated_{i}"] = gc.init_params(keys[1 + i], self.filters)
        return p

    def apply(self, params, x):
        x = x / 256.0 - 0.5
        h = nn.conv2d(params["conv"], x)
        for i, gc in enumerate(self.convs):
            h = gc.apply(params[f"gated_{i}"], h)
        return h
