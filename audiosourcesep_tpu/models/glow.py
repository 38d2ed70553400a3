"""Glow: step, block, and multi-scale bijectors.

Re-design of /root/reference/flow_models/flow_glow.py. The multi-scale
architecture is a single generic class for L in {2, 3, 4} levels instead of
three hand-unrolled ones, and it threads the init minibatch through each
block correctly (the reference passes the *original* minibatch to blocks
2..L — flow_glow.py:162-174, 245-266 — so deeper ActNorm data-dependent
inits normalise the wrong statistics; fixed here, as recommended in
SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bijectors import (ActNorm, AffineCouplingSplit, Bijector, Chain,
                         Invertible1x1Conv, ShiftAndLogScaleConvNet, Squeeze)


def glow_step(net_factory, name: str = "glow_step") -> Chain:
    """actnorm -> invertible 1x1 conv -> affine coupling (flow_glow.py:9-31)."""
    return Chain([ActNorm(), Invertible1x1Conv(),
                  AffineCouplingSplit(net_factory())], name=name)


def glow_block(K: int, net_factory, name: str = "glow_block") -> Chain:
    """squeeze -> K glow steps (flow_glow.py:34-52)."""
    return Chain([Squeeze()] + [glow_step(net_factory) for _ in range(K)],
                 name=name)


class GlowMultiScale(Bijector):
    """L-level multi-scale Glow with channel factor-out.

    After each of the first L-1 blocks, half the channels are factored out,
    reshaped to the base spatial resolution (plain reshape, log-det 0,
    matching flow_glow.py:179-185), and concatenated to the final latent:
    ``z = concat(z_1, z_2, ..., z_L)`` over channels at
    ``(H / 2^L, W / 2^L)``. Base event shape: ``(H/2^L, W/2^L, C * 4^L)``.
    """

    name = "glow_multiscale"

    def __init__(self, L: int, K: int, net_factory, remat: bool = False):
        assert L >= 2
        self.L = L
        self.K = K
        # remat: rematerialise each block's forward under grad — trades
        # FLOPs for HBM when differentiating through the whole chain (the
        # BASIS Glow-prior path computes grad(log_prob) every Langevin
        # step; SURVEY.md §7 'memory/recompute tradeoffs')
        self.remat = remat
        self.blocks = [glow_block(K, net_factory, name=f"block{l+1}")
                       for l in range(L)]

    def _block_forward(self, l, params, h, rng):
        block = self.blocks[l]
        if self.remat:
            # Per-STEP rematerialisation. Checkpointing the whole K-step
            # block is useless under grad: the block's backward recompute
            # still materialises every step's coupling-net activations at
            # once (measured 18.0 vs 18.1 GiB temps at the production
            # 512-filter/K=40 separation scale,
            # benchmarks/probe_glow_sep_memory.py). Saving only each
            # step's input instead bounds the backward working set to a
            # single step's residuals plus K tiny inter-step iterates.
            total = jnp.zeros(h.shape[0], jnp.result_type(float))
            for name, b in zip(block.names, block.bijectors):
                fwd = jax.checkpoint(
                    lambda p, x, f=b.forward: f(p, x, None))
                h, fldj = fwd(params[name], h)
                total = total + fldj
            return h, total
        return block.forward(params, h, rng)

    def base_event_shape(self, data_shape):
        H, W, C = data_shape
        f = 2 ** self.L
        return (H // f, W // f, C * f * f)

    # -- init (correct minibatch threading) --------------------------------
    def init(self, key, x):
        N, H, W, _ = x.shape
        bh, bw = H // 2 ** self.L, W // 2 ** self.L
        keys = jax.random.split(key, self.L)
        params = {}
        zs = []
        h = x
        for l, (k, block) in enumerate(zip(keys, self.blocks)):
            p, out = block.init(k, h)
            params[f"block{l+1}"] = p
            if l < self.L - 1:
                z, h = jnp.split(out, 2, axis=-1)
                zs.append(z.reshape(N, bh, bw, -1))
            else:
                zs.append(out)
        return params, jnp.concatenate(zs, axis=-1)

    def init_params(self, key, x):
        return self.init(key, x)[0]

    def reinit(self, params, x):
        """Recompute ActNorm data-dependent stats (same threading as
        :meth:`init`, trained params elsewhere)."""
        N, H, W, _ = x.shape
        bh, bw = H // 2 ** self.L, W // 2 ** self.L
        out = dict(params)
        zs = []
        h = x
        for l, block in enumerate(self.blocks):
            out[f"block{l+1}"], o = block.reinit(params[f"block{l+1}"], h)
            if l < self.L - 1:
                z, h = jnp.split(o, 2, axis=-1)
                zs.append(z.reshape(N, bh, bw, -1))
            else:
                zs.append(o)
        return out, jnp.concatenate(zs, axis=-1)

    # -- forward / inverse -------------------------------------------------
    def forward(self, params, x, rng=None):
        N, H, W, _ = x.shape
        bh, bw = H // 2 ** self.L, W // 2 ** self.L
        total = jnp.zeros(N, x.dtype)
        zs = []
        h = x
        for l, block in enumerate(self.blocks):
            out, fldj = self._block_forward(l, params[f"block{l+1}"], h,
                                            rng)
            total = total + fldj
            if l < self.L - 1:
                z, h = jnp.split(out, 2, axis=-1)
                zs.append(z.reshape(N, bh, bw, -1))
            else:
                zs.append(out)
        return jnp.concatenate(zs, axis=-1), total

    def inverse(self, params, y, rng=None):
        N = y.shape[0]
        # recover the factored-out latents: [z1 | [z2 | [... | zL]]]
        zs = []
        rem = y
        for _ in range(self.L - 1):
            z, rem = jnp.split(rem, 2, axis=-1)
            zs.append(z)
        zs.append(rem)

        total = jnp.zeros(N, y.dtype)
        h, fldj = self.blocks[-1].inverse(params[f"block{self.L}"], zs[-1],
                                          rng)
        total = total + fldj
        for l in range(self.L - 2, -1, -1):
            # z_l lives at the spatial resolution of block l's output
            hh, hw, hc = h.shape[1], h.shape[2], h.shape[3]
            z = zs[l].reshape(N, hh, hw, hc)
            out = jnp.concatenate([z, h], axis=-1)
            h, fldj = self.blocks[l].inverse(params[f"block{l+1}"], out, rng)
            total = total + fldj
        return h, total


def make_conv_net_factory(n_filters: int):
    def factory():
        return ShiftAndLogScaleConvNet(n_filters)
    return factory
