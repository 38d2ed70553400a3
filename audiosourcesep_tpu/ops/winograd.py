"""Winograd F(2x2, 3x3) convolution with a fused Pallas TPU kernel.

The separation hot loop is conv-bound (docs/DESIGN.md "Round-3
decomposition"): ~84% of the score-network forward FLOPs are 3x3,
stride-1, undilated convolutions (reference score_network.py:7-302 —
every RCU/CRP/MSF/ResidualBlock conv), running at XLA's conv speed
limit for this channel geometry.  Winograd F(2x2,3x3) computes the same
convolution with 2.25x fewer MXU FLOPs by transforming 4x4 input tiles
(stride 2) into a per-tile elementwise product in a 16-point transform
domain, which batches into 16 channel-contraction matmuls:

    Y = A^T [ (G g G^T) . (B^T d B) ] A      (per tile, summed over C_in)

with exact +-1 / +-0.5 transform matrices (no precision surprises in
bf16 beyond the usual conv rounding):

    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

A *pure-XLA* Winograd loses: the 16 transform arrays round-trip through
HBM (~2 GB per 96x64@192 conv call at batch 60) and cost more than the
direct conv.  The win requires fusing transform -> matmul -> inverse
transform in VMEM, which is exactly what the Pallas kernel here does:
each grid step DMAs one spatial slab (with 2-row halo) into VMEM,
computes the 16 tile transforms with shifted-slice arithmetic (2 adds
per transform point), contracts against the pre-transformed weights
U[16, C_in, C_out] on the MXU with f32 accumulation, applies the
inverse transform, and writes the interleaved output block.

Gradients: `winograd_conv2d` carries a custom VJP whose backward pass
is the XLA conv VJP (identical math), so the op is safe to use inside
differentiated code (e.g. DSM training loss), not just inference.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["transform_weights", "winograd_conv2d",
           "winograd_conv2d_reference", "winograd_eligible"]

# transform matrices (numpy: baked as compile-time constants)
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_weights(kernel: jax.Array) -> jax.Array:
    """[3, 3, C_in, C_out] -> U [16, C_in, C_out] = flat(G g G^T)."""
    u = jnp.einsum("ui,ijcd,vj->uvcd", _G, kernel.astype(jnp.float32), _G)
    return u.reshape(16, *kernel.shape[2:])


def winograd_conv2d_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Pure-XLA Winograd (correctness oracle / non-TPU fallback).

    NHWC, SAME padding, stride 1, H and W even. Matches
    lax.conv_general_dilated to f32 rounding.
    """
    b, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0 and kernel.shape[:2] == (3, 3)
    u = transform_weights(kernel).reshape(4, 4, cin, kernel.shape[3])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    th, tw = h // 2, w // 2
    # d[i, j, b, a, c, cin] = xp[b, 2a + i, 2c + j, cin]
    d = jnp.stack([jnp.stack(
        [jax.lax.slice(xp, (0, i, j, 0), (b, i + h - 1, j + w - 1, cin),
                       (1, 2, 2, 1)) for j in range(4)]) for i in range(4)])
    d = d.astype(jnp.float32)
    v = jnp.einsum("ui,vj,ijbrsc->uvbrsc", _BT, _BT, d)
    m = jnp.einsum("uvbrsc,uvcd->uvbrsd", v, u)
    y = jnp.einsum("pu,qv,uvbrsd->brpsqd", _AT, _AT, m)
    return y.reshape(b, h, w, kernel.shape[3]).astype(x.dtype)


# ---------------------------------------------------------------------------
# fused Pallas kernel
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 10 * 1024 * 1024


def _block_vmem_bytes(tr: int, tw: int, cin: int, cout: int) -> int:
    """Rough VMEM bytes for one grid step: input slab (bf16) + U (bf16)
    + 16 V transforms (bf16) + 8 P accumulators (f32) + double-buffered
    output block (bf16)."""
    w = 2 * tw
    return ((2 * tr + 2) * (w + 2) * cin * 2
            + 16 * cin * cout * 2
            + 16 * tr * tw * cin * 2
            + 8 * tr * tw * cout * 4
            + 2 * 2 * tr * w * cout * 2)


def _pick_tile_rows(th: int, tw: int, cin: int, cout: int):
    """Tile-rows per block: the largest divisor of th whose block fits
    the VMEM budget with tr*tw <= 256 tiles (MXU M-dim stays <= 2 tiles
    of 128). None if no divisor fits."""
    best = None
    for tr in range(1, th + 1):
        if th % tr == 0 and tr * tw <= 256 \
                and _block_vmem_bytes(tr, tw, cin, cout) < _VMEM_BUDGET:
            best = tr
    return best


def _wino_kernel(x_hbm, u_ref, out_ref, xs_ref, sem, *, tr: int, tw: int,
                 cin: int, cout: int):
    """One grid step: rows [2*tr*r, 2*tr*r + 2*tr + 2) of padded image b."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    rows = 2 * tr + 2
    w = 2 * tw
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * 2 * tr, rows)], xs_ref, sem)
    copy.start()
    copy.wait()
    x = xs_ref[...]                                   # [rows, w + 2, cin]

    # Column phase split. Strided slices lower to >2D gathers, which
    # Mosaic rejects — split even/odd columns by reshaping the column
    # axis to (tw, 2) and indexing instead. da[j][row, t] is tile
    # column-offset j of tile-col t: x[row, 2 t + j].
    lo = x[:, 0:w].reshape(rows, tw, 2, cin)
    hi = x[:, 2:w + 2].reshape(rows, tw, 2, cin)
    da = (lo[:, :, 0], lo[:, :, 1], hi[:, :, 0], hi[:, :, 1])

    # Row phase split (outer axis -> free): d[j][i][a, t] = tile
    # row-offset i, col-offset j of tile (a, t) = x[2 a + i, 2 t + j].
    def row_phases(dj):
        eo = dj[0:2 * tr].reshape(tr, 2, tw, cin)
        sh = dj[2:2 * tr + 2].reshape(tr, 2, tw, cin)
        return (eo[:, 0], eo[:, 1], sh[:, 0], sh[:, 1])

    d = [row_phases(dj) for dj in da]                 # d[j][i] [tr, tw, cin]

    # B^T along rows then columns (each point: one add/sub on the VPU).
    # e_u is built per-u inside the loop to keep VMEM live ranges short
    # (materialising all 16 e arrays overflows scoped VMEM).
    def row_combo(uu, dj):
        if uu == 0:
            return dj[0] - dj[2]
        if uu == 1:
            return dj[1] + dj[2]
        if uu == 2:
            return dj[2] - dj[1]
        return dj[1] - dj[3]

    at = _AT  # [2, 4]
    acc = [[None] * 4 for _ in range(2)]              # P[i][v] accumulators
    for uu in range(4):
        e = [row_combo(uu, d[j]) for j in range(4)]
        vs = (e[0] - e[2], e[1] + e[2], e[2] - e[1], e[1] - e[3])
        for vv in range(4):
            m = jax.lax.dot_general(
                vs[vv], u_ref[uu * 4 + vv],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [tr, tw, cout]
            for i in range(2):
                coef = float(at[i, uu])
                if coef == 0.0:
                    continue
                term = m if coef == 1.0 else -m
                acc[i][vv] = term if acc[i][vv] is None else acc[i][vv] + term

    # Phase-separated output (Mosaic rejects the lane/sublane reshapes
    # an in-kernel interleave needs; XLA de-interleaves outside, where
    # the transpose fuses into the consumer). out_ref: [1,2,2,tr,tw,cout]
    dt = out_ref.dtype
    for i in range(2):
        p = acc[i]
        out_ref[0, i, 0] = (p[0] + p[1] + p[2]).astype(dt)
        out_ref[0, i, 1] = (p[1] - p[2] - p[3]).astype(dt)


def _winograd_pallas(xp: jax.Array, u: jax.Array, h: int, w: int,
                     interpret: bool = False) -> jax.Array:
    b, hp, wp, cin = xp.shape
    cout = u.shape[-1]
    th, tw = h // 2, w // 2
    tr = _pick_tile_rows(th, tw, cin, cout)
    assert tr is not None, "caller must check winograd_eligible first"
    grid = (b, th // tr)
    kernel = partial(_wino_kernel, tr=tr, tw=tw, cin=cin, cout=cout)
    phased = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # padded input in HBM
            pl.BlockSpec((16, cin, cout), lambda b_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2, tr, tw, cout),
                               lambda b_, r_: (b_, 0, 0, r_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, 2, th, tw, cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * tr + 2, wp, cin), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, u)
    # de-interleave phases: [b, 2, 2, th, tw, c] -> [b, h, w, c]
    return phased.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, cout)


def winograd_eligible(x_shape, kernel_shape, stride: int = 1,
                      dilation: int = 1) -> bool:
    """True when the fused kernel supports this conv (3x3, stride 1,
    undilated, even spatial dims, enough channels to feed the MXU)."""
    if len(kernel_shape) != 4 or tuple(kernel_shape[:2]) != (3, 3):
        return False
    if stride != 1 or dilation != 1:
        return False
    _, h, w, cin = x_shape
    cout = kernel_shape[3]
    if h % 2 or w % 2 or h < 4 or w < 4:
        return False
    if cin < 64 or cout < 64:
        return False            # thin channels: XLA conv is fine
    return _pick_tile_rows(h // 2, w // 2, cin, cout) is not None


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def winograd_conv2d(x: jax.Array, kernel: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """SAME 3x3 stride-1 conv via the fused Winograd TPU kernel.

    NHWC `x`, HWIO `kernel`. Forward runs the Pallas kernel; backward is
    the XLA conv VJP (identical math). Bias is the caller's job.
    """
    # The manual halo DMA needs 8-aligned sublane (W) extents and a
    # 128-aligned lane (C) dim; pad both (the kernel never reads the W
    # pad, and the zero channels contribute nothing to the contraction —
    # Mosaic pads K to the lane tile anyway, so the matmul cost is
    # unchanged; 384-channel convs are already aligned).
    w, cin = x.shape[2], x.shape[3]
    wp = -(-(w + 2) // 8) * 8
    cp = -(-cin // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, cp - cin)))
    u = transform_weights(kernel).astype(x.dtype)
    if cp != cin:
        u = jnp.pad(u, ((0, 0), (0, cp - cin), (0, 0)))
    return _winograd_pallas(xp, u, x.shape[1], w, interpret=interpret)


def _xla_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _wino_fwd(x, kernel, interpret):
    return winograd_conv2d(x, kernel, interpret), (x, kernel)


def _wino_bwd(interpret, res, g):
    x, kernel = res
    _, vjp = jax.vjp(_xla_conv, x, kernel)
    return vjp(g)


winograd_conv2d.defvjp(_wino_fwd, _wino_bwd)


# ---------------------------------------------------------------------------
# dilated convs via phase decomposition
# ---------------------------------------------------------------------------

def dilated_eligible(x_shape, kernel_shape, stride: int = 1,
                     dilation: int = 1) -> bool:
    """A dilation-d 3x3 SAME conv splits exactly into d*d independent
    stride-1 3x3 convs on the d-subsampled phase grids (the reference's
    cascade uses d in {2, 4}; score_network.py:121-178). Eligible when
    the phase grid itself is Winograd-eligible."""
    if dilation < 2 or stride != 1:
        return False
    _, h, w, cin = x_shape
    if h % (2 * dilation) or w % (2 * dilation):
        return False
    phase = (x_shape[0] * dilation * dilation, h // dilation,
             w // dilation, cin)
    return winograd_eligible(phase, kernel_shape)


def dilated_winograd_conv2d(x: jax.Array, kernel: jax.Array, dilation: int,
                            interpret: bool = False) -> jax.Array:
    """Dilation-d 3x3 SAME conv = Winograd conv on the d*d phase grids.

    y[d a + p, d b + q] only reads x[d (a+i) + p, d (b+j) + q], so each
    (p, q) phase is an independent stride-1 conv with SAME zero padding
    on its subsampled grid; phases move to the batch axis for the fused
    kernel and interleave back afterwards.
    """
    b, h, w, cin = x.shape
    d = dilation
    cout = kernel.shape[3]
    xr = (x.reshape(b, h // d, d, w // d, d, cin)
          .transpose(0, 2, 4, 1, 3, 5)
          .reshape(b * d * d, h // d, w // d, cin))
    y = winograd_conv2d(xr, kernel, interpret)
    return (y.reshape(b, d, d, h // d, w // d, cout)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(b, h, w, cout))
