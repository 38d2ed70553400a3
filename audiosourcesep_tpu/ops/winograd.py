"""Winograd F(2x2, 3x3) convolution with a fused Pallas TPU kernel.

The separation hot loop is conv-bound (docs/DESIGN.md "Round-3
decomposition"): ~84% of the score-network forward FLOPs are 3x3
stride-1 convolutions (reference score_network.py:7-302 — every
RCU/CRP/MSF/ResidualBlock conv).  Winograd F(2x2,3x3) computes the same
convolution with 2.25x fewer MXU FLOPs by transforming 4x4 input tiles
(stride 2) into a per-tile elementwise product in a 16-point transform
domain, which batches into 16 channel-contraction matmuls:

Measured verdict (benchmarks/profile_winograd.py, slope timing, v5e): XLA's conv
lowering runs at 88-100% of bf16 peak on the melspec separation model's
conv classes, so this kernel only wins where XLA's conv underperforms —
small-spatial 128-multiple-channel shapes (the 32x32@128 image path:
1.67x) — and `winograd_eligible` restricts routing accordingly.
End-to-end coda (benchmarks/bench_image_basis.py): even on the image
path the full anneal is 0.71x with routing on — `pallas_call` is a
fusion barrier, so the norm/activation epilogues XLA folds into convs
become separate HBM round-trips — hence routing is opt-in-experimental
everywhere (`run_basis_sep.py --winograd`) and no path uses it by
default.  The general mechanism is kept (and tested) because it is the
template for any future shape class where XLA's *fused* conv leaves
room.

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


def _block_vmem_bytes(tr: int, tw: int, cin: int, cout: int,
                      itemsize: int = 2) -> int:
    """Rough VMEM bytes for one grid step: phased input slab + U + live V
    transforms + 8 P accumulators (always f32) + double-buffered phased
    output block. ``itemsize`` is the element width of x/u/v/out (2 for
    the bf16 fast path, 4 for f32 routing)."""
    twp = -(-(tw + 1) // 8) * 8
    return (4 * (tr + 1) * twp * cin * itemsize
            + 16 * cin * cout * itemsize
            + 8 * tr * tw * cin * itemsize
            + 8 * tr * tw * cout * 4
            + 2 * 4 * tr * tw * cout * itemsize)


def _pick_tile_rows(th: int, tw: int, cin: int, cout: int,
                    itemsize: int = 2):
    """Tile-rows per block: the largest divisor of th whose block fits
    the VMEM budget with tr*tw <= 256 tiles (MXU M-dim stays <= 2 tiles
    of 128). None if no divisor fits."""
    best = None
    for tr in range(1, th + 1):
        if th % tr == 0 and tr * tw <= 256 \
                and _block_vmem_bytes(tr, tw, cin, cout,
                                      itemsize) < _VMEM_BUDGET:
            best = tr
    return best


def _wino_kernel(x_hbm, u_ref, out_ref, xs_ref, sem, *, tr: int, tw: int,
                 cin: int, cout: int):
    """One grid step: tile-rows [tr*r, tr*(r+1)) of phased image b.

    The input arrives phase-split from XLA as
    X[b, r, q, m, n, c] = xpad[b, 2 m + r, 2 n + q, c], so every tile
    offset d[i][j] is an outer-dim index plus 0/1-shifted slice — no
    sublane interleave reshapes, which Mosaic either rejects or lowers
    to element shuffles that cost more than the matmuls (measured:
    the in-kernel-split variant ran 3.6x slower than the XLA conv).
    """
    b = pl.program_id(0)
    r = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, :, pl.ds(r * tr, tr + 1)], xs_ref, sem)
    copy.start()
    copy.wait()
    x = xs_ref[...]                           # [2, 2, tr + 1, twp, cin]

    # d[i][j][a, t] = xpad[2 (r tr + a) + i, 2 t + j]
    def dphase(i, j):
        return x[i % 2, j % 2, i // 2:i // 2 + tr, j // 2:j // 2 + tw]

    d = [[dphase(i, j) for i in range(4)] for j in range(4)]

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


def _winograd_pallas(xph: jax.Array, u: jax.Array, h: int, w: int,
                     interpret: bool = False) -> jax.Array:
    b = xph.shape[0]
    cin = xph.shape[-1]
    cout = u.shape[-1]
    th, tw = h // 2, w // 2
    tr = _pick_tile_rows(th, tw, cin, cout, jnp.dtype(xph.dtype).itemsize)
    assert tr is not None, "caller must check winograd_eligible first"
    grid = (b, th // tr)
    kernel = partial(_wino_kernel, tr=tr, tw=tw, cin=cin, cout=cout)
    phased = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # phased input in HBM
            pl.BlockSpec((16, cin, cout), lambda b_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2, tr, tw, cout),
                               lambda b_, r_: (b_, 0, 0, r_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, 2, th, tw, cout), xph.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tr + 1, xph.shape[4], cin), xph.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xph, u)
    # de-interleave phases: [b, 2, 2, th, tw, c] -> [b, h, w, c]
    return phased.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, cout)


def winograd_eligible(x_shape, kernel_shape, stride: int = 1,
                      dilation: int = 1, itemsize: int = 2) -> bool:
    """True when the fused kernel supports this conv (3x3, stride 1,
    undilated, even spatial dims, enough channels to feed the MXU).
    ``itemsize`` is the conv dtype's width (2 bf16 / 4 f32) — the VMEM
    fit must be judged at the width the kernel will actually run."""
    if len(kernel_shape) != 4 or tuple(kernel_shape[:2]) != (3, 3):
        return False
    if stride != 1 or dilation != 1:
        return False
    _, h, w, cin = x_shape
    cout = kernel_shape[3]
    if h % 2 or w % 2 or h < 4 or w < 4:
        return False
    if cin < 64 or cout < 128 or cout % 128:
        return False
        # cout must fill whole MXU lane tiles: at cout=192 the padded
        # matmul's useful rate tops out at ~110 TF/s while XLA's conv
        # lowering reaches 126 TF/s (measured, benchmarks/profile_winograd.py)
    if h * w > 1024:
        return False
        # Measured (benchmarks/profile_winograd.py, slope timing): at the separation
        # model's large-spatial classes XLA's conv lowering runs at
        # 173-200 TF/s (88-100% of bf16 peak) and the fused kernel
        # LOSES (0.62-0.83x) — the 2.25x FLOP reduction is eaten by the
        # tile transforms and phase prep. It wins only where XLA's conv
        # underperforms: small-spatial 128-multiple-channel shapes like
        # the image path's 32x32@128 (61 TF/s XLA -> 1.67x here).
    # judge the fit at the shapes the kernel sees: channels padded to a
    # full 128 lane tile (winograd_conv2d pads before the pallas_call)
    cp = -(-cin // 128) * 128
    return _pick_tile_rows(h // 2, w // 2, cp, cout, itemsize) is not None


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def winograd_conv2d(x: jax.Array, kernel: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """SAME 3x3 stride-1 conv via the fused Winograd TPU kernel.

    NHWC `x`, HWIO `kernel`. Forward runs the Pallas kernel; backward is
    the XLA conv VJP (identical math). Bias is the caller's job.
    """
    # XLA-side prep: SAME-pad, pad channels to a full lane tile (the
    # zero channels are free — Mosaic pads K anyway), then phase-split
    # X[b, r, q, m, n, c] = xpad[b, 2 m + r, 2 n + q, c] so the kernel
    # never reshuffles sublanes (see _wino_kernel). This replaces — not
    # adds to — the pad the kernel would otherwise need, and the
    # transpose runs at HBM bandwidth. The phase dim n is padded to an
    # 8-aligned DMA extent.
    b, h, w, cin = x.shape
    th, tw = h // 2, w // 2
    cp = -(-cin // 128) * 128
    twp = -(-(tw + 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, cp - cin)))
    xph = (xp.reshape(b, th + 1, 2, tw + 1, 2, cp)
           .transpose(0, 2, 4, 1, 3, 5))
    xph = jnp.pad(xph, ((0, 0), (0, 0), (0, 0), (0, 0),
                        (0, twp - tw - 1), (0, 0)))
    u = transform_weights(kernel).astype(x.dtype)
    if cp != cin:
        u = jnp.pad(u, ((0, 0), (0, cp - cin), (0, 0)))
    return _winograd_pallas(xph, u, h, w, interpret=interpret)


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
                     dilation: int = 1, *, itemsize: int) -> bool:
    """A dilation-d 3x3 SAME conv splits exactly into d*d independent
    stride-1 3x3 convs on the d-subsampled phase grids (the reference's
    cascade uses d in {2, 4}; score_network.py:121-178). Eligible when
    the phase grid itself is Winograd-eligible. ``itemsize`` is required
    (no bf16 default): the VMEM fit must be judged at the width the
    kernel will actually run, so callers state it explicitly (derive it
    from the input as ``jnp.dtype(x.dtype).itemsize``, as nn.py does).

    NOTE: nn.conv2d does NOT route dilated convs here — measured on the
    cascade's shapes, XLA's dilated conv runs at 175-200 TF/s and the
    phase-split path loses 2-3x (benchmarks/profile_winograd.py). Kept as a tested
    utility for shape classes where the phase conv wins."""
    if dilation < 2 or stride != 1:
        return False
    _, h, w, cin = x_shape
    if h % (2 * dilation) or w % (2 * dilation):
        return False
    phase = (x_shape[0] * dilation * dilation, h // dilation,
             w // dilation, cin)
    # thread the true element width: judging the VMEM fit at the bf16
    # default would approve f32 convs the kernel then rejects at trace time
    return winograd_eligible(phase, kernel_shape, itemsize=itemsize)


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
