"""Pallas TPU 3x3 convolution as nine shifted MXU matmuls.

Why this exists: in the fused serving program XLA's layout assignment gives
the UNet/VAE convolutions a `{3,0,2,1}` (batch-in-sublanes) layout and they
run at 41-50% MFU, while the identical shapes in isolation run 72-93%
(docs/PERFORMANCE.md, v5e traces). The defusion barrier and the HBM-level
9-matmul reformulation were both measured dead ends — the barrier is 2%
slower end-to-end and the HBM variant reads/writes the fp32 output nine
times. This kernel changes the mechanism: it is a *custom call*, so its
operand/result layouts are pinned to the default row-major form (XLA must
feed it well-laid-out data), and the nine shifted accumulations happen in a
VMEM fp32 accumulator with zero extra HBM traffic.

Formulation. A SAME-padded 3x3 stride-1 conv over NHWC is

    y[b,h,w,k] = sum_{dy,dx in 0..2} x[b, h+dy-1, w+dx-1, :] @ W[dy,dx,:,k]

Pad H by one row on each side and flatten (H, W) -> M *outside* the kernel
(an XLA pad+reshape producing the exact buffer the DMA wants). In flat
coordinates every (dy, dx) tap of an output tile is a contiguous slice of
the input window at static offset `dy*W + dx - 1`, so the kernel is just:
DMA a (TH+2)*W-row window HBM->VMEM, take nine statically-offset slices,
mask the two column-wrap edges (flat index wraps x[h, -1] to x[h-1, W-1];
those outputs must see the zero padding), and accumulate nine
[M, C] x [C, BK] MXU matmuls into an fp32 register accumulator. The
channel counts of every hot conv in SD2/VAE towers (320/640/1280,
512/256/128) are multiples or clean fractions of the 128-lane MXU tile, so
the matmul form reaches the tiling efficiency the conv emitter loses to the
program-level layout.

Backward: `jax.custom_vjp` whose bwd re-runs the XLA convolution's own VJP
— training takes the exact XLA gradients regardless of which forward
implementation served the primal.

Reference behavior being replaced: `torch.nn.Conv2d(pad=1)` inside the
diffusers UNet/VAE used by /root/reference/marigold/marigold_depth_pipeline.py
(here marigold_tpu/models/layers.py:conv2d).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "supports"]

# Weight block budget (bytes): full [9, C, BK] panel must sit in VMEM next
# to the input window, the fp32 accumulator, and the output tile.
_W_BUDGET = 6 << 20
# Live-set budget. Empirically (v5e): Mosaic keeps all nine unrolled
# shifted slices live simultaneously — TH=24 at C=640 (~17 MB modeled)
# compiles, TH=48 (~32 MB) crashes the compiler. 18 MB keeps headroom.
_VMEM_BUDGET = 18 << 20
_TARGET_M = 4096


def supports(x_shape, w_shape, stride, padding, dtype) -> bool:
    """True when the Pallas kernel covers this conv (hot-path shapes only)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, c_in, c_out = w_shape
    if (kh, kw) != (3, 3) or stride != 1:
        return False
    if padding != [(1, 1), (1, 1)]:
        return False
    # Mosaic's HBM memref_slice requires the lane (minor) dim to be a
    # multiple of the 128 tile — C=320 towers (SD2 level 0) fall back to
    # the XLA emitter; 640/1280 UNet levels and all VAE channel counts
    # (512/256/128) qualify.
    if c_in < 128 or c_out < 128 or c_in % 128 or c_out % 128:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    h = x_shape[1]
    return _plan(x_shape, w_shape, jnp.dtype(dtype).itemsize) is not None and h >= 1


def _plan(x_shape, w_shape, itemsize):
    """Pick (TH, BK): H-tile height and K block. None if nothing fits.

    BK candidates largest-first: every extra K sweep re-DMAs the input
    window (grid (B, KT, HT), HT fastest — input HBM reads scale with
    KT), so prefer the whole K panel and fall back to smaller
    128-multiple divisors only when no H tile fits beside it."""
    _, h, w, c = x_shape
    k = w_shape[3]
    bk_cands = [
        cand for cand in range(128, k + 1, 128)
        if k % cand == 0 and 9 * c * cand * itemsize <= _W_BUDGET
    ]
    for bk in sorted(bk_cands, reverse=True):
        # H tile: largest divisor of H whose working set fits VMEM.
        best = None
        for th in range(1, h + 1):
            if h % th:
                continue
            m = th * w
            if best is not None and m > _TARGET_M:
                break
            need = (
                (th + 2) * w * c * itemsize  # input window
                + m * bk * 4  # fp32 accumulator
                + 2 * m * bk * itemsize  # output tile (double-buffered)
                + 2 * 9 * c * bk * itemsize  # weight panel (dbl-buffered)
                + 9 * m * c * itemsize  # all nine shifted slices live
            )
            if need <= _VMEM_BUDGET:
                best = th
        if best is not None:
            return (best, bk)
    return None


def _kernel(x_hbm, w_ref, b_ref, out_ref, xs_ref, sem, *, W, TH, C, out_dtype):
    # grid = (B, KT, HT), HT fastest. Each step convolves a TH-row band of
    # one batch element against one BK-column weight panel.
    b = pl.program_id(0)
    ht = pl.program_id(2)
    M = TH * W
    M2 = (TH + 2) * W
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(ht * M, M2)], xs_ref, sem)
    dma.start()
    dma.wait()
    col = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % W
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = dy * W + dx - 1
            if s == -1:
                # First element would read before the window; it is a
                # masked column-wrap anyway, so substitute a zero row.
                body = xs_ref[pl.ds(0, M - 1), :]
                sl = jnp.concatenate(
                    [jnp.zeros((1, C), body.dtype), body], axis=0
                )
            elif s == 2 * W + 1:
                # Symmetric: last element reads one past the window.
                body = xs_ref[pl.ds(s, M - 1), :]
                sl = jnp.concatenate(
                    [body, jnp.zeros((1, C), body.dtype)], axis=0
                )
            else:
                sl = xs_ref[pl.ds(s, M), :]
            if dx == 0:
                sl = jnp.where(col == 0, 0, sl)
            elif dx == 2:
                sl = jnp.where(col == W - 1, 0, sl)
            t = jax.lax.dot_general(
                sl,
                w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_pallas(x, w, bias, interpret=False):
    B, H, W, C = x.shape
    K = w.shape[3]
    itemsize = jnp.dtype(x.dtype).itemsize
    TH, BK = _plan(x.shape, w.shape, itemsize)
    HT = H // TH
    KT = K // BK
    M = TH * W
    x2 = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0))).reshape(B, (H + 2) * W, C)
    w9 = w.astype(x.dtype).reshape(9, C, K)
    b1 = bias.astype(x.dtype).reshape(1, K)
    out = pl.pallas_call(
        functools.partial(_kernel, W=W, TH=TH, C=C, out_dtype=x.dtype),
        grid=(B, KT, HT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, C, BK), lambda b, kt, ht: (0, 0, kt)),
            pl.BlockSpec((1, BK), lambda b, kt, ht: (0, kt)),
        ],
        out_specs=pl.BlockSpec((1, M, BK), lambda b, kt, ht: (b, ht, kt)),
        out_shape=jax.ShapeDtypeStruct((B, H * W, K), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((TH + 2) * W, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, w9, b1)
    return out.reshape(B, H, W, K)


def _xla_conv(x, w, bias):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, w, bias, interpret=False):
    """SAME-padded stride-1 3x3 conv, NHWC x HWIO -> NHWC (Pallas forward,
    XLA gradients). `bias` is required (pass zeros for bias-free convs);
    caller must check `supports()` first."""
    return _conv3x3_pallas(x, w, bias, interpret=interpret)


def _conv3x3_fwd(x, w, bias, interpret):
    return _conv3x3_pallas(x, w, bias, interpret=interpret), (x, w, bias)


def _conv3x3_bwd(interpret, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(_xla_conv, x, w, bias)
    return vjp(g)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
