"""Winograd F(2x2, 3x3) convolution for TPU (Pallas kernel).

Motivation: the VAE decoder is the serving pipeline's second-largest
device-time block (~1.76 s of a 5.04 s batch) and is conv-dominated, with
the XLA conv emitter measured at 51-67% MFU at the decoder shapes
(docs/PERFORMANCE.md round-5 conv investigation). Direct-conv
reformulations cannot beat the emitter (measured, ibid.) — but Winograd
changes the *math*: F(2x2,3x3) computes each 2x2 output tile with 16
multiplies instead of 36, a 2.25x MXU FLOP reduction, turning the conv
into 16 dense [M, C] x [C, K] matmuls (one per Winograd tile position)
plus cheap VPU add/sub transforms.

Layout scheme. A 4x4 input tile with stride 2 is not a unit-stride slice
of an NHWC buffer — but after a *pixel unshuffle* into 4 phase tensors
P[pi][pj][u, v] = x[2u+pi, 2v+pj], tile position (a, b) of output tile
(t, w) is phase (a%2, b%2) at (t + a//2, w + b//2): a UNIT shift. So the
host-side XLA program pads (SAME + alignment), unshuffles, and flattens
(u, v) -> rows; the kernel DMAs four phase windows, takes statically
shifted slices exactly like the nine-tap kernel in ops/conv.py, builds
the 16 B^T d B combinations with VPU adds, runs 16 MXU matmuls against
the pre-transformed filter U = G g G^T, and accumulates the four output
phases Y_ab = sum_ij A[a,i] A[b,j] (V_ij @ U_ij) in fp32. The output
phases are pixel-shuffled back by XLA. No masks are needed anywhere: the
padding is materialized, and the single end-overrunning tap (du=1, dv=1)
substitutes one zero row for an element that lands in the discarded
alignment column.

Numerics: V/F sums are computed in the input dtype (bf16 on TPU; 2-term
sums), products accumulate in fp32 on the MXU, output-phase accumulation
and bias in fp32. F(2x2,3x3) is the numerically mild Winograd variant;
tests bound the error against the fp32 XLA conv.

Transform matrices (Lavin & Gray, "Fast Algorithms for Convolutional
Neural Networks"):
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[1/2,1/2,1/2],[1/2,-1/2,1/2],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

Gradients: `jax.custom_vjp` re-running the XLA convolution's VJP, as in
ops/conv.py — training takes exact XLA gradients.

Reference behavior replaced: torch.nn.Conv2d(padding=1) inside the
diffusers VAE/UNet used by /root/reference/marigold (via
marigold_tpu/models/layers.py:conv2d).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["winograd3x3", "supports"]

_U_BUDGET = 5 << 20  # transformed-filter panel [16, C, BK]
# Scoped-vmem stack limit is 16 MB and Mosaic's live set runs ~2 MB over
# this model (measured: modeled 15.2M compiled to a 17.18M allocation at
# 192x192x512/T=2) — budget 13 MB to stay under.
_VMEM_BUDGET = 13 << 20
_TARGET_M = 4096


def _phase_w(w):
    """Phase width: ceil((W+4)/2) rounded up to a sublane multiple of 8 so
    every output block [T*Wh1, BK] satisfies Mosaic's (8, 128) divisibility.
    The extra alignment columns are dead compute discarded by the final
    width slice (<=7 columns; <=2% at decoder widths)."""
    wh1 = (w + 4 + 1) // 2
    return (wh1 + 7) // 8 * 8

# A^T rows (output transform coefficients), zeros skipped in the kernel.
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))


def supports(x_shape, w_shape, stride, padding, dtype) -> bool:
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, c_in, c_out = w_shape
    if (kh, kw) != (3, 3) or stride != 1:
        return False
    if padding != [(1, 1), (1, 1)]:
        return False
    if c_in < 128 or c_out < 128 or c_in % 128 or c_out % 128:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    h, w = x_shape[1], x_shape[2]
    if h % 2 or w % 2:
        return False
    # The host-side phase/output shuffles materialize ~input-sized copies;
    # at the largest VAE-decode levels that can push a program over HBM
    # (the nine-tap kernel measurably did). MARIGOLD_TPU_WINO_MAX_HW caps
    # the spatial size winograd claims (pixels, H*W); 0 = unlimited.
    max_hw = int(os.environ.get("MARIGOLD_TPU_WINO_MAX_HW", "0"))
    if max_hw and h * w > max_hw:
        return False
    return _plan(x_shape, w_shape, jnp.dtype(dtype).itemsize) is not None


def _plan(x_shape, w_shape, itemsize):
    """Pick (T, BK): output-tile rows per grid step and K block.

    BK candidates are tried largest-first: a bigger K panel means fewer
    K sweeps, and each extra sweep re-DMAs every phase window (the grid
    is (B, KT, HT) with HT fastest, so input HBM reads scale with KT).
    But the largest panel can leave no VMEM for any row tile at wide
    channel counts — fall back to smaller 128-multiple divisors of K
    before giving up."""
    _, h, w, c = x_shape
    k = w_shape[3]
    ht = h // 2  # tile rows
    wh1 = _phase_w(w)  # phase width (includes alignment columns)
    bk_cands = [
        cand for cand in range(128, k + 1, 128)
        if k % cand == 0 and 16 * c * cand * itemsize <= _U_BUDGET
    ]
    for bk in sorted(bk_cands, reverse=True):
        best = None
        for t in range(1, ht + 1):
            if ht % t:
                continue
            m = t * wh1
            if best is not None and m > _TARGET_M:
                break
            need = (
                4 * (t + 1) * wh1 * c * itemsize  # four phase windows
                + 16 * m * c * itemsize  # all 16 F slices live
                + m * c * itemsize  # one live V
                + m * bk * 4  # one matmul result
                + 4 * m * bk * 4  # four fp32 Y accumulators
                + 2 * 16 * c * bk * itemsize  # U panel (double-buffered)
                + 2 * 4 * m * bk * itemsize  # output phases (dbl-buffered)
            )
            if need <= _VMEM_BUDGET:
                best = (t, m)
        if best is not None:
            return (best[0], bk)
    return None


def _kernel(x_hbm, u_ref, b_ref, out_ref, win_ref, sems, *, Wh1, T, C, out_dtype):
    # grid = (B, KT, HT), HT fastest.
    bb = pl.program_id(0)
    ht = pl.program_id(2)
    M = T * Wh1
    WLEN = (T + 1) * Wh1
    for p in range(4):
        pltpu.make_async_copy(
            x_hbm.at[bb, p, pl.ds(ht * M, WLEN)], win_ref.at[p], sems.at[p]
        ).start()
    for p in range(4):
        pltpu.make_async_copy(
            x_hbm.at[bb, p, pl.ds(ht * M, WLEN)], win_ref.at[p], sems.at[p]
        ).wait()

    def S(pi, du, pj, dv):
        """Phase slice: input tap at H-shift du, W-shift dv of phase (pi,pj)."""
        p = pi * 2 + pj
        s = du * Wh1 + dv
        if s + M <= WLEN:
            return win_ref[p, pl.ds(s, M), :]
        # (du=1, dv=1) overruns by one: that element is an alignment-column
        # output discarded by the host-side shuffle.
        body = win_ref[p, pl.ds(s, M - 1), :]
        return jnp.concatenate([body, jnp.zeros((1, C), body.dtype)], axis=0)

    # F[i][b]: B^T applied along H for each W tile position b=(pj,dv).
    F = []
    for i in range(4):
        row = []
        for b in range(4):
            pj, dv = b % 2, b // 2
            if i == 0:
                v = S(0, 0, pj, dv) - S(0, 1, pj, dv)
            elif i == 1:
                v = S(1, 0, pj, dv) + S(0, 1, pj, dv)
            elif i == 2:
                v = S(0, 1, pj, dv) - S(1, 0, pj, dv)
            else:
                v = S(1, 0, pj, dv) - S(1, 1, pj, dv)
            row.append(v)
        F.append(row)

    BK = u_ref.shape[2]
    Y = [jnp.zeros((M, BK), jnp.float32) for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if j == 0:
                V = F[i][0] - F[i][2]
            elif j == 1:
                V = F[i][1] + F[i][2]
            elif j == 2:
                V = F[i][2] - F[i][1]
            else:
                V = F[i][1] - F[i][3]
            m = jax.lax.dot_general(
                V,
                u_ref[i * 4 + j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for qa in range(2):
                ca = _AT[qa][i]
                if ca == 0:
                    continue
                for qb in range(2):
                    cb = _AT[qb][j]
                    if cb == 0:
                        continue
                    q = qa * 2 + qb
                    Y[q] = Y[q] + m if ca * cb > 0 else Y[q] - m
    bias = b_ref[:].astype(jnp.float32)
    for q in range(4):
        out_ref[0, q] = (Y[q] + bias).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _winograd_impl(x, w, bias, interpret=False):
    B, H, W, C = x.shape
    K = w.shape[3]
    itemsize = jnp.dtype(x.dtype).itemsize
    T, BK = _plan(x.shape, w.shape, itemsize)
    Ht = H // 2
    Wh1 = _phase_w(W)
    HT = Ht // T
    KT = K // BK
    M = T * Wh1

    # SAME pad + alignment columns up to the 8-sublane phase width;
    # unshuffle into [B, 4, (Hh1*Wh1), C], phase index p = (r%2)*2 + (c%2).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 2 * Wh1 - W - 1), (0, 0)))
    Hh1 = (H + 2) // 2
    ph = (
        xp.reshape(B, Hh1, 2, Wh1, 2, C)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(B, 4, Hh1 * Wh1, C)
    )

    # Filter transform U = G g G^T in fp32, flattened to [16, C, K].
    G = jnp.asarray(
        [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], jnp.float32
    )
    U = jnp.einsum("ia,jb,abck->ijck", G, G, w.astype(jnp.float32))
    U = U.reshape(16, C, K).astype(x.dtype)
    b1 = bias.astype(x.dtype).reshape(1, K)

    out = pl.pallas_call(
        functools.partial(_kernel, Wh1=Wh1, T=T, C=C, out_dtype=x.dtype),
        grid=(B, KT, HT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, C, BK), lambda b, kt, ht: (0, 0, kt)),
            pl.BlockSpec((1, BK), lambda b, kt, ht: (0, kt)),
        ],
        out_specs=pl.BlockSpec((1, 4, M, BK), lambda b, kt, ht: (b, 0, ht, kt)),
        out_shape=jax.ShapeDtypeStruct((B, 4, Ht * Wh1, K), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, (T + 1) * Wh1, C), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(ph, U, b1)

    # Shuffle the output phases back and drop the alignment columns.
    o = (
        out.reshape(B, 2, 2, Ht, Wh1, K)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(B, H, 2 * Wh1, K)
    )
    return o[:, :, :W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def winograd3x3(x, w, bias, interpret=False):
    """SAME-padded stride-1 3x3 conv via Winograd F(2x2,3x3), NHWC x HWIO
    -> NHWC (Pallas forward, XLA gradients). `bias` required; caller must
    check `supports()` first."""
    return _winograd_impl(x, w, bias, interpret=interpret)


def _wino_fwd(x, w, bias, interpret):
    return _winograd_impl(x, w, bias, interpret=interpret), (x, w, bias)


def _wino_bwd(interpret, res, g):
    from marigold_tpu.ops.conv import _xla_conv

    x, w, bias = res
    _, vjp = jax.vjp(_xla_conv, x, w, bias)
    return vjp(g)


winograd3x3.defvjp(_wino_fwd, _wino_bwd)
