"""Pallas TPU flash attention (forward) for the SD2 UNet self-attention.

Why: at 768px processing resolution the UNet's finest self-attention runs
over N = 96*96 = 9216 tokens; naive attention materializes [B,H,N,N]
logits in HBM (gigabytes, HBM-bandwidth-bound). This kernel keeps K/V tiles
in VMEM and computes an online-softmax over K blocks, so HBM traffic is
O(N*D) — the standard flash-attention recipe tiled for the MXU
(128-aligned blocks, fp32 accumulators, bf16 matmul inputs).

Replaces the reference's xformers memory-efficient attention
(script/depth/run.py:218, src/trainer/marigold_depth_trainer.py:96).

Layout: q,k,v are [BH, N, D] (batch*heads folded); non-128-multiple N is
handled by padding + masking padded K columns to -inf. Head dims up to 128
supported (SD2 uses 64).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  scale: float):
    """Grid: (BH, N_pad // block_q). q_ref: [block_q, D]; k/v_ref: [N_pad, D]
    (full row of K/V for this batch-head, VMEM-resident); o_ref: [block_q, D].
    n_valid_ref: scalar-prefetch actual K length (masks padded columns)."""
    n_valid = n_valid_ref[0]
    n_pad = k_ref.shape[0]
    block_q, d = q_ref.shape
    num_kb = n_pad // block_k

    # MXU inputs stay in the storage dtype (bf16 on the serving path — fp32
    # matmuls run at a fraction of bf16 MXU rate); accumulation and the
    # softmax state are fp32.
    q = q_ref[:]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [block_q, block_k] fp32
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(col < n_valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(q.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))

    o_ref[:] = (acc / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------------ #
# Shifted-softmax kernel: exp(clip(s - shift_q, max=CLAMP)) with a fixed
# per-QUERY-ROW shift instead of the online running max.
#
# Why: the dt online-softmax kernel is ~half VPU-bound — per K block it
# max-reduces the logits, rescales the softmax state AND the [D, block_q]
# fp32 accumulator by exp(m_prev - m_new). With a precomputed shift all of
# that collapses to exp + sum + one PV matmul per block; measured on v5e
# at the level-0 serving shape [100, 64, 9216]: 26.3 -> 19.4 ms (83 -> 112
# TF/s useful, ~85% of the QK-50%/PV-100% mixed MXU cap).
#
# Numerical design (NOT the unsafe "hope logits are small" trick):
# the wrapper computes shift[b, q] = max_j(S[b, q, j_sub]) + MARGIN over a
# strided subsample of K columns (~1-2% extra QK FLOPs). Let gap =
# true_rowmax - sampled_rowmax >= 0 (0 unless the row's peak hides
# entirely between sampled columns):
#   * underflow of the row is impossible: the largest p = exp(gap-MARGIN)
#     >= exp(-MARGIN) ~ 4e-18, a normal fp32; l >= that, and acc/l keeps
#     full fp32 *relative* precision (floating point, not fixed point).
#     Entries ~68 logits below the row max round to 0 — their true
#     softmax weight is <= 3e-30. Exactly like online softmax in bf16-out.
#   * overflow is impossible: p is clamped at exp(CLAMP)=e^75 and the
#     fp32 accumulators stay finite (l <= N * e^75 < fp32 max). The clamp
#     only engages when gap > MARGIN + 75 — a >115-logit spike between
#     sampled columns — and then degrades gracefully (the dominant,
#     clamped entries share weight equally; small entries still vanish)
#     instead of producing inf/NaN.
# The online-softmax kernel remains available (softmax="online") and is
# the training default via the custom VJP (backward recomputes with exact
# softmax either way).


def _flash_kernel_dt_shifted(n_valid_ref, qt_ref, kt_ref, vt_ref, shift_ref,
                             ot_ref, *, block_k: int, scale: float):
    """Grid: (BH, N_pad // block_q). shift_ref: [1, block_q] per-row
    shifts; everything else as _flash_kernel_dt."""
    n_valid = n_valid_ref[0]
    d, n_pad = kt_ref.shape
    block_q = qt_ref.shape[1]
    num_kb = n_pad // block_k

    qt = qt_ref[:]
    shift = shift_ref[:]  # [1, block_q] fp32

    def body(kb, carry):
        acc, l_prev = carry
        kt_blk = kt_ref[:, pl.ds(kb * block_k, block_k)]
        vt_blk = vt_ref[:, pl.ds(kb * block_k, block_k)]
        st = jax.lax.dot_general(
            kt_blk, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        st = jnp.where(row < n_valid, st, NEG_INF)
        p = jnp.exp(jnp.minimum(st - shift, 75.0))  # padded rows -> 0
        l_new = l_prev + jnp.sum(p, axis=0, keepdims=True)
        acc = acc + jax.lax.dot_general(
            vt_blk, p.astype(qt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, l_new

    acc0 = jnp.zeros((d, block_q), jnp.float32)
    l0 = jnp.zeros((1, block_q), jnp.float32)
    acc, l_fin = jax.lax.fori_loop(0, num_kb, body, (acc0, l0))

    ot_ref[:] = (acc / jnp.maximum(l_fin, 1e-30)).astype(ot_ref.dtype)


# ------------------------------------------------------------------ #
# Transposed-layout kernel: head dim in SUBLANES, tokens in LANES.
#
# With SD2's head dim 64, the [N, D] layout needs D padded to the 128-lane
# tile, doubling every MXU contraction's work (measured: both this module's
# padded kernel and jax's official TPU flash kernel plateau at ~63 TF/s
# *useful* on [100, 9216, 64] — i.e. ~64% MFU of which half is zeros).
# Storing Q/K/V as [BH, D, N] puts D=64 in sublanes (legal: multiple of the
# bf16 16-sublane tile) and the 128-aligned token axis in lanes, so the
# kernel contracts over real data only:
#   S^T = K_T^(d,bk)^T-contract-d Q_T^(d,bq)  -> [bk, bq]
#   O_T += V_T^(d,bk) @ P^T^(bk,bq)           -> [d, bq]   (native MXU)
# Softmax state lives as [1, bq] rows (reductions over sublanes).


def _flash_kernel_dt(n_valid_ref, qt_ref, kt_ref, vt_ref, ot_ref, *,
                     block_k: int, scale: float):
    """Grid: (BH, N_pad // block_q). qt_ref: [D, block_q];
    kt_ref/vt_ref: [D, N_pad]; ot_ref: [D, block_q]."""
    n_valid = n_valid_ref[0]
    d, n_pad = kt_ref.shape
    block_q = qt_ref.shape[1]
    num_kb = n_pad // block_k

    qt = qt_ref[:]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kt_blk = kt_ref[:, pl.ds(kb * block_k, block_k)]
        vt_blk = vt_ref[:, pl.ds(kb * block_k, block_k)]
        # S^T[bk, bq]: contract the d sublanes of both operands
        st = jax.lax.dot_general(
            kt_blk, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        st = jnp.where(row < n_valid, st, NEG_INF)

        m_cur = jnp.max(st, axis=0, keepdims=True)  # [1, bq]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(st - m_new)  # [bk, bq]
        alpha = jnp.exp(m_prev - m_new)  # [1, bq]
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        # O^T[d, bq] += V^T[d, bk] @ P^T[bk, bq] — native MXU orientation
        acc = acc * alpha + jax.lax.dot_general(
            vt_blk, p.astype(qt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((d, block_q), jnp.float32)
    m0 = jnp.full((1, block_q), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, block_q), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))

    ot_ref[:] = (acc / jnp.maximum(l_fin, 1e-30)).astype(ot_ref.dtype)


def _flash_kernel_dt_shifted_kblocked(n_valid_ref, qt_ref, kt_ref, vt_ref,
                                      shift_ref, ot_ref, acc_ref, l_ref, *,
                                      num_kb: int, scale: float):
    """K-blocked variant for large head dims (e.g. the SD2 VAE mid
    attention: one 512-wide head over 9216 tokens, whose full K/V rows
    don't fit VMEM). Grid: (BH, N_pad//block_q, Nk_pad//block_k) with the
    K dim innermost; acc/l live in VMEM scratch persisted across the K
    steps of one (b, i) cell."""
    kb = pl.program_id(2)
    n_valid = n_valid_ref[0]
    d, block_k = kt_ref.shape
    block_q = qt_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    st = jax.lax.dot_general(
        kt_ref[:], qt_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    row = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, block_q), 0
    )
    st = jnp.where(row < n_valid, st, NEG_INF)
    p = jnp.exp(jnp.minimum(st - shift_ref[:], 75.0))
    l_ref[:] += jnp.sum(p, axis=0, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        vt_ref[:], p.astype(qt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == num_kb - 1)
    def _finish():
        ot_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(ot_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def flash_attention_dt(
    qt: jax.Array,
    kt: jax.Array,
    vt: jax.Array,
    # v5e sweeps: q2304 won at [100, 64, 9216] (vs the padded layout's
    # 38.2 ms); block_k=None auto-selects per sequence length — at the
    # NI=3 serving shape [150, 64, 9216], k1024 measured 29.0 ms/call vs
    # k512's 30.8 (-5.7%), but k1024 pads level-1's N=2304 to 3072, so
    # the auto rule prefers the largest of {1024, 768, 512} that divides
    # the padded row (see _auto_block_k). block_q is clamped to the
    # padded sequence for shorter rows.
    block_q: int = 2304,
    block_k: Optional[int] = None,
    interpret: bool = False,
    softmax: str = "shifted",
) -> jax.Array:
    """Transposed-layout flash attention. qt/kt/vt: [BH, D, N] with D a
    multiple of the sublane tile (16 for bf16; SD2 uses 64). Returns
    O^T [BH, D, Nq]. Softmax scale = 1/sqrt(D).

    softmax: "shifted" (default — per-row precomputed shift, ~26% faster,
    see module comment for the numerical design) or "online" (classic
    running-max flash softmax).

    Differentiable: the forward runs the Pallas kernel (O(N*D) HBM); the
    backward recomputes attention probabilities in q-chunks of <=1024 rows
    under lax.scan (exact gradients, logits memory bounded to one chunk —
    the role xformers' memory-efficient backward plays for the reference's
    training, src/trainer/marigold_depth_trainer.py:96)."""
    return _flash_dt_impl(qt, kt, vt, block_q, block_k, interpret, softmax)


_SHIFT_MARGIN = 40.0
_SHIFT_SAMPLE_TARGET = 128  # aim for ~128 sampled K columns per row
_KV_RESIDENT_BYTES = 6 * 1024 * 1024  # full-K kernel if K+V rows fit this


def _k_resident(d: int, nk_pad: int, itemsize: int) -> bool:
    """Full-K-resident shifted kernel eligibility. Two gates:
    K+V rows must fit the VMEM budget, AND the head must be narrow
    (d<=128): the resident kernel's per-block fp32 compute buffers scale
    with d, so a d=512 head can pass the byte test at small nk yet blow
    the 16 MB scoped-VMEM limit (round-5 dress rehearsal: 384px smoke,
    nk_pad=2048, 18.2 MB stack allocation at compile). Pinned by
    tests/test_flash_attention.py::test_k_resident_gate."""
    return 2 * d * nk_pad * itemsize <= _KV_RESIDENT_BYTES and d <= 128


def _auto_block_k(nk: int) -> int:
    """Largest of {1024, 768, 512} whose padding of nk is smallest (ties
    go to the larger block — fewer K iterations per q block; measured
    -5.7% at [150, 64, 9216] for 1024 over 512 on v5e). Keeps level-1's
    N=2304 on 768 (exact) instead of padding 33% to 3072."""
    cands = (1024, 768, 512)
    return min(cands, key=lambda b: (_round_up(nk, b), -b))


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "softmax")
)
def _flash_dt_impl(
    qt: jax.Array,
    kt: jax.Array,
    vt: jax.Array,
    block_q: int = 2304,
    block_k: Optional[int] = None,
    interpret: bool = False,
    softmax: str = "shifted",
) -> jax.Array:
    bh, d, nq = qt.shape
    nk = kt.shape[2]
    if block_k is None:
        # Auto-widening to 1024/768 was validated on hardware only for the
        # shifted kernel; the online kernel carries extra per-block state
        # (running max + alpha rescale) so its VMEM fit/perf at wider
        # blocks is unverified — keep its measured 512 default.
        block_k = _auto_block_k(nk) if softmax == "shifted" else 512
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(nq, 128))
    block_k = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)

    qp = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad - nq)))
    kp = jnp.pad(kt, ((0, 0), (0, 0), (0, nk_pad - nk)))
    vp = jnp.pad(vt, ((0, 0), (0, 0), (0, nk_pad - nk)))
    n_valid = jnp.asarray([nk], jnp.int32)

    if softmax == "shifted":
        # full-K-resident kernel when eligible (see _k_resident);
        # K-blocked with scratch accumulators otherwise
        k_resident = _k_resident(d, nk_pad, qt.dtype.itemsize)
        if not k_resident:
            # wide-head K-blocked variant: tuned (and measured) at
            # q512/k512 — keep auto-selection from widening its K blocks
            block_q = min(block_q, 512)
            block_k = min(block_k, 512)
            nk_pad = _round_up(nk, block_k)
            kp = jnp.pad(kt, ((0, 0), (0, 0), (0, nk_pad - nk)))
            vp = jnp.pad(vt, ((0, 0), (0, 0), (0, nk_pad - nk)))
            nq_pad = _round_up(nq, block_q)
            qp = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad - nq)))

        # per-row shift from a strided K-column subsample (upper-bounded
        # extra work: ~nk/stride of one QK^T; XLA fuses max into the dot's
        # consumer). Sampled max <= true row max, so shift = sampled + 40
        # can never underflow the row (see module comment).
        stride = max(1, nk // _SHIFT_SAMPLE_TARGET)
        k_sub = kt[:, :, ::stride]
        s_sub = jax.lax.dot_general(
            qp, k_sub, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [BH, Nq_pad, n_sub]
        shifts = jnp.max(s_sub, axis=-1) + _SHIFT_MARGIN  # [BH, Nq_pad]
        shifts = shifts[:, None, :]  # [BH, 1, Nq_pad]

        if k_resident:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bh, nq_pad // block_q),
                in_specs=[
                    pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
                    pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
                    pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
                    pl.BlockSpec((1, 1, block_q), lambda b, i, n: (b, 0, i)),
                ],
                out_specs=pl.BlockSpec(
                    (1, d, block_q), lambda b, i, n: (b, 0, i)
                ),
            )

            def kernel(n_ref, q_ref, k_ref, v_ref, s_ref, o_ref):
                _flash_kernel_dt_shifted(
                    n_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], s_ref.at[0],
                    o_ref.at[0], block_k=block_k, scale=scale,
                )

            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((bh, d, nq_pad), qt.dtype),
                interpret=interpret,
            )(n_valid, qp, kp, vp, shifts)
            return out[:, :, :nq]

        num_kb = nk_pad // block_k
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nq_pad // block_q, num_kb),
            in_specs=[
                pl.BlockSpec((1, d, block_q), lambda b, i, k, n: (b, 0, i)),
                pl.BlockSpec((1, d, block_k), lambda b, i, k, n: (b, 0, k)),
                pl.BlockSpec((1, d, block_k), lambda b, i, k, n: (b, 0, k)),
                pl.BlockSpec((1, 1, block_q), lambda b, i, k, n: (b, 0, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, d, block_q), lambda b, i, k, n: (b, 0, i)
            ),
            scratch_shapes=[
                pltpu.VMEM((d, block_q), jnp.float32),
                pltpu.VMEM((1, block_q), jnp.float32),
            ],
        )

        def kernel_kb(n_ref, q_ref, k_ref, v_ref, s_ref, o_ref, acc, lsum):
            _flash_kernel_dt_shifted_kblocked(
                n_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], s_ref.at[0],
                o_ref.at[0], acc, lsum, num_kb=num_kb, scale=scale,
            )

        out = pl.pallas_call(
            kernel_kb,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bh, d, nq_pad), qt.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(n_valid, qp, kp, vp, shifts)
        return out[:, :, :nq]

    if softmax != "online":
        raise ValueError(f"unknown softmax mode: {softmax!r}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
            pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
    )

    def kernel(n_ref, q_ref, k_ref, v_ref, o_ref):
        _flash_kernel_dt(
            n_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0],
            block_k=block_k, scale=scale,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, d, nq_pad), qt.dtype),
        interpret=interpret,
    )(n_valid, qp, kp, vp)

    return out[:, :, :nq]


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """q: [BH, Nq, D], k/v: [BH, Nk, D] -> [BH, Nq, D].
    Softmax scale = 1/sqrt(D). Forward only (inference path)."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    # Mosaic tiling wants the minor (head) dim 128-aligned. Zero-padding is
    # exact: padded q/k lanes contribute 0 to logits, padded v lanes emit
    # zeros we slice off.
    d_pad = _round_up(d, 128)

    block_q = min(block_q, _round_up(nq, 128))
    block_k = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)

    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    n_valid = jnp.asarray([nk], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, n: (b, i, 0)),
            pl.BlockSpec((1, nk_pad, d_pad), lambda b, i, n: (b, 0, 0)),
            pl.BlockSpec((1, nk_pad, d_pad), lambda b, i, n: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i, n: (b, i, 0)),
    )

    def kernel(n_ref, q_ref, k_ref, v_ref, o_ref):
        _flash_kernel(
            n_ref,
            q_ref.at[0],
            k_ref.at[0],
            v_ref.at[0],
            o_ref.at[0],
            block_k=block_k,
            scale=scale,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(n_valid, qp, kp, vp)

    return out[:, :nq, :d]


# ------------------------------------------------------------------ #
# Training path: flash forward-with-LSE + Pallas flash backward.
#
# The first XLA backward (einsum recompute in 1024-row q-chunks under
# lax.scan, kept below as the fallback) traced at 74.5 ms/step — 28% of
# the bs2 480x640 training step — running at 3.2 TF/s: the sequential
# scan leaves the MXU idle and shuttles [chunk, Nk] fp32 logits through
# HBM. These kernels are the FlashAttention-2 backward tiled for the dt
# layout: probabilities recomputed block-wise in VMEM from the forward's
# saved logsumexp, one kernel producing dQ (grid over q blocks) and one
# producing dK/dV (grid over k blocks), all five matmuls on the MXU with
# no logits ever touching HBM.

_LSE_PAD = 1e30  # padded-q lse: exp(st - 1e30) == 0 kills padded columns

_FLASH_BWD = os.environ.get("MARIGOLD_TPU_FLASH_BWD", "pallas")


def _flash_kernel_dt_lse(n_valid_ref, qt_ref, kt_ref, vt_ref, ot_ref,
                         lse_ref, *, block_k: int, scale: float):
    """Online-softmax dt kernel that also writes the per-row logsumexp of
    the scaled logits (lse_ref: [1, block_q]) — the residual the Pallas
    backward needs. Used only by the custom-VJP forward rule, so the
    serving kernels above stay byte-identical."""
    n_valid = n_valid_ref[0]
    d, n_pad = kt_ref.shape
    block_q = qt_ref.shape[1]
    num_kb = n_pad // block_k

    qt = qt_ref[:]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kt_blk = kt_ref[:, pl.ds(kb * block_k, block_k)]
        vt_blk = vt_ref[:, pl.ds(kb * block_k, block_k)]
        st = jax.lax.dot_general(
            kt_blk, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        st = jnp.where(row < n_valid, st, NEG_INF)

        m_cur = jnp.max(st, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(st - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            vt_blk, p.astype(qt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((d, block_q), jnp.float32)
    m0 = jnp.full((1, block_q), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, block_q), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))

    l_safe = jnp.maximum(l_fin, 1e-30)
    ot_ref[:] = (acc / l_safe).astype(ot_ref.dtype)
    lse_ref[:] = m_fin + jnp.log(l_safe)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_dt_impl_lse(qt, kt, vt, block_q=2304, block_k=512,
                       interpret=False):
    """Exact (online-softmax) dt flash forward returning (out, lse);
    lse: [BH, Nq] fp32 logsumexp of the scaled logits."""
    bh, d, nq = qt.shape
    nk = kt.shape[2]
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(nq, 128))
    block_k = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)

    qp = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad - nq)))
    kp = jnp.pad(kt, ((0, 0), (0, 0), (0, nk_pad - nk)))
    vp = jnp.pad(vt, ((0, 0), (0, 0), (0, nk_pad - nk)))
    n_valid = jnp.asarray([nk], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
            pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, n: (b, 0, i)),
        ],
    )

    def kernel(n_ref, q_ref, k_ref, v_ref, o_ref, lse_ref):
        _flash_kernel_dt_lse(
            n_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0],
            lse_ref.at[0], block_k=block_k, scale=scale,
        )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, nq_pad), qt.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32),
        ],
        interpret=interpret,
    )(n_valid, qp, kp, vp)
    return out[:, :, :nq], lse[:, 0, :nq]


def _flash_bwd_dq_kernel(n_valid_ref, qt_ref, got_ref, lse_ref, dl_ref,
                         kt_ref, vt_ref, dqt_ref, *, block_k: int,
                         scale: float):
    """Grid: (BH, Nq_pad // block_q). qt/got/dqt: [d, block_q]; lse/dl
    (delta = rowsum(dO*O)): [1, block_q]; kt/vt: [d, Nk_pad] VMEM-resident.
    dQ^T = K^T dS with dS = P o (dP - delta), P recomputed blockwise from
    the saved lse."""
    n_valid = n_valid_ref[0]
    d, n_pad = kt_ref.shape
    block_q = qt_ref.shape[1]
    num_kb = n_pad // block_k

    qt = qt_ref[:]
    got = got_ref[:]
    lse = lse_ref[:]
    delta = dl_ref[:]

    def body(kb, acc):
        kt_blk = kt_ref[:, pl.ds(kb * block_k, block_k)]
        vt_blk = vt_ref[:, pl.ds(kb * block_k, block_k)]
        st = jax.lax.dot_general(
            kt_blk, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bk, bq]
        row = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        st = jnp.where(row < n_valid, st, NEG_INF)
        pt = jnp.exp(st - lse)  # exact probabilities
        dpt = jax.lax.dot_general(
            vt_blk, got, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, bq]
        dst = (pt * (dpt - delta)).astype(qt.dtype)
        return acc + jax.lax.dot_general(
            kt_blk, dst, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, bq]

    acc = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((d, block_q), jnp.float32)
    )
    dqt_ref[:] = (acc * scale).astype(dqt_ref.dtype)


def _flash_bwd_dkv_kernel(n_valid_ref, kt_ref, vt_ref, qt_ref, got_ref,
                          lse_ref, dl_ref, dkt_ref, dvt_ref, *,
                          block_q: int, scale: float):
    """Grid: (BH, Nk_pad // block_k). kt/vt/dkt/dvt: [d, block_k]; qt/got:
    [d, Nq_pad] VMEM-resident; lse/dl: [1, Nq_pad]. Padded q columns carry
    lse = +1e30 so their probabilities vanish; padded k rows are masked
    (their outputs are sliced off anyway)."""
    n_valid = n_valid_ref[0]
    d, nq_pad = qt_ref.shape
    block_k = kt_ref.shape[1]
    num_qb = nq_pad // block_q

    kt = kt_ref[:]
    vt = vt_ref[:]
    kb = pl.program_id(1)
    row = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, block_q), 0
    )

    def body(qb, carry):
        dk_acc, dv_acc = carry
        qt_blk = qt_ref[:, pl.ds(qb * block_q, block_q)]
        got_blk = got_ref[:, pl.ds(qb * block_q, block_q)]
        lse_blk = lse_ref[:, pl.ds(qb * block_q, block_q)]
        dl_blk = dl_ref[:, pl.ds(qb * block_q, block_q)]
        st = jax.lax.dot_general(
            kt, qt_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bk, bq]
        st = jnp.where(row < n_valid, st, NEG_INF)
        pt = jnp.exp(st - lse_blk)
        dpt = jax.lax.dot_general(
            vt, got_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst = (pt * (dpt - dl_blk)).astype(kt.dtype)
        # dV^T[d,bk] += dO^T[d,bq] P^T[bk,bq]^T ; dK^T[d,bk] += Q^T dS^T^T
        dv_acc = dv_acc + jax.lax.dot_general(
            got_blk, pt.astype(kt.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc = dk_acc + jax.lax.dot_general(
            qt_blk, dst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((d, block_k), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_qb, body, (zeros, zeros))
    dkt_ref[:] = (dk_acc * scale).astype(dkt_ref.dtype)
    dvt_ref[:] = dv_acc.astype(dvt_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_dt_bwd_pallas(qt, kt, vt, out, lse, got, block_q=512,
                         block_k=512, interpret=False):
    """Pallas flash backward: (dqt, dkt, dvt) on the dt layout."""
    bh, d, nq = qt.shape
    nk = kt.shape[2]
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(nq, 128))
    block_k = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)

    # delta = rowsum(dO o O) per query token (tiny, XLA-fused)
    delta = jnp.sum(
        got.astype(jnp.float32) * out.astype(jnp.float32), axis=1
    )  # [bh, nq]

    qp = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad - nq)))
    gp = jnp.pad(got, ((0, 0), (0, 0), (0, nq_pad - nq)))
    kp = jnp.pad(kt, ((0, 0), (0, 0), (0, nk_pad - nk)))
    vp = jnp.pad(vt, ((0, 0), (0, 0), (0, nk_pad - nk)))
    lse_p = jnp.pad(
        lse[:, None, :], ((0, 0), (0, 0), (0, nq_pad - nq)),
        constant_values=_LSE_PAD,
    )
    dl_p = jnp.pad(delta[:, None, :], ((0, 0), (0, 0), (0, nq_pad - nq)))
    n_valid = jnp.asarray([nk], jnp.int32)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, n: (b, 0, i)),
            pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
            pl.BlockSpec((1, d, nk_pad), lambda b, i, n: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i, n: (b, 0, i)),
    )

    def dq_kernel(n_ref, q_ref, g_ref, l_ref, dl_ref, k_ref, v_ref, o_ref):
        _flash_bwd_dq_kernel(
            n_ref, q_ref.at[0], g_ref.at[0], l_ref.at[0], dl_ref.at[0],
            k_ref.at[0], v_ref.at[0], o_ref.at[0],
            block_k=block_k, scale=scale,
        )

    dqt = pl.pallas_call(
        dq_kernel,
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, d, nq_pad), qt.dtype),
        interpret=interpret,
    )(n_valid, qp, gp, lse_p, dl_p, kp, vp)

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, d, block_k), lambda b, j, n: (b, 0, j)),
            pl.BlockSpec((1, d, block_k), lambda b, j, n: (b, 0, j)),
            pl.BlockSpec((1, d, nq_pad), lambda b, j, n: (b, 0, 0)),
            pl.BlockSpec((1, d, nq_pad), lambda b, j, n: (b, 0, 0)),
            pl.BlockSpec((1, 1, nq_pad), lambda b, j, n: (b, 0, 0)),
            pl.BlockSpec((1, 1, nq_pad), lambda b, j, n: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_k), lambda b, j, n: (b, 0, j)),
            pl.BlockSpec((1, d, block_k), lambda b, j, n: (b, 0, j)),
        ],
    )

    def dkv_kernel(n_ref, k_ref, v_ref, q_ref, g_ref, l_ref, dl_ref,
                   dk_ref, dv_ref):
        _flash_bwd_dkv_kernel(
            n_ref, k_ref.at[0], v_ref.at[0], q_ref.at[0], g_ref.at[0],
            l_ref.at[0], dl_ref.at[0], dk_ref.at[0], dv_ref.at[0],
            block_q=block_q, scale=scale,
        )

    dkt, dvt = pl.pallas_call(
        dkv_kernel,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, nk_pad), kt.dtype),
            jax.ShapeDtypeStruct((bh, d, nk_pad), vt.dtype),
        ],
        interpret=interpret,
    )(n_valid, kp, vp, qp, gp, lse_p, dl_p)

    return dqt[:, :, :nq], dkt[:, :, :nk], dvt[:, :, :nk]


def _use_pallas_bwd(d: int, nq: int, nk: int, itemsize: int) -> bool:
    """Pallas backward needs full K/V (dq kernel) and Q/dO (dkv kernel)
    rows VMEM-resident; fall back to the XLA scan backward for wide heads
    (e.g. d=512 VAE mid attention) or when disabled."""
    if _FLASH_BWD != "pallas":
        return False
    rows = 2 * d * max(_round_up(nq, 128), _round_up(nk, 128)) * itemsize
    return rows <= _KV_RESIDENT_BYTES


def _flash_dt_fwd(qt, kt, vt, block_q, block_k, interpret, softmax):
    if _use_pallas_bwd(qt.shape[1], qt.shape[2], kt.shape[2],
                       qt.dtype.itemsize):
        # training path: exact online-softmax forward that also emits the
        # logsumexp residual for the Pallas backward (exact regardless of
        # the serving `softmax` mode — the right numerics for training)
        out, lse = _flash_dt_impl_lse(
            qt, kt, vt, block_q, 512 if block_k is None else block_k,
            interpret,
        )
        return out, (qt, kt, vt, out, lse)
    out = _flash_dt_impl(qt, kt, vt, block_q, block_k, interpret, softmax)
    return out, (qt, kt, vt, None, None)


def _flash_dt_bwd(block_q, block_k, interpret, softmax, res, got):
    qt, kt, vt, out, lse = res
    if out is not None:
        return _flash_dt_bwd_pallas(
            qt, kt, vt, out, lse, got, interpret=interpret
        )
    return _flash_dt_bwd_xla(qt, kt, vt, got)


def _flash_dt_bwd_xla(qt, kt, vt, got):
    """Fallback exact attention backward on the transposed layout,
    q-chunked so the [chunk, Nk] logits never exceed one chunk's
    footprint (XLA einsums under lax.scan; used for wide heads whose
    rows exceed the Pallas kernels' VMEM budget, and via
    MARIGOLD_TPU_FLASH_BWD=xla).

    Math (per batch-head, standard attention grads): with S = QK^T*s,
    P = softmax(S), O = PV:
      dV = P^T dO;  dP = dO V^T;  dS = P*(dP - rowsum(dP*P));
      dQ = dS K * s;  dK = dS^T Q * s.
    """
    bh, d, nq = qt.shape
    nk = kt.shape[2]
    scale = 1.0 / math.sqrt(d)
    CH = min(1024, _round_up(nq, 128))
    nq_pad = _round_up(nq, CH)
    if nq_pad > nq:
        # zero-padded dO rows contribute exactly zero to every gradient
        qt_p = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad - nq)))
        got_p = jnp.pad(got, ((0, 0), (0, 0), (0, nq_pad - nq)))
    else:
        qt_p, got_p = qt, got
    n_ch = nq_pad // CH
    qt_c = qt_p.reshape(bh, d, n_ch, CH).transpose(2, 0, 1, 3)
    got_c = got_p.reshape(bh, d, n_ch, CH).transpose(2, 0, 1, 3)

    def body(carry, xs):
        dkt_acc, dvt_acc = carry
        q_c, g_c = xs  # [bh, d, CH]
        s = jnp.einsum("bdq,bdk->bqk", q_c, kt,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)  # fp32 [bh, CH, nk]
        dp = jnp.einsum("bdq,bdk->bqk", g_c, vt,
                        preferred_element_type=jnp.float32)
        r = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - r)).astype(kt.dtype)
        dq_c = jnp.einsum("bqk,bdk->bdq", ds, kt,
                          preferred_element_type=jnp.float32) * scale
        dkt_acc = dkt_acc + jnp.einsum(
            "bqk,bdq->bdk", ds, q_c, preferred_element_type=jnp.float32
        ) * scale
        dvt_acc = dvt_acc + jnp.einsum(
            "bqk,bdq->bdk", p.astype(g_c.dtype), g_c,
            preferred_element_type=jnp.float32,
        )
        return (dkt_acc, dvt_acc), dq_c

    zeros = jnp.zeros((bh, d, nk), jnp.float32)
    (dkt, dvt), dq_stack = jax.lax.scan(body, (zeros, zeros), (qt_c, got_c))
    dqt = dq_stack.transpose(1, 2, 0, 3).reshape(bh, d, nq_pad)[:, :, :nq]
    return (
        dqt.astype(qt.dtype),
        dkt.astype(kt.dtype),
        dvt.astype(vt.dtype),
    )


flash_attention_dt.defvjp(_flash_dt_fwd, _flash_dt_bwd)
