"""Functional NN building blocks for TPU (NHWC activations, HWIO kernels).

Design: no module framework — parameters are nested dicts of jnp arrays
whose keys mirror the diffusers module paths of the checkpoints we load
(e.g. params["down_blocks"]["0"]["resnets"]["0"]["norm1"]["scale"]), so the
safetensors loader is a mechanical name-split + layout transpose and parity
with reference checkpoints is auditable key-by-key.

Precision policy: matmuls/convs run in the params' dtype (bf16 on TPU, MXU
native); GroupNorm/LayerNorm statistics and softmax run in fp32 ("fp32
islands" — the reference keeps latents/loss fp32,
src/trainer/marigold_depth_trainer.py:306,329; GN is the precision-sensitive
op on TPU).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ #
# initializers (used for tests / training-from-scratch; checkpoints
# normally overwrite these)


def _split(key, n):
    return jax.random.split(key, n)


def init_linear(key, in_dim, out_dim, dtype=jnp.float32, bias=True):
    k1, _ = _split(key, 2)
    lim = 1.0 / math.sqrt(in_dim)
    p = {
        "weight": jax.random.uniform(k1, (in_dim, out_dim), dtype, -lim, lim)
    }
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_conv(key, in_ch, out_ch, kernel=3, dtype=jnp.float32, bias=True):
    k1, _ = _split(key, 2)
    fan_in = in_ch * kernel * kernel
    lim = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            k1, (kernel, kernel, in_ch, out_ch), dtype, -lim, lim
        )
    }
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def init_norm(num_ch, dtype=jnp.float32):
    return {"weight": jnp.ones((num_ch,), dtype), "bias": jnp.zeros((num_ch,), dtype)}


# ------------------------------------------------------------------ #
# core ops

# "xla" (default): the XLA conv emitter — measured best-in-program at every
# SD2/VAE tower shape (docs/PERFORMANCE.md round-5 conv investigation).
# "pallas": the nine-tap matmul kernel in ops/conv.py, kept as a measured
# opt-in (it wins only isolated 192x192x512 and loses 14% on the full UNet).
# "winograd": the F(2x2,3x3) Pallas kernel in ops/winograd.py (2.25x fewer
# MXU FLOPs); falls back to the XLA emitter where unsupported.
_CONV_IMPL = os.environ.get("MARIGOLD_TPU_CONV", "xla")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def _conv_impl_for(w, x, stride, padding):
    """Which 3x3 kernel handles this call: 'winograd' | 'pallas' | None.

    MARIGOLD_TPU_CONV_INTERPRET=1 lets tests exercise this exact dispatch
    off-TPU (Pallas interpret mode)."""
    if _CONV_IMPL == "xla":
        return None
    if not _on_tpu() and os.environ.get("MARIGOLD_TPU_CONV_INTERPRET") != "1":
        return None
    if _CONV_IMPL == "winograd":
        from marigold_tpu.ops import winograd as _wg

        if _wg.supports(x.shape, w.shape, stride, padding, x.dtype):
            return "winograd"
        return None
    if _CONV_IMPL == "pallas":
        from marigold_tpu.ops import conv as _pc

        if _pc.supports(x.shape, w.shape, stride, padding, x.dtype):
            return "pallas"
    return None


def linear(p, x):
    y = jnp.dot(x, p["weight"], preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def conv2d(p, x, stride=1, padding=1, spatial_axis=None):
    """x: [B,H,W,Cin], weight: [Kh,Kw,Cin,Cout] (HWIO).

    Conv dispatch: MARIGOLD_TPU_CONV=pallas routes SAME-padded stride-1
    3x3 convs with 128-multiple channels through the Pallas nine-tap
    matmul kernel (`ops/conv.py`). Default is the XLA emitter — the
    round-5 investigation (docs/PERFORMANCE.md) measured it faster
    in-program at every tower shape. Gradients always take the XLA VJP.

    spatial_axis: when set (inside `shard_map` with the H dimension sharded
    over that mesh axis), 3x3 convs exchange one halo row with each
    neighbor over ICI (`lax.ppermute`; edge shards receive zeros = the
    zero padding of the unsharded op) and then convolve without H padding,
    so the sharded result is bit-identical to the global conv. 1x1 convs
    are halo-free. Stride-2 3x3 convs pull only the top halo (even local H
    keeps every shard's sampling grid aligned with the global one)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    kh = p["weight"].shape[0]
    impl = None if spatial_axis is not None else _conv_impl_for(
        p["weight"], x, stride, padding
    )
    if impl is not None:
        bias = p.get("bias")
        if bias is None:
            bias = jnp.zeros((p["weight"].shape[3],), x.dtype)
        interp = not _on_tpu()
        if impl == "winograd":
            from marigold_tpu.ops import winograd as _wg

            return _wg.winograd3x3(
                x, p["weight"].astype(x.dtype), bias.astype(x.dtype), interp
            )
        from marigold_tpu.ops import conv as _pc

        return _pc.conv3x3(
            x, p["weight"].astype(x.dtype), bias.astype(x.dtype), interp
        )
    if spatial_axis is not None and kh == 3:
        from_prev, from_next = _halo_rows(x, spatial_axis)
        if stride == 1:
            x = jnp.concatenate([from_prev, x, from_next], axis=1)
        else:  # stride 2, kernel 3: windows start at global row -1
            x = jnp.concatenate([from_prev, x], axis=1)
        padding = [(0, 0), padding[1]]
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _halo_rows(x, axis_name):
    """Neighbor boundary rows for H-sharded [B,Hl,W,C]: (last row of the
    previous shard, first row of the next shard). Edge shards get zeros —
    `ppermute` leaves targets with no source at zero, which is exactly the
    global op's zero padding."""
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    from_prev = jax.lax.ppermute(x[:, -1:], axis_name, fwd)
    from_next = jax.lax.ppermute(x[:, :1], axis_name, bwd)
    return from_prev, from_next


def group_norm(p, x, num_groups=32, eps=1e-6, act=None, spatial_axis=None):
    """GroupNorm over channel groups. x: [B,H,W,C] (or [B,N,C]).

    Precision/bandwidth design: statistics accumulate in fp32 (the
    precision-sensitive part) but the tensor itself stays in its storage
    dtype — no materialized fp32 copy, so HBM traffic for the bf16 path is
    halved vs a naive fp32 upcast. The affine+activation epilogue folds
    into one fused VPU pass (act='silu' fuses the SD SiLU).

    spatial_axis: when the H dimension is sharded over that mesh axis
    (inside shard_map), the statistics are `psum`ed across shards so every
    device normalizes with the global mean/var.

    Measured non-option: an optimization_barrier here (to stop XLA fusing
    these reductions into the producing conv's epilogue) makes the full
    serving program 2% SLOWER — isolated convs run 72-93% MFU vs 41-50%
    in-program, but the gap comes from program-level layout assignment,
    not the fused reduce (v5e traces, docs/PERFORMANCE.md).

    Statistics layout (measured, r5 v5e trace): reducing a (g, c/g)
    reshape of the big tensor splits the 128-lane channel tiles at
    non-aligned group boundaries (c/g = 10 at C=320), and the resulting
    stat fusions ran 4.7-17 ms each — ~60x over the HBM floor, ~115 ms
    of a 739 ms UNet forward. Instead reduce per CHANNEL over the
    spatial axes (native-layout, lane-parallel), then group-aggregate
    the tiny [B, C] partials; identical fp32 math (the group sum is a
    sum of per-channel fp32 partial sums)."""
    orig_dtype = x.dtype
    shape = x.shape
    c = shape[-1]
    g = num_groups
    cg = c // g
    red_axes = tuple(range(1, x.ndim - 1))
    n_red = int(np.prod([shape[a] for a in red_axes])) * cg
    s1c = jnp.sum(x, axis=red_axes, dtype=jnp.float32)  # [B, C]
    s2c = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=red_axes, dtype=jnp.float32
    )
    bsz = shape[0]
    s1 = jnp.sum(s1c.reshape(bsz, g, cg), axis=-1)  # tiny [B, g]
    s2 = jnp.sum(s2c.reshape(bsz, g, cg), axis=-1)
    if spatial_axis is not None:
        # group-aggregate BEFORE the collective: psum commutes with the
        # [B,C]->[B,g] sum, and the [B,g] payload is c/g x smaller
        s1 = jax.lax.psum(s1, spatial_axis)
        s2 = jax.lax.psum(s2, spatial_axis)
        n_red *= jax.lax.axis_size(spatial_axis)
    mean = s1 / n_red
    var = jnp.maximum(s2 / n_red - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # fold (x - mean) * inv * w + b  ->  x * (inv*w) + (b - mean*inv*w),
    # expanded to per-channel [B, C] so the big-tensor pass needs no
    # group reshape
    w = p["weight"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32)
    inv_c = jnp.repeat(inv, cg, axis=-1)  # [B, C]
    mean_c = jnp.repeat(mean, cg, axis=-1)
    scale = inv_c * w
    shift = b - mean_c * scale
    bshape = (bsz,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * scale.reshape(bshape) + shift.reshape(bshape)
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(orig_dtype)


def layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(x.dtype)


def timestep_embedding(
    t: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, matching the SD2 UNet's time_proj
    semantics (flip_sin_to_cos=True, freq_shift=0). t: [B] -> [B, dim]."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention. q: [B,Nq,C], k/v: [B,Nk,C].
    Softmax in fp32 (TPU precision island). XLA fuses this well for the
    short-KV cross-attention; long self-attention is routed to the Pallas
    flash kernel by callers (ops/attention.py)."""
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // num_heads
    qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, c)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,2H,2W,C] nearest (diffusers Upsample2D semantics)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def geglu(p, x):
    """GEGLU feed-forward gate (diffusers FeedForward net.0): proj to 2*inner,
    split, value * gelu(gate)."""
    proj = linear(p, x)
    value, gate = jnp.split(proj, 2, axis=-1)
    return value * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(
        x.dtype
    )
