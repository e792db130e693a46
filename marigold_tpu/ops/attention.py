"""Attention dispatch: Pallas flash kernel for long self-attention on TPU,
fused XLA einsum for short sequences (the length-2 empty-prompt
cross-attention) and non-TPU backends.

The threshold trades kernel-launch overhead against the O(N^2) HBM cost of
materialized logits; above ~1024 tokens flash wins decisively on v5e.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 1024
_DISABLE_FLASH = os.environ.get("MARIGOLD_TPU_DISABLE_FLASH", "0") == "1"
# "shifted" (default): per-row precomputed softmax shift, ~23% faster at
# the level-0 serving shape; exact whenever the per-row logit landscape
# has no >40-logit spike hiding between every-72nd-column samples (see
# ops/flash_attention.py module comment). "online": classic running-max.
_FLASH_SOFTMAX = os.environ.get("MARIGOLD_TPU_FLASH_SOFTMAX", "shifted")


def get_flash_softmax() -> str:
    """Current flash-softmax mode ("shifted" serving default, "online"
    reference-exact). Pipeline program-cache keys include this value so a
    mode switch never reuses a program compiled under the other mode."""
    return _FLASH_SOFTMAX


def set_flash_softmax(mode: str) -> None:
    """Pin the flash-softmax mode at runtime (the `--parity` gate calls
    this with "online"; env var MARIGOLD_TPU_FLASH_SOFTMAX sets the
    import-time default — docs/PARITY.md 'Reproduction pins')."""
    if mode not in ("shifted", "online"):
        raise ValueError(f"flash softmax mode must be shifted|online, got {mode!r}")
    global _FLASH_SOFTMAX
    _FLASH_SOFTMAX = mode


def _on_tpu() -> bool:
    try:
        platform = jax.default_backend()
    except RuntimeError:
        return False
    return platform in ("tpu", "axon")


def use_flash(num_q: int, num_kv: int) -> bool:
    if _DISABLE_FLASH:
        return False
    return _on_tpu() and num_q >= _FLASH_MIN_SEQ and num_kv >= _FLASH_MIN_SEQ


def xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """[B,Nq,C] x [B,Nk,C] -> [B,Nq,C], fp32 softmax."""
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // num_heads
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(b, nk, num_heads, hd)
    vh = v.reshape(b, nk, num_heads, hd)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh, preferred_element_type=q.dtype)
    return out.reshape(b, nq, c)


def scaled_dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
    mask: Optional[jax.Array] = None,
    spatial_axis: Optional[str] = None,
) -> jax.Array:
    """Dispatching attention used by the UNet transformer blocks.

    spatial_axis: token axis sharded over that mesh axis (inside
    shard_map). K/V are all-gathered once (one O(N*D) ICI collective —
    tiny next to the O(N^2) score work it unlocks); each shard then runs
    the local kernel over its query slice. This is the sharded-attention
    design of ops/sharded_attention.py, fused into the UNet forward."""
    if spatial_axis is not None:
        k = jax.lax.all_gather(k, spatial_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, spatial_axis, axis=1, tiled=True)
    b, nq, c = q.shape
    nk = k.shape[1]
    if mask is None and use_flash(nq, nk):
        from marigold_tpu.ops.flash_attention import (
            _KV_RESIDENT_BYTES,
            flash_attention_dt,
        )

        hd = c // num_heads
        kv_bytes = 2 * hd * ((nk + 127) // 128 * 128) * q.dtype.itemsize
        if _FLASH_SOFTMAX == "online" and kv_bytes > _KV_RESIDENT_BYTES:
            # only the shifted kernel has the K-blocked variant; wide
            # heads (VAE mid, d=512) don't fit full K/V rows in VMEM
            return xla_attention(q, k, v, num_heads, mask)
        # [B,N,C] -> [B*H, hd, N]: the transposed layout keeps the head
        # dim (64 in SD2) in sublanes so the kernel contracts no zero
        # padding — ~31% faster than the [N, 128-padded-hd] layout at the
        # 9216-token level-0 shape (measured on v5e; scripts/
        # bench_attention_impls.py).
        def fold_t(x, n):
            return (
                x.reshape(b, n, num_heads, hd)
                .transpose(0, 2, 3, 1)
                .reshape(b * num_heads, hd, n)
            )

        out_t = flash_attention_dt(
            fold_t(q, nq), fold_t(k, nk), fold_t(v, nk),
            softmax=_FLASH_SOFTMAX,
        )
        return (
            out_t.reshape(b, num_heads, hd, nq)
            .transpose(0, 3, 1, 2)
            .reshape(b, nq, c)
        )
    return xla_attention(q, k, v, num_heads, mask)


# Measured SLOWER end-to-end on v5e (0.747 vs 0.775 maps/s serving): XLA
# does not fold the output transpose into the projection dot — the traced
# program shows the bhdn einsums at 95 TF/s (vs 109 for the plain dots)
# PLUS 64.5 ms/batch of explicit data-formatting around them, a net
# +23 ms/batch over the fold_t copies they replace. Kept opt-in as a
# recorded investigation (docs/PERFORMANCE.md "projected-QKV layout").
_PROJECTED_ATTN = os.environ.get("MARIGOLD_TPU_PROJECTED_ATTN", "0") == "1"


def self_attention_projected(
    y: jax.Array, attn_params: dict, num_heads: int,
    spatial_axis: Optional[str] = None,
) -> jax.Array:
    """Self-attention including its four projections, with Q/K/V computed
    DIRECTLY in the flash kernel's transposed [B*H, hd, N] layout.

    The standard path projects in [B,N,C] and then transposes each of
    Q/K/V to [B*H, hd, N] (fold_t above) and the kernel output back —
    four full layout-change passes over level-0-sized tensors per block
    (the 'data formatting'/'copy' slice of the serving trace). Emitting
    the projection einsum with the head/head-dim axes already leading
    lets XLA fold the transpose into the dot's output layout instead.

    Numerically identical math to linear()+scaled_dot_product_attention
    (same contractions, bf16-preferred accumulation); only the layout
    path differs. Falls back to that exact path whenever the flash
    kernel would not be used (short sequences, non-TPU, spatial mode,
    env kill-switch MARIGOLD_TPU_PROJECTED_ATTN=0).
    """
    from marigold_tpu.models import layers as L

    b, n, c = y.shape
    hd = c // num_heads
    a_out = attn_params["to_out"]["0"]

    use_projected = (
        _PROJECTED_ATTN
        and spatial_axis is None
        and use_flash(n, n)
        # proj_t reads only ['weight'] — fall back rather than silently
        # dropping Q/K/V biases if a checkpoint ever carries them (SD2
        # ships bias=False attention projections today)
        and not any(
            "bias" in attn_params[k] for k in ("to_q", "to_k", "to_v")
        )
    )
    if use_projected:
        from marigold_tpu.ops.flash_attention import (
            _KV_RESIDENT_BYTES,
            flash_attention_dt,
        )

        kv_bytes = 2 * hd * ((n + 127) // 128 * 128) * y.dtype.itemsize
        if _FLASH_SOFTMAX == "online" and kv_bytes > _KV_RESIDENT_BYTES:
            use_projected = False

    if not use_projected:
        q = L.linear(attn_params["to_q"], y)
        k = L.linear(attn_params["to_k"], y)
        v = L.linear(attn_params["to_v"], y)
        out = scaled_dot_product_attention(
            q, k, v, num_heads=num_heads, spatial_axis=spatial_axis
        )
        return L.linear(a_out, out)

    def proj_t(w):  # [C,C] -> [B*H, hd, N] projected activations
        wr = w.reshape(c, num_heads, hd)
        t = jnp.einsum("bnc,chd->bhdn", y, wr,
                       preferred_element_type=y.dtype)
        return t.reshape(b * num_heads, hd, n)

    out_t = flash_attention_dt(
        proj_t(attn_params["to_q"]["weight"]),
        proj_t(attn_params["to_k"]["weight"]),
        proj_t(attn_params["to_v"]["weight"]),
        softmax=_FLASH_SOFTMAX,
    )
    wo = a_out["weight"].reshape(num_heads, hd, c)
    out = jnp.einsum(
        "bhdn,hdc->bnc", out_t.reshape(b, num_heads, hd, n), wo,
        preferred_element_type=y.dtype,
    )
    return out + a_out["bias"]
