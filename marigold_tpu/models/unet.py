"""SD2-class conditional UNet (UNet2DConditionModel role) — functional JAX,
NHWC, config-driven so tiny test instances and the full 865M-param SD2
backbone share one code path.

Role parity: this is the denoiser the reference calls at
marigold_depth_pipeline.py:461-463 / marigold_depth_trainer.py:309-311,
consumed from diffusers. Marigold surgically widens conv_in (4->8 for
depth/normals; 4(n+1) in / 4n out for IID) — here arbitrary in/out channel
counts are just config (models/surgery.py replicates the training-time
surgery on loaded weights).

Architecture notes (SD2 config): block_out_channels (320,640,1280,1280);
down: CrossAttnDownBlock2D x3 + DownBlock2D; mid: cross-attn mid block; up:
UpBlock2D + CrossAttnUpBlock2D x3; layers_per_block 2; heads (5,10,20,20)
(diffusers' `attention_head_dim` field historically holds the *head count*
for SD checkpoints — kept with the same meaning for checkpoint compat);
cross_attention_dim 1024; linear transformer projections.

TPU design: everything is shape-static; attention dispatches through
ops/attention.py (Pallas flash kernel for long self-attention, XLA einsum
for the length-2 text cross-attention); GroupNorm+SiLU fused fp32 islands;
bf16 matmul path end-to-end otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from marigold_tpu.models import layers as L
from marigold_tpu.ops.attention import (
    scaled_dot_product_attention,
    self_attention_projected,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 96
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Sequence[str] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    attention_head_dim: Sequence[int] = (5, 10, 20, 20)  # = num heads (see module doc)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    norm_eps: float = 1e-5  # diffusers UNet2DConditionModel default; the
    # transformer blocks' spatial GroupNorm is hardcoded 1e-6 in diffusers
    use_linear_projection: bool = True

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "UNetConfig":
        ahd = d.get("attention_head_dim", (5, 10, 20, 20))
        if isinstance(ahd, int):
            ahd = (ahd,) * len(d.get("block_out_channels", (320, 640, 1280, 1280)))
        return cls(
            sample_size=d.get("sample_size", 96),
            in_channels=d.get("in_channels", 8),
            out_channels=d.get("out_channels", 4),
            block_out_channels=tuple(d.get("block_out_channels", (320, 640, 1280, 1280))),
            down_block_types=tuple(
                d.get(
                    "down_block_types",
                    ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
                )
            ),
            up_block_types=tuple(
                d.get(
                    "up_block_types",
                    ("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
                )
            ),
            layers_per_block=d.get("layers_per_block", 2),
            attention_head_dim=tuple(ahd),
            cross_attention_dim=d.get("cross_attention_dim", 1024),
            norm_num_groups=d.get("norm_num_groups", 32),
            norm_eps=d.get("norm_eps", 1e-5),
            use_linear_projection=d.get("use_linear_projection", True),
        )

    def to_dict(self) -> dict:
        return {
            "_class_name": "UNet2DConditionModel",
            "sample_size": self.sample_size,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "block_out_channels": list(self.block_out_channels),
            "down_block_types": list(self.down_block_types),
            "up_block_types": list(self.up_block_types),
            "layers_per_block": self.layers_per_block,
            "attention_head_dim": list(self.attention_head_dim),
            "cross_attention_dim": self.cross_attention_dim,
            "norm_num_groups": self.norm_num_groups,
            "norm_eps": self.norm_eps,
            "use_linear_projection": self.use_linear_projection,
            "act_fn": "silu",
        }

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


# ------------------------------------------------------------------ #
# init


def _init_resnet(key, c_in, c_out, temb_dim, dtype):
    k = jax.random.split(key, 4)
    p = {
        "norm1": L.init_norm(c_in, dtype),
        "conv1": L.init_conv(k[0], c_in, c_out, 3, dtype),
        "time_emb_proj": L.init_linear(k[1], temb_dim, c_out, dtype),
        "norm2": L.init_norm(c_out, dtype),
        "conv2": L.init_conv(k[2], c_out, c_out, 3, dtype),
    }
    if c_in != c_out:
        p["conv_shortcut"] = L.init_conv(k[3], c_in, c_out, 1, dtype)
    return p


def _init_cross_attn_xf(key, c, n_heads, cross_dim, dtype):
    """Transformer2DModel with one BasicTransformerBlock."""
    k = iter(jax.random.split(key, 16))
    blk = {
        "norm1": L.init_norm(c, dtype),
        "attn1": {
            "to_q": L.init_linear(next(k), c, c, dtype, bias=False),
            "to_k": L.init_linear(next(k), c, c, dtype, bias=False),
            "to_v": L.init_linear(next(k), c, c, dtype, bias=False),
            "to_out": {"0": L.init_linear(next(k), c, c, dtype)},
        },
        "norm2": L.init_norm(c, dtype),
        "attn2": {
            "to_q": L.init_linear(next(k), c, c, dtype, bias=False),
            "to_k": L.init_linear(next(k), cross_dim, c, dtype, bias=False),
            "to_v": L.init_linear(next(k), cross_dim, c, dtype, bias=False),
            "to_out": {"0": L.init_linear(next(k), c, c, dtype)},
        },
        "norm3": L.init_norm(c, dtype),
        "ff": {
            "net": {
                "0": {"proj": L.init_linear(next(k), c, 8 * c, dtype)},
                "2": L.init_linear(next(k), 4 * c, c, dtype),
            }
        },
    }
    return {
        "norm": L.init_norm(c, dtype),
        "proj_in": L.init_linear(next(k), c, c, dtype),
        "transformer_blocks": {"0": blk},
        "proj_out": L.init_linear(next(k), c, c, dtype),
    }


def init_params(key, cfg: UNetConfig, dtype=jnp.float32) -> dict:
    b = list(cfg.block_out_channels)
    temb = cfg.time_embed_dim
    keys = iter(jax.random.split(key, 512))

    params: dict = {
        "conv_in": L.init_conv(next(keys), cfg.in_channels, b[0], 3, dtype),
        "time_embedding": {
            "linear_1": L.init_linear(next(keys), b[0], temb, dtype),
            "linear_2": L.init_linear(next(keys), temb, temb, dtype),
        },
    }

    down: dict = {}
    c = b[0]
    for i, (bt, bc) in enumerate(zip(cfg.down_block_types, b)):
        blk: dict = {"resnets": {}}
        has_attn = bt == "CrossAttnDownBlock2D"
        if has_attn:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _init_resnet(next(keys), c, bc, temb, dtype)
            c = bc
            if has_attn:
                blk["attentions"][str(j)] = _init_cross_attn_xf(
                    next(keys), bc, cfg.attention_head_dim[i],
                    cfg.cross_attention_dim, dtype,
                )
        if i < len(b) - 1:
            blk["downsamplers"] = {"0": {"conv": L.init_conv(next(keys), c, c, 3, dtype)}}
        down[str(i)] = blk
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnets": {
            "0": _init_resnet(next(keys), b[-1], b[-1], temb, dtype),
            "1": _init_resnet(next(keys), b[-1], b[-1], temb, dtype),
        },
        "attentions": {
            "0": _init_cross_attn_xf(
                next(keys), b[-1], cfg.attention_head_dim[-1],
                cfg.cross_attention_dim, dtype,
            )
        },
    }

    up: dict = {}
    rev = list(reversed(b))
    c = rev[0]
    for i, bt in enumerate(cfg.up_block_types):
        bc = rev[i]
        skip_chs = _up_skip_channels(b, i, cfg.layers_per_block)
        blk = {"resnets": {}}
        has_attn = bt == "CrossAttnUpBlock2D"
        if has_attn:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = _init_resnet(
                next(keys), c + skip_chs[j], bc, temb, dtype
            )
            c = bc
            if has_attn:
                blk["attentions"][str(j)] = _init_cross_attn_xf(
                    next(keys), bc, list(reversed(cfg.attention_head_dim))[i],
                    cfg.cross_attention_dim, dtype,
                )
        if i < len(b) - 1:
            blk["upsamplers"] = {"0": {"conv": L.init_conv(next(keys), c, c, 3, dtype)}}
        up[str(i)] = blk
    params["up_blocks"] = up

    params["conv_norm_out"] = L.init_norm(b[0], dtype)
    params["conv_out"] = L.init_conv(next(keys), b[0], cfg.out_channels, 3, dtype)
    return params


def _down_skip_channels(b: list, layers_per_block: int) -> list:
    """Channel count of each entry pushed onto the skip stack."""
    skips = [b[0]]  # conv_in
    c = b[0]
    for i, bc in enumerate(b):
        for _ in range(layers_per_block):
            c = bc
            skips.append(c)
        if i < len(b) - 1:
            skips.append(c)  # downsampler
    return skips


def _up_skip_channels(b: list, up_idx: int, layers_per_block: int) -> list:
    """Skip channels consumed by up block `up_idx` (pops in reverse)."""
    skips = _down_skip_channels(b, layers_per_block)
    per_block = layers_per_block + 1
    start = len(skips) - up_idx * per_block
    return list(reversed(skips[start - per_block : start]))


# ------------------------------------------------------------------ #
# forward


def _resnet(p, x, temb, groups, eps=1e-5, spatial_axis=None):
    h = L.group_norm(p["norm1"], x, groups, eps=eps, act="silu",
                     spatial_axis=spatial_axis)
    h = L.conv2d(p["conv1"], h, spatial_axis=spatial_axis)
    t = L.linear(p["time_emb_proj"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = L.group_norm(p["norm2"], h, groups, eps=eps, act="silu",
                     spatial_axis=spatial_axis)
    h = L.conv2d(p["conv2"], h, spatial_axis=spatial_axis)
    if "conv_shortcut" in p:
        x = L.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _proj(pp, t):
    """proj_in/proj_out: Linear when use_linear_projection, else a 1x1
    Conv2d (SD1.x-class checkpoints) — identical math over the channel
    axis, so collapse the [1,1,C,C] HWIO kernel to [C,C] and apply as a
    linear on the token layout (diffusers applies the conv before the
    token reshape; for a 1x1 kernel the orders commute)."""
    w = pp["weight"]
    if w.ndim == 4:
        pp = dict(pp, weight=w[0, 0])
    return L.linear(pp, t)


def _transformer(p, x, ctx, n_heads, groups, use_linear_projection=True,
                 spatial_axis=None):
    b, h, w, c = x.shape
    residual = x
    xn = L.group_norm(p["norm"], x, groups, spatial_axis=spatial_axis)
    xn = xn.reshape(b, h * w, c)
    xn = _proj(p["proj_in"], xn)

    blk = p["transformer_blocks"]["0"]
    # self-attention: projections fused around the flash kernel's
    # transposed layout on TPU (falls back to linear+sdpa elsewhere)
    y = L.layer_norm(blk["norm1"], xn)
    xn = xn + self_attention_projected(
        y, blk["attn1"], num_heads=n_heads, spatial_axis=spatial_axis
    )
    # cross-attention over text context (length-2 empty-prompt in Marigold)
    y = L.layer_norm(blk["norm2"], xn)
    a2 = blk["attn2"]
    attn_out = scaled_dot_product_attention(
        L.linear(a2["to_q"], y),
        L.linear(a2["to_k"], ctx.astype(y.dtype)),
        L.linear(a2["to_v"], ctx.astype(y.dtype)),
        num_heads=n_heads,
    )
    xn = xn + L.linear(a2["to_out"]["0"], attn_out)
    # feed-forward (GEGLU)
    y = L.layer_norm(blk["norm3"], xn)
    y = L.geglu(blk["ff"]["net"]["0"]["proj"], y)
    xn = xn + L.linear(blk["ff"]["net"]["2"], y)

    xn = _proj(p["proj_out"], xn)
    return residual + xn.reshape(b, h, w, c)


def apply(
    params: dict,
    cfg: UNetConfig,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    spatial_axis: Optional[str] = None,
) -> jax.Array:
    """Denoiser forward. sample: [B,H,W,in_ch]; timesteps: [] or [B];
    encoder_hidden_states: [B,L,cross_dim]. Returns [B,H,W,out_ch].

    spatial_axis: run H-sharded under `shard_map` over that mesh axis —
    convs halo-exchange, GroupNorm psums statistics, self-attention
    all-gathers K/V (see parallel/spatial.py for the jitted wrapper).
    Requires the global H divisible by 8 * axis size so every level's
    local H stays even (checked by the wrapper)."""
    g = cfg.norm_num_groups
    b_ch = list(cfg.block_out_channels)
    bsz = sample.shape[0]

    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (bsz,))
    temb = L.timestep_embedding(timesteps, b_ch[0])
    temb = temb.astype(sample.dtype)
    te = params["time_embedding"]
    temb = L.linear(te["linear_1"], temb)
    temb = jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)
    temb = L.linear(te["linear_2"], temb)

    ctx = encoder_hidden_states
    if ctx.shape[0] == 1 and bsz > 1:
        ctx = jnp.broadcast_to(ctx, (bsz,) + ctx.shape[1:])

    h = L.conv2d(params["conv_in"], sample, spatial_axis=spatial_axis)
    skips = [h]

    for i, bt in enumerate(cfg.down_block_types):
        blk = params["down_blocks"][str(i)]
        has_attn = bt == "CrossAttnDownBlock2D"
        for j in range(cfg.layers_per_block):
            h = _resnet(blk["resnets"][str(j)], h, temb, g, cfg.norm_eps,
                        spatial_axis)
            if has_attn:
                h = _transformer(
                    blk["attentions"][str(j)], h, ctx,
                    cfg.attention_head_dim[i], g, cfg.use_linear_projection,
                    spatial_axis,
                )
            skips.append(h)
        if i < len(b_ch) - 1:
            h = L.conv2d(blk["downsamplers"]["0"]["conv"], h, stride=2,
                         padding=1, spatial_axis=spatial_axis)
            skips.append(h)

    mid = params["mid_block"]
    h = _resnet(mid["resnets"]["0"], h, temb, g, cfg.norm_eps, spatial_axis)
    h = _transformer(
        mid["attentions"]["0"], h, ctx, cfg.attention_head_dim[-1], g,
        cfg.use_linear_projection, spatial_axis,
    )
    h = _resnet(mid["resnets"]["1"], h, temb, g, cfg.norm_eps, spatial_axis)

    rev_heads = list(reversed(cfg.attention_head_dim))
    for i, bt in enumerate(cfg.up_block_types):
        blk = params["up_blocks"][str(i)]
        has_attn = bt == "CrossAttnUpBlock2D"
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(blk["resnets"][str(j)], h, temb, g, cfg.norm_eps,
                        spatial_axis)
            if has_attn:
                h = _transformer(
                    blk["attentions"][str(j)], h, ctx, rev_heads[i], g,
                    cfg.use_linear_projection, spatial_axis,
                )
        if i < len(b_ch) - 1:
            h = L.upsample_nearest_2x(h)
            # odd input dims: stride-2 downsampling ceils (11 -> 6), so 2x
            # overshoots (12); crop to the next skip's spatial dims — equal
            # to diffusers' F.interpolate(..., size=upsample_size, 'nearest')
            th, tw = skips[-1].shape[1], skips[-1].shape[2]
            if h.shape[1] != th or h.shape[2] != tw:
                # W-only crop is shard-local; an H crop would need global
                # coordination, but the wrapper's divisibility check keeps
                # every sharded level even so it never triggers there.
                assert spatial_axis is None or h.shape[1] == th
                h = h[:, :th, :tw, :]
            h = L.conv2d(blk["upsamplers"]["0"]["conv"], h,
                         spatial_axis=spatial_axis)

    h = L.group_norm(params["conv_norm_out"], h, g, eps=cfg.norm_eps,
                     act="silu", spatial_axis=spatial_axis)
    return L.conv2d(params["conv_out"], h, spatial_axis=spatial_axis)
