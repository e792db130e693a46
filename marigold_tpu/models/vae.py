"""AutoencoderKL (Stable Diffusion 2 VAE) — functional JAX, NHWC.

Role parity: the reference consumes diffusers' AutoencoderKL for
RGB->latent (/8 spatial, 4ch) and latent->RGB
(marigold_depth_pipeline.py:479-516). Note the pipeline uses the posterior
*mean*, never samples (line 493-495), and scales by 0.18215.

Architecture (SD2 VAE config): block_out_channels (128,256,512,512),
layers_per_block=2, latent_channels=4, GN(32) everywhere, mid-block single
-head attention. Encoder downsampling uses diffusers' asymmetric
(0,1)x(0,1) padding + stride-2 VALID conv; decoder upsampling is nearest-2x
+ 3x3 conv. Param-tree keys mirror diffusers module paths so checkpoints
map mechanically (see models/weights.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from marigold_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "VAEConfig":
        return cls(
            in_channels=d.get("in_channels", 3),
            out_channels=d.get("out_channels", 3),
            block_out_channels=tuple(d.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=d.get("layers_per_block", 2),
            latent_channels=d.get("latent_channels", 4),
            norm_num_groups=d.get("norm_num_groups", 32),
            scaling_factor=d.get("scaling_factor", 0.18215),
        )

    def to_dict(self) -> dict:
        return {
            "_class_name": "AutoencoderKL",
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "block_out_channels": list(self.block_out_channels),
            "down_block_types": ["DownEncoderBlock2D"] * len(self.block_out_channels),
            "up_block_types": ["UpDecoderBlock2D"] * len(self.block_out_channels),
            "layers_per_block": self.layers_per_block,
            "latent_channels": self.latent_channels,
            "norm_num_groups": self.norm_num_groups,
            "scaling_factor": self.scaling_factor,
            "act_fn": "silu",
        }

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


# ------------------------------------------------------------------ #
# init


def _init_resnet(key, c_in, c_out, groups, dtype):
    k = jax.random.split(key, 3)
    p = {
        "norm1": L.init_norm(c_in, dtype),
        "conv1": L.init_conv(k[0], c_in, c_out, 3, dtype),
        "norm2": L.init_norm(c_out, dtype),
        "conv2": L.init_conv(k[1], c_out, c_out, 3, dtype),
    }
    if c_in != c_out:
        p["conv_shortcut"] = L.init_conv(k[2], c_in, c_out, 1, dtype)
    return p


def _init_attn(key, c, groups, dtype):
    k = jax.random.split(key, 4)
    return {
        "group_norm": L.init_norm(c, dtype),
        "to_q": L.init_linear(k[0], c, c, dtype),
        "to_k": L.init_linear(k[1], c, c, dtype),
        "to_v": L.init_linear(k[2], c, c, dtype),
        "to_out": {"0": L.init_linear(k[3], c, c, dtype)},
    }


def _init_mid(key, c, groups, dtype):
    k = jax.random.split(key, 3)
    return {
        "resnets": {
            "0": _init_resnet(k[0], c, c, groups, dtype),
            "1": _init_resnet(k[1], c, c, groups, dtype),
        },
        "attentions": {"0": _init_attn(k[2], c, groups, dtype)},
    }


def init_params(key, cfg: VAEConfig, dtype=jnp.float32) -> dict:
    b = list(cfg.block_out_channels)
    g = cfg.norm_num_groups
    keys = iter(jax.random.split(key, 256))

    enc: dict = {"conv_in": L.init_conv(next(keys), cfg.in_channels, b[0], 3, dtype)}
    down = {}
    c = b[0]
    for i, bc in enumerate(b):
        blk: dict = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _init_resnet(next(keys), c, bc, g, dtype)
            c = bc
        if i < len(b) - 1:
            blk["downsamplers"] = {
                "0": {"conv": L.init_conv(next(keys), c, c, 3, dtype)}
            }
        down[str(i)] = blk
    enc["down_blocks"] = down
    enc["mid_block"] = _init_mid(next(keys), b[-1], g, dtype)
    enc["conv_norm_out"] = L.init_norm(b[-1], dtype)
    enc["conv_out"] = L.init_conv(next(keys), b[-1], 2 * cfg.latent_channels, 3, dtype)

    dec: dict = {"conv_in": L.init_conv(next(keys), cfg.latent_channels, b[-1], 3, dtype)}
    dec["mid_block"] = _init_mid(next(keys), b[-1], g, dtype)
    up = {}
    rev = list(reversed(b))
    c = rev[0]
    for i, bc in enumerate(rev):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = _init_resnet(next(keys), c, bc, g, dtype)
            c = bc
        if i < len(b) - 1:
            blk["upsamplers"] = {"0": {"conv": L.init_conv(next(keys), c, c, 3, dtype)}}
        up[str(i)] = blk
    dec["up_blocks"] = up
    dec["conv_norm_out"] = L.init_norm(rev[-1], dtype)
    dec["conv_out"] = L.init_conv(next(keys), rev[-1], cfg.out_channels, 3, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.init_conv(
            next(keys), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, dtype
        ),
        "post_quant_conv": L.init_conv(
            next(keys), cfg.latent_channels, cfg.latent_channels, 1, dtype
        ),
    }


# ------------------------------------------------------------------ #
# forward


def _resnet(p, x, groups, spatial_axis=None):
    h = L.group_norm(p["norm1"], x, groups, act="silu",
                     spatial_axis=spatial_axis)
    h = L.conv2d(p["conv1"], h, spatial_axis=spatial_axis)
    h = L.group_norm(p["norm2"], h, groups, act="silu",
                     spatial_axis=spatial_axis)
    h = L.conv2d(p["conv2"], h, spatial_axis=spatial_axis)
    if "conv_shortcut" in p:
        x = L.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn(p, x, groups, spatial_axis=None):
    b, h, w, c = x.shape
    res = x
    xn = L.group_norm(p["group_norm"], x, groups, spatial_axis=spatial_axis)
    xn = xn.reshape(b, h * w, c)
    q = L.linear(p["to_q"], xn)
    k = L.linear(p["to_k"], xn)
    v = L.linear(p["to_v"], xn)
    # dispatch: on TPU at >=1024 tokens this takes the K-blocked flash
    # kernel — the single 512-wide head at 768px (9216 tokens) otherwise
    # materializes a [B,9216,9216] fp32 logits transient (6.8 GB at the
    # serving decode batch), which was the HBM spike that made larger
    # serving configurations OOM
    from marigold_tpu.ops.attention import scaled_dot_product_attention

    o = scaled_dot_product_attention(q, k, v, num_heads=1,
                                     spatial_axis=spatial_axis)
    o = L.linear(p["to_out"]["0"], o).reshape(b, h, w, c)
    return res + o


def _mid(p, x, groups, spatial_axis=None):
    x = _resnet(p["resnets"]["0"], x, groups, spatial_axis)
    x = _attn(p["attentions"]["0"], x, groups, spatial_axis)
    x = _resnet(p["resnets"]["1"], x, groups, spatial_axis)
    return x


def encode(params: dict, cfg: VAEConfig, x: jax.Array, spatial_axis=None):
    """x: [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,H/8,W/8,latent].
    Reference path: vae.encoder + quant_conv, posterior mean
    (marigold_depth_pipeline.py:479-496).

    spatial_axis: H-sharded under shard_map (parallel/spatial.py) — the
    asymmetric-pad stride-2 downsample pulls its one extra bottom row from
    the next shard (ppermute zeros at the last shard = the (0,1) pad)."""
    g = cfg.norm_num_groups
    p = params["encoder"]
    h = L.conv2d(p["conv_in"], x, spatial_axis=spatial_axis)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _resnet(blk["resnets"][str(j)], h, g, spatial_axis)
        if i < n_blocks - 1:
            # diffusers VAE Downsample2D: asymmetric (0,1) pad + VALID stride-2
            if spatial_axis is None:
                h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
            else:
                _, from_next = L._halo_rows(h, spatial_axis)
                h = jnp.concatenate([h, from_next], axis=1)
                h = jnp.pad(h, [(0, 0), (0, 0), (0, 1), (0, 0)])
            h = L.conv2d(blk["downsamplers"]["0"]["conv"], h, stride=2, padding=0)
    h = _mid(p["mid_block"], h, g, spatial_axis)
    h = L.group_norm(p["conv_norm_out"], h, g, act="silu",
                     spatial_axis=spatial_axis)
    h = L.conv2d(p["conv_out"], h, spatial_axis=spatial_axis)
    moments = L.conv2d(params["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, logvar


def decode(params: dict, cfg: VAEConfig, z: jax.Array,
           spatial_axis=None) -> jax.Array:
    """z: [B,h,w,latent] (already divided by scaling_factor) -> [B,H,W,3].
    Reference path: post_quant_conv + vae.decoder
    (marigold_depth_pipeline.py:498-516). spatial_axis: H-sharded (the
    nearest-2x upsample is row-local, so only convs/GN/attention
    communicate)."""
    g = cfg.norm_num_groups
    z = L.conv2d(params["post_quant_conv"], z, padding=0)
    p = params["decoder"]
    h = L.conv2d(p["conv_in"], z, spatial_axis=spatial_axis)
    h = _mid(p["mid_block"], h, g, spatial_axis)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(blk["resnets"][str(j)], h, g, spatial_axis)
        if i < n_blocks - 1:
            h = L.upsample_nearest_2x(h)
            h = L.conv2d(blk["upsamplers"]["0"]["conv"], h,
                         spatial_axis=spatial_axis)
    h = L.group_norm(p["conv_norm_out"], h, g, act="silu",
                     spatial_axis=spatial_axis)
    return L.conv2d(p["conv_out"], h, spatial_axis=spatial_axis)


def encode_mean_scaled(params: dict, cfg: VAEConfig, x: jax.Array,
                       spatial_axis=None) -> jax.Array:
    """RGB -> scaled latent (posterior mean * scaling_factor), the exact
    transform the pipelines use for both RGB and stacked-GT encoding."""
    mean, _ = encode(params, cfg, x, spatial_axis=spatial_axis)
    return mean * cfg.scaling_factor


def decode_scaled(params: dict, cfg: VAEConfig, z: jax.Array,
                  spatial_axis=None) -> jax.Array:
    return decode(params, cfg, z / cfg.scaling_factor,
                  spatial_axis=spatial_axis)
