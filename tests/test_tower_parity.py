"""Assembled-tower parity: the full UNet and VAE forwards vs a functional
torch oracle implementing diffusers' documented module semantics, reading
the SAME safetensors export by diffusers parameter names.

What this catches that per-layer tests (test_models.py) cannot: skip-stack
push/pop ordering, up-block channel concatenation order, head-count
mapping, GEGLU split order, upsample-to-skip-size cropping, the
asymmetric VAE downsample pad, quant/post-quant conv placement, and every
name/layout in models/weights.py — i.e. the wiring of
UNet2DConditionModel / AutoencoderKL as consumed by the reference
(marigold_depth_pipeline.py:35-47, 461-516).

The oracle is written against diffusers' architecture (ResnetBlock2D,
Transformer2DModel with use_linear_projection, Downsample2D/Upsample2D,
Encoder/Decoder of AutoencoderKL), NOT against our JAX code.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from marigold_tpu.models import unet as unet_lib
from marigold_tpu.models import vae as vae_lib
from marigold_tpu.models import weights as W

# ------------------------------------------------------------------ #
# torch-side helpers reading a flat {diffusers_name: np.ndarray} dict
# (torch layouts: conv OIHW, linear [out, in])


def T(flat, name):
    return torch.from_numpy(np.array(flat[name]))


def t_conv(flat, p, x, stride=1, pad=1):
    b = T(flat, f"{p}.bias") if f"{p}.bias" in flat else None
    return F.conv2d(x, T(flat, f"{p}.weight"), b, stride=stride, padding=pad)


def t_lin(flat, p, x):
    b = T(flat, f"{p}.bias") if f"{p}.bias" in flat else None
    return F.linear(x, T(flat, f"{p}.weight"), b)


def t_gn(flat, p, x, groups, eps):
    return F.group_norm(x, groups, T(flat, f"{p}.weight"), T(flat, f"{p}.bias"), eps)


def t_ln(flat, p, x, eps=1e-5):
    return F.layer_norm(x, x.shape[-1:], T(flat, f"{p}.weight"), T(flat, f"{p}.bias"), eps)


def t_resnet(flat, p, x, temb, groups, eps):
    """diffusers ResnetBlock2D (default config: silu, time_emb_proj after
    nonlinearity, conv_shortcut 1x1 when channels change)."""
    h = t_conv(flat, f"{p}.conv1", F.silu(t_gn(flat, f"{p}.norm1", x, groups, eps)))
    if temb is not None:
        h = h + t_lin(flat, f"{p}.time_emb_proj", F.silu(temb))[:, :, None, None]
    h = t_conv(flat, f"{p}.conv2", F.silu(t_gn(flat, f"{p}.norm2", h, groups, eps)))
    if f"{p}.conv_shortcut.weight" in flat:
        x = t_conv(flat, f"{p}.conv_shortcut", x, pad=0)
    return x + h


def t_mha(flat, p, q_in, kv_in, heads):
    """diffusers Attention: per-head scaled dot product, to_out[0] proj."""
    q = t_lin(flat, f"{p}.to_q", q_in)
    k = t_lin(flat, f"{p}.to_k", kv_in)
    v = t_lin(flat, f"{p}.to_v", kv_in)
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // heads
    q = q.reshape(b, nq, heads, hd).permute(0, 2, 1, 3)
    k = k.reshape(b, nk, heads, hd).permute(0, 2, 1, 3)
    v = v.reshape(b, nk, heads, hd).permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(q, k, v)  # scale 1/sqrt(hd)
    o = o.permute(0, 2, 1, 3).reshape(b, nq, c)
    return t_lin(flat, f"{p}.to_out.0", o)


def t_transformer2d(flat, p, x, ctx, heads, groups):
    """diffusers Transformer2DModel, use_linear_projection=True, one
    BasicTransformerBlock, GEGLU ff. Spatial GN eps hardcoded 1e-6."""
    b, c, h, w = x.shape
    residual = x
    xn = t_gn(flat, f"{p}.norm", x, groups, 1e-6)
    xn = xn.permute(0, 2, 3, 1).reshape(b, h * w, c)
    xn = t_lin(flat, f"{p}.proj_in", xn)
    blk = f"{p}.transformer_blocks.0"
    xn = xn + t_mha(flat, f"{blk}.attn1", t_ln(flat, f"{blk}.norm1", xn), t_ln(flat, f"{blk}.norm1", xn), heads)
    xn = xn + t_mha(flat, f"{blk}.attn2", t_ln(flat, f"{blk}.norm2", xn), ctx, heads)
    y = t_ln(flat, f"{blk}.norm3", xn)
    proj = t_lin(flat, f"{blk}.ff.net.0.proj", y)
    val, gate = proj.chunk(2, dim=-1)
    xn = xn + t_lin(flat, f"{blk}.ff.net.2", val * F.gelu(gate))
    xn = t_lin(flat, f"{p}.proj_out", xn)
    return residual + xn.reshape(b, h, w, c).permute(0, 3, 1, 2)


def t_timestep_embedding(t, dim):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_unet(flat, cfg, x, t, ctx):
    """Functional UNet2DConditionModel forward (diffusers semantics)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    b_ch = list(cfg.block_out_channels)
    bsz = x.shape[0]
    temb = t_timestep_embedding(t.expand(bsz), b_ch[0])
    temb = t_lin(flat, "time_embedding.linear_2",
                 F.silu(t_lin(flat, "time_embedding.linear_1", temb)))
    if ctx.shape[0] == 1 and bsz > 1:
        ctx = ctx.expand(bsz, -1, -1)

    h = t_conv(flat, "conv_in", x)
    skips = [h]
    for i, bt in enumerate(cfg.down_block_types):
        pre = f"down_blocks.{i}"
        has_attn = bt == "CrossAttnDownBlock2D"
        for j in range(cfg.layers_per_block):
            h = t_resnet(flat, f"{pre}.resnets.{j}", h, temb, g, eps)
            if has_attn:
                h = t_transformer2d(flat, f"{pre}.attentions.{j}", h, ctx,
                                    cfg.attention_head_dim[i], g)
            skips.append(h)
        if i < len(b_ch) - 1:
            h = t_conv(flat, f"{pre}.downsamplers.0.conv", h, stride=2, pad=1)
            skips.append(h)

    h = t_resnet(flat, "mid_block.resnets.0", h, temb, g, eps)
    h = t_transformer2d(flat, "mid_block.attentions.0", h, ctx,
                        cfg.attention_head_dim[-1], g)
    h = t_resnet(flat, "mid_block.resnets.1", h, temb, g, eps)

    rev_heads = list(reversed(cfg.attention_head_dim))
    for i, bt in enumerate(cfg.up_block_types):
        pre = f"up_blocks.{i}"
        has_attn = bt == "CrossAttnUpBlock2D"
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = torch.cat([h, skip], dim=1)
            h = t_resnet(flat, f"{pre}.resnets.{j}", h, temb, g, eps)
            if has_attn:
                h = t_transformer2d(flat, f"{pre}.attentions.{j}", h, ctx,
                                    rev_heads[i], g)
        if i < len(b_ch) - 1:
            # diffusers Upsample2D: F.interpolate nearest to the next skip's
            # spatial size (handles odd dims), then 3x3 conv
            size = skips[-1].shape[2:]
            h = F.interpolate(h, size=size, mode="nearest")
            h = t_conv(flat, f"{pre}.upsamplers.0.conv", h)

    h = F.silu(t_gn(flat, "conv_norm_out", h, g, eps))
    return t_conv(flat, "conv_out", h)


def torch_vae_encode(flat, cfg, x):
    g, eps = cfg.norm_num_groups, 1e-6
    n = len(cfg.block_out_channels)
    h = t_conv(flat, "encoder.conv_in", x)
    for i in range(n):
        pre = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            h = t_resnet(flat, f"{pre}.resnets.{j}", h, None, g, eps)
        if i < n - 1:
            h = F.pad(h, (0, 1, 0, 1))  # diffusers Downsample2D asymmetric
            h = t_conv(flat, f"{pre}.downsamplers.0.conv", h, stride=2, pad=0)
    h = t_vae_mid(flat, "encoder.mid_block", h, g, eps)
    h = F.silu(t_gn(flat, "encoder.conv_norm_out", h, g, eps))
    h = t_conv(flat, "encoder.conv_out", h)
    moments = t_conv(flat, "quant_conv", h, pad=0)
    return moments.chunk(2, dim=1)


def t_vae_mid(flat, p, h, g, eps):
    h = t_resnet(flat, f"{p}.resnets.0", h, None, g, eps)
    b, c, hh, ww = h.shape
    res = h
    xn = t_gn(flat, f"{p}.attentions.0.group_norm", h, g, eps)
    xn = xn.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    o = t_mha(flat, f"{p}.attentions.0", xn, xn, heads=1)
    h = res + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    return t_resnet(flat, f"{p}.resnets.1", h, None, g, eps)


def torch_vae_decode(flat, cfg, z):
    g, eps = cfg.norm_num_groups, 1e-6
    n = len(cfg.block_out_channels)
    z = t_conv(flat, "post_quant_conv", z, pad=0)
    h = t_conv(flat, "decoder.conv_in", z)
    h = t_vae_mid(flat, "decoder.mid_block", h, g, eps)
    for i in range(n):
        pre = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            h = t_resnet(flat, f"{pre}.resnets.{j}", h, None, g, eps)
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(flat, f"{pre}.upsamplers.0.conv", h)
    h = F.silu(t_gn(flat, "decoder.conv_norm_out", h, g, eps))
    return t_conv(flat, "decoder.conv_out", h)


# ------------------------------------------------------------------ #
# tests


TOWER_UNET = unet_lib.UNetConfig(
    sample_size=16,
    in_channels=8,
    out_channels=4,
    block_out_channels=(16, 32, 32),
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=2,
    attention_head_dim=(2, 4, 4),
    cross_attention_dim=12,
    norm_num_groups=4,
)

TOWER_VAE = vae_lib.VAEConfig(
    block_out_channels=(8, 16, 16), layers_per_block=2, latent_channels=4,
    norm_num_groups=4,
)


@pytest.fixture(scope="module")
def unet_export(tmp_path_factory):
    params = unet_lib.init_params(jax.random.PRNGKey(3), TOWER_UNET)
    flat = W.tree_to_torch_flat(params)
    return params, {k: np.asarray(v, np.float32) for k, v in flat.items()}


@pytest.fixture(scope="module")
def vae_export():
    params = vae_lib.init_params(jax.random.PRNGKey(4), TOWER_VAE)
    flat = W.tree_to_torch_flat(params)
    return params, {k: np.asarray(v, np.float32) for k, v in flat.items()}


@pytest.mark.parametrize("hw", [(16, 16), (11, 18)])  # odd dims: crop path
def test_unet_tower_parity(unet_export, hw, rng):
    params, flat = unet_export
    h, w = hw
    x = rng.standard_normal((2, h, w, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 2, 12)).astype(np.float32)
    t = 541

    ours = np.asarray(unet_lib.apply(
        params, TOWER_UNET, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    ))
    with torch.no_grad():
        theirs = torch_unet(
            flat, TOWER_UNET, torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.tensor([t]), torch.from_numpy(ctx),
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("hw", [(32, 32), (36, 28)])
def test_vae_encode_tower_parity(vae_export, hw, rng):
    params, flat = vae_export
    h, w = hw
    x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    mean, logvar = vae_lib.encode(params, TOWER_VAE, jnp.asarray(x))
    with torch.no_grad():
        t_mean, t_logvar = torch_vae_encode(
            flat, TOWER_VAE, torch.from_numpy(x).permute(0, 3, 1, 2)
        )
    np.testing.assert_allclose(
        np.asarray(mean), t_mean.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logvar), t_logvar.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3
    )


def test_vae_decode_tower_parity(vae_export, rng):
    params, flat = vae_export
    z = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(vae_lib.decode(params, TOWER_VAE, jnp.asarray(z)))
    with torch.no_grad():
        theirs = torch_vae_decode(
            flat, TOWER_VAE, torch.from_numpy(z).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)
