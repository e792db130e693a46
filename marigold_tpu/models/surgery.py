"""UNet channel surgery for fine-tuning from Stable Diffusion 2.

Behavioral reference:
  * depth/normals: `_replace_unet_conv_in` duplicates the 4-channel conv_in
    kernel to 8 channels and halves the weights so initial activations are
    unchanged for duplicated input (marigold_depth_trainer.py:187-206).
  * IID: `_replace_unet_conv_in_out_multimodal` widens conv_in to
    4*(n_targets+1) (repeat n+1x, scale 1/(n+1)) and conv_out to
    4*n_targets (repeat, unscaled) (marigold_iid_trainer.py:203-248).

Our kernels are HWIO, so input-channel surgery acts on axis 2 and
output-channel surgery on axis 3.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from marigold_tpu.models.unet import UNetConfig


def replace_conv_in(cfg: UNetConfig, params: dict, new_in_channels: int):
    """Duplicate conv_in input channels and rescale to preserve output
    magnitude. new_in_channels must be a multiple of cfg.in_channels."""
    old = cfg.in_channels
    if new_in_channels % old != 0:
        raise ValueError(f"{new_in_channels} not a multiple of {old}")
    factor = new_in_channels // old
    w = params["conv_in"]["weight"]  # [kh,kw,in,out]
    w_new = jnp.concatenate([w] * factor, axis=2) / factor
    params = dict(params)
    params["conv_in"] = dict(params["conv_in"], weight=w_new)
    new_cfg = dataclasses.replace(cfg, in_channels=new_in_channels)
    return new_cfg, params


def replace_conv_in_out_multimodal(cfg: UNetConfig, params: dict, n_targets: int,
                                   latent_channels: int = 4):
    """IID surgery: conv_in 4 -> 4*(n+1) (scaled), conv_out 4 -> 4n
    (repeated along output axis, unscaled; bias repeated too)."""
    new_cfg, params = replace_conv_in(cfg, params, latent_channels * (n_targets + 1))

    w = params["conv_out"]["weight"]  # [kh,kw,in,out]
    if (latent_channels * n_targets) % cfg.out_channels != 0:
        # e.g. surgery re-applied to an already-widened UNet: integer
        # division would silently desync new_cfg.out_channels from the
        # actual weight shape
        raise ValueError(
            f"target channels {latent_channels * n_targets} not a "
            f"multiple of conv_out channels {cfg.out_channels}"
        )
    factor = (latent_channels * n_targets) // cfg.out_channels
    w_new = jnp.concatenate([w] * factor, axis=3)
    conv_out = dict(params["conv_out"], weight=w_new)
    if "bias" in conv_out:
        conv_out["bias"] = jnp.concatenate([params["conv_out"]["bias"]] * factor)
    params = dict(params)
    params["conv_out"] = conv_out
    new_cfg = dataclasses.replace(
        new_cfg, out_channels=latent_channels * n_targets
    )
    return new_cfg, params
