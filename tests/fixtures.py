"""Shared test fixtures: tiny diffusers-layout pipeline checkpoints written
to disk with torch-layout tensors, exercising the real from_pretrained path."""

import json
import os

import jax
import jax.numpy as jnp

from marigold_tpu.core.scheduler import DiffusionSchedule
from marigold_tpu.models import clip_text as clip_lib
from marigold_tpu.models import unet as unet_lib
from marigold_tpu.models import vae as vae_lib
from marigold_tpu.models import weights as W

TINY_VAE = vae_lib.VAEConfig(
    block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
    norm_num_groups=4,
)

TINY_CLIP = clip_lib.CLIPTextConfig(
    vocab_size=49408, hidden_size=12, intermediate_size=24,
    num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77,
)


def tiny_unet_config(in_ch=8, out_ch=4):
    return unet_lib.UNetConfig(
        sample_size=8,
        in_channels=in_ch,
        out_channels=out_ch,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=2,
        attention_head_dim=(2, 4),
        cross_attention_dim=12,
        norm_num_groups=4,
    )


def make_tiny_checkpoint(ckpt_dir: str, mode: str = "depth", seed: int = 0,
                         n_targets: int = 2,
                         iid_variant: str = "appearance") -> str:
    """Create a complete tiny pipeline checkpoint dir. Returns ckpt_dir.

    iid_variant: 'appearance' (albedo+material, InteriorVerse protocol) or
    'lighting' (albedo+shading+residual, Hypersim protocol)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    if mode == "iid" and iid_variant == "lighting":
        n_targets = 3
    if mode == "iid":
        latent = TINY_VAE.latent_channels
        unet_cfg = tiny_unet_config(
            in_ch=latent * (n_targets + 1), out_ch=latent * n_targets
        )
    elif mode == "sd2":
        # vanilla text-to-image base (pre-surgery): 4-channel in/out
        unet_cfg = tiny_unet_config(in_ch=4, out_ch=4)
    else:
        unet_cfg = tiny_unet_config()

    unet_params = unet_lib.init_params(k1, unet_cfg)
    vae_params = vae_lib.init_params(k2, TINY_VAE)
    text_params = clip_lib.init_params(k3, TINY_CLIP)

    W.save_unet(unet_cfg, unet_params, os.path.join(ckpt_dir, "unet"))
    W.save_vae(TINY_VAE, vae_params, os.path.join(ckpt_dir, "vae"))
    W.save_text_encoder(TINY_CLIP, text_params, os.path.join(ckpt_dir, "text_encoder"))
    DiffusionSchedule.create().save_pretrained(os.path.join(ckpt_dir, "scheduler"))

    index = {
        "_class_name": {
            "depth": "MarigoldDepthPipeline",
            "normals": "MarigoldNormalsPipeline",
            "iid": "MarigoldIIDPipeline",
            "sd2": "StableDiffusionPipeline",
        }[mode],
        "default_denoising_steps": 1 if mode == "depth" else 4,
        "default_processing_resolution": 32,
        "unet": ["diffusers", "UNet2DConditionModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "scheduler": ["diffusers", "DDIMScheduler"],
        "text_encoder": ["transformers", "CLIPTextModel"],
        "tokenizer": ["transformers", "CLIPTokenizer"],
    }
    if mode == "depth":
        index.update({"scale_invariant": True, "shift_invariant": True})
    if mode == "iid" and iid_variant == "lighting":
        # marigold-iid-lighting layout (reference model_index.json)
        index["target_properties"] = {
            "target_names": ["albedo", "shading", "residual"],
            "albedo": {"prediction_space": "srgb", "up_to_scale": False},
            "shading": {"prediction_space": "linear", "up_to_scale": True},
            "residual": {"prediction_space": "linear", "up_to_scale": True},
        }
    elif mode == "iid":
        index["target_properties"] = {
            "target_names": ["albedo", "material"][:n_targets],
            "albedo": {"prediction_space": "srgb", "up_to_scale": False},
            "material": {
                "prediction_space": "stack",
                "sub_target_names": ["roughness", "metallicity", None],
            },
        }
    with open(os.path.join(ckpt_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)
    return ckpt_dir
