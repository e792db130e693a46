"""Full-pipeline glue parity: MarigoldDepthPipeline vs a step-by-step
oracle that runs the MODEL math in torch (the diffusers-semantics oracles
from test_tower_parity) and everything else per the reference's documented
pipeline recipe (marigold_depth_pipeline.py:396-516).

Why this exists: tower/scheduler/ensemble parity tests validate the parts,
but with random weights an end-to-end shape test cannot catch glue bugs —
a flipped [rgb_latent, target_latent] concat order (reference line
456-458), a wrong latent scale factor (0.18215), sampling instead of the
posterior mean, or a missing decode channel-mean would all pass every
other test. This test reproduces the pipeline's exact internal noise
stream (same jax PRNG path) and checks the final depth map.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fixtures import make_tiny_checkpoint
from test_tower_parity import torch_unet, torch_vae_encode, torch_vae_decode

from marigold_tpu.models import weights as W
from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

LATENT_SCALE = 0.18215  # reference marigold_depth_pipeline.py:118


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_checkpoint(str(tmp_path_factory.mktemp("pg")), mode="depth")


def test_depth_pipeline_matches_torch_oracle(ckpt, rng):
    pipe = MarigoldDepthPipeline.from_pretrained(ckpt, dtype=jnp.float32)
    core = pipe.core
    steps, seed = 2, 11
    H = W_img = 64  # bucket-aligned: no resize, no bucket padding

    img = rng.integers(0, 255, (H, W_img, 3), dtype=np.uint8)
    out = pipe(
        img, denoising_steps=steps, ensemble_size=1, processing_res=0,
        match_input_res=False, seed=seed, color_map=None,
        show_progress_bar=False,
    )

    # ---------------- oracle ----------------
    unet_flat = {k: np.asarray(v, np.float32)
                 for k, v in W.tree_to_torch_flat(core.unet_params).items()}
    vae_flat = {k: np.asarray(v, np.float32)
                for k, v in W.tree_to_torch_flat(core.vae_params).items()}
    ctx = torch.from_numpy(np.asarray(core.empty_text_embed, np.float32))

    # preprocess: uint8 -> [-1,1] (reference :244-252)
    x = torch.from_numpy(
        (img.astype(np.float32) / 255.0 * 2.0 - 1.0)
    ).permute(2, 0, 1)[None]

    # encode: posterior MEAN (no sampling) * scale (reference :479-496)
    with torch.no_grad():
        mean, _ = torch_vae_encode(vae_flat, core.vae_cfg, x)
    rgb_latent = mean * LATENT_SCALE

    # the pipeline's exact internal noise stream (pipelines/base.py)
    key = jax.random.PRNGKey(seed % (2**31))
    h_lat = H // core.vae_cfg.downscale_factor
    noise = np.asarray(jax.random.normal(key, (1, h_lat, h_lat, 4), jnp.float32))
    target = torch.from_numpy(noise).permute(0, 3, 1, 2)

    schedule = core.schedule
    ts = schedule.inference_timesteps(steps)
    prev_ts = schedule.prev_timesteps(ts)
    for t, pt in zip(ts, prev_ts):
        # channel order is load-bearing: [rgb_latent, target] (ref :456-458)
        unet_in = torch.cat([rgb_latent, target], dim=1)
        with torch.no_grad():
            model_out = torch_unet(
                unet_flat, core.unet_cfg, unet_in,
                torch.tensor([int(t)]), ctx,
            )
        # step through the (golden-tested) schedule on the oracle's tensors
        new = schedule.ddim_step(
            jnp.asarray(model_out.permute(0, 2, 3, 1).numpy()),
            jnp.asarray(int(t)), jnp.asarray(int(pt)),
            jnp.asarray(target.permute(0, 2, 3, 1).numpy()),
        )
        target = torch.from_numpy(np.asarray(new)).permute(0, 3, 1, 2)

    # decode: /scale -> decoder -> MEAN over 3 channels (ref :498-516)
    with torch.no_grad():
        decoded = torch_vae_decode(vae_flat, core.vae_cfg, target / LATENT_SCALE)
    depth = decoded.mean(dim=1, keepdim=True)
    depth = torch.clip(depth, -1.0, 1.0)
    depth = ((depth + 1.0) / 2.0)[0, 0].numpy()
    # E=1: decoded values pass through unmodified (reference
    # marigold_depth_pipeline.py:301-321 — clip only, no min-max stretch)

    np.testing.assert_allclose(out.depth_np, depth, atol=2e-3)
    # strong agreement, not just correlation
    assert np.corrcoef(out.depth_np.ravel(), depth.ravel())[0, 1] > 0.9999


def test_concat_order_is_detected(ckpt, rng):
    """Sanity that the oracle has teeth: flipping the UNet input concat
    order must NOT reproduce the pipeline output."""
    pipe = MarigoldDepthPipeline.from_pretrained(ckpt, dtype=jnp.float32)
    core = pipe.core
    seed = 11
    H = 64
    img = rng.integers(0, 255, (H, H, 3), dtype=np.uint8)
    out = pipe(
        img, denoising_steps=1, ensemble_size=1, processing_res=0,
        match_input_res=False, seed=seed, color_map=None,
        show_progress_bar=False,
    )

    unet_flat = {k: np.asarray(v, np.float32)
                 for k, v in W.tree_to_torch_flat(core.unet_params).items()}
    vae_flat = {k: np.asarray(v, np.float32)
                for k, v in W.tree_to_torch_flat(core.vae_params).items()}
    ctx = torch.from_numpy(np.asarray(core.empty_text_embed, np.float32))
    x = torch.from_numpy(
        (img.astype(np.float32) / 255.0 * 2.0 - 1.0)
    ).permute(2, 0, 1)[None]
    with torch.no_grad():
        mean, _ = torch_vae_encode(vae_flat, core.vae_cfg, x)
    rgb_latent = mean * LATENT_SCALE
    key = jax.random.PRNGKey(seed % (2**31))
    h_lat = H // core.vae_cfg.downscale_factor
    noise = np.asarray(jax.random.normal(key, (1, h_lat, h_lat, 4), jnp.float32))
    target = torch.from_numpy(noise).permute(0, 3, 1, 2)

    schedule = core.schedule
    ts = schedule.inference_timesteps(1)
    prev_ts = schedule.prev_timesteps(ts)
    unet_in = torch.cat([target, rgb_latent], dim=1)  # WRONG order
    with torch.no_grad():
        model_out = torch_unet(
            unet_flat, core.unet_cfg, unet_in, torch.tensor([int(ts[0])]), ctx
        )
    new = schedule.ddim_step(
        jnp.asarray(model_out.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(int(ts[0])), jnp.asarray(int(prev_ts[0])),
        jnp.asarray(target.permute(0, 2, 3, 1).numpy()),
    )
    with torch.no_grad():
        decoded = torch_vae_decode(
            vae_flat, core.vae_cfg,
            torch.from_numpy(np.asarray(new)).permute(0, 3, 1, 2) / LATENT_SCALE,
        )
    depth = torch.clip(decoded.mean(dim=1), -1, 1)[0].numpy()
    depth = (depth + 1.0) / 2.0
    assert not np.allclose(out.depth_np, depth, atol=2e-3)
