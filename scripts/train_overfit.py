"""Overfit-one-batch training validation at full SD2 scale on the TPU,
for all three modalities.

The timed train step (289 ms/bs2, docs/PERFORMANCE.md) proves the step
runs and is fast; this run proves the gradient path *converges*: the
flash-attention custom VJP, full rematerialization, masked latent loss,
mixed-precision cast, and Adafactor update together drive the loss down
by orders of magnitude on one fixed batch — the semantics the reference
validates over 30k real iterations (reference
src/trainer/marigold_depth_trainer.py:208-401 depth,
marigold_normals_trainer.py:63+ normals,
marigold_iid_trainer.py:64+,203-248 IID incl. the conv surgery).

Setup: full-size SD2 config at 480x640 bs2, random 4-channel init with
the real conv surgery applied (conv_in 4->8 for depth/normals;
conv_in 4->4(n+1) + conv_out 4->4n for IID — the wider UNet IO runs
end-to-end under remat+donation), full VAE encoder, Adafactor + full
remat + donated state (the shipped single-chip configuration), one fixed
synthetic batch with a ~10%-invalid mask, FIXED sampling key — the
(timestep, noise) pair is constant so the target is deterministic and
true overfitting is possible.

Writes docs/overfit_curve[_{modality}].json (per-step losses) and the
matching .png, and asserts the end/start loss ratio.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/train_overfit.py --modality iid --steps 400
"""

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_batch(modality, B, H, W, n_targets, rng, jnp):
    """One fixed synthetic batch in the exact layout the trainers feed
    (trainer.py _assemble_batch): rgb_norm [-1,1], gt_norm [-1,1]
    (3ch depth-stacked / 3ch unit normals / 3n-ch target concat),
    ~10%-invalid mask."""
    g = np.sin(np.linspace(0, 3, H)[:, None] + np.linspace(0, 2, W)[None, :])
    h = np.cos(np.linspace(0, 2, H)[:, None] - np.linspace(0, 4, W)[None, :])
    if modality == "depth":
        gt = np.repeat(g[..., None].astype(np.float32), 3, axis=-1)
    elif modality == "normals":
        n = np.stack([g, h, np.abs(g * h) + 0.5], -1).astype(np.float32)
        gt = n / np.linalg.norm(n, axis=-1, keepdims=True)
    else:  # iid: n_targets distinct smooth 3-channel fields in [-1,1]
        gt = np.concatenate(
            [
                np.stack([g * np.cos(i), h * np.sin(i + 1), g * h], -1)
                for i in range(n_targets)
            ],
            axis=-1,
        ).astype(np.float32)
        gt = np.clip(gt, -1, 1)
    gt = np.repeat(gt[None], B, axis=0)
    return {
        "rgb_norm": jnp.asarray(
            rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
        "gt_norm": jnp.asarray(gt, jnp.float32),
        "valid_mask": jnp.asarray(rng.uniform(size=(B, H, W, 1)) > 0.1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", choices=["depth", "normals", "iid"],
                    default="depth")
    ap.add_argument("--iid_targets", type=int, default=3,
                    help="IID target count (3 = lighting: albedo/shading/"
                    "residual; 2 = appearance)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="constant LR; higher than the 3e-5 fine-tune LR "
                    "because this is 400 steps from random init")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--split_accum", type=int, default=1,
                    help=">1: two-program accumulation (make_accum_pair, remat none) — the r5 single-chip recipe")
    ap.add_argument("--target_ratio", type=float, default=1e-2,
                    help="require final loss <= ratio * initial loss")
    ap.add_argument("--out", default=os.path.join(REPO, "docs"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import surgery
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.train.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    # random 4-channel SD2 init, then the real trainer surgery — the
    # same start state the fine-tune begins from (minus pretraining)
    unet_cfg = unet_lib.UNetConfig(in_channels=4)
    vae_cfg = vae_lib.VAEConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = unet_lib.init_params(k1, unet_cfg, dtype=jnp.bfloat16)
    if args.modality in ("depth", "normals"):
        unet_cfg, unet_params = surgery.replace_conv_in(
            unet_cfg, unet_params, 8
        )
    else:
        unet_cfg, unet_params = surgery.replace_conv_in_out_multimodal(
            unet_cfg, unet_params, args.iid_targets, vae_cfg.latent_channels
        )
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), unet_params
    )
    vae_params = vae_lib.init_params(k2, vae_cfg, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(unet_params))
    print(f"{args.modality}: UNet {unet_cfg.in_channels}->"
          f"{unet_cfg.out_channels}ch, {n_params/1e6:.0f}M params, "
          f"device: {jax.devices()[0]}")

    apply_fn = None
    if args.split_accum > 1:
        # the r5 shipped single-chip recipe: two-program accumulation
        # (micro grad+accumulate / apply update), remat none —
        # proves the 48.9 ms/sample geometry CONVERGES at full scale,
        # not just that it benches (train_step.make_accum_pair)
        import optax
        from marigold_tpu.train.train_step import make_accum_pair

        inner = optax.adafactor(
            args.lr, multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
        )
        micro, apply_raw, optimizer = make_accum_pair(
            unet_cfg, vae_cfg, DiffusionSchedule.create(), inner,
            args.split_accum, loss_name="mse_loss",
            multi_res_noise_cfg=None, remat="none",
        )
        step = jax.jit(micro, donate_argnums=(0,))
        apply_fn = jax.jit(apply_raw, donate_argnums=(0,))
    else:
        optimizer = make_optimizer(args.lr, None, accumulation_steps=1,
                                   name="adafactor")
        step = jax.jit(
            make_train_step(unet_cfg, vae_cfg, DiffusionSchedule.create(),
                            optimizer, loss_name="mse_loss",
                            multi_res_noise_cfg=None, remat=True),
            donate_argnums=(0,),
        )
    state = create_train_state(unet_params, optimizer)

    rng = np.random.default_rng(0)
    batch = synth_batch(args.modality, args.batch, args.height, args.width,
                        args.iid_targets, rng, jnp)
    text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
    fixed_key = jax.random.PRNGKey(1)  # constant (timestep, noise) pair

    losses, gnorms = [], []
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, vae_params, text, batch, fixed_key)
        if apply_fn is not None and (i + 1) % args.split_accum == 0:
            state = apply_fn(state)
        if (i + 1) % 20 == 0 or i < 3:
            loss = float(m["loss"])
            print(f"step {i+1:4d}  loss {loss:.6f}  "
                  f"gnorm {float(m['grad_norm']):.3f}  "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        losses.append(float(m["loss"]))
        gnorms.append(float(m["grad_norm"]))
    wall = time.perf_counter() - t0

    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), "non-finite loss"
    ratio = float(np.mean(losses[-10:]) / np.mean(losses[:3]))
    print(f"\ninitial {np.mean(losses[:3]):.4f} -> final "
          f"{np.mean(losses[-10:]):.6f}  (ratio {ratio:.2e}), "
          f"{wall/args.steps*1e3:.0f} ms/step avg incl. host loop")

    stem = ("overfit_curve" if args.modality == "depth"
            else f"overfit_curve_{args.modality}")
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{stem}.json"), "w") as f:
        json.dump({
            "config": vars(args), "n_params": n_params,
            "unet_io": [unet_cfg.in_channels, unet_cfg.out_channels],
            "platform": jax.devices()[0].platform,
            "loss": losses.tolist(), "grad_norm": gnorms,
            "ratio_final_over_initial": ratio, "wall_s": wall,
        }, f)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.semilogy(np.arange(1, len(losses) + 1), losses, lw=1.2)
        ax.set_xlabel("step"); ax.set_ylabel("masked latent MSE")
        ax.set_title(f"SD2-scale {args.modality} overfit-one-batch on "
                     f"{jax.devices()[0].platform} "
                     f"({n_params/1e6:.0f}M params, Adafactor+remat)")
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{stem}.png"), dpi=120)
    except Exception as e:  # plot is best-effort
        print(f"plot skipped: {e}")

    assert ratio <= args.target_ratio, (
        f"loss only dropped {1/max(ratio,1e-12):.1f}x "
        f"(need >={1/args.target_ratio:.0f}x)")
    print("OVERFIT OK")


if __name__ == "__main__":
    main()
