"""Overfit-one-batch training validation at full SD2 scale on the TPU.

The timed train step (289 ms/bs2, docs/PERFORMANCE.md) proves the step
runs and is fast; this run proves the gradient path *converges*: the
flash-attention custom VJP, full rematerialization, masked latent loss,
mixed-precision cast, and Adafactor update together drive the loss down
by orders of magnitude on one fixed batch — the semantics the reference
validates over 30k real iterations (reference
src/trainer/marigold_depth_trainer.py:208-401, the train loop +
accumulation + loss path this replaces).

Setup: full-size SD2 depth config (UNetConfig() 866M-param 8-ch UNet,
full VAE encoder, 480x640 bs2), random init, Adafactor + full remat +
donated state (the shipped single-chip configuration), one fixed
synthetic batch with a ~10%-invalid mask, FIXED sampling key — the
(timestep, noise) pair is constant so the target is deterministic and
true overfitting is possible.

Writes docs/overfit_curve.json (per-step losses) and
docs/overfit_curve.png, and asserts the end/start loss ratio.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/train_overfit.py --steps 400
"""

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="constant LR; higher than the 3e-5 fine-tune LR "
                    "because this is 400 steps from random init")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=2)
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
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.train.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    unet_cfg = unet_lib.UNetConfig()
    vae_cfg = vae_lib.VAEConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32),
        unet_lib.init_params(k1, unet_cfg, dtype=jnp.bfloat16),
    )
    vae_params = vae_lib.init_params(k2, vae_cfg, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(unet_params))
    print(f"UNet params: {n_params/1e6:.0f}M, device: {jax.devices()[0]}")

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
    B, H, W = args.batch, args.height, args.width
    # smooth "depth" stacked to 3 channels, as the depth trainer feeds it
    g = np.sin(np.linspace(0, 3, H)[:, None] + np.linspace(0, 2, W)[None, :])
    depth3 = np.repeat((g[None, ..., None]).astype(np.float32), 3, axis=-1)
    batch = {
        "rgb_norm": jnp.asarray(
            rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
        "gt_norm": jnp.asarray(np.repeat(depth3, B, axis=0), jnp.float32),
        "valid_mask": jnp.asarray(rng.uniform(size=(B, H, W, 1)) > 0.1),
    }
    text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
    fixed_key = jax.random.PRNGKey(1)  # constant (timestep, noise) pair

    losses, gnorms = [], []
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, vae_params, text, batch, fixed_key)
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

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "overfit_curve.json"), "w") as f:
        json.dump({
            "config": vars(args), "n_params": n_params,
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
        ax.set_title(f"SD2-scale overfit-one-batch on "
                     f"{jax.devices()[0].platform} "
                     f"({n_params/1e6:.0f}M params, Adafactor+remat)")
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "overfit_curve.png"), dpi=120)
    except Exception as e:  # plot is best-effort
        print(f"plot skipped: {e}")

    assert ratio <= args.target_ratio, (
        f"loss only dropped {1/max(ratio,1e-12):.1f}x "
        f"(need >={1/args.target_ratio:.0f}x)")
    print("OVERFIT OK")


if __name__ == "__main__":
    main()
