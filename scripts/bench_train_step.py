"""Per-sample training-step throughput vs device batch size (real chip).

The shipped single-chip config runs bs2 @480x640 with 16 accumulation
steps (effective batch 32). The NI-geometry lesson from serving (bench
NI=3 beat NI=4 by 5.5%; docs/PERFORMANCE.md) says to re-sweep geometry
after structural changes — this does it for the train step: same jitted
step the trainer uses (train_step.py, Adafactor + full remat + donated
state, bf16 compute / fp32 masters), pipelined steps (no per-step host
sync), batch sizes swept.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/bench_train_step.py [--batches 2,4,8]
"""

import argparse
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument(
        "--accum", type=int, default=1,
        help="optax.MultiSteps accumulation steps (shipped config: 16); "
        "at 1 the eff-batch-32 extrapolation excludes MultiSteps overhead",
    )
    ap.add_argument("--remat", default="full",
                    choices=("none", "full", "save_heavy"))
    ap.add_argument("--accum_dtype", default=None,
                    choices=(None, "bfloat16"),
                    help="bf16 accumulator (train_step."
                         "gradient_accumulation; opt-in numerics)")
    ap.add_argument("--grad_dtype", default=None,
                    choices=(None, "bfloat16"),
                    help="bf16 gradient storage (halves the grad buffer; "
                         "opt-in numerics — see make_train_step)")
    ap.add_argument("--split_accum", action="store_true",
                    help="two-program accumulation (make_accum_pair): "
                         "micro grad+accumulate steps + a separate "
                         "apply program — decouples the HBM peaks")
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

    unet_cfg = unet_lib.UNetConfig(in_channels=4)
    vae_cfg = vae_lib.VAEConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    init = jax.jit(lambda k: unet_lib.init_params(k, unet_cfg,
                                                  dtype=jnp.bfloat16))
    unet_params = jax.block_until_ready(init(k1))
    unet_cfg, unet_params = surgery.replace_conv_in(unet_cfg, unet_params, 8)
    # Stage the master copy on HOST: the real trainer keeps only one
    # fp32 master tree on device (inside the donated TrainState) plus
    # the bf16 serving copy — a second device-resident fp32 tree here
    # would steal 3.46 GB of HBM from the step and make every OOM
    # boundary in the sweep a bench artifact.
    unet_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, dtype=np.float32), unet_params
    )
    vae_params = jax.block_until_ready(
        jax.jit(lambda k: vae_lib.init_params(k, vae_cfg,
                                              dtype=jnp.bfloat16))(k2)
    )

    gd = jnp.dtype(args.grad_dtype) if args.grad_dtype else None
    ad = jnp.dtype(args.accum_dtype) if args.accum_dtype else None
    apply_fn = None
    if args.split_accum:
        import optax
        from marigold_tpu.train.train_step import make_accum_pair

        inner = optax.adafactor(
            3e-5, multiply_by_parameter_scale=False, clipping_threshold=1.0
        )
        micro, apply_raw, optimizer = make_accum_pair(
            unet_cfg, vae_cfg, DiffusionSchedule.create(), inner,
            args.accum, loss_name="mse_loss", multi_res_noise_cfg=None,
            remat=args.remat, accum_dtype=ad, grad_dtype=gd,
        )
        step = jax.jit(micro, donate_argnums=(0,))
        apply_fn = jax.jit(apply_raw, donate_argnums=(0,))
    else:
        optimizer = make_optimizer(
            3e-5, None, accumulation_steps=args.accum, name="adafactor",
            accum_dtype=ad,
        )
        step = jax.jit(
            make_train_step(unet_cfg, vae_cfg, DiffusionSchedule.create(),
                            optimizer, loss_name="mse_loss",
                            multi_res_noise_cfg=None, remat=args.remat,
                            grad_dtype=gd),
            donate_argnums=(0,),
        )
    text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    H, W = args.height, args.width

    for bs in [int(b) for b in args.batches.split(",")]:
        batch = {
            "rgb_norm": jnp.asarray(
                rng.standard_normal((bs, H, W, 3)).clip(-1, 1), jnp.float32),
            "gt_norm": jnp.asarray(
                rng.standard_normal((bs, H, W, 3)).clip(-1, 1), jnp.float32),
            "valid_mask": jnp.asarray(
                rng.random((bs, H, W, 1)) > 0.1),
        }
        try:
            # fresh copies: the jitted step donates the state, and the
            # donated leaves alias unet_params
            state = create_train_state(
                jax.tree_util.tree_map(jnp.asarray, unet_params), optimizer
            )
            micro_i = 0

            def one(state):
                nonlocal micro_i
                state, m = step(state, vae_params, text, batch, key)
                micro_i += 1
                if apply_fn is not None and micro_i % args.accum == 0:
                    state = apply_fn(state)
                return state, m

            t0 = time.perf_counter()
            state, m = one(state)
            jax.block_until_ready(m["loss"])
            compile_s = time.perf_counter() - t0
            if apply_fn is not None:  # compile the apply program too
                for _ in range(args.accum - 1):
                    state, m = one(state)
                jax.block_until_ready(m["loss"])
            for _ in range(3):
                state, m = one(state)
            jax.block_until_ready(m["loss"])
            micro_i = 0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, m = one(state)
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / args.steps
            accum_note = (
                "" if args.accum > 1
                else ", excl. MultiSteps accum overhead — rerun --accum 16"
            )
            print(f"bs{bs}: {dt*1e3:7.1f} ms/step  "
                  f"{dt/bs*1e3:6.1f} ms/sample  "
                  f"(eff-batch-32 iter: {dt*32/bs:.2f}s{accum_note}; "
                  f"first call {compile_s:.0f}s)", flush=True)
            del state
        except Exception as e:
            print(f"bs{bs}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)


if __name__ == "__main__":
    main()
