"""Warm-start breakdown: where do the seconds go between `python bench.py`
and the first served map? (VERDICT r2: BENCH init dropped 248s -> 48s with
the persistent compile cache, but the remaining 48s was unexplained.)

Phases measured (each blocked to completion):
  import        python imports (jax + marigold modules)
  init_eager    unet+vae init_params as bench.py ran it through r2:
                hundreds of per-layer RNG dispatches through the tunnel
  init_jit      the same init as ONE jitted program (compile+run, then
                the cached-second-call cost)
  core          DiffusionCore construction (cast_tree to bf16)
  warmup        first fused-batch call (program-cache hit via the
                persistent compile cache) at --res
  steady        second call (the steady-state latency)

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/profile_warm_start.py [--res 768] [--skip_eager]
"""

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--ensemble", type=int, default=10)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--ni", type=int, default=4)
    ap.add_argument("--skip_eager", action="store_true",
                    help="skip the (slow) eager per-layer init baseline")
    args = ap.parse_args()

    t = {}
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from marigold_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.pipelines.base import DiffusionCore
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

    jax.devices()  # force backend/tunnel init into this phase
    t["import+backend"] = time.perf_counter() - t0

    dtype = jnp.bfloat16
    unet_cfg = unet_lib.UNetConfig()
    vae_cfg = vae_lib.VAEConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    def block(tree):
        jax.block_until_ready(tree)
        return tree

    if not args.skip_eager:
        t0 = time.perf_counter()
        up = block(unet_lib.init_params(k1, unet_cfg, dtype=dtype))
        vp = block(vae_lib.init_params(k2, vae_cfg, dtype=dtype))
        t["init_eager"] = time.perf_counter() - t0
        del up, vp

    init_one = jax.jit(
        lambda ka, kb: (
            unet_lib.init_params(ka, unet_cfg, dtype=dtype),
            vae_lib.init_params(kb, vae_cfg, dtype=dtype),
        )
    )
    t0 = time.perf_counter()
    unet_params, vae_params = block(init_one(k1, k2))
    t["init_jit_first"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    block(init_one(k1, k2))
    t["init_jit_cached"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    core = DiffusionCore(
        unet_cfg, unet_params, vae_cfg, vae_params,
        text_cfg=None, text_params=None,
        schedule=DiffusionSchedule.create(), dtype=dtype,
    )
    core._empty_text_embed = jnp.zeros(
        (1, 2, unet_cfg.cross_attention_dim), dtype
    )
    pipe = MarigoldDepthPipeline(
        core,
        {"scale_invariant": True, "shift_invariant": True,
         "default_denoising_steps": args.steps,
         "default_processing_resolution": args.res},
    )
    t["core_construct"] = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    R = args.res
    rgb_stack = rng.integers(0, 255, (args.ni, R, R, 3), dtype=np.uint8)

    t0 = time.perf_counter()
    pred, _ = pipe._infer_fused_batch(
        rgb_stack, denoising_steps=args.steps, ensemble_size=args.ensemble,
        batch_size=args.ni * args.ensemble, seed=1234, out_hw=(R, R),
        sync=True, compact_output=True,
    )
    t["warmup_first_call"] = time.perf_counter() - t0
    assert np.isfinite(pred).all()

    t0 = time.perf_counter()
    pipe._infer_fused_batch(
        rgb_stack, denoising_steps=args.steps, ensemble_size=args.ensemble,
        batch_size=args.ni * args.ensemble, seed=1235, out_hw=(R, R),
        sync=True, compact_output=True,
    )
    t["steady_call"] = time.perf_counter() - t0

    total_warm = (
        t["import+backend"] + t["init_jit_cached"] + t["core_construct"]
        + t["warmup_first_call"]
    )
    print(json.dumps({k: round(v, 2) for k, v in t.items()}))
    print(f"# warm-start (import + jit-cached init + core + first call): "
          f"{total_warm:.1f}s")


if __name__ == "__main__":
    main()
