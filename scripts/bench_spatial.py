"""Benchmark the spatial-parallel (>1k-px) inference mode.

Runs pipe(img, spatial=True) at a high processing resolution with the
image's H axis sharded over all local devices, and reports maps/sec plus
the single-device comparison when it fits. On the 1-chip environment this
exercises the real kernel dispatch through a degenerate mesh; on a real
multi-chip host it measures the ICI-sharded throughput (halo convs, psum
GroupNorm, gather-KV flash attention — docs/PERFORMANCE.md "Spatial
parallelism").

Usage: python scripts/bench_spatial.py [--res 1536] [--ensemble 2]
       [--steps 4] [--n_devices N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1536)
    ap.add_argument("--ensemble", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--n_devices", type=int, default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.parallel.mesh import get_mesh
    from marigold_tpu.pipelines.base import DiffusionCore
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

    mesh = get_mesh(args.n_devices)
    n = mesh.size
    print(f"mesh: {n} device(s) on {jax.devices()[0].platform}")

    dtype = jnp.bfloat16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_cfg = unet_lib.UNetConfig()
    vae_cfg = vae_lib.VAEConfig()
    core = DiffusionCore(
        unet_cfg, unet_lib.init_params(k1, unet_cfg, dtype=dtype),
        vae_cfg, vae_lib.init_params(k2, vae_cfg, dtype=dtype),
        text_cfg=None, text_params=None,
        schedule=DiffusionSchedule.create(), dtype=dtype, mesh=mesh,
    )
    core._empty_text_embed = jnp.zeros((1, 2, 1024), dtype)
    pipe = MarigoldDepthPipeline(core, {
        "scale_invariant": True, "shift_invariant": True,
        "default_denoising_steps": args.steps,
        "default_processing_resolution": args.res,
    })

    rng = np.random.default_rng(0)
    rgb = (rng.uniform(-1, 1, (args.res, args.res, 3))).astype(np.float32)

    kw = dict(
        denoising_steps=args.steps, ensemble_size=args.ensemble,
        seed=1234, out_hw=(args.res, args.res), spatial=True,
    )
    pred, unc = pipe._infer_fused(rgb, **kw)  # warmup/compile
    assert np.isfinite(pred).all()

    t0 = time.time()
    for i in range(args.iters):
        pred, _ = pipe._infer_fused(rgb, **{**kw, "seed": 1234 + i})
    dt = (time.time() - t0) / args.iters
    print(
        f"spatial {args.res}px E={args.ensemble} steps={args.steps} over "
        f"{n} device(s): {dt:.2f} s/map = {1.0 / dt:.3f} maps/s"
    )


if __name__ == "__main__":
    main()
