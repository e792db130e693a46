"""Serving throughput for the normals and IID modalities on the real chip
(the depth headline lives in bench.py; this publishes the other two).

Protocol shapes (reference eval drivers):
  normals — 4-step DDIM, ensemble 10, 768 px
            (script/normals/eval/*.sh: res 768 for DIODE/OASIS, 640 for
            ScanNet/NYU/iBims; 768 is the heavier one and the published
            number)
  iid     — 4-step DDIM, ensemble 1, 640 px, 3 targets
            (script/iid/eval/11_infer_appearance_interiorverse.sh /
            lighting drivers: E=1; the lighting checkpoint is the wider
            conv_in 4->16 / conv_out 4->12 UNet, n=3 VAE decodes per map)

Same methodology as bench.py: random full-size weights (throughput is
weight-independent), uint8 upload, compact uint16 readback, several
in-flight batches, wall-clock over n_iter batches after a warmup.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/bench_modality_serving.py [--modality normals|iid|both]

Prints one JSON line per modality.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pipe(modality, dtype):
    import jax
    import jax.numpy as jnp

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.pipelines.base import DiffusionCore
    from marigold_tpu.pipelines.iid import MarigoldIIDPipeline
    from marigold_tpu.pipelines.normals import MarigoldNormalsPipeline

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    if modality == "normals":
        unet_cfg = unet_lib.UNetConfig()  # in 8 / out 4, like depth
    else:  # iid lighting: 3 targets
        unet_cfg = unet_lib.UNetConfig(in_channels=16, out_channels=12)
    vae_cfg = vae_lib.VAEConfig()

    init = jax.jit(
        lambda ka, kb: (
            unet_lib.init_params(ka, unet_cfg, dtype=dtype),
            vae_lib.init_params(kb, vae_cfg, dtype=dtype),
        )
    )
    unet_params, vae_params = jax.block_until_ready(init(k1, k2))

    core = DiffusionCore(
        unet_cfg, unet_params, vae_cfg, vae_params,
        text_cfg=None, text_params=None,
        schedule=DiffusionSchedule.create(), dtype=dtype,
    )
    core._empty_text_embed = jnp.zeros(
        (1, 2, unet_cfg.cross_attention_dim), dtype
    )
    if modality == "normals":
        return MarigoldNormalsPipeline(core, {"default_denoising_steps": 4})
    return MarigoldIIDPipeline(
        core,
        {
            "default_denoising_steps": 4,
            "target_properties": {
                "target_names": ["albedo", "shading", "residual"],
                "albedo": {"prediction_space": "srgb"},
                "shading": {"prediction_space": "linear",
                            "up_to_scale": True},
                "residual": {"prediction_space": "linear",
                             "up_to_scale": True},
            },
        },
    )


def bench_one(modality, res, steps, ensemble, ni, n_iter=4):
    import jax
    import jax.numpy as jnp

    pipe = build_pipe(modality, jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgb_stack = rng.integers(0, 255, (ni, res, res, 3), dtype=np.uint8)

    # warmup + compile (persistent cache makes reruns fast)
    pred, _ = pipe._infer_fused_batch(
        rgb_stack, denoising_steps=steps, ensemble_size=ensemble,
        batch_size=ni * ensemble, seed=1234, out_hw=(res, res),
        sync=True, compact_output=True,
    )
    assert np.isfinite(pred).all()

    t0 = time.time()
    in_flight = []
    for i in range(n_iter):
        p, u = pipe._infer_fused_batch(
            rgb_stack, denoising_steps=steps, ensemble_size=ensemble,
            batch_size=ni * ensemble, seed=1234 + i, out_hw=(res, res),
            sync=False, compact_output=True,
        )
        in_flight.append(p)
    results = [np.asarray(jax.device_get(p)) for p in in_flight]
    assert all(np.isfinite(r).all() for r in results)
    dt = (time.time() - t0) / n_iter / ni
    return 1.0 / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", default="both",
                    choices=["normals", "iid", "both"])
    # NI=4 OOMs for normals: the member stack/readback is 3-channel where
    # depth's is 1-channel (+190 MB fp32 at 768px), and depth's NI=4 was
    # already near the HBM edge. Measured: NI=2 0.7495, NI=3 0.8053
    # maps/s (v5e, 2026-08) — NI=3 ships.
    ap.add_argument("--normals_ni", type=int,
                    default=int(os.environ.get("MARIGOLD_BENCH_NI", "3")))
    ap.add_argument("--iid_ni", type=int, default=16)
    ap.add_argument("--n_iter", type=int, default=4)
    args = ap.parse_args()

    from marigold_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))

    jobs = []
    if args.modality in ("normals", "both"):
        # same UNet/VAE footprint as depth => same 40-row denoise batch
        jobs.append(("normals", 768, 4, 10, args.normals_ni))
    if args.modality in ("iid", "both"):
        # E=1: images are the only batch axis; 640px latents are smaller
        # so more rows fit than depth's 40 at 768
        jobs.append(("iid", 640, 4, 1, args.iid_ni))

    for modality, res, steps, ensemble, ni in jobs:
        maps_per_sec, dt = bench_one(
            modality, res, steps, ensemble, ni, n_iter=args.n_iter
        )
        print(json.dumps({
            "metric": f"{res}px {modality} maps/sec/chip "
                      f"({steps}-step, {ensemble}-ensemble)",
            "value": round(maps_per_sec, 4),
            "unit": "maps/sec",
        }))
        print(f"# {modality}: {dt*1000:.0f} ms/map | NI={ni} E={ensemble} "
              f"steps={steps} res={res} bf16", file=sys.stderr)


if __name__ == "__main__":
    main()
