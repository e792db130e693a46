"""Serving throughput for the non-headline protocol shapes on the real
chip (the depth 4-step headline lives in bench.py; this publishes the
rest).

Protocol shapes (reference eval drivers):
  normals — 4-step DDIM, ensemble 10, 768 px
            (script/normals/eval/*.sh: res 768 for DIODE/OASIS, 640 for
            ScanNet/NYU/iBims; 768 is the heavier one and the published
            number)
  iid     — 4-step DDIM, ensemble 1, 640 px, 3 targets
            (script/iid/eval/11_infer_appearance_interiorverse.sh /
            lighting drivers: E=1; the lighting checkpoint is the wider
            conv_in 4->16 / conv_out 4->12 UNet, n=3 VAE decodes per map)
  depth1  — 1-step DDIM, ensemble 10, 768 px: the ACTUAL flagship v1-1
            depth eval protocol (script/depth/eval/11_infer_nyu.sh:13-15
            --denoise_steps 1 --ensemble_size 10 --processing_res 768).
            At 1 step the denoise:decode ratio inverts (10 decodes vs 10
            single-step UNet fwds per map), so its NI optimum is swept
            separately. Also reports single-image latency (NI=1,
            synchronous round trip) alongside batched throughput.
  lcm     — LCM consistency sampler, 1 step, ensemble 10, 768 px: the
            legacy v1-0 LCM checkpoint path the reference accepts
            (marigold/marigold_depth_pipeline.py:368-377 LCMScheduler;
            driver config #5). Same UNet footprint; the sampler renoises
            toward the next timestep instead of DDIM.

Same methodology as bench.py: random full-size weights (throughput is
weight-independent), uint8 upload, compact uint16 readback, several
in-flight batches, wall-clock over n_iter batches after a warmup.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/bench_modality_serving.py \
          [--modality normals|iid|depth1|lcm|both|all]

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
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline
    from marigold_tpu.pipelines.iid import MarigoldIIDPipeline
    from marigold_tpu.pipelines.normals import MarigoldNormalsPipeline

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    if modality == "iid":  # iid lighting: 3 targets
        unet_cfg = unet_lib.UNetConfig(in_channels=16, out_channels=12)
    else:  # depth/depth1/lcm/normals: in 8 / out 4
        unet_cfg = unet_lib.UNetConfig()
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
    if modality in ("depth1", "lcm"):
        if modality == "lcm":
            # legacy v1-0 LCM checkpoint path: the consistency sampler
            # replaces DDIM inside the same fused program (core/lcm.py)
            from marigold_tpu.core.lcm import LCMSchedule

            core.lcm = LCMSchedule.create(
                base=core.schedule, original_inference_steps=50
            )
        return MarigoldDepthPipeline(core, {
            "scale_invariant": True, "shift_invariant": True,
            "default_denoising_steps": 1,
        })
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


def bench_one(modality, res, steps, ensemble, ni, n_iter=4,
              device_only=False):
    """device_only=True times async submit + block_until_ready WITHOUT
    the host transfer: this tunneled bench host reads back at
    10-50 MB/s depending on the day, which for readback-heavy configs
    (IID: ~30 MB/map) makes the wall number a tunnel measurement, not a
    chip one (docs/PERFORMANCE.md r5 "Tunnel-readback variability").
    Production hosts read back at GB/s, so device-only is the per-chip
    capacity there."""
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
    if device_only:
        jax.block_until_ready(in_flight)
        dt = (time.time() - t0) / n_iter / ni
        results = [np.asarray(jax.device_get(in_flight[0]))]  # untimed
    else:
        results = [np.asarray(jax.device_get(p)) for p in in_flight]
        dt = (time.time() - t0) / n_iter / ni
    assert all(np.isfinite(r).all() for r in results)
    return 1.0 / dt, dt


def bench_latency(modality, res, steps, ensemble, n_iter=4):
    """Single-image synchronous latency: one image per dispatch, full
    host->device->host round trip per map (the interactive-use number, as
    opposed to the batched steady-state throughput above)."""
    import jax.numpy as jnp

    pipe = build_pipe(modality, jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, res, res, 3), dtype=np.uint8)
    pipe._infer_fused_batch(  # warmup + compile
        img, denoising_steps=steps, ensemble_size=ensemble,
        batch_size=ensemble, seed=7, out_hw=(res, res), sync=True,
        compact_output=True,
    )
    t0 = time.time()
    for i in range(n_iter):
        p, _ = pipe._infer_fused_batch(
            img, denoising_steps=steps, ensemble_size=ensemble,
            batch_size=ensemble, seed=7 + i, out_hw=(res, res), sync=True,
            compact_output=True,
        )
        assert np.isfinite(p).all()
    return (time.time() - t0) / n_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", default="both",
                    choices=["normals", "iid", "depth1", "lcm", "both",
                             "all"])
    # NI=4 OOMs for normals: the member stack/readback is 3-channel where
    # depth's is 1-channel (+190 MB fp32 at 768px), and depth's NI=4 was
    # already near the HBM edge. Measured: NI=2 0.7495, NI=3 0.8053
    # maps/s (v5e, 2026-08) — NI=3 ships.
    ap.add_argument("--normals_ni", type=int,
                    default=int(os.environ.get("MARIGOLD_BENCH_NI", "3")))
    ap.add_argument("--iid_ni", type=int, default=16)
    # 1-step NI sweep on v5e (2026-08): NI=2/3/6 -> 1.299/1.510-1.537/
    # 1.343 maps/s; NI=10 OOMs HBM. NI=3 is the optimum at 1 step too —
    # the 30-row denoise batch already saturates the MXU for the single
    # step, and larger NI only grows the decode working set (see
    # docs/PERFORMANCE.md "1-step protocols").
    ap.add_argument("--depth1_ni", type=int,
                    default=int(os.environ.get("MARIGOLD_BENCH_NI1", "3")))
    ap.add_argument("--lcm_ni", type=int,
                    default=int(os.environ.get("MARIGOLD_BENCH_NI1", "3")))
    ap.add_argument("--n_iter", type=int, default=4)
    ap.add_argument("--latency", action="store_true",
                    help="also measure single-image synchronous latency "
                         "for depth1/lcm")
    ap.add_argument("--device_only", action="store_true",
                    help="time device completion without the host "
                         "readback (see bench_one docstring)")
    args = ap.parse_args()

    from marigold_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))

    jobs = []
    if args.modality in ("normals", "both", "all"):
        # same UNet/VAE footprint as depth => same 40-row denoise batch
        jobs.append(("normals", 768, 4, 10, args.normals_ni))
    if args.modality in ("iid", "both", "all"):
        # E=1: images are the only batch axis; 640px latents are smaller
        # so more rows fit than depth's 40 at 768
        jobs.append(("iid", 640, 4, 1, args.iid_ni))
    if args.modality in ("depth1", "all"):
        jobs.append(("depth1", 768, 1, 10, args.depth1_ni))
    if args.modality in ("lcm", "all"):
        jobs.append(("lcm", 768, 1, 10, args.lcm_ni))

    for modality, res, steps, ensemble, ni in jobs:
        base = "depth" if modality in ("depth1", "lcm") else modality
        sampler = "LCM" if modality == "lcm" else "DDIM"
        maps_per_sec, dt = bench_one(
            modality, res, steps, ensemble, ni, n_iter=args.n_iter,
            device_only=args.device_only,
        )
        tag = ", device-only" if args.device_only else ""
        print(json.dumps({
            "metric": f"{res}px {base} maps/sec/chip "
                      f"({steps}-step {sampler}, {ensemble}-ensemble"
                      f"{tag})",
            "value": round(maps_per_sec, 4),
            "unit": "maps/sec",
        }))
        print(f"# {modality}: {dt*1000:.0f} ms/map | NI={ni} E={ensemble} "
              f"steps={steps} res={res} bf16", file=sys.stderr)
        if args.latency and modality in ("depth1", "lcm"):
            lat = bench_latency(modality, res, steps, ensemble,
                                n_iter=args.n_iter)
            print(json.dumps({
                "metric": f"{res}px {base} single-image latency "
                          f"({steps}-step {sampler}, {ensemble}-ensemble)",
                "value": round(lat, 4),
                "unit": "s/map",
            }))


if __name__ == "__main__":
    main()
