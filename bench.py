"""Flagship benchmark: 768px depth maps/sec/chip, 4-step DDIM, 10-member
ensemble — the BASELINE.json north-star metric.

Runs the real end-to-end pipeline (preprocess -> VAE encode -> scan(4 UNet
steps) -> VAE decode -> on-device ensemble alignment -> host readback) on
full SD2-size models with randomly initialized weights (throughput is
weight-independent; real checkpoints are not downloadable in this
environment).

Baseline: the reference (PyTorch+diffusers+xformers, fp16) on A100-80GB.
Derivation from public SD2 measurements: the 768px SD2 UNet runs ~10 it/s
at batch 1 on A100 fp16 (~0.1 s/step); at the ensemble batch the reference
uses (bs<=30 per its A100 table, marigold/util/batchsize.py:42) per-step
time scales to ~0.7 s for 10 members => 4 steps ~2.8 s; plus 10 VAE
decodes (~1.5 s), VAE encodes of the replicated input, CPU scipy-BFGS
ensemble alignment at 768px (seconds — it is host-side,
marigold/util/ensemble.py:165), preprocessing and transfers: ~8 s per
ensembled map => ~0.12 maps/sec. We use 0.12 as the A100 per-chip
baseline; the >=5x target is therefore ~0.6 maps/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

A100_BASELINE_MAPS_PER_SEC = 0.12

ENSEMBLE = 10
STEPS = 4
RES = 768


def main():
    import jax
    import jax.numpy as jnp

    import os
    from marigold_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.pipelines.base import DiffusionCore, BasePipeline
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    unet_cfg = unet_lib.UNetConfig()  # full SD2, in 8ch / out 4ch
    vae_cfg = vae_lib.VAEConfig()  # full SD2 VAE

    # One jitted program for the whole init: the eager path is hundreds of
    # per-layer RNG dispatches through the device tunnel (measured 135 s on
    # the tunneled v5e); as a single cached program it is ~0.1 s warm
    # (scripts/profile_warm_start.py, docs/PERFORMANCE.md "Warm start").
    t0 = time.time()
    init_fn = jax.jit(
        lambda ka, kb: (
            unet_lib.init_params(ka, unet_cfg, dtype=dtype),
            vae_lib.init_params(kb, vae_cfg, dtype=dtype),
        )
    )
    unet_params, vae_params = jax.block_until_ready(init_fn(k1, k2))
    init_s = time.time() - t0

    core = DiffusionCore(
        unet_cfg, unet_params, vae_cfg, vae_params,
        text_cfg=None, text_params=None,
        schedule=DiffusionSchedule.create(), dtype=dtype,
    )
    # constant empty-prompt embedding (the CLIP tower runs once per process
    # in real use; excluded here so the bench measures the denoise path)
    core._empty_text_embed = jnp.zeros((1, 2, unet_cfg.cross_attention_dim), dtype)

    pipe = MarigoldDepthPipeline(
        core,
        {
            "scale_invariant": True,
            "shift_invariant": True,
            "default_denoising_steps": STEPS,
            "default_processing_resolution": RES,
        },
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (RES, RES, 3), dtype=np.uint8)

    # Throughput serving: NI images' ensembles share one fused program
    # (the denoise batch saturates the MXU; decode is chunked separately
    # at <=20 rows). Inputs upload as uint8 and normalize on device — 4x
    # less host->device traffic, which was the steady-state pipeline
    # bubble.
    # Geometry sweep (repeated runs, v5e), NI x denoise-chunk:
    #   NI=2/c20 0.729 | NI=3/c30 0.815-0.820 | NI=4/c40 0.775-0.776
    #   NI=4/c20 0.748 | NI=6/c30 0.770
    # NI=3 with one 30-row denoise chunk (2x15-row decode chunks) is the
    # optimum: the 40-row batch sits at the HBM edge and schedules
    # worse, and splitting the denoise into multiple lax.map chunks
    # costs more in per-chunk fixed work than it buys in HBM headroom.
    # (r1's "NI=3 compile OOM" was the old monolithic program; the
    # decoupled denoise/decode structure fixed it, but NI=3 was never
    # re-tried until round 3 of the continuous build.)
    NI = int(os.environ.get("MARIGOLD_BENCH_NI", "3"))
    # denoise chunk rows (<= NI*ENSEMBLE; lax.map iterates the chunks)
    CHUNK = int(os.environ.get("MARIGOLD_BENCH_CHUNK", str(NI * ENSEMBLE)))
    imgs = [img] + [
        rng.integers(0, 255, (RES, RES, 3), dtype=np.uint8)
        for _ in range(NI - 1)
    ]

    import jax as _jax
    import numpy as _np

    rgb_stack = _np.stack(imgs)  # uint8 [NI, RES, RES, 3]

    # warmup & compile (same uint8-in / uint16-out program the timed loop
    # runs; compact_output reads back 16-bit depth — the precision the
    # serving outputs carry — for 4x less tunnel traffic)
    pred, unc = pipe._infer_fused_batch(
        rgb_stack, denoising_steps=STEPS, ensemble_size=ENSEMBLE,
        batch_size=CHUNK, seed=1234, out_hw=(RES, RES), sync=True,
        compact_output=True,
    )
    assert pred.shape[1:3] == (RES, RES)
    assert np.isfinite(pred).all() and 0 <= pred.min() <= pred.max() <= 1

    # steady-state throughput: pipeline several in-flight batches (async
    # dispatch); sync + read back everything at the end
    n_iter = 4
    t0 = time.time()
    in_flight = []
    for i in range(n_iter):
        pred, unc = pipe._infer_fused_batch(
            rgb_stack, denoising_steps=STEPS, ensemble_size=ENSEMBLE,
            batch_size=CHUNK, seed=1234 + i,
            out_hw=(RES, RES), sync=False, compact_output=True,
        )
        in_flight.append((pred, unc))
    results = [
        _np.asarray(_jax.device_get(p)).astype(_np.float32) / 65535.0
        for p, _ in in_flight
    ]
    assert all(_np.isfinite(r).all() for r in results)
    dt = (time.time() - t0) / n_iter / NI

    maps_per_sec = 1.0 / dt
    result = {
        "metric": "768px depth maps/sec/chip (4-step, 10-ensemble)",
        "value": round(maps_per_sec, 4),
        "unit": "maps/sec",
        "vs_baseline": round(maps_per_sec / A100_BASELINE_MAPS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(
        f"# latency {dt*1000:.0f} ms/map (batched serving) | init {init_s:.1f}s | "
        f"E={ENSEMBLE} steps={STEPS} res={RES} dtype=bf16 | "
        f"baseline 0.12 maps/s = A100 as-shipped estimate "
        f"(optimized-torch band 0.22-0.36 -> {maps_per_sec/0.36:.2f}-"
        f"{maps_per_sec/0.22:.2f}x; see BASELINE.md derivations)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
