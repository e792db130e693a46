"""Measure the real-checkpoint serving warm-start path at FULL scale with
a synthetic diffusers-layout checkpoint on disk.

The parity runbook (scripts/parity_runbook.sh) needs real downloads; this
script exercises the exact same code path — safetensors read, torch->JAX
layout transposes, dtype cast, device upload, fused-program compile,
first map — on a checkpoint we can fabricate locally at the real shapes
(866M-param 8-ch SD2 UNet, SD2 VAE, OpenCLIP-H text tower; fp16 on disk
like the HF `fp16` distribution, ~2.5 GB). Values are random (throughput
and load cost are weight-independent); the point is that every byte of
the from_pretrained path runs at full scale, which tiny-fixture tests
cannot show.

Reference anchor: the runbook stage this pre-validates is the
script/depth/eval/11_infer_nyu.sh checkpoint load
(marigold/marigold_depth_pipeline.py from_pretrained).

Usage:
  # stage 1 (any platform; writes ~2.6 GB under --ckpt_dir):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      python scripts/bench_checkpoint_load.py --make --ckpt_dir /root/ckpt_synth
  # stage 2 (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/bench_checkpoint_load.py --bench --ckpt_dir /root/ckpt_synth

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_checkpoint(ckpt_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import clip_text as clip_lib
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.models import weights as W

    unet_cfg = unet_lib.UNetConfig()  # depth: in 8 / out 4, 866M params
    vae_cfg = vae_lib.VAEConfig()
    text_cfg = clip_lib.CLIPTextConfig()

    rng = np.random.default_rng(0)

    def materialize(shape_tree):
        # fill with small-scale noise in fp16 — load cost and serving
        # throughput are weight-independent; activations stay finite
        return jax.tree_util.tree_map(
            lambda s: (rng.standard_normal(s.shape, dtype=np.float32)
                       * 0.02).astype(np.float16),
            shape_tree,
        )

    t0 = time.time()
    k = jax.random.PRNGKey(0)
    unet_params = materialize(jax.eval_shape(
        lambda kk: unet_lib.init_params(kk, unet_cfg, dtype=jnp.float16), k
    ))
    vae_params = materialize(jax.eval_shape(
        lambda kk: vae_lib.init_params(kk, vae_cfg, dtype=jnp.float16), k
    ))
    text_params = materialize(jax.eval_shape(
        lambda kk: clip_lib.init_params(kk, text_cfg, dtype=jnp.float16), k
    ))

    W.save_unet(unet_cfg, unet_params, os.path.join(ckpt_dir, "unet"))
    W.save_vae(vae_cfg, vae_params, os.path.join(ckpt_dir, "vae"))
    W.save_text_encoder(
        text_cfg, text_params, os.path.join(ckpt_dir, "text_encoder")
    )
    DiffusionSchedule.create().save_pretrained(
        os.path.join(ckpt_dir, "scheduler")
    )
    index = {
        "_class_name": "MarigoldDepthPipeline",
        "default_denoising_steps": 1,
        "default_processing_resolution": 768,
        "scale_invariant": True,
        "shift_invariant": True,
        "unet": ["diffusers", "UNet2DConditionModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "scheduler": ["diffusers", "DDIMScheduler"],
        "text_encoder": ["transformers", "CLIPTextModel"],
        "tokenizer": ["transformers", "CLIPTokenizer"],
    }
    with open(os.path.join(ckpt_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)

    n_bytes = 0
    for root, _, files in os.walk(ckpt_dir):
        for fn in files:
            n_bytes += os.path.getsize(os.path.join(root, fn))
    print(json.dumps({
        "metric": "synthetic full-size checkpoint write",
        "value": round(time.time() - t0, 2), "unit": "s",
        "bytes": n_bytes,
    }))


def bench_load(ckpt_dir: str, res: int, steps: int, ensemble: int) -> None:
    import jax
    import jax.numpy as jnp

    from marigold_tpu.models.manifest import validate_checkpoint
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline
    from marigold_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))

    # pre-flight: header-only manifest validation (runbook stage 2)
    t0 = time.time()
    report = validate_checkpoint(ckpt_dir)
    dt_validate = time.time() - t0
    assert report["ok"], report
    print(json.dumps({
        "metric": "manifest validation (headers only)",
        "value": round(dt_validate * 1000, 1), "unit": "ms",
    }))

    # the full load path: safetensors read -> layout transposes -> bf16
    # cast -> device upload (jnp.asarray lands on the default device)
    t0 = time.time()
    pipe = MarigoldDepthPipeline.from_pretrained(
        ckpt_dir, dtype=jnp.bfloat16
    )
    jax.block_until_ready((pipe.core.unet_params, pipe.core.vae_params))
    dt_load = time.time() - t0
    print(json.dumps({
        "metric": "from_pretrained full-size (read+transpose+cast+upload)",
        "value": round(dt_load, 2), "unit": "s",
    }))

    # first map: empty-text embed + fused-program compile + run
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, res, res, 3), dtype=np.uint8)

    def one_map(seed):
        pred, _ = pipe._infer_fused_batch(
            img, denoising_steps=steps, ensemble_size=ensemble,
            batch_size=ensemble, seed=seed, out_hw=(res, res), sync=True,
            compact_output=True,
        )
        assert np.isfinite(pred).all()

    t0 = time.time()
    one_map(1234)
    dt_first = time.time() - t0
    t0 = time.time()
    one_map(1235)
    dt_warm = time.time() - t0
    print(json.dumps({
        "metric": f"cold start to first map ({steps}-step DDIM, "
                  f"{ensemble}-ensemble, {res}px)",
        "value": round(dt_load + dt_first, 2), "unit": "s",
        "load_s": round(dt_load, 2), "first_map_s": round(dt_first, 2),
        "warm_map_s": round(dt_warm, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="/root/ckpt_synth/marigold-depth-synth")
    ap.add_argument("--make", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--ensemble", type=int, default=10)
    args = ap.parse_args()

    if args.make:
        os.makedirs(args.ckpt_dir, exist_ok=True)
        make_checkpoint(args.ckpt_dir)
    if args.bench:
        bench_load(args.ckpt_dir, args.res, args.steps, args.ensemble)
    if not (args.make or args.bench):
        print("pass --make and/or --bench", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
