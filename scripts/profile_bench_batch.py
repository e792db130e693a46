"""Trace the actual serving batch program (bench.py configuration) and
print the device-time breakdown by op category."""

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.pipelines.base import DiffusionCore
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    unet_cfg = unet_lib.UNetConfig()
    vae_cfg = vae_lib.VAEConfig()
    init_fn = jax.jit(
        lambda ka, kb: (
            unet_lib.init_params(ka, unet_cfg, dtype=dtype),
            vae_lib.init_params(kb, vae_cfg, dtype=dtype),
        )
    )
    unet_params, vae_params = jax.block_until_ready(init_fn(k1, k2))
    core = DiffusionCore(unet_cfg, unet_params, vae_cfg, vae_params,
                         text_cfg=None, text_params=None,
                         schedule=DiffusionSchedule.create(), dtype=dtype)
    core._empty_text_embed = jnp.zeros((1, 2, 1024), dtype)
    pipe = MarigoldDepthPipeline(core, {
        "scale_invariant": True, "shift_invariant": True,
        "default_denoising_steps": 4, "default_processing_resolution": 768,
    })

    rng = np.random.default_rng(0)
    ni = int(os.environ.get("MARIGOLD_BENCH_NI", "3"))
    steps = int(os.environ.get("MARIGOLD_BENCH_STEPS", "4"))
    imgs = [rng.integers(0, 255, (768, 768, 3), dtype=np.uint8) for _ in range(ni)]
    rgb_stack = np.stack(imgs)  # uint8, matching bench.py

    def run(i):
        return pipe._infer_fused_batch(
            rgb_stack, denoising_steps=steps, ensemble_size=10,
            batch_size=ni * 10,
            seed=1234 + i, out_hw=(768, 768), sync=False,
        )

    # warmup/compile
    pred, unc = run(0)
    _ = np.asarray(jax.device_get(pred)).ravel()[0]
    print("compiled; tracing 2 batches")

    trace_dir = "/tmp/benchtrace"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        outs = [run(1), run(2)]
        res = [np.asarray(jax.device_get(p)) for p, _ in outs]
    wall = (time.time() - t0) / 2
    print(f"wall per batch (incl readback): {wall:.3f}s")

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == 3]
    agg, cnt = collections.Counter(), collections.Counter()
    top = collections.Counter()
    for e in events:
        nm = e["name"]
        if nm.startswith("jit_"):
            top[nm] += e.get("dur", 0)
            continue
        key_ = re.sub(r"[.\d]+$", "", nm)
        agg[key_] += e.get("dur", 0)
        cnt[key_] += 1
    print("\nprogram envelopes (per batch):")
    for nm, dur in top.most_common(6):
        print(f"  {dur/1e3/2:9.2f} ms  {nm[:80]}")
    print("\nleaf ops (ms per batch):")
    tot = sum(agg.values())
    for nm, dur in agg.most_common(18):
        print(f"  {dur/1e3/2:9.2f} ms x{cnt[nm]//2:5d}  {nm}")
    print(f"  ---- total device {tot/1e6/2:.3f} s/batch")

    # individual op instances (exact names incl. fusion numbers), to
    # locate WHICH fusions carry the non-matmul time
    inst, icnt = collections.Counter(), collections.Counter()
    for e in events:
        nm = e["name"]
        if nm.startswith("jit_"):
            continue
        inst[nm] += e.get("dur", 0)
        icnt[nm] += 1
    print("\ntop individual ops (ms per batch, x count):")
    for nm, dur in inst.most_common(40):
        print(f"  {dur/1e3/2:9.2f} ms x{icnt[nm]//2:5d}  {nm}")


if __name__ == "__main__":
    main()
