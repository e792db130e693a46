"""Trace the actual training step (shipped single-chip config: bs2
@480x640, Adafactor, donated state, bf16 compute / fp32 masters) and
print the device-time breakdown by op category plus an MFU number —
the same per-category attribution methodology that drove the serving
path to 0.826 maps/s (profile_bench_batch.py), applied to training.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python scripts/profile_train_step.py [--bs 2] [--remat full]

--remat: full (shipped), none, or a selective policy name (see
  train_step.make_train_step remat options).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_PEAK_TFLOPS = 197.0  # bf16 peak, one v5e chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--steps", type=int, default=4,
                    help="traced steps (pipelined)")
    ap.add_argument("--remat", default="full",
                    help="full | none | <policy name>")
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--accum_dtype", default=None,
                    help="accumulator dtype (e.g. bfloat16); default fp32 "
                         "optax.MultiSteps")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), unet_params
    )
    vae_params = jax.block_until_ready(
        jax.jit(lambda k: vae_lib.init_params(k, vae_cfg,
                                              dtype=jnp.bfloat16))(k2)
    )

    optimizer = make_optimizer(
        3e-5, None, accumulation_steps=args.accum, name="adafactor",
        accum_dtype=jnp.dtype(args.accum_dtype) if args.accum_dtype
        else None,
    )
    remat = args.remat if args.remat != "none" else False
    if remat == "full":
        remat = True
    step = jax.jit(
        make_train_step(unet_cfg, vae_cfg, DiffusionSchedule.create(),
                        optimizer, loss_name="mse_loss",
                        multi_res_noise_cfg=None, remat=remat),
        donate_argnums=(0,),
    )
    text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    H, W, bs = args.height, args.width, args.bs
    batch = {
        "rgb_norm": jnp.asarray(
            rng.standard_normal((bs, H, W, 3)).clip(-1, 1), jnp.float32),
        "gt_norm": jnp.asarray(
            rng.standard_normal((bs, H, W, 3)).clip(-1, 1), jnp.float32),
        "valid_mask": jnp.asarray(rng.random((bs, H, W, 1)) > 0.1),
    }

    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, unet_params), optimizer
    )

    # AOT: one compile serves execution AND XLA's own flop count (which
    # includes remat recompute); useful-FLOP math is printed separately.
    t0 = time.perf_counter()
    compiled = step.lower(state, vae_params, text, batch, key).compile()
    print(f"compile {time.perf_counter()-t0:.0f}s")
    try:
        cost = compiled.cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception as e:  # cost_analysis can be backend-dependent
        print(f"cost_analysis unavailable: {e}")
        step_flops = 0.0
    step = compiled

    t0 = time.perf_counter()
    state, m = step(state, vae_params, text, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"first call {time.perf_counter()-t0:.0f}s")
    for _ in range(3):
        state, m = step(state, vae_params, text, batch, key)
    jax.block_until_ready(m["loss"])

    trace_dir = "/tmp/traintrace"
    os.system(f"rm -rf {trace_dir}")
    n = args.steps
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            state, m = step(state, vae_params, text, batch, key)
        jax.block_until_ready(m["loss"])
    wall = (time.perf_counter() - t0) / n
    print(f"wall per step: {wall*1e3:.1f} ms  ({wall/bs*1e3:.1f} ms/sample)")

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == 3]

    # trace events carry hlo_category + model_flops in args; XLA module
    # envelopes appear both as jit_* and as bare step-counter names
    # ("0","1",...) with no hlo_category — exclude both from op totals
    top = collections.Counter()
    agg, cnt = collections.Counter(), collections.Counter()
    cat = collections.Counter()
    cat_flops = collections.Counter()
    for e in events:
        nm = e["name"]
        a = e.get("args", {}) or {}
        hc = a.get("hlo_category")
        if nm.startswith("jit_"):
            top[nm] += e.get("dur", 0)
            continue
        if hc is None:
            continue  # per-step envelope / non-op event
        key_ = re.sub(r"[.\d]+$", "", nm)
        agg[key_] += e.get("dur", 0)
        cnt[key_] += 1
        cat[hc] += e.get("dur", 0)
        try:
            cat_flops[hc] += float(a.get("model_flops") or 0)
        except (TypeError, ValueError):
            pass

    print("\nprogram envelopes (ms per step):")
    for nm, dur in top.most_common(6):
        print(f"  {dur/1e3/n:9.2f} ms  {nm[:80]}")
    step_ms = (max(top.values()) / 1e3 / n) if top else 0.0
    if step_ms:
        print(f"device step: {step_ms:.1f} ms "
              f"({step_ms/bs:.1f} ms/sample)")

    tot = sum(cat.values())
    print(f"\nhlo categories (ms per step, op total {tot/1e3/n:.1f} ms):")
    for nm, dur in cat.most_common():
        eff = cat_flops[nm] / (dur / 1e6) / 1e12 if dur else 0.0
        print(f"  {dur/1e3/n:9.2f} ms  {100*dur/tot:5.1f}%  "
              f"{cat_flops[nm]/1e12/n:6.2f} TF  {eff:6.1f} TF/s  {nm}")

    print(f"\nleaf ops (ms per step):")
    for nm, dur in agg.most_common(args.top):
        print(f"  {dur/1e3/n:9.2f} ms x{cnt[nm]//n:5d}  {nm}")

    dev_s = step_ms / 1e3 if step_ms else tot / 1e6 / n
    if step_flops and dev_s:
        tf = step_flops / 1e12
        print(f"\nXLA-counted FLOPs/step: {tf:.2f} TF "
              f"-> {tf/dev_s:.1f} TF/s "
              f"= {100*tf/dev_s/V5E_PEAK_TFLOPS:.1f}% of v5e bf16 peak "
              f"(includes remat recompute)")


if __name__ == "__main__":
    main()
