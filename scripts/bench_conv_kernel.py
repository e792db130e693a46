"""A/B the Pallas nine-tap conv kernel vs the XLA conv emitter on the real
TPU at the serving tower shapes, by device trace (wall clocks through the
tunnel are unreliable — docs/PERFORMANCE.md methodology).

Usage: python scripts/bench_conv_kernel.py [--iters 12]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16

# (B, H, W, C): UNet levels at the NI=4 serving batch, VAE decoder levels
# at the 20-row decode chunk.
SHAPES = [
    (40, 96, 96, 320),
    (40, 48, 48, 640),
    (40, 24, 24, 1280),
    (40, 12, 12, 1280),
    (20, 192, 192, 512),
    (20, 384, 384, 256),
    (20, 768, 768, 128),
]


def device_time_per_iter(fn, x, iters):
    """Total pid-3 device time per iteration of the chained program."""
    run = jax.jit(fn)
    y = run(x)
    np.asarray(jax.device_get(y)).ravel()[0]  # force compile+execute
    trace_dir = "/tmp/convtrace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            x = run(x)
        np.asarray(jax.device_get(x)).ravel()[0]
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    tot = sum(
        e.get("dur", 0)
        for e in data["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3
        and not e["name"].startswith("jit_")
    )
    return tot / 1e6 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.ops import conv as pc

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    for (B, H, W, C) in SHAPES:
        x = jax.random.normal(key, (B, H, W, C), dt)
        w = (jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.02).astype(dt)
        b = jnp.zeros((C,), dt)
        flops = 2.0 * 9 * B * H * W * C * C
        def rep(tag, s):
            tf = flops / s / 1e12
            print(f"  {tag:7s} {s*1e3:8.2f} ms  {tf:6.1f} TF/s ({100*tf/PEAK_TFLOPS:4.1f}% MFU)")
        if not pc.supports(x.shape, w.shape, 1, [(1, 1), (1, 1)], dt):
            print(f"[{B},{H},{W},{C}] pallas unsupported (XLA fallback)")
            rep("xla", device_time_per_iter(lambda x: pc._xla_conv(x, w, b), x, args.iters))
            continue
        plan = pc._plan(x.shape, w.shape, 2)
        secs_x = device_time_per_iter(lambda x: pc._xla_conv(x, w, b), x, args.iters)
        secs_p = device_time_per_iter(lambda x: pc.conv3x3(x, w, b), x, args.iters)
        print(f"[{B},{H},{W},{C}] plan TH={plan[0]} BK={plan[1]}")
        rep("xla", secs_x)
        rep("pallas", secs_p)


if __name__ == "__main__":
    main()
