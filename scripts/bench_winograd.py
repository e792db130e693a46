"""A/B the Winograd F(2x2,3x3) Pallas conv vs the XLA emitter and the
nine-tap Pallas kernel on the real TPU, by device trace (wall clocks
through the tunnel are unreliable — docs/PERFORMANCE.md methodology).

MFU is reported in *direct-conv* FLOPs: Winograd does 2.25x fewer MXU
multiplies, so its effective MFU can exceed the emitter's ceiling.

Usage: python scripts/bench_winograd.py [--iters 12]
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

PEAK_TFLOPS = 197.0  # v5e bf16

# VAE decoder levels at the 20-row decode chunk, plus the UNet levels with
# 128-multiple channels at the NI=4 serving batch. (B, H, W, C, K):
# 384x384x512->256 is the up-block-2 transition conv the BK-fallback
# planner newly covers (BK=128).
SHAPES = [
    (20, 192, 192, 512, 512),
    (20, 384, 384, 512, 256),
    (20, 384, 384, 256, 256),
    (20, 768, 768, 128, 128),
    (40, 48, 48, 640, 640),
    (40, 24, 24, 1280, 1280),
]


def device_time_per_iter(fn, x, iters):
    run = jax.jit(fn)
    run(x).block_until_ready()  # compile (never device_get: multi-GB
    trace_dir = "/tmp/winotrace"  # arrays crawl through the tunnel)
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(iters):
            out = run(x)  # no chaining: K may differ from C
        out.block_until_ready()
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
    from marigold_tpu.ops import winograd as wg

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    for (B, H, W, C, K) in SHAPES:
        x = jax.random.normal(key, (B, H, W, C), dt)
        w = (jax.random.normal(key, (3, 3, C, K), jnp.float32) * 0.02).astype(dt)
        b = jnp.zeros((K,), dt)
        flops = 2.0 * 9 * B * H * W * C * K

        def rep(tag, s):
            tf = flops / s / 1e12
            print(f"  {tag:9s} {s*1e3:8.2f} ms  {tf:6.1f} TF/s ({100*tf/PEAK_TFLOPS:5.1f}% dMFU)", flush=True)

        secs_x = device_time_per_iter(lambda x: pc._xla_conv(x, w, b), x, args.iters)
        print(f"[{B},{H},{W},{C}->{K}]", flush=True)
        rep("xla", secs_x)
        if pc.supports(x.shape, w.shape, 1, [(1, 1), (1, 1)], dt):
            rep("ninetap", device_time_per_iter(lambda x: pc.conv3x3(x, w, b), x, args.iters))
        if wg.supports(x.shape, w.shape, 1, [(1, 1), (1, 1)], dt):
            t, bk = wg._plan(x.shape, w.shape, 2)
            print(f"  wino plan T={t} BK={bk}", flush=True)
            rep("winograd", device_time_per_iter(lambda x: wg.winograd3x3(x, w, b), x, args.iters))
        else:
            print("  winograd unsupported", flush=True)


if __name__ == "__main__":
    main()
