"""Per-op microbenchmark of the UNet/VAE hot path on the real TPU.

Times isolated pieces (conv at each pyramid level, resnet block, GroupNorm,
transformer block, full UNet forward, VAE decode) and reports achieved
TFLOP/s vs the v5e bf16 peak (~197 TF/s) to localize the MFU floor.

Usage:  python scripts/profile_unet.py [--bs 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, secs, flops):
    tf = flops / secs / 1e12
    print(f"{name:42s} {secs*1e3:9.2f} ms  {tf:7.1f} TF/s  ({100*tf/PEAK_TFLOPS:5.1f}% MFU)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=20)
    args = ap.parse_args()
    B = args.bs

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.models import layers as L
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    print(f"== conv2d 3x3 at UNet pyramid levels (bs={B}) ==")
    for (h, w, c) in [(96, 96, 320), (48, 48, 640), (24, 24, 1280), (12, 12, 1280)]:
        x = jax.random.normal(key, (B, h, w, c), dtype)
        p = L.init_conv(key, c, c, 3, dtype)
        f = jax.jit(lambda p, x: L.conv2d(p, x))
        secs = timed(f, p, x)
        flops = 2 * B * h * w * 9 * c * c
        report(f"conv3x3 {h}x{w}x{c}", secs, flops)

    print(f"== GroupNorm+SiLU (bs={B}) ==")
    for (h, w, c) in [(96, 96, 320), (48, 48, 640)]:
        x = jax.random.normal(key, (B, h, w, c), dtype)
        p = L.init_norm(c, dtype)
        f = jax.jit(lambda p, x: L.group_norm(p, x, 32, act="silu"))
        secs = timed(f, p, x)
        gb = (2 * B * h * w * c * 2) / 1e9  # ~2 passes read + 1 write, bf16
        print(f"{'gn_silu %dx%dx%d' % (h, w, c):42s} {secs*1e3:9.2f} ms  ~{gb/secs:6.0f} GB/s eff bw")

    print(f"== resnet block 96x96x320 (bs={B}) ==")
    temb = jax.random.normal(key, (B, 1280), dtype)
    from marigold_tpu.models.unet import _resnet, _init_resnet, _transformer, _init_cross_attn_xf
    rp = _init_resnet(key, 320, 320, 1280, dtype)
    x = jax.random.normal(key, (B, 96, 96, 320), dtype)
    f = jax.jit(lambda p, x, t: _resnet(p, x, t, 32))
    secs = timed(f, rp, x, temb)
    flops = 2 * B * 96 * 96 * 9 * 320 * 320 * 2  # two 3x3 convs
    report("resnet(320->320)@96", secs, flops)

    print(f"== transformer block 96x96x320, ctx len 2 (bs={B}) ==")
    tp = _init_cross_attn_xf(key, 320, 5, 1024, dtype)
    ctx = jax.random.normal(key, (B, 2, 1024), dtype)
    f = jax.jit(lambda p, x, c: _transformer(p, x, c, 5, 32))
    secs = timed(f, tp, x, ctx)
    n = 96 * 96
    flops = 2 * B * n * (320 * 320 * 4           # self qkv+out
                         + 320 * 320 * 2         # attn matmuls ~ n*d per tok x2
                         ) + 2 * B * n * (320 * 8 * 320 + 320 * 4 * 320)  # GEGLU ff
    flops += 2 * B * n * n * 320 * 2  # attention score+value matmuls
    report("transformer@96 (5 heads)", secs, flops)

    print(f"== full UNet forward (bs={B}, 96x96 latents) ==")
    cfg = unet_lib.UNetConfig()
    params = unet_lib.init_params(jax.random.PRNGKey(1), cfg, dtype=dtype)
    xs = jax.random.normal(key, (B, 96, 96, 8), dtype)
    t = jnp.asarray(999)
    emb = jax.random.normal(key, (1, 2, 1024), dtype)
    f = jax.jit(lambda p, x, t, e: unet_lib.apply(p, cfg, x, t, e))
    secs = timed(f, params, xs, t, emb, iters=4)
    # rough per-sample flops estimate at 96x96: ~1.5 TF
    report("unet fwd (est 1.5 TF/sample)", secs, 1.5e12 * B)

    print(f"== VAE decode (bs={B}, 96x96x4 -> 768x768x3) ==")
    vcfg = vae_lib.VAEConfig()
    vparams = vae_lib.init_params(jax.random.PRNGKey(2), vcfg, dtype=dtype)
    z = jax.random.normal(key, (B, 96, 96, 4), dtype)
    f = jax.jit(lambda p, z: vae_lib.decode_scaled(p, vcfg, z))
    secs = timed(f, vparams, z, iters=2)
    report("vae decode (est 2.5 TF/sample)", secs, 2.5e12 * B)


if __name__ == "__main__":
    main()
