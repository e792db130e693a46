"""Per-op microbenchmark of the UNet/VAE hot path on the real TPU.

Chains iterations through a data dependency (x_{i+1} = f(x_i)) so async
dispatch over the device tunnel cannot overlap or elide work, and uses the
compiled program's own cost_analysis() FLOP count for MFU.

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


def bench_chained(fn, x0, *extra, iters=20, warmup=3):
    """fn(x, *extra) -> array with same shape as x. Returns s/iter."""
    lowered = jax.jit(fn).lower(x0, *extra)
    compiled = lowered.compile()
    flops = compiled.cost_analysis().get("flops", 0.0)
    def sync(a):
        # force full execution + readback of one element (block_until_ready
        # over the device tunnel has been observed to return early for
        # small programs)
        return np.asarray(jax.device_get(a)).ravel()[0]

    x = x0
    for _ in range(warmup):
        x = compiled(x, *extra)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = compiled(x, *extra)
    sync(x)
    dt = (time.perf_counter() - t0) / iters
    return dt, flops


def report(name, secs, flops):
    tf = flops / secs / 1e12
    print(f"{name:44s} {secs*1e3:9.2f} ms  {tf:7.1f} TF/s  ({100*tf/PEAK_TFLOPS:5.1f}% MFU)  [{flops/1e9:.1f} GF]")


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
    from marigold_tpu.models.unet import _resnet, _init_resnet, _transformer, _init_cross_attn_xf

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    print(f"== conv2d 3x3, chained (bs={B}) ==")
    for (h, w, c) in [(96, 96, 320), (48, 48, 640), (24, 24, 1280), (12, 12, 1280)]:
        x = jax.random.normal(key, (B, h, w, c), dtype)
        p = L.init_conv(key, c, c, 3, dtype)
        secs, flops = bench_chained(lambda x, p: L.conv2d(p, x), x, p)
        report(f"conv3x3 {h}x{w}x{c}", secs, flops)

    print(f"== GroupNorm+SiLU chained (bs={B}) ==")
    for (h, w, c) in [(96, 96, 320), (48, 48, 640)]:
        x = jax.random.normal(key, (B, h, w, c), dtype)
        p = L.init_norm(c, dtype)
        secs, flops = bench_chained(lambda x, p: L.group_norm(p, x, 32, act="silu"), x, p)
        gbytes = 2 * (B * h * w * c * 2) / 1e9
        print(f"{'gn_silu %dx%dx%d' % (h, w, c):44s} {secs*1e3:9.2f} ms  ~{gbytes/secs:6.0f} GB/s eff bw")

    print(f"== resnet block chained (bs={B}) ==")
    temb = jax.random.normal(key, (B, 1280), dtype)
    for (h, w, c) in [(96, 96, 320), (48, 48, 640)]:
        rp = _init_resnet(key, c, c, 1280, dtype)
        x = jax.random.normal(key, (B, h, w, c), dtype)
        secs, flops = bench_chained(lambda x, p, t: _resnet(p, x, t, 32), x, rp, temb)
        report(f"resnet({c})@{h}", secs, flops)

    print(f"== transformer block chained, ctx len 2 (bs={B}) ==")
    for (h, w, c, heads) in [(96, 96, 320, 5), (48, 48, 640, 10)]:
        tp = _init_cross_attn_xf(key, c, heads, 1024, dtype)
        ctx = jax.random.normal(key, (B, 2, 1024), dtype)
        x = jax.random.normal(key, (B, h, w, c), dtype)
        secs, flops = bench_chained(
            lambda x, p, cx: _transformer(p, x, cx, heads, 32), x, tp, ctx
        )
        report(f"transformer@{h} ({heads} heads)", secs, flops)

    print(f"== full UNet forward chained (bs={B}, 96x96) ==")
    cfg = unet_lib.UNetConfig()
    params = unet_lib.init_params(jax.random.PRNGKey(1), cfg, dtype=dtype)
    t = jnp.asarray(999)
    emb = jax.random.normal(key, (1, 2, 1024), dtype)
    x = jax.random.normal(key, (B, 96, 96, 8), dtype)

    def unet_chain(x, params, t, emb):
        out = unet_lib.apply(params, cfg, x, t, emb)  # [B,96,96,4]
        return jnp.concatenate([out, out], axis=-1)

    secs, flops = bench_chained(unet_chain, x, params, t, emb, iters=6, warmup=2)
    report("unet fwd", secs, flops)

    print(f"== VAE decode chained (bs={B}) ==")
    vcfg = vae_lib.VAEConfig()
    vparams = vae_lib.init_params(jax.random.PRNGKey(2), vcfg, dtype=dtype)
    z = jax.random.normal(key, (B, 96, 96, 4), dtype)

    def dec_chain(z, vparams):
        img = vae_lib.decode_scaled(vparams, vcfg, z)  # [B,768,768,3]
        # pool back to latent shape to close the chain
        pooled = img[:, ::8, ::8, :]
        return jnp.concatenate([pooled, pooled[..., :1]], axis=-1)

    secs, flops = bench_chained(dec_chain, z, vparams, iters=4, warmup=2)
    report("vae decode", secs, flops)

    print(f"== VAE encode chained (bs=2) ==")
    rgb = jax.random.normal(key, (2, 768, 768, 3), dtype)

    def enc_chain(rgb, vparams):
        lat = vae_lib.encode_mean_scaled(vparams, vcfg, rgb)
        up = jnp.repeat(jnp.repeat(lat, 8, 1), 8, 2)
        return jnp.concatenate([up, up[..., :1] * 0 - 1], axis=-1)[..., :3]

    secs, flops = bench_chained(enc_chain, rgb, vparams, iters=4, warmup=2)
    report("vae encode (bs=2)", secs, flops)


if __name__ == "__main__":
    main()
