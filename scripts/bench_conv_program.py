"""In-program A/B of the conv implementation: full UNet forward and VAE
decode, traced on the real TPU. The isolated-op A/B
(bench_conv_kernel.py) cannot settle the question — the XLA conv emitter
loses ~30% to program-level layout assignment inside the fused programs
(docs/PERFORMANCE.md), so the kernel must be judged inside the program.

Usage: MARIGOLD_TPU_CONV=pallas|xla python scripts/bench_conv_program.py
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def device_time_per_iter(fn, x, *extra, iters=6):
    run = jax.jit(fn)
    y = run(x, *extra)
    np.asarray(jax.device_get(y)).ravel()[0]
    trace_dir = "/tmp/convprogtrace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            x = run(x, *extra)
        np.asarray(jax.device_get(x)).ravel()[0]
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    evs = [e for e in data["traceEvents"] if e.get("ph") == "X" and e.get("pid") == 3]
    tot = sum(e.get("dur", 0) for e in evs if not e["name"].startswith("jit_"))
    import collections, re
    agg = collections.Counter()
    for e in evs:
        if e["name"].startswith("jit_"):
            continue
        agg[re.sub(r"[.\d]+$", "", e["name"])] += e.get("dur", 0)
    return tot / 1e6 / iters, {k: v / 1e6 / iters for k, v in agg.most_common(12)}


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib

    # label must mirror the dispatch default in models/layers.py ("xla"):
    # an unlabeled run routes through the XLA emitter and must say so
    impl = os.environ.get("MARIGOLD_TPU_CONV", "xla")
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    cfg = unet_lib.UNetConfig()
    params = unet_lib.init_params(jax.random.PRNGKey(1), cfg, dtype=dtype)
    t = jnp.asarray(999)
    emb = jax.random.normal(key, (1, 2, 1024), dtype)
    x = jax.random.normal(key, (40, 96, 96, 8), dtype)

    def unet_chain(x, params, t, emb):
        out = unet_lib.apply(params, cfg, x, t, emb)
        return jnp.concatenate([out, out], axis=-1)

    secs, top = device_time_per_iter(unet_chain, x, params, t, emb)
    print(f"[{impl}] unet fwd bs40:   {secs*1e3:8.2f} ms/iter")
    for k, v in top.items():
        print(f"    {v*1e3:8.2f} ms  {k}")

    vcfg = vae_lib.VAEConfig()
    vparams = vae_lib.init_params(jax.random.PRNGKey(2), vcfg, dtype=dtype)
    z = jax.random.normal(key, (20, 96, 96, 4), dtype)

    def dec_chain(z, vparams):
        img = vae_lib.decode_scaled(vparams, vcfg, z)
        pooled = img[:, ::8, ::8, :]
        return jnp.concatenate([pooled, pooled[..., :1]], axis=-1)

    secs, top = device_time_per_iter(dec_chain, z, vparams, iters=4)
    print(f"[{impl}] vae decode bs20: {secs*1e3:8.2f} ms/iter")
    for k, v in top.items():
        print(f"    {v*1e3:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
