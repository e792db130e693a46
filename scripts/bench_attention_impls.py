"""Head-to-head attention implementations on the real TPU at the SD2 UNet
level-0 shape (bs20: [B=20, H=5, N=9216, d=64], bf16).

Wall-clock through the device tunnel is dominated by readback (~50 MB/s),
so timings come from the device trace (jax.profiler), keyed by op name.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("ATTN_BENCH_B", "20"))
H, N, D = 5, 9216, 64
USEFUL = 4 * B * H * N * N * D


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.ops.flash_attention import (
        flash_attention as ours,
        flash_attention_dt,
    )

    key = jax.random.PRNGKey(0)
    q4 = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)

    impls = {}

    def ours_call(x):
        bh = B * H
        xf = x.reshape(bh, N, D)
        return ours(xf, xf, xf).reshape(B, H, N, D)

    impls["ours_pad128"] = jax.jit(ours_call)

    def make_dt(bq, bk, softmax="online"):
        def dt_call(x):
            bh = B * H
            # [B,H,N,D] -> [BH, D, N] (the production wrapper transposes
            # straight from the [B,N,C] projection output)
            xt = x.reshape(bh, N, D).transpose(0, 2, 1)
            ot = flash_attention_dt(
                xt, xt, xt, block_q=bq, block_k=bk, softmax=softmax
            )
            return ot.transpose(0, 2, 1).reshape(B, H, N, D)

        dt_call.__name__ = f"dt_q{bq}_k{bk}_{softmax}"
        dt_call.__qualname__ = dt_call.__name__
        return jax.jit(dt_call)

    for (bq, bk) in [(512, 512), (1024, 512), (1024, 1024), (2048, 512),
                     (512, 2304), (2304, 512)]:
        impls[f"ours_dt_q{bq}k{bk}"] = make_dt(bq, bk)
    # shifted softmax (the serving default): no online max / rescale
    for (bq, bk) in [(2304, 512), (2304, 1024), (2304, 768), (2304, 1152),
                     (2304, 1536)]:
        impls[f"ours_dtS_q{bq}k{bk}"] = make_dt(bq, bk, softmax="shifted")

    # warm up (compile) everything
    outs = {}
    for name, f in impls.items():
        try:
            outs[name] = f(q4)
            outs[name].block_until_ready()
            print(f"compiled {name}")
        except Exception as e:
            print(f"{name} FAILED compile: {type(e).__name__}: {str(e)[:160]}")
            impls[name] = None

    trace_dir = "/tmp/attntrace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for name, f in impls.items():
            if f is None:
                continue
            for _ in range(3):
                o = f(q4)
        o.block_until_ready()
        _ = np.asarray(jax.device_get(o[0, 0, 0, :2]))

    # parse newest trace
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == 3]
    agg, cnt = collections.Counter(), collections.Counter()
    for e in events:
        name = re.sub(r"[.\d]+$", "", e["name"])
        agg[name] += e.get("dur", 0)
        cnt[name] += 1
    print("\ndevice op totals over the whole trace (3 calls each):")
    for nm, dur in agg.most_common(15):
        print(f"  {dur/1e3:9.2f} ms x{cnt[nm]:3d}  {nm}")
    print(f"\nuseful attention FLOPs per call: {USEFUL/1e12:.2f} TF")


if __name__ == "__main__":
    main()
