"""Head-to-head attention implementations on the real TPU at the SD2 UNet
level-0 shape (bs20: [B=20, H=5, N=9216, d=64], bf16)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 4


def timeit(name, fn, *args, iters=3, useful_flops=None):
    f = jax.jit(fn)
    try:
        out = f(*args)
        _ = np.asarray(jax.device_get(out)).ravel()[0]
    except Exception as e:
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        _ = np.asarray(jax.device_get(out)).ravel()[0]
    dt = (time.perf_counter() - t0) / iters / REPS
    tfs = (useful_flops / dt / 1e12) if useful_flops else 0
    print(f"{name:36s} {dt*1e3:8.2f} ms/call   {tfs:6.1f} TF/s useful")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.ops.flash_attention import flash_attention as ours

    B, H, N, D = 20, 5, 9216, 64
    key = jax.random.PRNGKey(0)
    q4 = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    useful = 4 * B * H * N * N * D

    def chain4(fn):
        def run(q):
            def body(i, acc):
                o = fn(acc)
                return (o * 0.997).astype(acc.dtype)
            return jax.lax.fori_loop(0, REPS, body, q)
        return run

    # ---- ours ([BH, N, D] layout) ----
    def ours_call(x):
        bh = B * H
        xf = x.reshape(bh, N, D)
        return ours(xf, xf, xf).reshape(B, H, N, D)

    timeit("ours pad-128 (bq256,bk512)", chain4(ours_call), q4, useful_flops=useful)

    # ---- official jax pallas TPU flash ----
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as official, BlockSizes,
    )

    for (bq, bkM, bk) in [(256, 512, 512), (512, 1024, 512), (1024, 1536, 512)]:
        bs = BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk, block_b=1)

        def official_call(x, bs=bs):
            return official(x, x, x, sm_scale=1.0 / np.sqrt(D), block_sizes=bs)

        timeit(f"official flash (bq{bq},bkM{bkM},bk{bk})",
               chain4(official_call), q4, useful_flops=useful)

    # ---- chunked XLA attention ----
    for chunk in (1024, 2304):
        def xla_chunked(x, chunk=chunk):
            bh = B * H
            xf = x.reshape(bh, N, D)
            scale = 1.0 / np.sqrt(D)
            qc = xf.reshape(bh, N // chunk, chunk, D).transpose(1, 0, 2, 3)

            def one(qb):
                s = jnp.einsum("bqd,bkd->bqk", qb, xf,
                               preferred_element_type=jnp.float32) * scale
                p = jax.nn.softmax(s, axis=-1).astype(xf.dtype)
                return jnp.einsum("bqk,bkd->bqd", p, xf,
                                  preferred_element_type=jnp.float32)

            o = jax.lax.map(one, qc)  # [nc, bh, chunk, D]
            return (o.transpose(1, 0, 2, 3).reshape(B, H, N, D)).astype(x.dtype)

        timeit(f"xla chunked (chunk={chunk})", chain4(xla_chunked), q4,
               useful_flops=useful)


if __name__ == "__main__":
    main()
