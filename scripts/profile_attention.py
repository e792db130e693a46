"""Isolate the UNet's attention cost on the real TPU.

Strategy: wrap K repetitions inside ONE jitted program (chained through a
data dependency) so per-dispatch tunnel latency amortizes away, and compare
UNet forwards with real attention vs attention stubbed to identity.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def timed_program(fn, *args, iters=3):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.ops import attention as attn_mod
    from marigold_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    B = 20

    # ---- flash kernel alone at the level-0 shape: [B*H, N, D] ----
    for (bh, n, d4) in [(B * 5, 9216, 64), (B * 10, 2304, 64)]:
        q = jax.random.normal(key, (bh, n, d4), dtype)

        def chain(q):
            def body(i, acc):
                o = flash_attention(acc, acc, acc)
                return o + 1e-6 * i  # break trivial reuse
            return jax.lax.fori_loop(0, REPS, body, q)

        secs = timed_program(chain, q) / REPS
        flops = 4 * bh * n * n * d4  # QK^T + PV
        print(f"flash [{bh},{n},{d4}]: {secs*1e3:8.2f} ms  "
              f"{flops/secs/1e12:6.1f} TF/s useful")

    # ---- full UNet: real vs identity attention ----
    cfg = unet_lib.UNetConfig()
    params = unet_lib.init_params(jax.random.PRNGKey(1), cfg, dtype=dtype)
    x = jax.random.normal(key, (B, 96, 96, 8), dtype)
    t = jnp.asarray(999)
    emb = jax.random.normal(key, (1, 2, 1024), dtype)

    def unet_chain(x, params, t, emb):
        def body(i, acc):
            out = unet_lib.apply(params, cfg, acc, t, emb)
            return jnp.concatenate([out, out], axis=-1)
        return jax.lax.fori_loop(0, 4, body, x)

    secs = timed_program(unet_chain, x, params, t, emb) / 4
    print(f"unet fwd (real attn):     {secs*1e3:8.2f} ms")

    real_sdpa = attn_mod.scaled_dot_product_attention

    def identity_sdpa(q, k, v, num_heads, mask=None):
        if k.shape[1] == q.shape[1]:  # self-attention only
            return q
        return real_sdpa(q, k, v, num_heads, mask)

    attn_mod.scaled_dot_product_attention = identity_sdpa
    unet_lib.scaled_dot_product_attention = identity_sdpa
    try:
        secs2 = timed_program(unet_chain, x, params, t, emb) / 4
    finally:
        attn_mod.scaled_dot_product_attention = real_sdpa
        unet_lib.scaled_dot_product_attention = real_sdpa
    print(f"unet fwd (identity self-attn): {secs2*1e3:8.2f} ms")
    print(f"=> self-attention share: {(secs-secs2)*1e3:.0f} ms "
          f"({100*(secs-secs2)/secs:.0f}%)")


if __name__ == "__main__":
    main()
