"""Spatially-sharded self-attention over a device mesh.

The reference has no sequence dimension worth scaling (SURVEY.md §5:
"long-context N/A — max ~9216 latent tokens at 768px"). Above ~1k-px
processing resolution, though, a single image's self-attention grows
quadratically (2048px -> 65k tokens -> ~4.3e9-entry score matrices per
head) and a single chip runs out of both FLOPs and HBM. This module is the
TPU-native long-context design with no reference counterpart:

  * the TOKEN axis shards over the mesh's `data` axis (the same axis the
    ensemble/batch shards over — an image too large for one chip is
    processed with E=1, so the axis is free);
  * K/V are all-gathered once per attention (one ICI collective of
    O(N*D) bytes — tiny next to the O(N^2) score work it unlocks);
  * each device runs the local flash kernel over its query slice —
    compute and softmax state never materialize across shards.

This is the blockwise/ring-attention family's simplest member (gather-KV
rather than ring-pass), which is optimal when N*D per image fits HBM —
true far past 4k px for SD2's latent attention.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharded_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mesh: Mesh,
    axis_name: str = "data",
    use_flash: bool = True,
) -> jax.Array:
    """Multi-head attention with the token axis sharded over the mesh.

    q/k/v: [B, N, C] with N divisible by the mesh axis size (callers pad —
    the latent token count at bucket-padded resolutions is a multiple of
    large powers of two). Returns [B, N, C] sharded like q.

    use_flash=False routes the per-shard computation through the XLA path
    (needed on CPU test meshes where Pallas requires interpret mode).
    """
    n_dev = mesh.shape[axis_name]
    b, n, c = q.shape
    if n % n_dev:
        raise ValueError(f"token count {n} must divide mesh size {n_dev}")

    runner = _get_runner(mesh, axis_name, num_heads, use_flash)
    with mesh:
        return runner(q, k, v)


_RUNNER_CACHE: dict = {}


def _get_runner(mesh, axis_name, num_heads, use_flash):
    """One jitted program per (mesh, heads, impl) — NOT per call; shapes
    are handled by jit's own cache."""
    key = (mesh, axis_name, num_heads, use_flash)
    if key in _RUNNER_CACHE:
        return _RUNNER_CACHE[key]

    def local_attn(q_shard, k_full, v_full):
        b, _, c = q_shard.shape
        # q_shard: [B, N/n_dev, C]; k/v_full: [B, N, C] (replicated)
        if use_flash:
            from marigold_tpu.ops.flash_attention import flash_attention_dt

            hd = c // num_heads
            nq = q_shard.shape[1]
            nk = k_full.shape[1]

            def fold_t(x, nn):
                return (
                    x.reshape(b, nn, num_heads, hd)
                    .transpose(0, 2, 3, 1)
                    .reshape(b * num_heads, hd, nn)
                )

            out_t = flash_attention_dt(
                fold_t(q_shard, nq), fold_t(k_full, nk), fold_t(v_full, nk)
            )
            return (
                out_t.reshape(b, num_heads, hd, nq)
                .transpose(0, 3, 1, 2)
                .reshape(b, nq, c)
            )
        from marigold_tpu.ops.attention import xla_attention

        return xla_attention(q_shard, k_full, v_full, num_heads)

    shard = NamedSharding(mesh, P(None, axis_name, None))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=shard)
    def run(q, k, v):
        q = jax.lax.with_sharding_constraint(q, shard)
        # ONE all-gather each for K and V (XLA inserts it from the
        # replicated constraint); scores/softmax stay shard-local
        k = jax.lax.with_sharding_constraint(k, repl)
        v = jax.lax.with_sharding_constraint(v, repl)
        out = jax.shard_map(
            local_attn,
            mesh=mesh,
            in_specs=(P(None, axis_name, None), P(), P()),
            out_specs=P(None, axis_name, None),
            # the Pallas flash kernel's out shape carries no vma annotation
            check_vma=False,
        )(q, k, v)
        return out

    _RUNNER_CACHE[key] = run
    return run
