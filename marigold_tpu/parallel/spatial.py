"""Spatially-sharded UNet forward: one image's latent H axis over the mesh.

The batch-sharded serving path (pipelines/base.py) covers the reference's
workloads — E ensemble members parallelize embarrassingly. Above ~1k-px
processing resolution with small E, though, a single trajectory's compute
and activations outgrow one chip: at 2048 px the level-0 self-attention is
65k tokens and the UNet activations alone approach the HBM ceiling. This
module is SURVEY.md §5's "spatial-shard the latent across chips" design —
sequence/context parallelism for a 2-D latent, with no reference
counterpart (the reference is single-GPU; SURVEY.md §2.6).

Design (all communication rides ICI, inserted explicitly inside
`jax.shard_map`):

  * the latent H dimension shards over the mesh axis; every conv, norm,
    matmul, and attention runs on [B, H/n, W, C] blocks;
  * 3x3 convs exchange ONE boundary row with each neighbor per call
    (`lax.ppermute`, O(B*W*C) bytes — models/layers.py:conv2d);
  * GroupNorm psums its fp32 statistics (two scalars per group —
    models/layers.py:group_norm);
  * self-attention all-gathers K/V once per layer and runs the local
    (flash) kernel over the query shard (ops/attention.py), the gather-KV
    member of the blockwise-attention family — optimal while N*D fits
    HBM, true far past 4k px for SD2's d=64 heads;
  * cross-attention, GEGLU, projections, and the time embedding are
    token-local: zero communication.

The sharded program is numerically equivalent to the single-device forward
(halo rows reproduce zero padding exactly; GN statistics are the same sums
reassociated) — asserted to tolerance in tests/test_mesh.py.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marigold_tpu.models import unet as unet_lib


def check_spatial_divisibility(h: int, mesh: Mesh, axis_name: str = "data",
                               n_levels: int = 4) -> None:
    """The latent H must split evenly at every UNet level: three stride-2
    downsamples (n_levels=4) need H divisible by 8, and the shard-local H
    must stay even through them, i.e. H divisible by 8 * mesh size. The
    shape-bucketing layer pads processing resolutions to satisfy this
    (64 * n px buckets at the input)."""
    n = mesh.shape[axis_name]
    need = (1 << (n_levels - 1)) * n
    if h % need:
        raise ValueError(
            f"spatial sharding over {n} devices needs latent H divisible "
            f"by {need}, got {h} (pad the input to a multiple of "
            f"{8 * need} px)"
        )


_PROGRAM_CACHE: dict = {}


def spatial_unet_apply(
    params: dict,
    cfg: unet_lib.UNetConfig,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
) -> jax.Array:
    """UNet forward with the H axis of ``sample`` sharded over ``mesh``.

    Drop-in for unet_lib.apply on oversized inputs; params replicate
    (weights are small next to >1k-px activations). Jitted once per
    (mesh, cfg); shapes go through jit's own cache.
    """
    check_spatial_divisibility(
        sample.shape[1], mesh, axis_name,
        n_levels=len(cfg.block_out_channels),
    )
    run = _get_program(mesh, axis_name, cfg)
    return run(params, sample, timesteps, encoder_hidden_states)


def _get_program(mesh: Mesh, axis_name: str, cfg: unet_lib.UNetConfig):
    key = (mesh, axis_name, cfg)
    if key in _PROGRAM_CACHE:
        return _PROGRAM_CACHE[key]

    x_spec = P(None, axis_name, None, None)
    x_shard = NamedSharding(mesh, x_spec)
    repl = NamedSharding(mesh, P())

    def local_fwd(params, sample_l, timesteps, ctx):
        return unet_lib.apply(
            params, cfg, sample_l, timesteps, ctx, spatial_axis=axis_name
        )

    @partial(jax.jit, out_shardings=x_shard)
    def run(params, sample, timesteps, ctx):
        sample = jax.lax.with_sharding_constraint(sample, x_shard)
        params = jax.lax.with_sharding_constraint(params, repl)
        return jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), x_spec, P(), P()),
            out_specs=x_spec,
            # Pallas kernels (flash attention) inside the body don't carry
            # varying-across-mesh annotations on their out shapes
            check_vma=False,
        )(params, sample, timesteps, ctx)

    _PROGRAM_CACHE[key] = run
    return run
