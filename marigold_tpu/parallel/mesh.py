"""Device-mesh & sharding layer.

The reference has NO distributed code (SURVEY.md §2.6): one GPU, ensemble
members chunked into batches. The TPU-native design scales the same
semantics over chips:

  * inference: the ensemble/batch axis shards over a 1-D `data` mesh axis
    riding ICI — E independent denoise trajectories are embarrassingly
    parallel, so XLA inserts zero collectives in the UNet loop and one
    all-gather before the ensemble reduction.
  * training: pjit data-parallel — same `data` axis, psum gradient
    all-reduce inserted by XLA from the sharding annotations.

Everything is expressed through `jax.sharding.NamedSharding` annotations on
jitted functions; no explicit collectives in model code.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over (the first n) local devices.

    Raises if fewer than ``n_devices`` are available: silently truncating
    produced an under-sized mesh on 1-device platforms, which then failed
    far from the cause (wrong shardings, divisibility asserts downstream).
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"get_mesh({n_devices}) but only {len(devs)} JAX device(s) "
                f"are available on platform {devs[0].platform!r}. For CPU "
                "testing, force the platform and device count before first "
                "backend use (see marigold_tpu.parallel.mesh.force_cpu_devices)."
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def force_cpu_devices(n_devices: int) -> None:
    """Force JAX onto the CPU platform with ``n_devices`` virtual devices.

    Works even when another platform plugin (e.g. a TPU tunnel) registered
    itself via sitecustomize: env vars like JAX_PLATFORMS are ignored once
    that happens, so we update jax.config directly and, if a backend was
    already initialized with the wrong platform or device count, discard it
    so the next backend touch re-initializes with the new settings.
    """
    import os

    flag = f"--xla_force_host_platform_device_count={n_devices}"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if flag not in xla_flags:
        os.environ["XLA_FLAGS"] = f"{xla_flags} {flag}".strip()

    def _apply_config():
        jax.config.update("jax_platforms", "cpu")
        try:
            # raises if a backend is already initialized; re-applied below
            # after clear_backends in that case
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass

    _apply_config()
    devs = jax.devices()
    if devs[0].platform != "cpu" or len(devs) < n_devices:
        # a backend already came up wrong — drop it and re-initialize
        try:
            import jax.extend.backend as _eb

            _eb.clear_backends()
        except Exception:
            from jax._src import xla_bridge as _xb

            _xb._clear_backends()  # type: ignore[attr-defined]
        _apply_config()
        devs = jax.devices()
    if devs[0].platform != "cpu" or len(devs) < n_devices:
        raise RuntimeError(
            f"could not force {n_devices} CPU devices: got {len(devs)} "
            f"device(s) on platform {devs[0].platform!r}"
        )


def data_parallel_sharding(mesh: Mesh, ndim: int, axis_name: str = "data"):
    """NamedSharding that splits the leading (batch/ensemble) dim."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicate(mesh: Mesh, x):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(
        x, NamedSharding(mesh, P())
    )


def shard_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Shard array(s) along the leading dim. Pads semantics are the
    caller's responsibility (leading dim should divide the axis size)."""
    def put(a):
        return jax.device_put(a, data_parallel_sharding(mesh, a.ndim, axis_name))

    return jax.tree_util.tree_map(put, x)


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host entry: initialize jax.distributed (single program per
    host; chips within a host talk over ICI, hosts over DCN).

    With no arguments, first honors the MARIGOLD_TPU_COORDINATOR /
    MARIGOLD_TPU_NUM_PROCESSES / MARIGOLD_TPU_PROCESS_ID environment
    variables (manual launches without a scheduler, torchrun-style),
    then relies on the cluster environment (TPU pod metadata / Slurm)
    for auto-detection, as jax.distributed.initialize does. No-op when
    already initialized or on a single process where auto-detection
    finds nothing. Returns jax.process_count().

    Design note (SURVEY.md §2.6): the `data` mesh axis simply spans all
    global devices — XLA lowers the gradient psum hierarchically
    (reduce-scatter/all-gather over ICI within a host, then the
    cross-host hop over DCN), so no topology-aware code is needed here
    for data parallelism. ZeRO-1 state sharding composes unchanged: each
    process holds only its addressable shards of the optimizer state.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("MARIGOLD_TPU_COORDINATOR")
    if num_processes is None and "MARIGOLD_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MARIGOLD_TPU_NUM_PROCESSES"])
    if process_id is None and "MARIGOLD_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MARIGOLD_TPU_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already initialized, or single-process with nothing to detect
        if "already" not in str(e).lower():
            raise
    return jax.process_count()


def global_batch_from_local(mesh: Mesh, local_batch, axis_name: str = "data"):
    """Assemble a globally-sharded batch from per-process local data.

    Single-process: identical to shard_batch. Multi-host: each process
    passes its LOCAL slice of the global batch (global batch size =
    local size x process_count, concatenated in process order); the
    returned jax.Arrays are globally addressable for pjit without any
    host gathering the full batch.
    """
    import jax

    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch, axis_name)

    def put(a):
        sharding = data_parallel_sharding(mesh, a.ndim, axis_name)
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))

    return jax.tree_util.tree_map(put, local_batch)
