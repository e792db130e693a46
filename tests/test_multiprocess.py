"""REAL multi-process validation of the multi-host layer.

The 8-virtual-device CPU mesh tests elsewhere are single-process; this
spawns TWO OS processes that rendezvous through `init_distributed`
(jax.distributed + a local coordinator), form one global 8-device mesh
(4 local devices each), and assemble a globally-sharded batch with
`global_batch_from_local` — the exact entry path `cli/train --multihost`
takes on a TPU pod (parallel/mesh.py:119-171), where each host feeds
only its local slice and no process ever materializes the full batch.

Asserts, per process: process_count/global-device topology, global batch
geometry, cross-process reduction seeing BOTH processes' data, and
process-order concatenation semantics.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from marigold_tpu.parallel.mesh import (
    get_mesh, global_batch_from_local, init_distributed,
)

# env vars are ignored once a site plugin registered (see
# force_cpu_devices docstring); set the config BEFORE any backend or
# distributed init
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
n = init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert n == 2, n
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = get_mesh(8)
# process p contributes 8 rows filled with p+1 -> global batch 16
# (global batch must divide the 8-device mesh: 2 rows per device)
local = {"x": np.full((8, 3), float(pid + 1), np.float32)}
gb = global_batch_from_local(mesh, local)
assert gb["x"].shape == (16, 3), gb["x"].shape
assert not gb["x"].sharding.is_fully_replicated

repl = NamedSharding(mesh, P())

@functools.partial(jax.jit, out_shardings=repl)
def stats(b):
    return jnp.mean(b["x"]), b["x"] * 1.0

mean, full = stats(gb)
np.testing.assert_allclose(float(mean), 1.5)  # sees BOTH processes
expected = np.concatenate(
    [np.full((8, 3), 1.0, np.float32), np.full((8, 3), 2.0, np.float32)]
)
np.testing.assert_array_equal(np.asarray(full), expected)
print(f"MULTIPROC_OK {pid}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_and_global_batch():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # CPU-only workers: drop TPU-plugin site dirs — their sitecustomize
    # dials the remote TPU at interpreter startup and hangs every new
    # python process when the tunnel is down.
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *keep])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIPROC_OK {pid}" in out, out


TRAIN_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
extra = sys.argv[4:]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
os.environ["MARIGOLD_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["MARIGOLD_TPU_NUM_PROCESSES"] = "2"
os.environ["MARIGOLD_TPU_PROCESS_ID"] = str(pid)
from marigold_tpu.cli.train import main
rc = main([
    "--config", os.path.join(tmp, "train_cfg.yaml"),
    "--output_dir", os.path.join(tmp, "runs"),
    "--base_data_dir", os.path.join(tmp, "data"),
    "--base_ckpt_dir", os.path.join(tmp, "ckpt_base"),
    "--no_wandb",
    "--multihost", "--data_parallel", "--add_datetime_prefix",
    *extra,
])
assert rc == 0, rc
print(f"TRAINPROC_OK {pid}", flush=True)
"""


import pytest


@pytest.mark.parametrize(
    "extra_flags,with_val",
    [(("--no_val",), False), (("--shard_optimizer",), True)],
    ids=["dp", "dp+zero1+val"],
)
def test_two_process_train_cli(tmp_path, extra_flags, with_val):
    """The full `cli/train --multihost --data_parallel` path with TWO OS
    processes (2 CPU devices each -> one global 4-device mesh): broadcast
    datetime run-name token, marker-gated run-dir join, process-sharded
    disjoint batch streams, global batch assembly, and the
    process-allgather checkpoint save with only process 0 writing. The
    zero1 variant shards Adam state over the global mesh (the save
    gathers shards living on BOTH processes) AND runs periodic
    validation — which executes on process 0 only, with the
    coordination barrier absorbing the skew before the next collective
    save (non-zero processes reaching that allgather minutes early was
    a real deadline-exceeded failure mode)."""
    import json

    import numpy as np
    import yaml
    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_checkpoint

    make_tiny_checkpoint(str(tmp_path / "ckpt_base" / "sd2"), mode="sd2")
    rng = np.random.default_rng(0)
    root = tmp_path / "data" / "nyu"
    os.makedirs(root)
    names = []
    for i in range(8):
        rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        depth_mm = rng.integers(500, 9000, (64, 64), dtype=np.uint16)
        Image.fromarray(rgb).save(root / f"rgb_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"depth_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"filled_{i:05d}.png")
        names.append(f"rgb_{i:05d}.png depth_{i:05d}.png filled_{i:05d}.png")
    (tmp_path / "split.txt").write_text("\n".join(names))
    # small validation split (validation runs batch_size=1 per sample)
    (tmp_path / "val_split.txt").write_text("\n".join(names[:2]))

    cfg = {
        "pipeline": {"name": "MarigoldDepthPipeline", "kwargs": {
            "scale_invariant": True, "shift_invariant": True,
            "default_denoising_steps": 1,
            "default_processing_resolution": 32,
        }},
        "model": {"name": "marigold_pipeline", "pretrained_path": "sd2"},
        "depth_normalization": {
            "type": "scale_shift_depth", "clip": True, "norm_min": -1.0,
            "norm_max": 1.0, "min_max_quantile": 0.02,
        },
        "augmentation": {"lr_flip_p": 0.5},
        "dataloader": {"num_workers": 0, "effective_batch_size": 4,
                       "max_train_batch_size": 2, "seed": 2024},
        "trainer": {"name": "MarigoldDepthTrainer", "init_seed": 2024,
                    "save_period": 2, "backup_period": 0,
                    "validation_period": 2 if with_val else 0,
                    "visualization_period": 0},
        "gt_depth_type": "depth_raw_norm",
        "gt_mask_type": "valid_mask_raw",
        "max_epoch": 100, "max_iter": 2,
        "optimizer": {"name": "Adam"},
        "loss": {"name": "mse_loss", "kwargs": {"reduction": "mean"}},
        "lr": 1e-4,
        "lr_scheduler": {"name": "IterExponential", "kwargs": {
            "total_iter": 100, "final_ratio": 0.01, "warmup_steps": 0}},
        "validation": {"denoising_steps": 1, "ensemble_size": 1,
                       "processing_res": 0, "match_input_res": False,
                       "resample_method": "bilinear",
                       "main_val_metric": "abs_relative_difference",
                       "main_val_metric_goal": "minimize",
                       "init_seed": 2024},
        "eval": {"alignment": "least_square", "align_max_res": None,
                 "eval_metrics": ["abs_relative_difference", "delta1_acc"]},
        "dataset": {
            "train": {"name": "mixed", "prob_ls": [1.0], "dataset_list": [
                {"name": "nyu_depth", "disp_name": "tiny_train",
                 "dir": "nyu", "filenames": str(tmp_path / "split.txt"),
                 "eigen_valid_mask": False}]},
            "val": ([{"name": "nyu_depth", "disp_name": "tiny_val",
                      "dir": "nyu",
                      "filenames": str(tmp_path / "val_split.txt"),
                      "eigen_valid_mask": False}] if with_val else []),
            "vis": [],
        },
        "logging": {"console_level": 30},
    }
    (tmp_path / "train_cfg.yaml").write_text(yaml.safe_dump(cfg))

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *keep])
    # worker stdout goes to FILES, not pipes: reading two pipes
    # sequentially deadlocks the pair the moment the not-yet-drained
    # worker fills its 64 KB pipe buffer while its peer waits in a
    # collective
    logs = [open(tmp_path / f"worker{pid}.log", "w+") for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER, str(pid), str(port),
             str(tmp_path), *extra_flags],
            env=env, stdout=logs[pid], stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = []
    for f in logs:
        f.seek(0)
        outs.append(f.read())
        f.close()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"TRAINPROC_OK {pid}" in out, out[-4000:]

    runs = [d for d in (tmp_path / "runs").iterdir() if d.is_dir()]
    assert len(runs) == 1, runs  # both processes agreed on the run name
    run_dir = runs[0]
    assert (run_dir / ".run_marker").exists()
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "checkpoint" / "latest" / "unet" / "config.json").exists()
    if with_val:
        # process 0 validated and saved the best checkpoint; the barrier
        # kept the non-validating process alive through the skew
        assert (run_dir / "checkpoint" / "best" / "unet").exists()
    with open(run_dir / "checkpoint" / "latest" / "unet" / "config.json") as f:
        assert json.load(f)["in_channels"] == 8
