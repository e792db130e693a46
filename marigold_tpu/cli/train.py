"""Training entry point.

Role parity: script/{depth,normals,iid}/train.py — config/resume/output
dirs, logger + TensorBoard init, mixed dataset + sampler wiring, val/vis
loaders, base-checkpoint load, trainer dispatch, --exit_after time budget,
resume from run dir.

Example:
  python -m marigold_tpu.cli.train --config config/train_marigold_depth.yaml \
      --base_ckpt_dir ckpt/ --base_data_dir data/ --output_dir output/run1
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import shutil
from datetime import datetime, timedelta


_RUN_MARKER = ".run_marker"


def _wait_for_dir(path: str, token: str, timeout_s: float = 120.0) -> None:
    """Block until process 0 creates `path` *for this run* on the shared
    fs: the directory existing is not enough — a stale dir from a previous
    run would make non-main processes latch onto it (and train into it)
    while process 0 fails fast with FileExistsError. Process 0 writes the
    broadcast run token into a marker file; we wait for a matching one."""
    import time

    marker = os.path.join(path, _RUN_MARKER)
    deadline = time.monotonic() + timeout_s
    while True:
        if os.path.isfile(marker):
            try:
                with open(marker) as f:
                    if f.read().strip() == token:
                        return
            except OSError:
                pass
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"run dir {path} was not created by process 0 (marker with "
                f"token {token!r}) within {timeout_s:.0f}s — if the dir "
                "pre-exists from an earlier run, process 0 has failed fast "
                "with FileExistsError; remove it or use "
                "--add_datetime_prefix"
            )
        time.sleep(0.5)


def build_parser():
    parser = argparse.ArgumentParser(description="Train a Marigold-TPU model")
    parser.add_argument("--config", type=str,
                        default="config/train_marigold_depth.yaml")
    parser.add_argument("--resume_run", type=str, default=None,
                        help="Path of checkpoint to resume, e.g. "
                             "output/run/checkpoint/latest")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--base_data_dir", type=str, default=None,
                        help="Defaults to $BASE_DATA_DIR")
    parser.add_argument("--base_ckpt_dir", type=str, default=None,
                        help="Defaults to $BASE_CKPT_DIR")
    parser.add_argument("--exit_after", type=int, default=-1,
                        help="Save and exit after this many minutes")
    parser.add_argument("--no_val", action="store_true")
    parser.add_argument("--no_wandb", action="store_true",
                        help="disable wandb tracking (reference --no_wandb; "
                             "noop when wandb is not installed)")
    parser.add_argument("--add_datetime_prefix", action="store_true",
                        help="prefix the run dir name with the start "
                             "datetime (reference --add_datetime_prefix)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard the per-step batch over all devices "
                             "(params replicated, psum grad all-reduce "
                             "from sharding annotations). Requires "
                             "max_train_batch_size % n_devices == 0.")
    parser.add_argument("--shard_optimizer", action="store_true",
                        help="ZeRO-1 with --data_parallel: shard Adam "
                             "m/v + the accumulation buffer over the mesh "
                             "(~14 GB of fp32 state at SD2 scale becomes "
                             "14/N GB per chip, so reference-parity Adam "
                             "fits on >=2 chips). Same numbers as the "
                             "replicated update.")
    parser.add_argument("--do_not_copy_data", action="store_true",
                        help="(Slurm) do not copy data to local scratch")
    parser.add_argument("--multihost", action="store_true",
                        help="Initialize jax.distributed for multi-host "
                             "training (TPU pod slices / multi-process): "
                             "chips within a host ride ICI, hosts ride "
                             "DCN. Combine with --data_parallel. The "
                             "coordinator is auto-detected from the "
                             "cluster environment.")
    return parser


def main(argv=None):
    from marigold_tpu.cli import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)

    from marigold_tpu.config import recursive_load_config
    from marigold_tpu.data import (
        ConcatDataset,
        DataLoader,
        DatasetMode,
        MixedBatchSampler,
        get_dataset,
    )
    from marigold_tpu.train.trainer import get_trainer_cls
    from marigold_tpu.utils.depth_transform import get_depth_normalizer
    from marigold_tpu.utils.logging_util import (
        config_logging,
        init_wandb,
        is_on_slurm,
        get_local_scratch_dir,
        load_wandb_job_id,
        log_slurm_job_id,
        save_wandb_job_id,
        tb_logger,
    )
    from marigold_tpu.utils.seeding import seed_all

    t_start = datetime.now()
    base_data_dir = args.base_data_dir or os.environ.get("BASE_DATA_DIR")
    base_ckpt_dir = args.base_ckpt_dir or os.environ.get("BASE_CKPT_DIR")

    # Multihost init must precede ANY filesystem/wandb side effect so
    # jax.process_index() can gate them: with N processes on a shared
    # filesystem, only process 0 may create the run dir (exist_ok=False
    # would crash the other N-1) or start a wandb run (N duplicates).
    is_main = True
    # all processes must agree on this token: it prefixes the run dir when
    # --add_datetime_prefix is set (each process computing its own
    # timestamp would diverge on clock skew or a second boundary) and
    # marks the run dir as created by THIS run (see _wait_for_dir)
    run_token = t_start.strftime("%y_%m_%d-%H_%M_%S")
    if args.multihost:
        from marigold_tpu.parallel.mesh import init_distributed

        n_proc = init_distributed()
        import jax
        import numpy as np
        from jax.experimental import multihost_utils

        is_main = jax.process_index() == 0
        tok = np.frombuffer(run_token.encode(), dtype=np.uint8)
        run_token = bytes(
            np.asarray(multihost_utils.broadcast_one_to_all(tok))
        ).decode().strip()
        logging.info(f"multihost: {n_proc} process(es), "
                     f"process_index={jax.process_index()}")

    resume_run = args.resume_run
    if resume_run is not None:
        out_dir_run = os.path.dirname(os.path.dirname(resume_run))
        cfg = recursive_load_config(os.path.join(out_dir_run, "config.yaml"))
    else:
        cfg = recursive_load_config(args.config)
        run_name = os.path.splitext(os.path.basename(args.config))[0]
        if args.add_datetime_prefix:
            run_name = f"{run_token}-{run_name}"
        out_dir_run = os.path.join(args.output_dir or "output", run_name)
        if is_main:
            # exist_ok=False like the reference (train.py:163): without the
            # datetime prefix a rerun of the same config must not silently
            # write into (and corrupt) the previous run's directory
            os.makedirs(out_dir_run, exist_ok=False)
            if args.multihost:
                with open(os.path.join(out_dir_run, _RUN_MARKER), "w") as f:
                    f.write(run_token)
        else:
            # non-zero processes join the dir process 0 creates
            _wait_for_dir(out_dir_run, run_token)

    out_dir_ckpt = os.path.join(out_dir_run, "checkpoint")
    out_dir_tb = os.path.join(out_dir_run, "tensorboard")
    out_dir_eval = os.path.join(out_dir_run, "evaluation")
    out_dir_vis = os.path.join(out_dir_run, "visualization")
    for d in (out_dir_ckpt, out_dir_tb, out_dir_eval, out_dir_vis):
        os.makedirs(d, exist_ok=True)

    # non-main processes log to console only (no file-handler contention)
    config_logging(cfg.get("logging", {}),
                   out_dir=out_dir_run if is_main else None)
    logging.info(f"config: {args.config}; output: {out_dir_run}")
    if is_main:
        tb_logger.set_dir(out_dir_tb)

    # wandb wrapping tensorboard, with run-ID persistence across resume
    # (reference train.py:185-210, logging_util.py:95-120; noop without
    # the package)
    wandb_kwargs = dict(cfg.get("wandb", {}) or {})  # project, entity, ...
    wandb_kwargs.setdefault("project", "marigold_tpu")
    wandb_kwargs.update(
        name=os.path.basename(out_dir_run),
        dir=out_dir_run,
        config={"entry": "train", "config": args.config},
    )
    if resume_run is not None:
        prev_id = load_wandb_job_id(out_dir_run)
        if prev_id is not None:
            wandb_kwargs.update(id=prev_id, resume="must")
    wandb_run = init_wandb(enable=is_main and not args.no_wandb,
                           **wandb_kwargs)
    if is_main and not args.no_wandb:
        # only a REAL run id may be persisted: a disabled-mode run carries
        # a synthetic id that would poison a later resume="must"
        save_wandb_job_id(wandb_run, out_dir_run)
    log_slurm_job_id()

    if resume_run is None and is_main:
        # save the effective composed config into the run dir
        import yaml

        with open(os.path.join(out_dir_run, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.to_dict(), f)
        # code snapshot for reproducibility (reference train.py:217-231)
        try:
            import tarfile

            pkg_dir = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
            snap = os.path.join(out_dir_run, "code_snapshot.tar")
            with tarfile.open(snap, "w") as tar:
                for dirpath, dirnames, filenames in os.walk(pkg_dir):
                    dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                    for fn in filenames:
                        if fn.endswith((".py", ".cc")):
                            full = os.path.join(dirpath, fn)
                            tar.add(
                                full,
                                arcname=os.path.relpath(
                                    full, os.path.dirname(pkg_dir)
                                ),
                            )
            logging.info(f"code snapshot: {snap}")
        except Exception:
            logging.exception("code snapshot failed (continuing)")

    # Slurm local-scratch data copy (reference train.py:233-252)
    if is_on_slurm() and not args.do_not_copy_data and base_data_dir:
        scratch = get_local_scratch_dir()
        if scratch:
            local = os.path.join(scratch, "train_data")
            logging.info(f"copying data to local scratch: {local}")
            shutil.copytree(base_data_dir, local, dirs_exist_ok=True)
            base_data_dir = local

    loader_seed = cfg.dataloader.get("seed")
    if loader_seed is not None:
        seed_all(loader_seed)

    # effective batch / accumulation (reference train.py:254-262)
    eff_bs = int(cfg.dataloader.effective_batch_size)
    max_bs = int(cfg.dataloader.max_train_batch_size)
    accumulation_steps = eff_bs / max_bs
    assert int(accumulation_steps) == accumulation_steps, (
        f"effective_batch_size {eff_bs} must be divisible by "
        f"max_train_batch_size {max_bs}"
    )
    accumulation_steps = int(accumulation_steps)
    logging.info(
        f"effective batch size: {eff_bs}, accumulation steps: {accumulation_steps}"
    )

    # datasets
    extra_kwargs = {}
    if cfg.get("depth_normalization") is not None:
        extra_kwargs["depth_transform"] = get_depth_normalizer(
            cfg.depth_normalization.to_dict()
            if hasattr(cfg.depth_normalization, "to_dict")
            else dict(cfg.depth_normalization)
        )
    train_datasets = get_dataset(
        cfg.dataset.train, base_data_dir=base_data_dir, mode=DatasetMode.TRAIN,
        augmentation_args=dict(cfg.get("augmentation") or {}),
        **extra_kwargs,
    )
    if not isinstance(train_datasets, list):
        train_datasets = [train_datasets]
    concat = ConcatDataset(train_datasets)
    sampler = MixedBatchSampler(
        train_datasets,
        batch_size=max_bs,
        shuffle=True,
        prob=list(cfg.dataset.train.get("prob_ls") or []) or None,
        generator=random.Random(loader_seed),
    )
    n_shard, i_shard = 1, 0
    if args.multihost:
        import jax

        if jax.process_count() > 1:
            # multi-host data parallelism: all processes share the seeded
            # batch stream and each takes its stride, so the per-step
            # global batch (global_batch_from_local concatenation) is
            # process_count DISTINCT batches — without this every process
            # drew the same samples and DP gradients were N duplicates
            n_shard, i_shard = jax.process_count(), jax.process_index()
            logging.info(f"data sharding: process {i_shard}/{n_shard} "
                         f"takes every {n_shard}-th batch")
    train_loader = DataLoader(
        concat, batch_sampler=sampler,
        num_workers=int(cfg.dataloader.get("num_workers", 0)),
        # per-batch augmentation seeds derive from this (loader.py's
        # determinism contract); without it, seeded runs reproduced the
        # batch ORDER but not the augmentations
        seed=loader_seed,
        shard_count=n_shard,
        shard_index=i_shard,
    )

    def _mk_eval_loaders(split):
        loaders = []
        for c in cfg.dataset.get(split) or []:
            ds = get_dataset(
                c, base_data_dir=base_data_dir, mode=DatasetMode.EVAL,
                **extra_kwargs,
            )
            loaders.append(DataLoader(ds, batch_size=1))
        return loaders

    val_loaders = [] if args.no_val else _mk_eval_loaders("val")
    vis_loaders = _mk_eval_loaders("vis")

    # base pipeline checkpoint (vanilla SD2 for fresh runs)
    from marigold_tpu import (
        MarigoldDepthPipeline,
        MarigoldIIDPipeline,
        MarigoldNormalsPipeline,
    )

    pipe_cls = {
        "MarigoldDepthPipeline": MarigoldDepthPipeline,
        "MarigoldNormalsPipeline": MarigoldNormalsPipeline,
        "MarigoldIIDPipeline": MarigoldIIDPipeline,
    }[cfg.pipeline.name]
    ckpt_path = os.path.join(base_ckpt_dir or "", cfg.model.pretrained_path)
    pipe = pipe_cls.from_pretrained(ckpt_path)
    # pipeline kwargs from the training config override the base checkpoint
    pipe.pipe_cfg.update(dict(cfg.pipeline.get("kwargs") or {}))
    pipe.default_denoising_steps = pipe.pipe_cfg.get("default_denoising_steps")
    pipe.default_processing_resolution = pipe.pipe_cfg.get(
        "default_processing_resolution"
    )
    if cfg.pipeline.name == "MarigoldIIDPipeline":
        pipe.target_properties = pipe.pipe_cfg.get("target_properties") or {}
        pipe.target_names = pipe.target_properties["target_names"]
        pipe.n_targets = len(pipe.target_names)

    mesh = None
    if args.data_parallel:
        import jax

        from marigold_tpu.parallel.mesh import get_mesh

        n_dev = jax.device_count()
        if n_dev > 1:
            mesh = get_mesh(n_dev)
            logging.info(f"data-parallel training over {n_dev} devices")
        else:
            logging.warning("--data_parallel requested but only one device "
                            "is available; training single-device")
    if args.shard_optimizer:
        if mesh is None:
            logging.warning("--shard_optimizer has no effect without a "
                            ">1-device --data_parallel mesh")
        else:
            # plain dict mutation: Config.__getattr__ wraps nested plain
            # dicts in a fresh object, so attribute writes on cfg.optimizer
            # would not persist into cfg
            opt = dict(cfg.get("optimizer") or {})
            opt["shard_states"] = True
            cfg["optimizer"] = opt

    trainer_cls = get_trainer_cls(cfg.trainer.name)
    trainer = trainer_cls(
        cfg=cfg,
        model=pipe,
        train_dataloader=train_loader,
        out_dir_ckpt=out_dir_ckpt,
        out_dir_eval=out_dir_eval,
        out_dir_vis=out_dir_vis,
        accumulation_steps=accumulation_steps,
        val_dataloaders=val_loaders,
        vis_dataloaders=vis_loaders,
        mesh=mesh,
    )

    if resume_run is not None:
        trainer.load_checkpoint(resume_run, load_trainer_state=True)

    t_end = (
        t_start + timedelta(minutes=args.exit_after)
        if args.exit_after > 0
        else None
    )
    try:
        trainer.train(t_end=t_end)
    except Exception:
        logging.exception("training failed")
        raise
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
