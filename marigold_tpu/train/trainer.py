"""Trainers: depth / normals / IID fine-tuning orchestration.

Behavioral reference: src/trainer/marigold_{depth,normals,iid}_trainer.py —
UNet-only fine-tuning (VAE/text frozen), conv surgery, per-step seeded
randomness from a pre-generated global seed sequence (deterministic
resume), gradient accumulation to the effective batch, per-effective-iter
callbacks (backup ckpt / validation / latest ckpt / visualization),
time-budgeted exit, in-training validation running the full inference
pipeline per sample, best-checkpoint gating on the first val set's main
metric.

TPU-first: the inner loop is ONE jitted train_step (train_step.py) with
gradient accumulation inside the optimizer (optax.MultiSteps) and data
parallelism by sharding annotations; the host loop only feeds batches and
orchestrates checkpoints/validation.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from datetime import datetime
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marigold_tpu.eval import metrics as M
from marigold_tpu.eval.alignment import align_depth_least_square
from marigold_tpu.models import surgery
from marigold_tpu.pipelines import image_util
from marigold_tpu.train.checkpoints import (
    load_train_state,
    save_train_state as save_train_ckpt,
)
from marigold_tpu.train.lr_schedule import iter_exponential
from marigold_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from marigold_tpu.utils.logging_util import tb_logger
from marigold_tpu.utils.seeding import generate_seed_sequence, key_from_seed

logger = logging.getLogger(__name__)


class MarigoldTrainerBase:
    modality = "depth"

    def __init__(
        self,
        cfg,
        model,  # a pipelines.BasePipeline (with .core)
        train_dataloader,
        out_dir_ckpt: str,
        out_dir_eval: str,
        out_dir_vis: str,
        accumulation_steps: int,
        val_dataloaders: Optional[List] = None,
        vis_dataloaders: Optional[List] = None,
        device=None,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = model
        self.core = model.core
        self.mesh = mesh  # jax.sharding.Mesh with a "data" axis, or None
        self.train_loader = train_dataloader
        self.out_dir_ckpt = out_dir_ckpt
        self.out_dir_eval = out_dir_eval
        self.out_dir_vis = out_dir_vis
        self.accumulation_steps = int(accumulation_steps)
        self.val_loaders = val_dataloaders or []
        self.vis_loaders = vis_dataloaders or []

        # surgery: widen conv_in (and conv_out for IID) on the loaded SD2
        self._apply_surgery()

        # optimizer: Adam + IterExponential on the UNet only (VAE/text are
        # simply never passed to the grad fn — frozen by construction)
        lr = float(cfg.lr)
        lrs = cfg.lr_scheduler.kwargs
        self.lr_schedule_fn = iter_exponential(
            int(lrs.total_iter), float(lrs.final_ratio), int(lrs.warmup_steps)
        )
        opt_cfg = cfg.get("optimizer") or {}
        accum_dtype = opt_cfg.get("accum_dtype")  # e.g. "bfloat16" (r4:
        # halves the accumulation buffer, unlocking bs8 single-chip —
        # opt-in numerics deviation, see train_step.gradient_accumulation)
        self._accum_dtype = jnp.dtype(accum_dtype) if accum_dtype else None
        # two-program accumulation (optimizer.split_accum: true) —
        # micro grad+accumulate steps + a separate apply program, so the
        # fwd/bwd peak and the optimizer-update transients never share a
        # program's HBM budget; unlocks bs8 accumulation on one chip
        # (train_step.make_accum_pair; semantics asserted equal to the
        # fused path in tests/test_accumulation.py)
        self.split_accum = (
            bool(opt_cfg.get("split_accum", False))
            and self.accumulation_steps > 1
        )
        if self.split_accum:
            from marigold_tpu.train.train_step import make_accum_pair

            self._inner_optimizer = make_optimizer(
                lr, self.lr_schedule_fn, 1, name=opt_cfg.get("name", "adam")
            )
            # optimizer_like: carries .init for create_train_state; the
            # jitted micro/apply programs are built in _build_train_step
            _, _, self.optimizer = self._make_pair()
        else:
            self.optimizer = make_optimizer(
                lr, self.lr_schedule_fn, self.accumulation_steps,
                name=opt_cfg.get("name", "adam"),
                accum_dtype=self._accum_dtype,
            )
        # train in fp32 master params (bf16 fwd handled inside model dtype)
        unet_params_f32 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), self.core.unet_params
        )
        self.state_shardings = None
        if mesh is not None and bool(opt_cfg.get("shard_states", False)):
            # ZeRO-1: shard Adam m/v + accumulator over the mesh so
            # reference-parity Adam fits at SD2 scale (>=2 chips); the
            # layout comes from shapes only (eval_shape) and the init runs
            # under jit with sharded out_shardings, so the full unsharded
            # ~14 GB fp32 state never materializes on one chip
            from marigold_tpu.train.train_step import zero1_state_shardings

            self.state_shardings = zero1_state_shardings(
                mesh,
                jax.eval_shape(
                    lambda p: create_train_state(p, self.optimizer),
                    unet_params_f32,
                ),
            )
        self.state = self._init_state(unet_params_f32)
        if mesh is not None:
            from marigold_tpu.parallel.mesh import replicate

            self.core.vae_params = replicate(mesh, self.core.vae_params)

        self._build_train_step()

        # trainer state (reference naming)
        self.effective_iter = 0
        self.epoch = 1
        self.n_batch_in_epoch = 0
        self.in_evaluation = False
        self.best_metric = (
            1e8 if cfg.validation.main_val_metric_goal == "minimize" else -1e8
        )
        self.max_iter = int(cfg.max_iter)
        self.max_epoch = int(cfg.max_epoch)
        self.save_period = int(cfg.trainer.save_period)
        self.backup_period = int(cfg.trainer.backup_period)
        self.val_period = int(cfg.trainer.validation_period)
        self.vis_period = int(cfg.trainer.visualization_period)
        self.gt_mask_type = cfg.get("gt_mask_type")

        init_seed = cfg.trainer.get("init_seed")
        self._seed_refills = 0
        self.global_seed_sequence: list = (
            generate_seed_sequence(init_seed, self.max_iter * max(
                self.accumulation_steps, 1))
            if init_seed is not None
            else []
        )

    # ------------------------------------------------------------------ #

    def _apply_surgery(self):
        raise NotImplementedError

    def _init_state(self, params_f32):
        """Fresh TrainState in the trainer's mesh layout. With ZeRO-1 the
        optimizer init runs under jit with sharded out_shardings — shards
        are allocated directly, never the full state on one chip."""
        if self.state_shardings is not None:
            init_fn = jax.jit(
                lambda p: create_train_state(p, self.optimizer),
                out_shardings=self.state_shardings,
            )
            return init_fn(params_f32)
        state = create_train_state(params_f32, self.optimizer)
        if self.mesh is not None:
            from marigold_tpu.parallel.mesh import replicate

            state = replicate(self.mesh, state)
        return state

    def _step_kwargs(self):
        """Shared make_train_step/make_accum_pair kwargs from the config."""
        cfg = self.cfg
        mrn = cfg.get("multi_res_noise")
        return dict(
            loss_name=cfg.loss.name,
            multi_res_noise_cfg=dict(mrn) if mrn else None,
            use_mask=cfg.get("gt_mask_type") is not None,
            compute_dtype=self.core.dtype,
            # bool (yaml true/false) or a mode string ("full"/"save_heavy"
            # /"none") — see train_step._apply_remat
            remat=cfg.trainer.get("remat", False),
            # opt-in bf16 gradient storage (optimizer.grad_dtype:
            # bfloat16): halves the gradient buffer, which together with
            # accum_dtype unlocks the bs8 accumulation geometry — see
            # train_step.make_train_step docstring
            grad_dtype=(
                jnp.dtype(g) if (g := (cfg.get("optimizer") or {})
                                 .get("grad_dtype")) else None
            ),
        )

    def _make_pair(self):
        from marigold_tpu.train.train_step import make_accum_pair

        return make_accum_pair(
            self.core.unet_cfg,
            self.core.vae_cfg,
            self.core.schedule,
            self._inner_optimizer,
            self.accumulation_steps,
            accum_dtype=self._accum_dtype,
            **self._step_kwargs(),
        )

    def _build_train_step(self):
        """(Re)build the jitted train step from the CURRENT core
        schedule/config — called at init and after load_checkpoint, whose
        checkpoint may carry a different scheduler config (the closure
        bakes schedule/unet_cfg in). Donates the state: at SD2 scale the
        fp32 Adam(+accum) state is ~14 GB — without donation the update
        transiently holds old+new copies and OOMs a 16 GB chip."""
        jit_kwargs = {}
        state_out = None
        if self.state_shardings is not None:
            # pin the output state to the ZeRO-1 layout (metrics replicated)
            from jax.sharding import NamedSharding, PartitionSpec as P

            state_out = self.state_shardings
            jit_kwargs["out_shardings"] = (
                state_out,
                NamedSharding(self.mesh, P()),
            )
        if self.split_accum:
            micro, apply_raw, _ = self._make_pair()
            self.train_step = jax.jit(
                micro, donate_argnums=(0,), **jit_kwargs
            )
            self.apply_step = jax.jit(
                apply_raw, donate_argnums=(0,),
                **({"out_shardings": state_out} if state_out is not None
                   else {}),
            )
            return
        self.apply_step = None
        _step_fn = make_train_step(
            self.core.unet_cfg,
            self.core.vae_cfg,
            self.core.schedule,
            self.optimizer,
            **self._step_kwargs(),
        )
        self.train_step = jax.jit(
            _step_fn, donate_argnums=(0,), **jit_kwargs
        )

    def _assemble_batch(self, batch) -> dict:
        """-> {rgb_norm [B,H,W,3], gt_norm [B,H,W,3k], valid_mask?}"""
        raise NotImplementedError

    def _next_seed(self) -> int:
        if not self.global_seed_sequence:
            # regenerate deterministically (reference _get_next_seed
            # refills from init_seed when empty, seeding.py:47-64). A
            # per-process np.random fallback would silently diverge the
            # replicated state across hosts in multi-host SPMD runs —
            # every process must derive the SAME key stream.
            base = self.cfg.trainer.get("init_seed") or 0
            self._seed_refills += 1
            chunk = max(self.max_iter, 1) * max(self.accumulation_steps, 1)
            self.global_seed_sequence = generate_seed_sequence(
                int(base) + 1_000_003 * self._seed_refills, chunk
            )
        return self.global_seed_sequence.pop()

    def _step_key(self):
        return key_from_seed(self._next_seed())

    # ------------------------------------------------------------------ #

    def train(self, t_end: Optional[datetime] = None) -> None:
        logger.info("Start training")
        if self.in_evaluation:
            logger.info("Resumed during validation: re-running validation.")
            if jax.process_index() == 0:  # same gating as the periodic path
                self.validate()
            # non-main processes would otherwise hit the allgather in the
            # save below — the job's FIRST collective on this resume path
            # — minutes before process 0 finishes validating
            self._coord_barrier("marigold_resume_validation_done")
            self.in_evaluation = False
            self.save_checkpoint("latest", save_train_state=True)

        accumulated_step = 0
        self._sync_params_to_core()
        while self.epoch <= self.max_epoch:
            logger.info(f"epoch: {self.epoch}")
            loader = self.train_loader
            if self.n_batch_in_epoch > 0 and hasattr(loader, "skip_first_batches"):
                loader.skip_first_batches(self.n_batch_in_epoch)

            for batch in loader:
                batch_dev = self._assemble_batch(batch)
                if self.mesh is not None:
                    from marigold_tpu.parallel.mesh import (
                        global_batch_from_local,
                    )

                    n_dev = self.mesh.shape["data"]
                    n_proc = jax.process_count()
                    lead = next(iter(batch_dev.values())).shape[0] * n_proc
                    if lead % n_dev:
                        raise ValueError(
                            f"global batch ({lead}) must be a multiple of "
                            f"the mesh size ({n_dev}) for data-parallel "
                            "training"
                        )
                    # single-host: shards the batch over local devices;
                    # multi-host: each process contributes its local slice
                    # of the global batch (mesh.py:global_batch_from_local)
                    batch_dev = global_batch_from_local(self.mesh, batch_dev)
                key = self._step_key()
                self._multihost_compile_barrier(batch_dev, key)
                self.state, step_metrics = self.train_step(
                    self.state,
                    self.core.vae_params,
                    self.core.empty_text_embed,
                    batch_dev,
                    key,
                )
                # device-side accumulation (no host sync per micro-batch);
                # the logged loss is the effective-batch mean like the
                # reference's accumulated loss, and a NaN in ANY
                # micro-batch of the window propagates into it
                window_loss = (
                    step_metrics["loss"] if accumulated_step == 0
                    else window_loss + step_metrics["loss"]
                )
                accumulated_step += 1
                self.n_batch_in_epoch += 1

                if accumulated_step >= self.accumulation_steps:
                    if self.split_accum:
                        # two-program accumulation: the optimizer update
                        # runs in its own program at the window boundary
                        self.state = self.apply_step(self.state)
                    loss = float(window_loss) / accumulated_step
                    accumulated_step = 0
                    self.effective_iter += 1
                    if not np.isfinite(loss):
                        logger.warning(f"non-finite loss at iter {self.effective_iter}")

                    tb_logger.log_dict(
                        {"train/loss": loss,
                         "train/grad_norm": float(step_metrics["grad_norm"])},
                        global_step=self.effective_iter,
                    )
                    tb_logger.log_scalar(
                        "lr",
                        float(self.cfg.lr)
                        * float(self.lr_schedule_fn(self.effective_iter)),
                        self.effective_iter,
                    )
                    tb_logger.log_scalar(
                        "n_batch_in_epoch", self.n_batch_in_epoch,
                        self.effective_iter,
                    )
                    logger.info(
                        f"iter {self.effective_iter:5d} (epoch {self.epoch:2d}): "
                        f"loss={loss:.5f}"
                    )

                    self._train_step_callback()

                    if self.max_iter > 0 and self.effective_iter >= self.max_iter:
                        self.save_checkpoint(
                            self._get_backup_ckpt_name(), save_train_state=False
                        )
                        logger.info("Training ended.")
                        return
                    if t_end is not None and datetime.now() >= t_end:
                        self.save_checkpoint("latest", save_train_state=True)
                        logger.info("Time is up, training paused.")
                        return
            self.epoch += 1
            self.n_batch_in_epoch = 0
        # epoch budget exhausted before max_iter: persist the final state
        # (the max_iter and t_end exits above each save; this path must too)
        self.save_checkpoint("latest", save_train_state=True)
        logger.info("Training ended (max_epoch reached).")

    # ------------------------------------------------------------------ #

    def _sync_params_to_core(self):
        """Push current train params into the inference core (bf16 for the
        pipeline's fused programs)."""
        self.core.unet_params = jax.tree_util.tree_map(
            lambda x: x.astype(self.core.dtype), self.state.params
        )
        # NOTE: no _jit_cache.clear() — unet_params is a *traced argument*
        # of every cached program (pipelines/base.py), so new params flow
        # through without retracing; clearing forced a full (minutes-long)
        # recompile of all inference programs at every validation period.

    def _multihost_compile_barrier(self, batch_dev, key) -> None:
        """Multi-host only, once per process: AOT-compile the train step
        (purely local work), then rendezvous on the coordination service
        before the first dispatch. Without this, the first collective's
        Gloo/NCCL context init — whose rendezvous deadline is ~30 s —
        races the peers' train-step compiles: a loaded host can skew two
        processes' compile completions by more than the deadline and kill
        the job (observed on the 2-process CPU-mesh test). The
        coordination-service barrier has a long explicit timeout, so
        arbitrary compile skew is absorbed before any collective fires."""
        if getattr(self, "_mh_compile_barrier_done", False):
            return
        self._mh_compile_barrier_done = True
        if jax.process_count() <= 1:
            return
        self.train_step.lower(
            self.state,
            self.core.vae_params,
            self.core.empty_text_embed,
            batch_dev,
            key,
        ).compile()
        self._coord_barrier("marigold_train_step_compiled")

    @staticmethod
    def _coord_barrier(name: str, timeout_ms: int = 7_200_000) -> None:
        """Rendezvous all processes on the coordination service (long
        explicit timeout, no device collective). Used wherever processes
        can reach their next COLLECTIVE with large wall-clock skew —
        compile time, or a process-0-only validation pass — because a
        collective's context init / op has a ~30 s rendezvous deadline
        that such skew exceeds."""
        import jax

        if jax.process_count() <= 1:
            return
        try:
            from jax._src import distributed

            client = distributed.global_state.client
            if client is not None:
                client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        except Exception:
            logger.warning(
                "coordination-service barrier %s unavailable; proceeding "
                "(next collective may race long-running peers)",
                name, exc_info=True,
            )

    def _train_step_callback(self):
        """Reference _train_step_callback (marigold_depth_trainer.py:423-451)."""
        if self.backup_period > 0 and 0 == self.effective_iter % self.backup_period:
            self.save_checkpoint(self._get_backup_ckpt_name(), save_train_state=False)

        _is_latest_saved = False
        if self.val_period > 0 and 0 == self.effective_iter % self.val_period:
            self.in_evaluation = True
            self.save_checkpoint("latest", save_train_state=True)
            _is_latest_saved = True
            # multi-host: validation runs on process 0 only — every
            # process running the identical pass duplicates the work
            # N-fold for the same result; the save_checkpoint calls
            # around it stay collective (opt-state gather), the "best"
            # save inside validate() has no collective
            # (save_train_state=False), and the coordination barrier
            # below absorbs the skew before the next collective
            if jax.process_index() == 0:
                self.validate()
            # absorb the multi-minute validation skew before the next
            # collective (the allgather in the save below)
            self._coord_barrier(f"marigold_val_done_{self.effective_iter}")
            self.in_evaluation = False
            self.save_checkpoint("latest", save_train_state=True)

        if (
            self.save_period > 0
            and 0 == self.effective_iter % self.save_period
            and not _is_latest_saved
        ):
            self.save_checkpoint("latest", save_train_state=True)

        if (self.vis_period > 0
                and 0 == self.effective_iter % self.vis_period
                and jax.process_index() == 0):
            # process 0 only: N processes writing the same visualization
            # files concurrently can interleave/corrupt them
            self.visualize()

    def _get_backup_ckpt_name(self):
        return f"iter_{self.effective_iter:06d}"

    # ------------------------------------------------------------------ #
    # validation / visualization

    def validate(self):
        self._sync_params_to_core()
        for i, val_loader in enumerate(self.val_loaders):
            val_name = getattr(val_loader.dataset, "disp_name", f"val_{i}")
            result = self.validate_single_dataset(val_loader)
            main_metric = self.cfg.validation.main_val_metric
            logger.info(
                f"Iter {self.effective_iter}. Validation metrics on "
                f"{val_name}: {result}"
            )
            tb_logger.log_dict(
                {f"val/{val_name}/{k}": v for k, v in result.items()},
                global_step=self.effective_iter,
            )
            if i == 0:  # best-ckpt gate on the first val dataset
                value = result[main_metric]
                goal = self.cfg.validation.main_val_metric_goal
                better = (
                    value < self.best_metric
                    if goal == "minimize"
                    else value > self.best_metric
                )
                if better:
                    self.best_metric = value
                    logger.info(f"Best metric: {main_metric} = {value}")
                    self.save_checkpoint("best", save_train_state=False)

    def validate_single_dataset(self, val_loader) -> dict:
        raise NotImplementedError

    def visualize(self):
        self._sync_params_to_core()
        for vis_loader in self.vis_loaders:
            name = getattr(vis_loader.dataset, "disp_name", "vis")
            out_dir = os.path.join(self.out_dir_vis, name)
            os.makedirs(out_dir, exist_ok=True)
            self._visualize_dataset(vis_loader, out_dir)

    def _visualize_dataset(self, vis_loader, out_dir):
        pass

    def _val_pipe_kwargs(self):
        v = self.cfg.validation
        return dict(
            denoising_steps=int(v.denoising_steps),
            ensemble_size=int(v.ensemble_size),
            processing_res=int(v.processing_res),
            match_input_res=bool(v.match_input_res),
            seed=v.get("init_seed"),
            show_progress_bar=False,
        )

    # ------------------------------------------------------------------ #
    # checkpointing

    def save_checkpoint(self, ckpt_name: str, save_train_state: bool = True):
        ckpt_dir = os.path.join(self.out_dir_ckpt, ckpt_name)
        logger.info(f"Saving checkpoint to {ckpt_dir}")
        trainer_state = {
            "effective_iter": self.effective_iter,
            "epoch": self.epoch,
            "n_batch_in_epoch": self.n_batch_in_epoch,
            "best_metric": float(self.best_metric),
            "in_evaluation": self.in_evaluation,
            "global_seed_sequence": self.global_seed_sequence,
            "step": int(self.state.step),
            # n_batch_in_epoch counts LOCAL (process-sharded) batches, so
            # a resume is only coherent at the same process count
            "process_count": jax.process_count(),
        }
        opt_state = self.state.opt_state if save_train_state else None
        if opt_state is not None and jax.process_count() > 1:
            # multi-host: ZeRO-sharded optimizer state is not fully
            # addressable on any one process — gather it (collective, all
            # processes participate) before process 0 writes
            from jax.experimental import multihost_utils

            opt_state = jax.tree_util.tree_map(
                lambda x: multihost_utils.process_allgather(x, tiled=True),
                opt_state,
            )
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # process 0 writes; others only joined the gather
        params_f32 = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), self.state.params
        )
        save_train_ckpt(
            ckpt_dir, self.core.unet_cfg, params_f32, self.core.schedule,
            trainer_state, opt_state,
        )

    def load_checkpoint(self, ckpt_dir: str, load_trainer_state: bool = True):
        logger.info(f"Loading checkpoint from {ckpt_dir}")
        unet_cfg, unet_params, schedule, trainer_state, opt_state = load_train_state(
            ckpt_dir, self.state.opt_state if load_trainer_state else None
        )
        self.core.unet_cfg = unet_cfg
        if schedule is not None:
            # the checkpoint's scheduler config is authoritative on resume
            # (it may differ from the in-memory default, e.g.
            # prediction_type); the step fn is rebuilt below because the
            # schedule/unet_cfg are baked into its closure
            self.core.schedule = schedule
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), unet_params
        )
        if opt_state is None:
            self.state = dataclasses.replace(
                self._init_state(params),
                step=jnp.asarray(trainer_state.get("step", 0), jnp.int32),
            )
        else:
            self.state = TrainState(
                step=jnp.asarray(trainer_state.get("step", 0), jnp.int32),
                params=params,
                opt_state=opt_state,
            )
            if self.mesh is not None:
                # restore the mesh layout (replicated, or ZeRO-1)
                if self.state_shardings is not None:
                    self.state = jax.device_put(self.state, self.state_shardings)
                else:
                    from marigold_tpu.parallel.mesh import replicate

                    self.state = replicate(self.mesh, self.state)
        self._build_train_step()
        if load_trainer_state:
            saved_nproc = int(trainer_state.get("process_count", 1))
            if (saved_nproc != jax.process_count()
                    and int(trainer_state["n_batch_in_epoch"]) > 0):
                # the saved mid-epoch position counts process-sharded
                # LOCAL batches (data/loader.py shard stride): replaying
                # it at a different process count would skip/duplicate
                # samples silently
                raise ValueError(
                    f"checkpoint was saved mid-epoch by {saved_nproc} "
                    f"process(es) but this run has {jax.process_count()}; "
                    "resume with the same process count, or restart from "
                    "an epoch boundary"
                )
            self.effective_iter = trainer_state["effective_iter"]
            self.epoch = trainer_state["epoch"]
            self.n_batch_in_epoch = trainer_state["n_batch_in_epoch"]
            self.best_metric = trainer_state["best_metric"]
            self.in_evaluation = trainer_state["in_evaluation"]
            self.global_seed_sequence = list(trainer_state["global_seed_sequence"])
        self._sync_params_to_core()


# ------------------------------------------------------------------ #


class MarigoldDepthTrainer(MarigoldTrainerBase):
    modality = "depth"

    def _apply_surgery(self):
        if self.core.unet_cfg.in_channels == 4:
            self.core.unet_cfg, self.core.unet_params = surgery.replace_conv_in(
                self.core.unet_cfg, self.core.unet_params, 8
            )

    def _assemble_batch(self, batch):
        gt_type = self.cfg.get("gt_depth_type", "depth_raw_norm")
        depth = np.asarray(batch[gt_type], np.float32)  # [B,H,W,1]
        gt3 = np.repeat(depth, 3, axis=-1)  # stack_depth_images (ref :415-421)
        # numpy, not device arrays: single-host jit uploads once; the
        # multi-host path (mesh.global_batch_from_local) consumes host
        # buffers directly — a jnp.asarray here forced a device->host->
        # device round trip per step
        out = {
            "rgb_norm": np.asarray(batch["rgb_norm"], np.float32),
            "gt_norm": gt3,
        }
        if self.gt_mask_type is not None:
            out["valid_mask"] = np.asarray(batch[self.gt_mask_type], bool)
        return out

    def validate_single_dataset(self, val_loader) -> dict:
        tracker = M.MetricTracker(*self.cfg.eval.eval_metrics)
        kwargs = self._val_pipe_kwargs()
        for batch in val_loader:
            rgb_int = np.asarray(batch["rgb_int"][0], np.uint8)
            out = self.model(rgb_int, color_map=None, **kwargs)
            depth_pred = out.depth_np
            gt = np.asarray(batch["depth_raw_linear"][0, ..., 0])
            valid = np.asarray(batch["valid_mask_raw"][0, ..., 0], bool)
            if depth_pred.shape != gt.shape:
                depth_pred = image_util.resize_np(
                    depth_pred[..., None], gt.shape, "bilinear"
                )[..., 0]
            aligned, _, _ = align_depth_least_square(gt, depth_pred, valid)
            aligned = np.clip(
                aligned, getattr(val_loader.dataset, "min_depth", 0),
                getattr(val_loader.dataset, "max_depth", np.inf),
            )
            for name in self.cfg.eval.eval_metrics:
                tracker.update(name, M.DEPTH_METRICS[name](aligned, gt, valid))
        return tracker.result()

    def _visualize_dataset(self, vis_loader, out_dir):
        kwargs = self._val_pipe_kwargs()
        for batch in vis_loader:
            rgb_int = np.asarray(batch["rgb_int"][0], np.uint8)
            out = self.model(rgb_int, color_map="Spectral", **kwargs)
            name = os.path.splitext(
                os.path.basename(batch["rgb_relative_path"][0])
            )[0]
            if out.depth_colored is not None:
                out.depth_colored.save(
                    os.path.join(
                        out_dir, f"iter_{self.effective_iter:06d}_{name}.png"
                    )
                )


class MarigoldNormalsTrainer(MarigoldTrainerBase):
    modality = "normals"

    def _apply_surgery(self):
        if self.core.unet_cfg.in_channels == 4:
            self.core.unet_cfg, self.core.unet_params = surgery.replace_conv_in(
                self.core.unet_cfg, self.core.unet_params, 8
            )

    def _assemble_batch(self, batch):
        gt_type = self.cfg.get("gt_normals_type", "normals")
        return {
            "rgb_norm": jnp.asarray(batch["rgb_norm"], jnp.float32),
            "gt_norm": jnp.asarray(batch[gt_type], jnp.float32),
        }

    def validate_single_dataset(self, val_loader) -> dict:
        tracker = M.MetricTracker(*self.cfg.eval.eval_metrics)
        kwargs = self._val_pipe_kwargs()
        for batch in val_loader:
            rgb_int = np.asarray(batch["rgb_int"][0], np.uint8)
            out = self.model(rgb_int, **kwargs)
            pred = out.normals_np
            gt = np.asarray(batch["normals"][0])
            if pred.shape != gt.shape:
                pred = image_util.resize_np(pred, gt.shape[:2], "bilinear")
                pred /= np.clip(
                    np.linalg.norm(pred, axis=-1, keepdims=True), 1e-6, None
                )
            err = M.compute_cosine_error(pred, gt, masked=True)
            for name in self.cfg.eval.eval_metrics:
                tracker.update(name, M.NORMALS_METRICS[name](err))
        return tracker.result()

    def _visualize_dataset(self, vis_loader, out_dir):
        kwargs = self._val_pipe_kwargs()
        for batch in vis_loader:
            rgb_int = np.asarray(batch["rgb_int"][0], np.uint8)
            out = self.model(rgb_int, **kwargs)
            name = os.path.splitext(
                os.path.basename(batch["rgb_relative_path"][0])
            )[0]
            out.normals_img.save(
                os.path.join(out_dir, f"iter_{self.effective_iter:06d}_{name}.png")
            )


class MarigoldIIDTrainer(MarigoldTrainerBase):
    modality = "iid"

    def _apply_surgery(self):
        n = len(self.model.target_names)
        latent = self.core.vae_cfg.latent_channels
        if self.core.unet_cfg.in_channels == 4:
            self.core.unet_cfg, self.core.unet_params = (
                surgery.replace_conv_in_out_multimodal(
                    self.core.unet_cfg, self.core.unet_params, n, latent
                )
            )

    def _assemble_batch(self, batch):
        # rgb and each target: [0,1] -> [-1,1] (reference :286-288)
        rgb = np.asarray(batch["rgb"], np.float32) * 2.0 - 1.0
        targets = [
            np.asarray(batch[t], np.float32) * 2.0 - 1.0
            for t in self.model.target_names
        ]
        out = {
            "rgb_norm": jnp.asarray(rgb),
            "gt_norm": jnp.asarray(np.concatenate(targets, axis=-1)),
        }
        if self.gt_mask_type is not None:
            out["valid_mask"] = jnp.asarray(
                np.asarray(batch[self.gt_mask_type], bool)
            )
        return out

    def validate_single_dataset(self, val_loader) -> dict:
        tracker = M.MetricTracker()
        kwargs = self._val_pipe_kwargs()
        use_mask = bool(self.cfg.validation.get("use_mask", False))
        for batch in val_loader:
            rgb01 = np.asarray(batch["rgb"][0], np.float32)
            out = self.model(rgb01, **kwargs)
            for t in self.model.target_names:
                pred = np.moveaxis(out[t].array, 0, -1)  # [H,W,3]
                gt = np.asarray(batch[t][0])
                if pred.shape != gt.shape:
                    pred = image_util.resize_np(pred, gt.shape[:2], "bilinear")
                mask = None
                if use_mask and f"mask_{t}" in batch:
                    mask = np.asarray(batch[f"mask_{t}"][0], bool)
                val = M.compute_iid_metric(
                    pred, gt, t, M.psnr, valid_mask=mask, metric_name="psnr"
                )
                tracker.update(f"psnr_{t}", val)
        result = tracker.result()
        result["psnr"] = float(np.mean(list(result.values()))) if result else 0.0
        return result

    def _visualize_dataset(self, vis_loader, out_dir):
        kwargs = self._val_pipe_kwargs()
        for batch in vis_loader:
            rgb01 = np.asarray(batch["rgb"][0], np.float32)
            out = self.model(rgb01, **kwargs)
            name = os.path.splitext(
                os.path.basename(batch["rgb_relative_path"][0])
            )[0]
            for entry in out:
                entry.image.save(
                    os.path.join(
                        out_dir,
                        f"iter_{self.effective_iter:06d}_{name}_{entry.name}.png",
                    )
                )


trainer_name_class_dict = {
    "MarigoldDepthTrainer": MarigoldDepthTrainer,
    "MarigoldNormalsTrainer": MarigoldNormalsTrainer,
    "MarigoldIIDTrainer": MarigoldIIDTrainer,
}


def get_trainer_cls(trainer_name: str):
    """Registry (reference src/trainer/__init__.py:36-44)."""
    return trainer_name_class_dict[trainer_name]
