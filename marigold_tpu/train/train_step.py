"""The pjit training step: frozen-VAE latent diffusion fine-tuning.

Behavioral reference: MarigoldDepthTrainer.train's inner loop
(src/trainer/marigold_depth_trainer.py:240-352): VAE-encode RGB + GT (no
grad), per-sample random timestep, (optionally annealed multi-res) noise,
DDPM add_noise, UNet forward, target per prediction_type, latent MSE masked
by the 8x-maxpooled valid mask, gradient accumulation, Adam + exponential
LR.

TPU-first design:
  * one jitted `train_step(state, batch, key)`; gradient accumulation via
    `optax.MultiSteps` (stateful, inside the optimizer — no Python-side
    accumulation loop).
  * data parallelism by construction: batch arrays sharded on the leading
    axis over the mesh's `data` axis, params/opt state replicated; XLA
    inserts the psum gradient all-reduce from the sharding annotations
    (SURVEY.md §2.6 "TPU-native equivalents").
  * loss/latents fp32 (reference keeps them fp32 at lines 306, 329-334)
    while the UNet matmuls run in the param dtype (bf16).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from marigold_tpu.core.scheduler import DiffusionSchedule
from marigold_tpu.models import unet as unet_lib
from marigold_tpu.models import vae as vae_lib
from marigold_tpu.train.loss import get_loss
from marigold_tpu.train.multi_res_noise import multi_res_noise_like


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array  # effective (optimizer) step count tracking
    params: Any
    opt_state: Any


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def downsample_valid_mask(valid_mask: jax.Array, factor: int = 8) -> jax.Array:
    """[B,H,W,1] bool -> [B,H/f,W/f,1]: a latent pixel is valid iff NO
    invalid pixel falls in its receptive window (reference max-pools the
    invalid mask, marigold_depth_trainer.py:245-251)."""
    invalid = (~valid_mask).astype(jnp.float32)
    pooled = jax.lax.reduce_window(
        invalid,
        0.0,
        jax.lax.max,
        (1, factor, factor, 1),
        (1, factor, factor, 1),
        "VALID",
    )
    return pooled < 0.5


def _save_heavy_policy(prim, *_, **__):
    """Remat policy: keep every matmul/conv/attention result (the MXU ops
    whose recompute costs real FLOPs) and rematerialize only elementwise
    chains (GroupNorm stats, silu, adds) during backward. The flash
    attention kernel is a custom_vjp call — saving it keeps its residuals
    so the backward-pass probability recompute (its own design) is the
    only attention recompute."""
    return prim.name in (
        "dot_general",
        "conv_general_dilated",
        "custom_vjp_call_jaxpr",
        "custom_vjp_call",
    )


def _apply_remat(fwd: Callable, remat) -> Callable:
    """remat modes for the UNet forward under value_and_grad:

    * "none" / False — store all activations (fastest when HBM allows).
    * "full" / True — `jax.checkpoint`: backprop recomputes the whole
      forward instead of storing ~GBs of activations; ~+1 forward of
      FLOPs but the smallest footprint.
    * "save_heavy" — `jax.checkpoint` with a policy saving matmul/conv/
      attention outputs: backward recomputes only elementwise chains, so
      ~zero FLOP overhead at a fraction of full-activation memory — the
      middle point that fits full-size bs2 training on one 16 GB chip
      without full remat's extra forward.
    """
    if remat in (False, None, "none"):
        return fwd
    if remat in (True, "full"):
        return jax.checkpoint(fwd)
    if remat == "save_heavy":
        return jax.checkpoint(fwd, policy=_save_heavy_policy)
    raise ValueError(f"unknown remat mode: {remat!r}")


def make_train_step(
    unet_cfg: unet_lib.UNetConfig,
    vae_cfg: vae_lib.VAEConfig,
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    loss_name: str = "mse_loss",
    multi_res_noise_cfg: Optional[dict] = None,
    use_mask: bool = True,
    compute_dtype=jnp.bfloat16,
    remat="none",
    grad_dtype=None,
) -> Callable:
    """Returns train_step(state, vae_params, text_embed, batch, key) ->
    (state, metrics). batch: dict with rgb_norm [B,H,W,3], target gt
    [B,H,W,3] (depth stacked to 3ch / normals / per-target concat), and
    optional valid_mask [B,H,W,1] bool.

    Mixed precision: fp32 master params (state.params) are cast to
    `compute_dtype` for the UNet forward/backward; gradients accumulate
    back to fp32 through the cast; latents/targets/loss stay fp32
    (reference keeps them fp32 at marigold_depth_trainer.py:306,329).
    Pass compute_dtype=None to run the forward in the master dtype.

    grad_dtype: None (default) differentiates w.r.t. the fp32 masters —
    the backward's final store is fp32 through the cast, reference-exact.
    `jnp.bfloat16` differentiates w.r.t. the CAST params instead, so the
    gradient tree is stored in bf16: same backward matmuls (MXU
    accumulates fp32 either way), half the gradient buffer (1.73 GB at
    SD2 scale) — the exact HBM a bf16 accumulator costs, which is what
    unlocks the bs8 accumulation geometry on one 16 GB chip
    (docs/PERFORMANCE.md round 5). A numerics deviation (grads rounded
    to bf16 at store), so opt-in like accum_dtype.

    Jit with donate_argnums=(0,) — at SD2 scale the fp32 Adam(+accum)
    state is ~14 GB; without donating the TrainState the update holds two
    copies and OOMs a 16 GB chip."""
    loss_and_grad = _make_loss_and_grad(
        unet_cfg, vae_cfg, schedule, loss_name, multi_res_noise_cfg,
        use_mask, compute_dtype, remat, grad_dtype,
    )

    def train_step(state: TrainState, vae_params, text_embed, batch, key):
        loss, grads = loss_and_grad(
            state.params, vae_params, text_embed, batch, key
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {
            "loss": loss,
            # upcast before the norm: with bf16 grads the squared-sum
            # reduction would lose ~3 digits (the cast fuses into the
            # reduce — no fp32 gradient copy materializes)
            "grad_norm": optax.global_norm(jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads
            )),
        }
        return new_state, metrics

    return train_step


def _make_loss_and_grad(
    unet_cfg, vae_cfg, schedule, loss_name, multi_res_noise_cfg,
    use_mask, compute_dtype, remat, grad_dtype,
):
    """(params, vae_params, text_embed, batch, key) -> (loss, grads):
    the shared diffusion fine-tuning objective + backward used by both
    the single-program step (make_train_step) and the two-program
    accumulation pair (make_accum_pair)."""
    loss_fn_inner = get_loss(loss_name)
    ds = vae_cfg.downscale_factor

    def loss_and_grad(master_params, vae_params, text_embed, batch, key):
        rgb = batch["rgb_norm"]
        gt = batch["gt_norm"]
        bsz = rgb.shape[0]
        k_t, k_noise = jax.random.split(key)

        # frozen encoders — no gradient flows into the VAE
        rgb_latent = vae_lib.encode_mean_scaled(vae_params, vae_cfg, rgb)
        n_groups = gt.shape[-1] // 3
        if n_groups <= 1:
            gt_latent = vae_lib.encode_mean_scaled(vae_params, vae_cfg, gt)
        else:  # IID: encode each 3-channel target, concat latents
            gt_latent = jnp.concatenate(
                [
                    vae_lib.encode_mean_scaled(
                        vae_params, vae_cfg, gt[..., 3 * i : 3 * i + 3]
                    )
                    for i in range(n_groups)
                ],
                axis=-1,
            )
        rgb_latent = jax.lax.stop_gradient(rgb_latent)
        gt_latent = jax.lax.stop_gradient(gt_latent.astype(jnp.float32))

        timesteps = jax.random.randint(
            k_t, (bsz,), 0, schedule.num_train_timesteps
        )

        if multi_res_noise_cfg is not None:
            strength = jnp.asarray(
                multi_res_noise_cfg.get("strength", 0.9), jnp.float32
            )
            if multi_res_noise_cfg.get("annealed", False):
                strength = strength * (
                    timesteps.astype(jnp.float32) / schedule.num_train_timesteps
                )
            else:
                strength = jnp.broadcast_to(strength, (bsz,))
            noise = multi_res_noise_like(
                k_noise, gt_latent, strength,
                multi_res_noise_cfg.get("downscale_strategy", "original"),
            )
        else:
            noise = jax.random.normal(k_noise, gt_latent.shape, jnp.float32)

        noisy_latents = schedule.add_noise(gt_latent, noise, timesteps)
        target = schedule.training_target(gt_latent, noise, timesteps)

        if use_mask and "valid_mask" in batch:
            mask_lat = downsample_valid_mask(batch["valid_mask"], ds)
            mask_lat = jnp.repeat(mask_lat, gt_latent.shape[-1], axis=-1)
        else:
            mask_lat = None

        def loss_of(params, pre_cast=False):
            if compute_dtype is not None and not pre_cast:
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(compute_dtype), params
                )
            x = jnp.concatenate(
                [rgb_latent, noisy_latents.astype(rgb_latent.dtype)], axis=-1
            )
            x = x.astype(params["conv_in"]["weight"].dtype)
            fwd = lambda p, xx: unet_lib.apply(
                p, unet_cfg, xx, timesteps, text_embed
            )
            fwd = _apply_remat(fwd, remat)
            pred = fwd(params, x)
            pred = pred.astype(jnp.float32)
            if mask_lat is not None:
                diff = loss_fn_inner(pred, target, reduction="none")
                n = jnp.maximum(jnp.sum(mask_lat), 1)
                return jnp.sum(jnp.where(mask_lat, diff, 0.0)) / n
            return loss_fn_inner(pred, target, reduction="mean")

        if grad_dtype is not None:
            # differentiate w.r.t. the cast params: the gradient tree is
            # stored in grad_dtype (see make_train_step docstring),
            # halving its HBM
            cast_params = jax.tree_util.tree_map(
                lambda p: p.astype(grad_dtype), master_params
            )
            return jax.value_and_grad(
                lambda p: loss_of(p, pre_cast=True)
            )(cast_params)
        return jax.value_and_grad(loss_of)(master_params)

    return loss_and_grad


def make_accum_pair(
    unet_cfg: unet_lib.UNetConfig,
    vae_cfg: vae_lib.VAEConfig,
    schedule: DiffusionSchedule,
    inner_optimizer: optax.GradientTransformation,
    accumulation_steps: int,
    loss_name: str = "mse_loss",
    multi_res_noise_cfg: Optional[dict] = None,
    use_mask: bool = True,
    compute_dtype=jnp.bfloat16,
    remat="none",
    accum_dtype=None,
    grad_dtype=None,
):
    """Two-PROGRAM gradient accumulation: returns (micro_step,
    apply_step, optimizer_like).

    The single-program path (make_train_step + gradient_accumulation)
    fuses the optimizer update into every micro-step under lax.cond, so
    one program must fit BOTH the fwd/bwd activation peak AND the
    optimizer-update transients (fp32 mean cast, update tree). Measured
    on a 16 GB v5e: that sum kills the bs8 geometry (OOM under every
    dtype combination). Splitting decouples the peaks:

      * micro_step(state, vae_params, text_embed, batch, key)
        -> (state, metrics): loss/grads + `acc += grad` ONLY. Peak =
        activations + grads + accumulator; no optimizer transients.
      * apply_step(state) -> state: mean = acc/k -> inner optimizer
        update -> zero the accumulator. Peak = params + optimizer state
        + the fp32 mean; no activations.

    Both donate their TrainState and preserve its structure
    (_AccumState opt_state, same as gradient_accumulation), so
    checkpointing/resume/ZeRO-1 sharding are unchanged; `optimizer_like`
    carries the matching .init for create_train_state. The trainer calls
    micro_step every batch and apply_step at each k-th boundary.
    `state.step` counts micro-steps (like the fused path).

    Semantics match gradient_accumulation exactly (asserted in
    tests/test_accumulation.py::test_accum_pair_matches_fused)."""
    k = int(accumulation_steps)
    loss_and_grad = _make_loss_and_grad(
        unet_cfg, vae_cfg, schedule, loss_name, multi_res_noise_cfg,
        use_mask, compute_dtype, remat, grad_dtype,
    )

    def init(params):
        acc = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, accum_dtype or p.dtype), params
        )
        return _AccumState(
            jnp.zeros((), jnp.int32), acc, inner_optimizer.init(params)
        )

    optimizer_like = optax.GradientTransformation(
        init, lambda *a, **kw: (_ for _ in ()).throw(RuntimeError(
            "make_accum_pair state: use micro_step/apply_step, not "
            "optimizer.update"
        ))
    )

    def micro_step(state: TrainState, vae_params, text_embed, batch, key):
        loss, grads = loss_and_grad(
            state.params, vae_params, text_embed, batch, key
        )
        st: _AccumState = state.opt_state
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), st.acc, grads
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads
            )),
        }
        new_state = TrainState(
            step=state.step + 1, params=state.params,
            opt_state=_AccumState(st.mini_step + 1, acc, st.inner),
        )
        return new_state, metrics

    def apply_step(state: TrainState):
        st: _AccumState = state.opt_state
        mean = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32) / k, st.acc
        )
        updates, inner2 = inner_optimizer.update(
            mean, st.inner, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, st.acc)
        return TrainState(
            step=state.step, params=new_params,
            opt_state=_AccumState(st.mini_step, zeroed, inner2),
        )

    return micro_step, apply_step, optimizer_like


def zero1_state_shardings(mesh, state_shapes: TrainState, axis_name: str = "data"):
    """ZeRO-1 sharding layout for a :class:`TrainState`.

    Params stay replicated (every chip needs them each forward), but the
    optimizer state — Adam's m/v moments and the MultiSteps gradient
    accumulator, ~3x the param bytes in fp32 — is sharded: each array is
    split along its largest mesh-divisible axis. XLA's GSPMD partitioner
    then computes the Adam update shard-local and all-gathers only the
    parameter delta, which is the ZeRO-1 communication pattern expressed
    purely through sharding annotations (no hand-written collectives).

    Why it matters here: the reference trains with Adam on one GPU
    (src/trainer/marigold_depth_trainer.py:105); at SD2 scale fp32
    Adam(+accumulation) state is ~14 GB and OOMs one 16 GB v5e chip.
    Sharding it over N chips leaves ~14/N GB per chip, so reference-parity
    Adam runs on any >=2-chip mesh while staying bit-equivalent to the
    replicated update (tests/test_mesh.py).

    ``state_shapes`` is the TrainState (arrays or ShapeDtypeStructs, e.g.
    from ``jax.eval_shape(create_train_state, ...)``). Returns a TrainState
    of NamedShardings with the same tree structure.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis_name]
    repl = NamedSharding(mesh, P())

    def shard_leaf(s):
        best = None
        for ax, size in enumerate(s.shape):
            if size % n == 0 and size >= n and (
                best is None or size > s.shape[best]
            ):
                best = ax
        if best is None:
            return repl
        spec = [None] * len(s.shape)
        spec[best] = axis_name
        return NamedSharding(mesh, P(*spec))

    return TrainState(
        step=repl,
        params=jax.tree_util.tree_map(lambda _: repl, state_shapes.params),
        opt_state=jax.tree_util.tree_map(shard_leaf, state_shapes.opt_state),
    )


class _AccumState(NamedTuple):
    mini_step: jax.Array  # int32, counts micro-steps
    acc: Any  # grad-shaped running sum in accum_dtype
    inner: Any  # inner optimizer state


def gradient_accumulation(
    inner: optax.GradientTransformation, k: int, dtype=None
) -> optax.GradientTransformation:
    """optax.MultiSteps semantics with a controllable accumulator dtype.

    Why not MultiSteps: its fp32 accumulator is a full gradient-sized
    buffer (3.46 GB at SD2 scale) that coexists with the live gradient at
    the micro-step peak — measured on a 16 GB v5e, that combination
    admits only small-activation configs (bs2; bs4/bs8 OOM under every
    remat policy). Storing the running sum in bf16 halves the buffer and
    unlocks the fast bs8 geometry. bf16 summation of k<=16 same-scale
    gradients loses ~3 decimal digits — far below minibatch noise, and
    Adafactor/Adam normalize per-tensor — but it IS a numerics deviation,
    so fp32 (dtype=None) stays the default and the bf16 accumulator is
    opt-in (config optimizer.accum_dtype, docs/PERFORMANCE.md r4).

    The inner update runs under lax.cond on the k-th micro-step with the
    accumulated mean; other micro-steps return zero updates (params
    unchanged), exactly like MultiSteps.
    """
    k = int(k)

    def init(params):
        acc = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, dtype or p.dtype), params
        )
        return _AccumState(jnp.zeros((), jnp.int32), acc, inner.init(params))

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), state.acc, grads
        )
        boundary = (state.mini_step + 1) % k == 0

        def do_update(operand):
            acc_, inner_state = operand
            mean = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32) / k, acc_
            )
            updates, inner2 = inner.update(mean, inner_state, params)
            zeroed = jax.tree_util.tree_map(jnp.zeros_like, acc_)
            return updates, zeroed, inner2

        def skip(operand):
            acc_, inner_state = operand
            updates = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), grads
            )
            return updates, acc_, inner_state

        updates, acc_out, inner_out = jax.lax.cond(
            boundary, do_update, skip, (acc, state.inner)
        )
        return updates, _AccumState(state.mini_step + 1, acc_out, inner_out)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float,
    lr_schedule_fn: Optional[Callable] = None,
    accumulation_steps: int = 1,
    name: str = "adam",
    accum_dtype=None,
) -> optax.GradientTransformation:
    """Optimizer(+schedule) with optional gradient accumulation (the
    reference's effective-batch-32 = 2 x 16 accumulation,
    train_marigold_depth.yaml:29).

    name:
      * "adam" — the reference's optimizer (marigold_depth_trainer.py:105).
        Caution at SD2 scale on one 16 GB chip: fp32 params + m + v +
        the MultiSteps accumulator is ~13.9 GB of persistent state and
        the step OOMs (measured); use >=2 chips or "adafactor".
      * "adafactor" — factored second moments (state ~ params in MBs, not
        GBs): the TPU-native choice for single-chip full-size fine-tuning.
    """
    if lr_schedule_fn is not None:
        sched = lambda step: lr * lr_schedule_fn(step)
    else:
        sched = lr
    name = name.lower()
    if name == "adam":
        opt = optax.adam(sched)
    elif name == "adafactor":
        opt = optax.adafactor(
            sched, multiply_by_parameter_scale=False, clipping_threshold=1.0
        )
    else:
        raise ValueError(f"unknown optimizer: {name}")
    if accumulation_steps > 1:
        if accum_dtype is not None:
            # bf16 accumulator: halves the 3.46 GB buffer; opt-in
            # (see gradient_accumulation docstring)
            opt = gradient_accumulation(
                opt, accumulation_steps, dtype=accum_dtype
            )
        else:
            opt = optax.MultiSteps(opt, every_k_schedule=accumulation_steps)
    return opt
