"""Diffusion schedules for TPU: DDIM (trailing spacing, zero-terminal-SNR)
and DDPM forward process, as pure functions over precomputed fp32 tables.

Design notes (TPU-first):
  * No Python objects with mutable state inside jit — the schedule is a
    frozen pytree of tables; every step is a pure function indexed by a
    traced timestep, so the denoise loop can run under `lax.scan` with the
    UNet traced exactly once.
  * All schedule math is fp32 (precision-sensitive: alphas_cumprod spans
    ~[0, 1) and the zero-SNR rescale divides by tiny numbers); activations
    may be bf16 — the step functions upcast scalars, not tensors.

Behavioral parity targets (semantics defined by the reference's use of
diffusers schedulers; see reference marigold/marigold_depth_pipeline.py:340-379
which *requires* trailing spacing + zero-SNR rescale for v1-1 checkpoints,
and src/trainer/marigold_depth_trainer.py:119-123 which builds the DDPM
training scheduler from the same config):
  * scaled_linear beta schedule (Stable Diffusion 2).
  * `rescale_betas_zero_snr`: terminal alphā_T == 0 exactly.
  * trailing timestep spacing: steps=1 -> [999]; steps=4 -> [999,749,499,249].
  * prediction types: epsilon, sample, v_prediction.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    """Beta table. `scaled_linear` is the SD2 schedule."""
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        t = np.arange(num_train_timesteps, dtype=np.float64)
        f = lambda u: np.cos((u / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.clip(1.0 - f(t + 1) / f(t), 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero.

    Standard zero-terminal-SNR recipe (Lin et al., "Common Diffusion Noise
    Schedules and Sample Steps are Flawed"): shift sqrt(alphā) so the last
    entry is 0, rescale so the first entry is unchanged, and rederive betas.
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    abar_sqrt = np.sqrt(alphas_cumprod)

    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()
    abar_sqrt = abar_sqrt - abar_sqrt_T
    abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)

    abar = abar_sqrt**2
    alphas_new = np.empty_like(abar)
    alphas_new[0] = abar[0]
    alphas_new[1:] = abar[1:] / abar[:-1]
    return 1.0 - alphas_new


def trailing_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Trailing spacing: the last step is always t = T-1 (required for
    zero-SNR 1-step inference — reference checks this at
    marigold_depth_pipeline.py:348-367)."""
    step = num_train_timesteps / num_inference_steps
    ts = np.round(np.arange(num_train_timesteps, 0, -step)).astype(np.int64) - 1
    return ts


def leading_timesteps(
    num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 0
) -> np.ndarray:
    step = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int64)
    return ts + steps_offset


def linspace_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    return (
        np.linspace(0, num_train_timesteps - 1, num_inference_steps)
        .round()[::-1]
        .astype(np.int64)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Frozen pytree of schedule tables + static config.

    Serves both roles the reference splits between diffusers' DDIMScheduler
    (inference: `ddim_step`) and DDPMScheduler (training forward process:
    `add_noise`, `velocity`).
    """

    alphas_cumprod: jax.Array  # [T] fp32
    final_alpha_cumprod: jax.Array  # [] fp32 (alpha for "step -1")
    # -- static fields (hashable; not traced) --
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    timestep_spacing: str = dataclasses.field(metadata=dict(static=True))
    steps_offset: int = dataclasses.field(metadata=dict(static=True))
    rescaled_zero_snr: bool = dataclasses.field(metadata=dict(static=True))
    beta_schedule: str = dataclasses.field(metadata=dict(static=True))
    beta_start: float = dataclasses.field(metadata=dict(static=True))
    beta_end: float = dataclasses.field(metadata=dict(static=True))
    # diffusers DDIM clip_sample: clamp pred x0 (and re-derive eps from
    # the clamped value) each step; SD2/Marigold configs ship False, but
    # older DDPM-style configs set it and silently ignoring it diverges
    clip_sample: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    clip_sample_range: float = dataclasses.field(
        default=1.0, metadata=dict(static=True)
    )

    # ------------------------------------------------------------------ #
    # Construction

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "v_prediction",
        timestep_spacing: str = "trailing",
        steps_offset: int = 1,
        rescale_betas_zero_snr: bool = True,
        set_alpha_to_one: bool = False,
        clip_sample: bool = False,
        clip_sample_range: float = 1.0,
    ) -> "DiffusionSchedule":
        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final_alpha = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
            final_alpha_cumprod=jnp.asarray(final_alpha, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
            rescaled_zero_snr=bool(rescale_betas_zero_snr),
            beta_schedule=beta_schedule,
            beta_start=beta_start,
            beta_end=beta_end,
            clip_sample=bool(clip_sample),
            clip_sample_range=float(clip_sample_range),
        )

    @classmethod
    def from_config(cls, cfg: Mapping[str, Any]) -> "DiffusionSchedule":
        """Build from a diffusers-style scheduler_config.json dict (the
        format shipped inside reference checkpoints' `scheduler/` dirs)."""
        return cls.create(
            num_train_timesteps=int(cfg.get("num_train_timesteps", 1000)),
            beta_start=float(cfg.get("beta_start", 0.00085)),
            beta_end=float(cfg.get("beta_end", 0.012)),
            beta_schedule=str(cfg.get("beta_schedule", "scaled_linear")),
            prediction_type=str(cfg.get("prediction_type", "v_prediction")),
            timestep_spacing=str(cfg.get("timestep_spacing", "trailing")),
            steps_offset=int(cfg.get("steps_offset", 1)),
            rescale_betas_zero_snr=bool(cfg.get("rescale_betas_zero_snr", True)),
            set_alpha_to_one=bool(cfg.get("set_alpha_to_one", False)),
            clip_sample=bool(cfg.get("clip_sample", False)),
            clip_sample_range=float(cfg.get("clip_sample_range", 1.0)),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "DiffusionSchedule":
        cfg_path = os.path.join(path, "scheduler_config.json")
        with open(cfg_path) as f:
            return cls.from_config(json.load(f))

    def to_config(self) -> dict:
        return {
            "_class_name": "DDIMScheduler",
            "num_train_timesteps": self.num_train_timesteps,
            "beta_start": self.beta_start,
            "beta_end": self.beta_end,
            "beta_schedule": self.beta_schedule,
            "prediction_type": self.prediction_type,
            "timestep_spacing": self.timestep_spacing,
            "steps_offset": self.steps_offset,
            "rescale_betas_zero_snr": self.rescaled_zero_snr,
            "set_alpha_to_one": bool(self.final_alpha_cumprod == 1.0),
            "clip_sample": self.clip_sample,
            "clip_sample_range": self.clip_sample_range,
        }

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "scheduler_config.json"), "w") as f:
            json.dump(self.to_config(), f, indent=2)

    # ------------------------------------------------------------------ #
    # Inference (DDIM, eta=0 — the reference never uses stochastic DDIM)

    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Host-side (static) timestep sequence, descending. Returned as a
        numpy array: it becomes a scan-over constant, never a traced value."""
        T = self.num_train_timesteps
        if num_inference_steps > T:
            raise ValueError(f"steps {num_inference_steps} > train timesteps {T}")
        if self.timestep_spacing == "trailing":
            return trailing_timesteps(T, num_inference_steps)
        if self.timestep_spacing == "leading":
            return leading_timesteps(T, num_inference_steps, self.steps_offset)
        if self.timestep_spacing == "linspace":
            return linspace_timesteps(T, num_inference_steps)
        raise ValueError(f"unknown timestep_spacing: {self.timestep_spacing}")

    def prev_timesteps(self, timesteps: np.ndarray) -> np.ndarray:
        """Previous timestep per DDIM step (may be negative => final alpha)."""
        n = len(timesteps)
        return timesteps - self.num_train_timesteps // n

    def _alpha_at(self, t: jax.Array) -> jax.Array:
        """alphā(t) with t possibly negative (maps to final_alpha_cumprod)."""
        a = jnp.take(self.alphas_cumprod, jnp.clip(t, 0, None), axis=0)
        return jnp.where(t < 0, self.final_alpha_cumprod, a)

    def pred_x0_and_eps(
        self, model_output: jax.Array, t: jax.Array, sample: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Convert the model output under this schedule's prediction_type into
        (predicted x0, predicted epsilon) at timestep t. Scalar math in fp32."""
        a_t = self._alpha_at(t).astype(jnp.float32)
        sqrt_a = jnp.sqrt(a_t)
        sqrt_b = jnp.sqrt(1.0 - a_t)
        x = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (x - sqrt_b * m) / jnp.maximum(sqrt_a, 1e-12)
            eps = m
        elif self.prediction_type == "sample":
            x0 = m
            eps = (x - sqrt_a * m) / jnp.maximum(sqrt_b, 1e-12)
        elif self.prediction_type == "v_prediction":
            x0 = sqrt_a * x - sqrt_b * m
            eps = sqrt_a * m + sqrt_b * x
        else:
            raise ValueError(f"unknown prediction_type: {self.prediction_type}")
        return x0, eps

    def ddim_step(
        self,
        model_output: jax.Array,
        t: jax.Array,
        prev_t: jax.Array,
        sample: jax.Array,
    ) -> jax.Array:
        """Deterministic DDIM update x_t -> x_{prev_t}.

        Reference behavior: diffusers DDIMScheduler.step with eta=0,
        clip_sample=False, called from the denoise loop at reference
        marigold_depth_pipeline.py:466-468.
        """
        x0, eps = self.pred_x0_and_eps(model_output, t, sample)
        if self.clip_sample:
            # diffusers clamps x0 then re-derives eps from the clamped
            # value (DDIMScheduler.step clipping block)
            a_t = self._alpha_at(t).astype(jnp.float32)
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
            eps = (sample.astype(jnp.float32) - jnp.sqrt(a_t) * x0) / (
                jnp.maximum(jnp.sqrt(1.0 - a_t), 1e-12)
            )
        a_prev = self._alpha_at(prev_t).astype(jnp.float32)
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return prev.astype(sample.dtype)

    # ------------------------------------------------------------------ #
    # Training forward process (DDPM role)

    def add_noise(
        self, x0: jax.Array, noise: jax.Array, t: jax.Array
    ) -> jax.Array:
        """q(x_t | x_0): x_t = sqrt(alphā_t) x0 + sqrt(1-alphā_t) eps.
        `t` broadcasts over leading batch dim ([B] against [B, ...])."""
        a = jnp.take(self.alphas_cumprod, t, axis=0).astype(jnp.float32)
        a = a.reshape(a.shape + (1,) * (x0.ndim - a.ndim))
        out = jnp.sqrt(a) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - a) * noise.astype(
            jnp.float32
        )
        return out.astype(x0.dtype)

    def velocity(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """v-prediction target: v = sqrt(alphā_t) eps - sqrt(1-alphā_t) x0."""
        a = jnp.take(self.alphas_cumprod, t, axis=0).astype(jnp.float32)
        a = a.reshape(a.shape + (1,) * (x0.ndim - a.ndim))
        out = jnp.sqrt(a) * noise.astype(jnp.float32) - jnp.sqrt(1.0 - a) * x0.astype(
            jnp.float32
        )
        return out.astype(x0.dtype)

    def training_target(
        self, x0: jax.Array, noise: jax.Array, t: jax.Array
    ) -> jax.Array:
        """The regression target per prediction_type (reference trainer
        dispatch at marigold_depth_trainer.py:315-325)."""
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "sample":
            return x0
        if self.prediction_type == "v_prediction":
            return self.velocity(x0, noise, t)
        raise ValueError(f"unknown prediction_type: {self.prediction_type}")


def check_trailing_zero_snr(schedule: DiffusionSchedule, num_steps: int) -> list[str]:
    """Reproduce the reference's inference-setting guardrails
    (_check_inference_step, marigold_depth_pipeline.py:340-379) as a list of
    warning strings (empty = all good)."""
    warnings = []
    if schedule.timestep_spacing != "trailing" or not schedule.rescaled_zero_snr:
        warnings.append(
            "scheduler is not configured with timestep_spacing='trailing' and "
            "rescale_betas_zero_snr=True; few-step inference quality will degrade"
        )
    if num_steps > 10:
        warnings.append(
            f"denoising_steps={num_steps}: more than 10 steps is unnecessary "
            "for v1-1 checkpoints and slows inference"
        )
    return warnings
