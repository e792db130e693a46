"""LCM (Latent Consistency Model) scheduler — legacy support.

Role parity: the reference's depth pipeline accepts LCMScheduler for the
deprecated v1-0 LCM checkpoints (1-4 step inference with a deprecation
warning, marigold_depth_pipeline.py:368-377); normals/IID reject it.

Semantics (standard LCM sampling): consistency boundary conditions
  scaled_t = timestep_scaling * t
  c_skip = sigma_data^2 / (scaled_t^2 + sigma_data^2)
  c_out  = scaled_t / sqrt(scaled_t^2 + sigma_data^2)
  denoised = c_out * pred_x0(model_output) + c_skip * sample
followed by re-noising to the next timestep with FRESH noise (multi-step
consistency sampling); the final step returns `denoised`.
Inference timesteps are drawn from the `original_inference_steps`-point
training grid, evenly strided.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marigold_tpu.core.scheduler import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    base: DiffusionSchedule
    original_inference_steps: int = 50
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0

    @classmethod
    def create(cls, base: Optional[DiffusionSchedule] = None, **kw) -> "LCMSchedule":
        if base is None:
            base = DiffusionSchedule.create(
                rescale_betas_zero_snr=False, timestep_spacing="leading",
                prediction_type="epsilon",
            )
        return cls(base=base, **kw)

    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        if num_inference_steps > self.original_inference_steps:
            # diffusers LCMScheduler.set_timesteps raises here too; the
            # grid only has original_inference_steps entries, and silently
            # running fewer steps than requested would misattribute results
            raise ValueError(
                f"num_inference_steps ({num_inference_steps}) cannot exceed "
                f"original_inference_steps ({self.original_inference_steps})"
            )
        T = self.base.num_train_timesteps
        k = T // self.original_inference_steps
        # training grid: t = k*i + k - 1 for i in 0..origin_steps-1
        grid = np.arange(1, self.original_inference_steps + 1) * k - 1
        skip = max(len(grid) // num_inference_steps, 1)
        ts = grid[::-1][::skip][:num_inference_steps]
        return ts.astype(np.int64)

    def boundary_scalings(self, t: jax.Array):
        st = self.timestep_scaling * t.astype(jnp.float32)
        c_skip = self.sigma_data**2 / (st**2 + self.sigma_data**2)
        c_out = st / jnp.sqrt(st**2 + self.sigma_data**2)
        return c_skip, c_out

    def step(
        self,
        model_output: jax.Array,
        t: jax.Array,
        prev_t: jax.Array,
        sample: jax.Array,
        noise: jax.Array,
        is_last: jax.Array,
    ) -> tuple[jax.Array, jax.Array]:
        """One LCM step. Returns (prev_sample, denoised)."""
        x0, _ = self.base.pred_x0_and_eps(model_output, t, sample)
        c_skip, c_out = self.boundary_scalings(t)
        denoised = c_out * x0 + c_skip * sample.astype(jnp.float32)

        a_prev = self.base._alpha_at(prev_t).astype(jnp.float32)
        renoised = (
            jnp.sqrt(a_prev) * denoised
            + jnp.sqrt(1.0 - a_prev) * noise.astype(jnp.float32)
        )
        prev = jnp.where(is_last, denoised, renoised)
        return prev.astype(sample.dtype), denoised.astype(sample.dtype)
