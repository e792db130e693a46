"""Learning-rate schedules as optax-compatible pure functions.

`iter_exponential` reproduces the reference's IterExponential schedule
(src/util/lr_scheduler.py:34-59): linear warmup from 0 to 1 over
`warmup_steps`, then exponential decay reaching `final_ratio` at
`total_iter`, constant afterwards. Returned values are multiplicative
factors to apply to the base LR (use with optax.scale_by_schedule or pass
base_lr to get absolute LRs).
"""

from __future__ import annotations

import jax.numpy as jnp


def iter_exponential(total_iter: int, final_ratio: float, warmup_steps: int = 0):
    total_iter = int(total_iter)
    warmup_steps = int(warmup_steps)
    final_ratio = float(final_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        # decay: factor = exp(log(final_ratio) * (step - warmup) / (total - warmup))
        denom = jnp.maximum(total_iter - warmup_steps, 1)
        frac = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        decay = jnp.exp(jnp.log(final_ratio) * frac)
        out = jnp.where(step < warmup_steps, warm, decay)
        return out

    return schedule
