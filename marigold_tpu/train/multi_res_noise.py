"""Multi-resolution (pyramid) noise for diffusion training, TPU-native.

Behavioral reference: src/util/multi_res_noise.py:37-103 — sum of bilinear-
upsampled Gaussian noise pyramids weighted by strength**i, renormalized to
unit std. Four downscale strategies: original / every_layer / power_of_two /
random_step.

TPU-first redesign: the reference draws a *random* downscale factor
r ~ U[2,4) per call, producing data-dependent tensor shapes — which would
force an XLA recompile per training step. Here every pyramid level has a
static power-of-two shape (trace-time constant); the random factor instead
modulates the per-level *amplitude* so that the amplitude-vs-spatial-scale
profile matches the reference's in expectation:

  reference level i: spatial scale r**i, amplitude strength**i
  => amplitude(scale s) = strength ** log_r(s)
  ours  level i: spatial scale 2**i, amplitude strength ** (i * log(2)/log(r))

For r == 2 this is exact (power_of_two / every_layer strategies are exact by
construction). Inputs are NHWC (TPU layout).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _num_levels(h: int, w: int, cap: int = 10) -> int:
    return min(cap, int(math.log2(max(min(h, w), 2))) + 1)


def multi_res_noise_like(
    key: jax.Array,
    x: jax.Array,
    strength=0.9,
    downscale_strategy: str = "original",
) -> jax.Array:
    """Returns noise with the same NHWC shape as `x`, approximately unit std.

    `strength` may be a scalar or a per-sample [B] array (the reference's
    annealed variant passes strength * t/T per sample,
    marigold_depth_trainer.py:272-290).
    """
    b, h, w, c = x.shape
    strength = jnp.asarray(strength, jnp.float32)
    if strength.ndim == 1:
        strength = strength.reshape(-1, 1, 1, 1)

    n_levels = _num_levels(h, w)
    keys = jax.random.split(key, n_levels + 2)

    if downscale_strategy in ("original", "random_step"):
        r = jax.random.uniform(keys[-1], (), jnp.float32) * 2.0 + 2.0
        # amplitude exponent per octave; 'random_step' downsamples by r each
        # step (scale r**i at level i) == same amplitude profile as 'original'
        octave_pow = jnp.log(2.0) / jnp.log(r)
    elif downscale_strategy in ("every_layer", "power_of_two"):
        octave_pow = jnp.asarray(1.0, jnp.float32)
    else:
        raise ValueError(f"unknown downscale strategy: {downscale_strategy}")

    noise = jax.random.normal(keys[0], x.shape, jnp.float32)
    for i in range(1, n_levels):
        hh, ww = max(1, h >> i), max(1, w >> i)
        lvl = jax.random.normal(keys[i], (b, hh, ww, c), jnp.float32)
        up = jax.image.resize(lvl, x.shape, method="bilinear")
        noise = noise + up * strength ** (i * octave_pow)

    noise = noise / jnp.maximum(jnp.std(noise), 1e-8)
    return noise.astype(x.dtype)
