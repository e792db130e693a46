"""Depth normalization for training data.

Semantics defined by the reference's ScaleShiftDepthNormalizer
(src/util/depth_transform.py:77-130): map the [q, 1-q] quantile range of
valid depth linearly onto [norm_min, norm_max], optionally clipping.

The data path runs on host (numpy); a jnp twin is provided for fused
on-device validation/visualization paths.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_depth_normalizer(cfg):
    """Factory mirroring reference src/util/depth_transform.py:35-52.
    `cfg` is a mapping with keys type/norm_min/norm_max/min_max_quantile/clip,
    or None for identity."""
    if cfg is None:
        return lambda x, valid_mask=None, clip=None: x
    if cfg["type"] == "scale_shift_depth":
        return ScaleShiftDepthNormalizer(
            norm_min=cfg.get("norm_min", -1.0),
            norm_max=cfg.get("norm_max", 1.0),
            min_max_quantile=cfg.get("min_max_quantile", 0.02),
            clip=cfg.get("clip", True),
        )
    raise NotImplementedError(f"unknown depth normalizer: {cfg['type']}")


class ScaleShiftDepthNormalizer:
    """Affine-invariant depth normalizer: d' = (d - q_lo) / (q_hi - q_lo)
    mapped to [norm_min, norm_max]. Not invertible without GT."""

    is_absolute = False
    far_plane_at_max = True

    def __init__(self, norm_min=-1.0, norm_max=1.0, min_max_quantile=0.02, clip=True):
        self.norm_min = float(norm_min)
        self.norm_max = float(norm_max)
        self.norm_range = self.norm_max - self.norm_min
        self.min_quantile = float(min_max_quantile)
        self.max_quantile = 1.0 - self.min_quantile
        self.clip = bool(clip)

    def __call__(self, depth_linear, valid_mask=None, clip=None):
        clip = self.clip if clip is None else clip
        d = np.asarray(depth_linear, dtype=np.float32)
        if valid_mask is None:
            valid_mask = np.ones_like(d, dtype=bool)
        valid_mask = np.asarray(valid_mask, dtype=bool) & (d > 0)
        vals = d[valid_mask]
        if vals.size == 0:
            return np.zeros_like(d)
        lo = np.quantile(vals, self.min_quantile)
        hi = np.quantile(vals, self.max_quantile)
        rng = max(hi - lo, 1e-8)
        out = (d - lo) / rng * self.norm_range + self.norm_min
        if clip:
            out = np.clip(out, self.norm_min, self.norm_max)
        return out

    def scale_back(self, depth_norm):
        """[norm_min, norm_max] -> [0, 1]."""
        return (np.asarray(depth_norm) - self.norm_min) / self.norm_range

    def denormalize(self, depth_norm, **kwargs):
        return self.scale_back(depth_norm)

    # on-device twin for fused pipelines -------------------------------- #

    def normalize_jax(self, depth, valid_mask=None, clip=None):
        clip = self.clip if clip is None else clip
        d = jnp.asarray(depth, jnp.float32)
        mask = jnp.ones_like(d, dtype=bool) if valid_mask is None else valid_mask
        mask = mask & (d > 0)
        # masked quantile with static shapes: sort with invalids pushed to +inf
        flat = jnp.where(mask, d, jnp.inf).reshape(-1)
        order = jnp.sort(flat)
        n_valid = jnp.sum(mask)
        lo_idx = jnp.clip((n_valid.astype(jnp.float32) - 1) * self.min_quantile, 0, None)
        hi_idx = jnp.clip((n_valid.astype(jnp.float32) - 1) * self.max_quantile, 0, None)

        def q_at(fidx):
            i0 = jnp.floor(fidx).astype(jnp.int32)
            i1 = jnp.clip(i0 + 1, 0, flat.shape[0] - 1)
            w = fidx - i0.astype(jnp.float32)
            return order[i0] * (1 - w) + order[i1] * w

        lo, hi = q_at(lo_idx), q_at(hi_idx)
        rng = jnp.maximum(hi - lo, 1e-8)
        out = (d - lo) / rng * self.norm_range + self.norm_min
        if clip:
            out = jnp.clip(out, self.norm_min, self.norm_max)
        return out
