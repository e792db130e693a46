"""LPIPS perceptual metric (VGG16 variant) in JAX.

Role parity: the reference's IID eval uses torchmetrics LPIPS
(script/iid/eval.py:44-48,113-131), which downloads pretrained VGG16 +
learned linear calibration weights at runtime. This implementation is
offline-first: weights load from a local file (safetensors/npz) passed
explicitly or via $LPIPS_WEIGHTS; without weights the metric is
unavailable and callers should skip it (the eval CLI reports which metrics
ran).

Weight file layout (flat names):
  features.<idx>.weight / .bias   — torchvision VGG16 conv layers (OIHW)
  lins.<k>.weight                 — LPIPS 1x1 calibration convs [1,C,1,1]
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 "features" conv indices and the 5 LPIPS tap points
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_TAP_AFTER_RELU_OF = [1, 3, 6, 9, 12]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_POOL_BEFORE_CONV = {2, 4, 7, 10}  # conv positions preceded by maxpool

# ImageNet normalization in LPIPS convention (input in [-1,1])
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, params: dict):
        self.params = params

    @classmethod
    def from_file(cls, path: Optional[str] = None) -> Optional["LPIPS"]:
        path = path or os.environ.get("LPIPS_WEIGHTS")
        if not path or not os.path.exists(path):
            return None
        if path.endswith(".npz"):
            with np.load(path) as z:
                flat = {k: z[k] for k in z.files}
        else:
            from safetensors import safe_open

            flat = {}
            with safe_open(path, framework="numpy") as st:
                for k in st.keys():
                    flat[k] = st.get_tensor(k)
        params = {"convs": [], "lins": []}
        for i, idx in enumerate(_VGG16_CONV_IDX):
            w = flat[f"features.{idx}.weight"]  # OIHW
            b = flat[f"features.{idx}.bias"]
            params["convs"].append(
                {
                    "weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(b),
                }
            )
        for k in range(5):
            lw = flat[f"lins.{k}.weight"]  # [1,C,1,1]
            params["lins"].append(jnp.asarray(lw.reshape(-1)))
        return cls(params)

    def _features(self, x):
        """x: [B,H,W,3] in [-1,1] -> list of 5 normalized feature maps."""
        h = (x - _SHIFT) / _SCALE
        feats = []
        conv_i = 0
        for pos in range(len(_VGG16_CONV_IDX)):
            if pos in _POOL_BEFORE_CONV:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID",
                )
            p = self.params["convs"][conv_i]
            h = jax.lax.conv_general_dilated(
                h, p["weight"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            h = jax.nn.relu(h)
            conv_i += 1
            if pos in _TAP_AFTER_RELU_OF:
                n = jnp.sqrt(jnp.sum(h**2, axis=-1, keepdims=True))
                feats.append(h / jnp.clip(n, 1e-10, None))
        return feats

    def __call__(self, pred, gt) -> float:
        """pred/gt: [H,W,3] in [0,1] -> LPIPS distance (lower=better)."""
        a = jnp.asarray(pred, jnp.float32)[None] * 2.0 - 1.0
        b = jnp.asarray(gt, jnp.float32)[None] * 2.0 - 1.0
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for k in range(5):
            d = (fa[k] - fb[k]) ** 2
            w = self.params["lins"][k]
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return float(total)


def get_lpips(path: Optional[str] = None) -> Optional[LPIPS]:
    return LPIPS.from_file(path)
