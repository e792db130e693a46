"""Image utilities for the pipelines.

Behavioral reference: marigold/util/image_util.py — resize_max_res
(aspect-preserving max-edge resize with antialiasing, lines 90-120),
colorize_depth_maps (matplotlib colormap, 38-76), chw2hwc (79-87),
srgb<->linear gamma 2.2 (144-149), float2int (137-141).

TPU note: `jax.image.resize(..., antialias=True)` implements the same
area-weighted triangle filter torchvision's antialiased bilinear uses, so
device-side resizes match the reference's preprocessing closely; host-side
(numpy) twins are provided for the data/eval layers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

RESAMPLE_METHODS = {
    "bilinear": "linear",
    "bicubic": "cubic",
    # jax.image.resize 'nearest' samples at half-pixel centers, which IS
    # torchvision's NEAREST_EXACT — the variant the reference uses on every
    # GT/depth resize (tested vs torch in tests/test_resize_parity.py).
    "nearest": "nearest",
    "nearest-exact": "nearest",
}


def get_resample_method(name: str) -> str:
    """Maps the reference's torchvision method names
    (image_util.py:123-134) onto jax.image method names."""
    if name not in RESAMPLE_METHODS:
        raise ValueError(f"Unknown resampling method: {name}")
    return RESAMPLE_METHODS[name]


def resize_jax(img: jax.Array, out_hw: tuple[int, int], method: str = "bilinear",
               antialias: bool = True) -> jax.Array:
    """img: [..., H, W, C] -> [..., h, w, C]."""
    m = get_resample_method(method)
    shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1])
    if m == "nearest":
        return jax.image.resize(img, shape, method="nearest")
    return jax.image.resize(img, shape, method=m, antialias=antialias)


def resize_max_res_shape(h: int, w: int, max_edge: int) -> tuple[int, int]:
    """Target shape of aspect-preserving max-edge resize
    (reference image_util.py:90-120: int(h*scale), floor)."""
    scale = max_edge / max(h, w)
    return max(int(h * scale), 1), max(int(w * scale), 1)


def resize_max_res_jax(img: jax.Array, max_edge: int, method: str = "bilinear"):
    h, w = img.shape[-3], img.shape[-2]
    nh, nw = resize_max_res_shape(h, w, max_edge)
    return resize_jax(img, (nh, nw), method)


def resize_np(img: np.ndarray, out_hw: tuple[int, int], method: str = "bilinear",
              antialias: bool = True) -> np.ndarray:
    return np.asarray(
        resize_jax(jnp.asarray(img), out_hw, method, antialias)
    )


def _aa_axis_matrix(n_in: int, n_out: int, method: str) -> np.ndarray:
    """[n_out, n_in] weight matrix of torchvision's antialiased separable
    resize (torch aten upsample_*2d_aa): kernel support scales with the
    downscale ratio, truncated edge kernels renormalize; on upscale the
    clamped scale is 1, which for bilinear reduces exactly to plain
    interpolation (and for bicubic to the PIL a=-0.5 cubic)."""
    ratio = n_in / n_out
    clamped = max(ratio, 1.0)
    if method == "linear":
        f_support = 1.0

        def filt(x):
            return np.maximum(0.0, 1.0 - np.abs(x))
    else:  # bicubic (PIL/AA cubic, a = -0.5)
        f_support = 2.0
        a = -0.5

        def filt(x):
            x = np.abs(x)
            return np.where(
                x < 1.0,
                ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
                np.where(
                    x < 2.0,
                    (((x - 5.0) * x + 8.0) * x - 4.0) * a,
                    0.0,
                ),
            )

    support = f_support * clamped
    centers = ratio * (np.arange(n_out) + 0.5)
    xmin = np.maximum((centers - support + 0.5).astype(np.int64), 0)
    xmax = np.minimum((centers + support + 0.5).astype(np.int64), n_in)
    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        ks = np.arange(xmin[i], xmax[i])
        w = filt((ks + 0.5 - centers[i]) / clamped)
        s = w.sum()
        if s > 0:
            W[i, ks] = w / s
    return W.astype(np.float32)


def resize_host(img: np.ndarray, out_hw: tuple[int, int],
                method: str = "bilinear") -> np.ndarray:
    """Pure-numpy resize with torchvision-`resize(..., antialias=True)`
    semantics — the transform the reference applies on the resize-back
    path (marigold_depth_pipeline.py:306-312: interpolation =
    resample_method, antialias=True; antialias only changes downscales).
    Runs on host: no device dispatch, no per-shape compilation.
    method: bilinear | bicubic | nearest | nearest_exact.
    img: [..., H, W, C]."""
    h, w = img.shape[-3], img.shape[-2]
    th, tw = out_hw
    if (h, w) == (th, tw):
        return np.asarray(img)
    m = get_resample_method(method)  # 'linear' | 'cubic' | 'nearest'
    if m == "nearest":
        # half-pixel centers = torchvision NEAREST_EXACT, the variant the
        # reference maps "nearest" onto (image_util.py:123-134)
        ri = np.minimum(
            ((np.arange(th) + 0.5) * (h / th)).astype(np.int64), h - 1
        )
        ci = np.minimum(
            ((np.arange(tw) + 0.5) * (w / tw)).astype(np.int64), w - 1
        )
        return np.asarray(img)[..., ri, :, :][..., :, ci, :]
    x = np.asarray(img, np.float32)
    Wh = _aa_axis_matrix(h, th, m)
    Ww = _aa_axis_matrix(w, tw, m)
    tmp = np.einsum("oh,...hwc->...owc", Wh, x)
    return np.einsum("pw,...owc->...opc", Ww, tmp)


def bilinear_resize_host(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Pure-numpy bilinear resize, exactly torch's
    F.interpolate(mode='bilinear', align_corners=False, antialias=False).
    NOTE: for the reference-faithful resize-back (antialias=True,
    method-honoring) use `resize_host`; this plain form matches it
    exactly on upscales and stays for callers wanting the non-AA
    transform. img: [..., H, W, C]."""
    h, w = img.shape[-3], img.shape[-2]
    th, tw = out_hw
    if (h, w) == (th, tw):
        return np.asarray(img)

    def axis_weights(n_in, n_out):
        # src = (i + 0.5) * n_in/n_out - 0.5, clamped; linear weights
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0, n_in - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(img.dtype if img.dtype.kind == "f" else np.float32)
        return lo, hi, frac

    rlo, rhi, rf = axis_weights(h, th)
    clo, chi, cf = axis_weights(w, tw)
    x = np.asarray(img, np.float32)
    top = x[..., rlo, :, :] * (1 - rf)[:, None, None] + x[..., rhi, :, :] * rf[:, None, None]
    out = top[..., :, clo, :] * (1 - cf)[:, None] + top[..., :, chi, :] * cf[:, None]
    return out


def chw2hwc(chw: np.ndarray) -> np.ndarray:
    assert 3 == chw.ndim
    return np.moveaxis(chw, 0, -1)


def hwc2chw(hwc: np.ndarray) -> np.ndarray:
    assert 3 == hwc.ndim
    return np.moveaxis(hwc, -1, 0)


def colorize_depth_maps(
    depth_map,
    min_depth: float = 0.0,
    max_depth: float = 1.0,
    cmap: str = "Spectral",
    valid_mask=None,
) -> np.ndarray:
    """Depth [H,W] (or [B,H,W] / [1,1,H,W]-ish) -> colored [B,3,H,W] in
    [0,1] (reference image_util.py:38-76 semantics, CHW output kept for API
    compat)."""
    import matplotlib

    depth = np.asarray(depth_map, np.float32)
    if depth.ndim == 2:
        depth = depth[None]
    depth = depth.reshape((-1,) + depth.shape[-2:])

    cm = matplotlib.colormaps[cmap]
    rng = max(max_depth - min_depth, 1e-8)
    d = np.clip((depth - min_depth) / rng, 0, 1)
    img_colored_np = cm(d, bytes=False)[..., 0:3]  # [B,H,W,3]

    if valid_mask is not None:
        valid_mask = np.asarray(valid_mask, bool)
        if valid_mask.ndim == 2:
            valid_mask = valid_mask[None]
        valid_mask = valid_mask.reshape((-1,) + valid_mask.shape[-2:])
        img_colored_np[~valid_mask] = 0

    return np.moveaxis(img_colored_np, -1, 1)  # [B,3,H,W]


def float2int(img: np.ndarray, n_bits: int = 8) -> np.ndarray:
    """[0,1] float -> uint image (reference image_util.py:137-141)."""
    m = 2**n_bits - 1
    dtype = np.uint8 if n_bits == 8 else np.uint16
    return (np.clip(img, 0, 1) * m + 0.5).astype(dtype)


def srgb2linear(img):
    return img ** 2.2


def linear2srgb(img):
    xp = jnp if isinstance(img, jax.Array) else np
    return xp.clip(img, 0.0, None) ** (1.0 / 2.2)


def norm_to_rgb(norm: np.ndarray) -> np.ndarray:
    """[-1,1] normals [H,W,3] -> uint8 RGB."""
    return float2int((np.asarray(norm) + 1.0) / 2.0)
