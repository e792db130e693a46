"""Resize-semantics parity vs torch/torchvision oracles.

The reference resizes GT depth/normals with torchvision NEAREST_EXACT
(half-pixel centers; src/dataset/base_depth_dataset.py:248-254,
marigold/util/image_util.py:123-134) and inputs with antialiased bilinear.
These tests pin our host- and device-side resizes to the torch behavior:
notably, jax.image.resize(method='nearest') uses half-pixel centers, i.e.
it IS torch's nearest-exact (NOT the legacy floor-sampling 'nearest')."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from marigold_tpu.data.base_depth import nearest_resize
from marigold_tpu.pipelines import image_util


@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 5), (3, 2)),
    ((7, 5), (4, 3)),
    ((7, 5), (14, 10)),
    ((480, 640), (240, 320)),
    ((37, 53), (480, 640)),
])
def test_host_nearest_resize_is_nearest_exact(in_hw, out_hw, rng):
    x = rng.standard_normal(in_hw + (2,)).astype(np.float32)
    ours = nearest_resize(x, out_hw)
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None], size=out_hw,
            mode="nearest-exact",
        )[0].permute(1, 2, 0).numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("out_hw", [(3, 2), (4, 3), (14, 10), (5, 5)])
@pytest.mark.parametrize("method", ["nearest", "nearest-exact"])
def test_jax_nearest_is_nearest_exact(out_hw, method, rng):
    x = rng.standard_normal((1, 7, 5, 1)).astype(np.float32)
    ours = np.asarray(image_util.resize_jax(jnp.asarray(x), out_hw, method))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="nearest-exact",
        ).permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("out_hw", [(24, 18), (100, 77)])
def test_bilinear_antialias_close_to_torch(out_hw, rng):
    """Downsampling with antialias: jax's triangle filter vs torchvision's
    antialiased bilinear — small numerical differences allowed, no
    systematic shift."""
    x = rng.standard_normal((1, 96, 72, 3)).astype(np.float32)
    ours = np.asarray(image_util.resize_jax(jnp.asarray(x), out_hw, "bilinear"))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", antialias=True, align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
    )
    assert np.mean(np.abs(ours - theirs)) < 0.02
    np.testing.assert_allclose(ours, theirs, atol=0.12)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((96, 96), (768, 768)),   # upscale (the resize-back path)
    ((768, 768), (480, 640)), # downscale back to input res
    ((37, 53), (40, 60)),
    ((40, 60), (37, 53)),
])
def test_bilinear_resize_host_matches_torch(in_hw, out_hw, rng):
    """The host-side resize-back must be torch F.interpolate bilinear
    (align_corners=False, NO antialias) — bit-level parity with the
    reference's output path."""
    x = rng.standard_normal(in_hw + (3,)).astype(np.float32)
    ours = image_util.bilinear_resize_host(x, out_hw)
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None], size=out_hw,
            mode="bilinear", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("method,mode", [
    ("bilinear", "bilinear"), ("bicubic", "bicubic"),
])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((96, 96), (768, 768)),    # upscale (protocol resize-back)
    ((768, 768), (480, 640)),  # downscale back (input < processing_res)
    ((37, 53), (40, 60)),
    ((40, 60), (37, 53)),
])
def test_resize_host_matches_torch_antialias(method, mode, in_hw, out_hw, rng):
    """The reference's resize-back is torchvision resize(interpolation=
    resample_method, antialias=True) (marigold_depth_pipeline.py:306-312);
    resize_host must match it at every scale — antialias only changes
    downscales, so the old non-AA host resize diverged exactly there."""
    x = rng.standard_normal(in_hw + (3,)).astype(np.float32)
    ours = image_util.resize_host(x, out_hw, method)
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None], size=out_hw,
            mode=mode, antialias=True, align_corners=False,
        )[0].permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_resize_host_nearest_is_nearest_exact(rng):
    """'nearest' maps to torchvision NEAREST_EXACT (reference
    image_util.py:123-134) in resize_host too."""
    x = rng.standard_normal((41, 57, 3)).astype(np.float32)
    ours = image_util.resize_host(x, (29, 37), "nearest")
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None], size=(29, 37),
            mode="nearest-exact",
        )[0].permute(1, 2, 0).numpy()
    )
    np.testing.assert_array_equal(ours, theirs)
