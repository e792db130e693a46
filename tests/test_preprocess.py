"""Preprocessing math tests (Hypersim tone map / distance->depth / normal
fixing) + InteriorVerse tar packing."""

import os

import numpy as np

from marigold_tpu.preprocess.hypersim import (
    dist_2_depth,
    fix_normals,
    tone_map,
)
from marigold_tpu.preprocess.interiorverse import pack_scenes


def test_tone_map_target_percentile(rng):
    rgb = rng.uniform(0, 3.0, (64, 64, 3))
    entity = np.ones((64, 64), int)
    out = tone_map(rgb, entity)
    assert out.min() >= 0 and out.max() <= 1
    # after inverse gamma, the 90th-percentile brightness of the scaled
    # linear image must be 0.8^(2.2)... i.e. luma(out^2.2)'s p90 ~= 0.8^2.2
    luma_lin = (
        0.3 * out[..., 0] ** 2.2 + 0.59 * out[..., 1] ** 2.2
        + 0.11 * out[..., 2] ** 2.2
    )
    # cross-channel gamma doesn't commute exactly with luma; loose check
    assert 0.3 < np.percentile(luma_lin, 90) < 0.9


def test_tone_map_all_invalid():
    rgb = np.full((8, 8, 3), 2.0)
    entity = np.full((8, 8), -1)
    out = tone_map(rgb, entity)  # scale 1.0 -> gamma only
    np.testing.assert_allclose(out, np.clip(2.0 ** (1 / 2.2), 0, 1), atol=1e-6)


def test_dist_2_depth_center_identity():
    d = np.full((768, 1024), 5.0)
    depth = dist_2_depth(d)
    # at the image center the ray is (almost) the optical axis
    assert abs(depth[384, 512] - 5.0) < 0.01
    # off-center depth < distance
    assert depth[0, 0] < 5.0
    assert depth.max() <= 5.0 + 1e-6


def test_fix_normals_flips_backfacing():
    h, w = 4, 4
    normal_cam = np.tile([0.0, 0.0, 2.0], (h, w, 1))  # unnormalized
    normal_world = np.tile([0.0, 0.0, 1.0], (h, w, 1))
    position = np.zeros((h, w, 3))
    cam_pos = np.asarray([0.0, 0.0, -10.0])  # surface faces AWAY from cam
    out = fix_normals(normal_cam, normal_world, position, cam_pos)
    # n.v = (0,0,1).(0,0,-1) = -1 < -1e-3 -> flipped, and unit length
    np.testing.assert_allclose(
        out, np.tile([0.0, 0.0, -1.0], (h, w, 1)), atol=1e-6
    )


def test_fix_normals_nan_skips():
    bad = np.full((2, 2, 3), np.nan)
    assert fix_normals(bad, bad, np.zeros((2, 2, 3)), np.zeros(3)) is None


def test_fix_normals_inf_position_patched():
    h, w = 3, 3
    n = np.tile([0.0, 0.0, 1.0], (h, w, 1))
    pos = np.zeros((h, w, 3))
    pos[0, 0, 2] = np.inf
    out = fix_normals(n.copy(), n, pos, np.asarray([0.0, 0.0, 10.0]))
    assert np.isfinite(out).all()


def test_interiorverse_packing(tmp_path):
    scene = tmp_path / "L3D001"
    scene.mkdir()
    for fid in ("000", "001"):
        for kind in ("im", "albedo", "material", "mask"):
            (scene / f"{fid}_{kind}.exr").write_bytes(b"exr-stub")
    # incomplete frame: missing mask
    for kind in ("im", "albedo", "material"):
        (scene / f"002_{kind}.exr").write_bytes(b"exr-stub")

    tar_path = str(tmp_path / "iv.tar")
    lines = pack_scenes(str(tmp_path), tar_path, scenes=["L3D001"])
    assert len(lines) == 2  # incomplete frame skipped
    assert lines[0].split()[0] == "L3D001/000_im.exr"
    import tarfile

    with tarfile.open(tar_path) as tar:
        names = tar.getnames()
    assert "./L3D001/000_albedo.exr" in names
    assert not any("002" in n for n in names)


def test_lpips_with_synthetic_weights(tmp_path, rng):
    """LPIPS structure check with random weights: zero distance for
    identical inputs, positive for different ones, deterministic."""
    import numpy as np

    flat = {}
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512)]
    for i, (cin, cout) in zip(
        [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28], cfg
    ):
        flat[f"features.{i}.weight"] = rng.normal(
            0, 0.05, (cout, cin, 3, 3)
        ).astype(np.float32)
        flat[f"features.{i}.bias"] = np.zeros(cout, np.float32)
    for k, c in enumerate([64, 128, 256, 512, 512]):
        flat[f"lins.{k}.weight"] = np.abs(
            rng.normal(0, 1, (1, c, 1, 1))
        ).astype(np.float32)
    np.savez(tmp_path / "lpips.npz", **flat)

    from marigold_tpu.eval.lpips import get_lpips

    fn = get_lpips(str(tmp_path / "lpips.npz"))
    assert fn is not None
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert fn(img, img) < 1e-6
    other = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    d = fn(img, other)
    assert d > 0
    assert abs(fn(img, other) - d) < 1e-6
    # missing weights -> None
    assert get_lpips(str(tmp_path / "nope.npz")) is None
