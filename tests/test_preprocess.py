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


# ---------------- full drivers on synthetic HDF5 scenes ---------------- #

_H, _W = 12, 16


def _h5_write(path, arr):
    import h5py

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("dataset", data=arr)


def _make_scene(root, scene, cam="cam_00", frames=(0,), task="normals",
                rng=None, nan_normals=(), bad_albedo=()):
    """Synthetic Hypersim raw scene tree (HDF5 layout as on disk)."""
    sdir = os.path.join(root, scene)
    final = os.path.join(sdir, "images", f"scene_{cam}_final_hdf5")
    geom = os.path.join(sdir, "images", f"scene_{cam}_geometry_hdf5")
    for fr in frames:
        stem_f = os.path.join(final, f"frame.{fr:04d}")
        stem_g = os.path.join(geom, f"frame.{fr:04d}")
        color = rng.uniform(0.1, 2.0, (_H, _W, 3))
        _h5_write(stem_f + ".color.hdf5", color)
        _h5_write(stem_g + ".render_entity_id.hdf5",
                  np.ones((_H, _W), np.int32))
        if task == "normals":
            n = np.tile([0.0, 0.0, 1.0], (_H, _W, 1))
            if fr in nan_normals:
                n = n.copy()
                n[0, 0, 0] = np.nan
            _h5_write(stem_g + ".normal_cam.hdf5", 2.0 * n)  # unnormalized
            # world normals point +z; surface at z=0
            _h5_write(stem_g + ".normal_world.hdf5", n)
            _h5_write(stem_g + ".position.hdf5", np.zeros((_H, _W, 3)))
            _h5_write(stem_g + ".depth_meters.hdf5",
                      np.full((_H, _W), 3.0))
        elif task == "iid":
            albedo = rng.uniform(0.1, 0.9, (_H, _W, 3))
            if fr in bad_albedo:
                albedo = albedo + 2.0  # albedo_max > 1 -> reject
            shading = rng.uniform(0.5, 1.0, (_H, _W, 3))
            residual = rng.uniform(0.0, 0.01, (_H, _W, 3))
            _h5_write(stem_f + ".diffuse_reflectance.hdf5", albedo)
            _h5_write(stem_f + ".diffuse_illumination.hdf5", shading)
            _h5_write(stem_f + ".residual.hdf5", residual)
            # color consistent with decomposition so the PSNR gate passes
            _h5_write(stem_f + ".color.hdf5",
                      albedo * shading + residual)
    # camera BELOW the surface, looking up: world n.v < 0 -> flip branch
    cam_pos = np.tile([0.0, 0.0, -10.0], (max(frames) + 1, 1))
    _h5_write(os.path.join(sdir, "_detail", cam,
                           "camera_keyframe_positions.hdf5"), cam_pos)


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("scene_name,camera_name,frame_id,"
                "included_in_public_release,split_partition_name\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def test_hypersim_normals_driver(tmp_path, rng):
    from marigold_tpu.preprocess.hypersim import main as hypersim_main

    raw = tmp_path / "raw"
    out = tmp_path / "out"
    _make_scene(str(raw), "ai_001_001", frames=(0, 1), task="normals",
                rng=rng, nan_normals=(1,))
    _write_csv(str(tmp_path / "split.csv"), [
        ("ai_001_001", "cam_00", 0, "True", "train"),
        ("ai_001_001", "cam_00", 1, "True", "train"),   # NaN -> skipped
        ("ai_001_001", "cam_00", 2, "True", "train"),   # missing -> skipped
    ])
    rc = hypersim_main([
        "--task", "normals", "--split_csv", str(tmp_path / "split.csv"),
        "--dataset_dir", str(raw), "--output_dir", str(out),
    ])
    assert rc == 0
    lines = (out / "hypersim_filtered_train.txt").read_text().splitlines()
    assert lines == [
        "train/ai_001_001/rgb_cam_00_fr0000.png "
        "train/ai_001_001/normal_cam_cam_00_fr0000.npy"
    ]
    n = np.load(out / "train/ai_001_001/normal_cam_cam_00_fr0000.npy")
    assert n.shape == (_H, _W, 3)
    # camera at -z, world n=+z -> n.v=-1 < -1e-3 -> flipped, unit length
    np.testing.assert_allclose(n, np.tile([0.0, 0.0, -1.0], (_H, _W, 1)),
                               atol=1e-6)

    # the output tree is consumable by the shipped dataset class
    from marigold_tpu.config import Config
    from marigold_tpu.data import DatasetMode, get_dataset

    ds = get_dataset(
        Config(name="hypersim_normals", dir=".",
               filenames=str(out / "hypersim_filtered_train.txt"),
               disp_name="hs"),
        base_data_dir=str(out), mode=DatasetMode.EVAL,
    )
    s = ds[0]
    assert s["rgb_int"].shape == (_H, _W, 3)
    np.testing.assert_allclose(
        np.linalg.norm(s["normals"], axis=-1), 1.0, atol=1e-5)


def test_hypersim_iid_driver_and_resume(tmp_path, rng):
    from marigold_tpu.preprocess.hypersim import main as hypersim_main

    raw = tmp_path / "raw"
    out = tmp_path / "out"
    _make_scene(str(raw), "ai_002_002", frames=(0, 1), task="iid",
                rng=rng, bad_albedo=(1,))
    _write_csv(str(tmp_path / "split.csv"), [
        ("ai_002_002", "cam_00", 0, "True", "train"),
        ("ai_002_002", "cam_00", 1, "True", "train"),   # bad albedo -> reject
        ("ai_002_002", "cam_00", 1, "False", "train"),  # not public -> drop
    ])
    argv = [
        "--task", "iid", "--split_csv", str(tmp_path / "split.csv"),
        "--dataset_dir", str(raw), "--output_dir", str(out),
    ]
    assert hypersim_main(argv) == 0
    lines = (out / "filename_list_train.txt").read_text().splitlines()
    assert len(lines) == 1
    cols = lines[0].split()
    assert [c.split("/")[-1].split("_")[0] for c in cols] == [
        "rgb", "albedo", "shading", "residual", "shading"]
    # reject left a marker file (resumable) logging the offending range
    marker = (out / "train/ai_002_002_invalid/status_cam_00_fr0001.txt")
    assert marker.exists()
    assert "2." in marker.read_text()

    # stats JSON carries the per-plane percentiles
    import json

    stats = json.loads((out / cols[4]).read_text())
    for key in ("albedo_98", "shading_98", "residual_02", "residual_98",
                "shading_mean", "residual_std"):
        assert key in stats
    # albedo saved clipped to [0,1]
    a = np.load(out / cols[1])
    assert a.min() >= 0 and a.max() <= 1

    # ---- resume: re-run must be a no-op (markers + outputs respected) ----
    mtimes = {c: os.path.getmtime(out / c) for c in cols}
    marker_mtime = os.path.getmtime(marker)
    assert hypersim_main(argv) == 0
    assert {c: os.path.getmtime(out / c) for c in cols} == mtimes
    assert os.path.getmtime(marker) == marker_mtime
    lines2 = (out / "filename_list_train.txt").read_text().splitlines()
    assert lines2 == lines

    # the output tree is consumable by the shipped dataset class
    from marigold_tpu.config import Config
    from marigold_tpu.data import DatasetMode, get_dataset

    ds = get_dataset(
        Config(name="hypersim_iid", dir=".",
               filenames=str(out / "filename_list_train.txt"),
               disp_name="hiid"),
        base_data_dir=str(out), mode=DatasetMode.EVAL,
    )
    s = ds[0]
    assert s["albedo"].shape == (_H, _W, 3)
    assert s["mask_albedo"].all()
    assert s["shading"].max() <= 1.0 + 1e-6


def test_interiorverse_normals_driver(tmp_path, rng):
    from marigold_tpu.data.exr import write_exr
    from marigold_tpu.preprocess.interiorverse import preprocess_normals

    scene = tmp_path / "raw" / "scenes_85" / "L3D001"
    scene.mkdir(parents=True)
    rgb_hdr = rng.uniform(0, 2.0, (_H, _W, 3)).astype(np.float32)
    write_exr(str(scene / "000_im.exr"), rgb_hdr)
    n = rng.normal(size=(_H, _W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    write_exr(str(scene / "000_normal.exr"), 0.5 * n)  # unnormalized input
    # frame 001: normal map with an invalid (zero) pixel -> skipped
    bad = n.copy()
    bad[0, 0] = 0
    write_exr(str(scene / "001_im.exr"), rgb_hdr)
    write_exr(str(scene / "001_normal.exr"), bad)
    # frame 002: NaN rgb -> rgb skipped (no png), normal still processed
    nan_rgb = rgb_hdr.copy()
    nan_rgb[0, 0, 0] = np.nan
    write_exr(str(scene / "002_im.exr"), nan_rgb)
    write_exr(str(scene / "002_normal.exr"), n)

    out = tmp_path / "out"
    out.mkdir()
    lines = preprocess_normals(str(tmp_path / "raw"), str(out))
    assert lines == [
        "L3D001/000_img.png L3D001/000_normal.npy",
        "L3D001/002_img.png L3D001/002_normal.npy",
    ]
    saved = np.load(out / "scenes_85/L3D001/000_normal.npy")
    np.testing.assert_allclose(saved, n, atol=2e-3)  # fp16 exr round-trip
    assert (out / "scenes_85/L3D001/000_img.png").exists()
    assert not (out / "scenes_85/L3D001/001_normal.npy").exists()
    assert (out / "interiorverse_filtered_all.txt").read_text().splitlines() \
        == lines
