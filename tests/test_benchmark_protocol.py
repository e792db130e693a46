"""Protocol smoke tests: drive cli/benchmark.py end-to-end (infer -> eval
-> summary txt) for EVERY benchmark registry entry, against the SHIPPED
dataset configs and split lists, on synthetic mini data trees containing
just the first N split entries. Each entry's distinct quirks run through
the full CLI chain: KITTI 352x1216 bm-crop + eigen mask, ETH3D 4032x6048
binary-float depth + alignment_max_res 1024, DIODE explicit .npy masks,
NYU eigen crop, the 5 normals sets, InteriorVerse EXR appearance (material
in linear space + LPIPS), Hypersim lighting (scale-align + quantile map).

Reference protocols: script/depth/eval/*.sh, script/normals/eval/*.sh,
script/iid/eval/*.sh.
"""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from fixtures import make_tiny_checkpoint
from marigold_tpu.data.exr import write_exr

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _split_lines(cfg_path, n):
    with open(os.path.join(REPO, cfg_path)) as f:
        ds = yaml.safe_load(f)["dataset"]
    with open(os.path.join(REPO, ds["filenames"])) as f:
        lines = [ln.split() for ln in f.readlines()[:n] if ln.strip()]
    return ds["dir"], lines


def _smooth_depth(h, w, lo, hi):
    g = np.sin(np.linspace(0, 3, h)[:, None] + np.linspace(0, 2, w)[None, :])
    return lo + (hi - lo) * (g + 1) / 2


def _save_rgb(path, h, w, rng):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if max(h, w) > 2000:
        # big files (ETH3D): a smooth gradient compresses to a tiny JPG
        x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
        y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
        arr = np.stack([x + 0 * y, y + 0 * x, (x + y) / 2], -1).astype(np.uint8)
    else:
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def _save_unit_normals(path, h, w, rng):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = rng.standard_normal((h, w, 3)).astype(np.float32)
    n[..., 2] = np.abs(n[..., 2]) + 0.3  # camera-facing hemisphere
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    np.save(path, n)


# ---------------- per-benchmark mini-tree builders ---------------- #
# each: build(root_dir, lines, rng) where root_dir is base_data_dir/<dir>
# (tar paths are created as directories — the tar-or-dir reader treats a
# non-file path as a directory)


def build_depth_nyu(root, lines, rng):
    for rgb_rel, depth_rel, filled_rel in lines:
        _save_rgb(os.path.join(root, rgb_rel), 480, 640, rng)
        mm = (_smooth_depth(480, 640, 2.0, 3.5) * 1000).astype(np.uint16)
        for rel in (depth_rel, filled_rel):
            os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
            Image.fromarray(mm).save(os.path.join(root, rel))


def build_depth_kitti(root, lines, rng):
    for rgb_rel, depth_rel, _focal in lines:
        _save_rgb(os.path.join(root, rgb_rel), 375, 1242, rng)
        # depth PNG in 1/256 m units; zeros are invalid (sparse GT)
        d = (_smooth_depth(375, 1242, 5.0, 30.0) * 256).astype(np.uint16)
        d[::3] = 0  # sparsity like projected LiDAR
        os.makedirs(os.path.dirname(os.path.join(root, depth_rel)), exist_ok=True)
        Image.fromarray(d).save(os.path.join(root, depth_rel))


def build_depth_eth3d(root, lines, rng):
    H, W = 4032, 6048  # hardcoded in ETH3DDepthDataset
    for rgb_rel, depth_rel in lines:
        _save_rgb(os.path.join(root, rgb_rel), H, W, rng)
        d = _smooth_depth(H, W, 1.0, 40.0).astype(np.float32)
        d[:50] = np.inf  # the loader must map inf -> 0 (invalid)
        p = os.path.join(root, depth_rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        d.tofile(p)


def build_depth_scannet(root, lines, rng):
    for rgb_rel, depth_rel in lines:
        _save_rgb(os.path.join(root, rgb_rel), 480, 640, rng)
        mm = (_smooth_depth(480, 640, 1.5, 6.0) * 1000).astype(np.uint16)
        p = os.path.join(root, depth_rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(mm).save(p)


def build_depth_diode(root, lines, rng):
    for rgb_rel, depth_rel, mask_rel in lines:
        _save_rgb(os.path.join(root, rgb_rel), 192, 256, rng)
        d = _smooth_depth(192, 256, 1.0, 20.0).astype(np.float32)[..., None]
        mask = np.ones((192, 256), bool)
        mask[:20] = False  # explicit invalid region
        np.save(os.path.join(root, depth_rel), d)
        np.save(os.path.join(root, mask_rel), mask)


def _build_normals(root, lines, rng, hw=(96, 128)):
    for rgb_rel, normal_rel in lines:
        _save_rgb(os.path.join(root, rgb_rel), hw[0], hw[1], rng)
        _save_unit_normals(os.path.join(root, normal_rel), hw[0], hw[1], rng)


def build_iid_interiorverse(root, lines, rng):
    h, w = 96, 128
    for im_rel, albedo_rel, material_rel, mask_rel in lines:
        for rel in (im_rel, albedo_rel, material_rel, mask_rel):
            os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
        # HDR linear radiance (values may exceed 1)
        write_exr(os.path.join(root, im_rel),
                  rng.uniform(0, 2, (h, w, 3)).astype(np.float32))
        write_exr(os.path.join(root, albedo_rel),
                  rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        write_exr(os.path.join(root, material_rel),
                  rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        write_exr(os.path.join(root, mask_rel),
                  np.ones((h, w, 3), np.float32))


def build_iid_hypersim(root, lines, rng):
    h, w = 96, 128
    for rgb_rel, albedo_rel, shading_rel, residual_rel, stats_rel in lines:
        _save_rgb(os.path.join(root, rgb_rel), h, w, rng)
        np.save(os.path.join(root, albedo_rel),
                rng.uniform(0.05, 1, (h, w, 3)).astype(np.float32))
        np.save(os.path.join(root, shading_rel),
                rng.uniform(0, 3, (h, w, 3)).astype(np.float32))
        np.save(os.path.join(root, residual_rel),
                rng.uniform(0, 0.5, (h, w, 3)).astype(np.float32))
        with open(os.path.join(root, stats_rel), "w") as f:
            json.dump({}, f)


BENCHES = [
    # (modality, benchmark, builder, ckpt kwargs, n_samples, expect_metrics)
    ("depth", "nyu", build_depth_nyu, {"mode": "depth"}, 2,
     ["abs_relative_difference", "delta1_acc"]),
    ("depth", "kitti", build_depth_kitti, {"mode": "depth"}, 1,
     ["abs_relative_difference", "silog_rmse"]),
    ("depth", "eth3d", build_depth_eth3d, {"mode": "depth"}, 1,
     ["abs_relative_difference"]),
    ("depth", "scannet", build_depth_scannet, {"mode": "depth"}, 2,
     ["abs_relative_difference"]),
    ("depth", "diode", build_depth_diode, {"mode": "depth"}, 2,
     ["abs_relative_difference"]),
    ("normals", "scannet", _build_normals, {"mode": "normals"}, 2,
     ["mean_angular_error", "sub11_25_error"]),
    ("normals", "nyu", _build_normals, {"mode": "normals"}, 2,
     ["mean_angular_error"]),
    ("normals", "ibims", _build_normals, {"mode": "normals"}, 2,
     ["mean_angular_error"]),
    ("normals", "diode", _build_normals, {"mode": "normals"}, 2,
     ["mean_angular_error"]),
    ("normals", "oasis", _build_normals, {"mode": "normals"}, 2,
     ["mean_angular_error"]),
    ("iid", "appearance_interiorverse", build_iid_interiorverse,
     {"mode": "iid"}, 2, ["psnr_albedo", "psnr_material", "ssim_albedo"]),
    ("iid", "lighting_hypersim", build_iid_hypersim,
     {"mode": "iid", "iid_variant": "lighting"}, 2,
     ["psnr_albedo", "psnr_shading", "psnr_residual"]),
]


@pytest.mark.parametrize(
    "modality,bench,builder,ckpt_kwargs,n,expect",
    BENCHES, ids=[f"{m}-{b}" for m, b, *_ in BENCHES],
)
def test_benchmark_protocol(tmp_path, rng, modality, bench, builder,
                            ckpt_kwargs, n, expect, monkeypatch):
    from marigold_tpu.cli.benchmark import PROTOCOLS, main

    cfg_path = PROTOCOLS[modality][bench][0]
    ds_dir, lines = _split_lines(cfg_path, n)
    assert len(lines) == n, f"split list shorter than {n}?"
    base = tmp_path / "base_data"
    builder(str(base / ds_dir), lines, rng)

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"), **ckpt_kwargs)
    out_dir = tmp_path / "eval_out"

    if bench == "appearance_interiorverse":
        # LPIPS e2e: a correctly-shaped random-init weight file (the
        # offline converter's self-test mode) must make the eval CLI
        # report lpips_* (reference script/iid/eval.py:113-131)
        import sys

        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from export_lpips_weights import random_init_flat

        lp = tmp_path / "lpips_rand.npz"
        np.savez(lp, **random_init_flat())
        monkeypatch.setenv("LPIPS_WEIGHTS", str(lp))
        expect = expect + ["lpips_albedo", "lpips_material"]
    elif modality == "iid":
        monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)

    rc = main([
        "--modality", modality,
        "--benchmark", bench,
        "--checkpoint", ckpt,
        "--base_data_dir", str(base),
        "--output_dir", str(out_dir),
        "--ensemble_size", "2",     # smoke override (protocol: 10 / 1)
        "--denoise_steps", "1",     # smoke override (protocol: 1 / 4)
        "--processing_res", "64",   # smoke override (protocol pins vary)
        "--limit", str(n),
    ])
    assert rc == 0

    metric_dir = out_dir / modality / bench / "eval_metric"
    txt = metric_dir / "eval_metrics-least_square.txt"
    csv_path = metric_dir / "per_sample_metrics.csv"
    assert txt.exists() and csv_path.exists()
    text = txt.read_text()
    for m in expect:
        assert m in text, f"{m} missing from summary:\n{text}"
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) == 1 + n
    # every metric value in the summary must be finite
    import re

    for val in re.findall(r"-?\d+\.\d+(?:e[+-]?\d+)?", text):
        assert np.isfinite(float(val))

    pred_dir = out_dir / modality / bench / "prediction" / f"{modality}_npy"
    preds = sorted(os.listdir(pred_dir))
    if modality == "iid":
        n_targets = 3 if ckpt_kwargs.get("iid_variant") == "lighting" else 2
        assert len(preds) == n * n_targets
    else:
        assert len(preds) == n
    arr = np.load(pred_dir / preds[0])
    assert np.isfinite(arr).all()


def test_benchmark_nyu_protocol_details(tmp_path, rng):
    """NYU extras beyond the generic parametrized assertions: prediction
    naming mode + full-input-resolution outputs in [0,1]."""
    from marigold_tpu.cli.benchmark import PROTOCOLS, main

    cfg_path = PROTOCOLS["depth"]["nyu"][0]
    ds_dir, lines = _split_lines(cfg_path, 2)
    base = tmp_path / "base_data"
    build_depth_nyu(str(base / ds_dir), lines, rng)
    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"), mode="depth")
    out_dir = tmp_path / "eval_out"
    rc = main([
        "--modality", "depth", "--benchmark", "nyu",
        "--checkpoint", ckpt, "--base_data_dir", str(base),
        "--output_dir", str(out_dir),
        "--ensemble_size", "2", "--processing_res", "64", "--limit", "2",
    ])
    assert rc == 0
    pred_dir = out_dir / "depth" / "nyu" / "prediction" / "depth_npy"
    preds = sorted(os.listdir(pred_dir))
    assert len(preds) == 2
    p = np.load(pred_dir / preds[0])
    assert p.shape == (480, 640)
    assert np.isfinite(p).all() and p.min() >= 0.0 and p.max() <= 1.0


def test_benchmark_all_depth(tmp_path, rng):
    """`--benchmark all` — the exact code path scripts/eval/depth_all.sh
    drives (the one-command real-weights parity gate, README) — must
    resolve every depth registry entry end-to-end and write each
    dataset's summary + per-sample CSV."""
    from marigold_tpu.cli.benchmark import PROTOCOLS, main

    builders = {
        "nyu": build_depth_nyu, "kitti": build_depth_kitti,
        "eth3d": build_depth_eth3d, "scannet": build_depth_scannet,
        "diode": build_depth_diode,
    }
    assert set(builders) == set(PROTOCOLS["depth"]), (
        "depth registry changed — update this test's builders")
    base = tmp_path / "base_data"
    for bench, builder in builders.items():
        ds_dir, lines = _split_lines(PROTOCOLS["depth"][bench][0], 1)
        builder(str(base / ds_dir), lines, rng)

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"), mode="depth")
    out_dir = tmp_path / "eval_out"
    rc = main([
        "--modality", "depth", "--benchmark", "all",
        "--checkpoint", ckpt, "--base_data_dir", str(base),
        "--output_dir", str(out_dir),
        "--ensemble_size", "2", "--denoise_steps", "1",
        "--processing_res", "64", "--limit", "1",
    ])
    assert rc == 0
    for bench in builders:
        md = out_dir / "depth" / bench / "eval_metric"
        assert (md / "eval_metrics-least_square.txt").exists(), bench
        assert (md / "per_sample_metrics.csv").exists(), bench


def test_benchmark_iid_serving_batch(tmp_path, rng, monkeypatch):
    """--serving_batch routes IID protocol inference through the batched
    multi-image program (the iid branch of cli/infer's fast path: float
    [0,1] inputs, per-target fan-out) and the eval chain still runs."""
    from marigold_tpu.cli.benchmark import PROTOCOLS, main

    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    cfg_path = PROTOCOLS["iid"]["appearance_interiorverse"][0]
    ds_dir, lines = _split_lines(cfg_path, 2)
    base = tmp_path / "base_data"
    build_iid_interiorverse(str(base / ds_dir), lines, rng)
    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"), mode="iid")
    out_dir = tmp_path / "eval_out"

    rc = main([
        "--modality", "iid",
        "--benchmark", "appearance_interiorverse",
        "--checkpoint", ckpt,
        "--base_data_dir", str(base),
        "--output_dir", str(out_dir),
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "64",
        "--serving_batch", "2",
        "--limit", "2",
    ])
    assert rc == 0
    pred_dir = (out_dir / "iid" / "appearance_interiorverse" / "prediction"
                / "iid_npy")
    preds = sorted(os.listdir(pred_dir))
    assert len(preds) == 2 * 2  # 2 samples x (albedo, material)
    for p in preds:
        arr = np.load(pred_dir / p)
        assert np.isfinite(arr).all()
        assert arr.ndim == 3 and arr.shape[0] == 3  # CHW per-target
    txt = (out_dir / "iid" / "appearance_interiorverse" / "eval_metric"
           / "eval_metrics-least_square.txt")
    assert txt.exists()
