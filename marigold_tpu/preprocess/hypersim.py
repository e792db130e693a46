"""Hypersim raw-data preprocessing (HDF5 -> training-ready files).

Behavioral reference: script/{depth,normals,iid}/dataset_preprocess/hypersim/
— the published Marigold training data recipe:
  * tone_map: scale the HDR render so the 90th-percentile CCIR601 luma maps
    to 0.8 after gamma 1/2.2, clip to [0,1] (hypersim_util.py:35-74).
  * dist_2_depth: Hypersim "depth" HDF5 stores ray distance; convert to
    planar depth with focal 886.81 at 1024x768 (hypersim_util.py:78-95;
    apple/ml-hypersim#9). Saved as uint16 PNG in millimeters.
  * normals: unit-normalize, patch -inf camera positions, flip normals
    whose world-space n.v is < -1e-3 (back-facing renderer artifacts)
    (preprocess_hypersim_normals.py:144-183).
  * IID lighting: extract diffuse_reflectance / diffuse_illumination /
    residual HDF5 planes to .npy (preprocess_hypersim_iid.py:136-156).

Entry point: python -m marigold_tpu.preprocess.hypersim --task depth ...
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

IMG_WIDTH = 1024
IMG_HEIGHT = 768
FOCAL_LENGTH = 886.81


def tone_map(rgb: np.ndarray, entity_id_map: np.ndarray) -> np.ndarray:
    """HDR [H,W,3] -> tone-mapped sRGB [0,1]."""
    gamma = 1.0 / 2.2
    inv_gamma = 1.0 / gamma
    percentile = 90
    brightness_nth_percentile_desired = 0.8

    valid_mask = entity_id_map != -1
    if np.count_nonzero(valid_mask) == 0:
        scale = 1.0
    else:
        brightness = 0.3 * rgb[..., 0] + 0.59 * rgb[..., 1] + 0.11 * rgb[..., 2]
        brightness_valid = brightness[valid_mask]
        eps = 1e-4
        current = np.percentile(brightness_valid, percentile)
        if current < eps:
            scale = 0.0
        else:
            scale = (
                np.power(brightness_nth_percentile_desired, inv_gamma) / current
            )
    out = np.power(np.maximum(scale * rgb, 0), gamma)
    return np.clip(out, 0, 1)


def dist_2_depth(distance: np.ndarray, width: int = IMG_WIDTH,
                 height: int = IMG_HEIGHT,
                 focal: float = FOCAL_LENGTH) -> np.ndarray:
    """Ray distance [H,W] -> planar depth [H,W]."""
    px = np.linspace(-0.5 * width + 0.5, 0.5 * width - 0.5, width,
                     dtype=np.float32)[None, :]
    py = np.linspace(-0.5 * height + 0.5, 0.5 * height - 0.5, height,
                     dtype=np.float32)[:, None]
    norm = np.sqrt(px**2 + py**2 + focal**2)
    return distance / norm * focal


def fix_normals(
    normal_cam: np.ndarray,
    normal_world: np.ndarray,
    position_world: np.ndarray,
    camera_position: np.ndarray,
) -> Optional[np.ndarray]:
    """Unit-normalize camera-space normals and flip back-facing ones (world
    n.v < -1e-3). Returns None if the map contains NaNs (sample skipped,
    reference behavior)."""
    if np.any(np.isnan(normal_cam)):
        return None
    h, w, _ = normal_cam.shape

    def normalize(a):
        n = np.linalg.norm(a, axis=-1, keepdims=True)
        return a / np.clip(n, 1e-12, None)

    normal_cam = normalize(normal_cam.reshape(-1, 3)).reshape(h, w, 3)

    position = position_world.copy()
    if np.any(np.isinf(position)):  # ai_051_004-style -inf artifacts
        inf_idx = np.where(np.isinf(position))
        for hh, ww, ch in zip(*inf_idx):
            src = hh + 1 if hh == 0 else hh - 1
            position[hh, ww, ch] = position[src, ww, ch]

    to_cam = normalize(
        (camera_position[None, :] - position.reshape(-1, 3))
    )
    n_dot_v = np.sum(normal_world.reshape(-1, 3) * to_cam, axis=1)
    back_facing = (n_dot_v < -1e-3).reshape(h, w)
    normal_cam[back_facing] *= -1
    return normal_cam


def _read_h5(path: str) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f["dataset"])


def process_depth_frame(scene_dir: str, cam: str, frame: int, out_dir: str):
    """One frame: final color HDF5 + geometry distance HDF5 -> rgb PNG +
    mm-uint16 depth PNG. Returns (rgb_rel, depth_rel, invalid_ratio)."""
    from PIL import Image

    stem_final = os.path.join(
        scene_dir, "images", f"scene_{cam}_final_hdf5", f"frame.{frame:04d}"
    )
    stem_geom = os.path.join(
        scene_dir, "images", f"scene_{cam}_geometry_hdf5", f"frame.{frame:04d}"
    )
    rgb_hdr = _read_h5(stem_final + ".color.hdf5").astype(np.float64)
    dist = _read_h5(stem_geom + ".depth_meters.hdf5").astype(np.float64)
    entity = _read_h5(stem_geom + ".render_entity_id.hdf5").astype(int)

    rgb_tm = tone_map(rgb_hdr, entity)
    rgb_int = (rgb_tm * 255).astype(np.uint8)

    depth = dist_2_depth(dist)
    valid = entity != -1
    invalid_ratio = 1.0 - valid.mean()
    depth = np.where(valid, depth, 0.0)
    depth_mm = (depth * 1000.0).astype(np.uint16)

    scene_name = os.path.basename(scene_dir.rstrip("/"))
    os.makedirs(os.path.join(out_dir, scene_name), exist_ok=True)
    rgb_rel = os.path.join(scene_name, f"rgb_{cam}_fr{frame:04d}.png")
    depth_rel = os.path.join(scene_name, f"depth_plane_{cam}_fr{frame:04d}.png")
    Image.fromarray(rgb_int).save(os.path.join(out_dir, rgb_rel))
    Image.fromarray(depth_mm).save(os.path.join(out_dir, depth_rel))
    return rgb_rel, depth_rel, invalid_ratio


def main(argv=None):
    parser = argparse.ArgumentParser(description="Preprocess Hypersim raw data")
    parser.add_argument("--task", choices=["depth", "normals", "iid"],
                        default="depth")
    parser.add_argument("--split_csv", type=str, required=True,
                        help="metadata_images_split_scene_v1.csv")
    parser.add_argument("--dataset_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    args = parser.parse_args(argv)

    import csv

    rows = []
    with open(args.split_csv) as f:
        for row in csv.DictReader(f):
            if row.get("included_in_public_release", "True") in ("True", "true"):
                rows.append(row)

    filename_lists: dict = {}
    for row in rows:
        split = row.get("split_partition_name", "train")
        scene = row["scene_name"]
        cam = row["camera_name"]
        frame = int(row["frame_id"])
        out_split = os.path.join(args.output_dir, split)
        os.makedirs(out_split, exist_ok=True)
        try:
            if args.task == "depth":
                rgb_rel, depth_rel, _ = process_depth_frame(
                    os.path.join(args.dataset_dir, scene), cam, frame, out_split
                )
                filename_lists.setdefault(split, []).append(
                    f"{rgb_rel} {depth_rel}"
                )
            else:
                raise NotImplementedError(
                    f"task {args.task}: frame-level API available as library "
                    "functions (fix_normals / tone_map); wire per your raw "
                    "layout"
                )
        except FileNotFoundError as e:
            print(f"skip {scene}/{cam}/{frame}: {e}")
    for split, lines in filename_lists.items():
        with open(
            os.path.join(args.output_dir, f"filename_list_{split}.txt"), "w"
        ) as f:
            f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
