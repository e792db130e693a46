"""InteriorVerse preprocessing: pack per-scene EXR files into a tar archive
readable by the tar-transparent data layer.

Behavioral reference: script/iid/dataset_preprocess/interiorverse_appearance/
preprocess_interiorverse_iid.py — tars scene directories (im/albedo/material
/mask EXRs) and emits filename lists of the form
  <scene>/<id>_im.exr <scene>/<id>_albedo.exr <scene>/<id>_material.exr <scene>/<id>_mask.exr
"""

from __future__ import annotations

import argparse
import os
import re
import tarfile


def pack_scenes(dataset_dir: str, output_tar: str, scenes=None) -> list[str]:
    """Tar scene dirs; returns filename-list lines for frames having all of
    im/albedo/material/mask."""
    scenes = scenes or sorted(
        d for d in os.listdir(dataset_dir)
        if os.path.isdir(os.path.join(dataset_dir, d))
    )
    lines = []
    with tarfile.open(output_tar, "w") as tar:
        for scene in scenes:
            sdir = os.path.join(dataset_dir, scene)
            ids = sorted(
                {
                    m.group(1)
                    for f in os.listdir(sdir)
                    if (m := re.match(r"(\d+)_im\.exr$", f))
                }
            )
            for fid in ids:
                frame_files = [
                    f"{fid}_im.exr", f"{fid}_albedo.exr",
                    f"{fid}_material.exr", f"{fid}_mask.exr",
                ]
                if not all(
                    os.path.exists(os.path.join(sdir, f)) for f in frame_files
                ):
                    continue
                for f in frame_files:
                    tar.add(
                        os.path.join(sdir, f), arcname=f"./{scene}/{f}"
                    )
                lines.append(" ".join(f"{scene}/{f}" for f in frame_files))
    return lines


def main(argv=None):
    parser = argparse.ArgumentParser(description="Pack InteriorVerse scenes")
    parser.add_argument("--dataset_dir", type=str, required=True)
    parser.add_argument("--output_tar", type=str, required=True)
    parser.add_argument("--filename_list", type=str, required=True)
    args = parser.parse_args(argv)
    lines = pack_scenes(args.dataset_dir, args.output_tar)
    os.makedirs(os.path.dirname(args.filename_list) or ".", exist_ok=True)
    with open(args.filename_list, "w") as f:
        f.write("\n".join(lines))
    print(f"packed {len(lines)} frames -> {args.output_tar}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
