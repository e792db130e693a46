"""In-the-wild folder inference CLI.

Role parity: script/{depth,normals,iid}/run.py in the reference — run a
checkpoint over a folder of images, save npy + PNG outputs. One CLI with
--modality replaces the three near-identical scripts.

Example:
  python -m marigold_tpu.cli.run --modality depth \
      --checkpoint /path/to/marigold-depth-v1-1 \
      --input_rgb_dir in/ --output_dir out/ \
      --denoise_steps 4 --ensemble_size 10
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import numpy as np

EXTENSION_LIST = [".jpg", ".jpeg", ".png"]


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run Marigold-TPU inference on a folder of images."
    )
    parser.add_argument("--modality", choices=["depth", "normals", "iid"],
                        default="depth")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Pipeline checkpoint path (diffusers layout).")
    parser.add_argument("--input_rgb_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--denoise_steps", type=int, default=None)
    parser.add_argument("--ensemble_size", type=int, default=1)
    parser.add_argument("--half_precision", action="store_true",
                        help="bf16 inference (TPU-native half precision).")
    parser.add_argument("--full_precision", action="store_true",
                        help="fp32 inference (overrides the bf16 default).")
    parser.add_argument("--processing_res", type=int, default=None,
                        help="0 = native resolution.")
    parser.add_argument("--output_processing_res", action="store_true",
                        help="Do not resize back to input resolution.")
    parser.add_argument("--resample_method", type=str, default="bilinear",
                        choices=["bilinear", "bicubic", "nearest"])
    parser.add_argument("--color_map", type=str, default="Spectral",
                        help="(depth) colormap; 'None' to skip.")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=0)
    return parser


def main(argv=None):
    from marigold_tpu.cli import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    from PIL import Image

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    dtype = jnp.float32 if args.full_precision else jnp.bfloat16

    from marigold_tpu import (
        MarigoldDepthPipeline,
        MarigoldIIDPipeline,
        MarigoldNormalsPipeline,
    )
    from marigold_tpu.pipelines import image_util

    cls = {
        "depth": MarigoldDepthPipeline,
        "normals": MarigoldNormalsPipeline,
        "iid": MarigoldIIDPipeline,
    }[args.modality]
    # --half_precision also prefers fp16 weight-variant files when the
    # checkpoint ships them (reference script/depth/run.py:203-215); the
    # loader falls back to the plain files when no variant exists
    variant = "fp16" if args.half_precision else None
    pipe = cls.from_pretrained(args.checkpoint, dtype=dtype, variant=variant)

    rgb_paths = sorted(
        p
        for ext in EXTENSION_LIST
        for p in glob.glob(os.path.join(args.input_rgb_dir, f"*{ext}"))
    )
    if not rgb_paths:
        logging.error(f"no images found in {args.input_rgb_dir}")
        return 1
    logging.info(f"inference on {len(rgb_paths)} images")

    os.makedirs(args.output_dir, exist_ok=True)
    out_npy = os.path.join(args.output_dir, f"{args.modality}_npy")
    os.makedirs(out_npy, exist_ok=True)

    common = dict(
        denoising_steps=args.denoise_steps,
        ensemble_size=args.ensemble_size,
        processing_res=args.processing_res,
        match_input_res=not args.output_processing_res,
        resample_method=args.resample_method,
        batch_size=args.batch_size,
        seed=args.seed,
        show_progress_bar=True,
        # in-the-wild folders mix image shapes; bucket padding (masked out
        # of ensemble statistics) bounds compiles to one program per 64-px
        # bucket instead of one per unique shape
        shape_bucketing=True,
    )

    for path in rgb_paths:
        name = os.path.splitext(os.path.basename(path))[0]
        img = Image.open(path)
        if args.modality == "depth":
            cmap = None if args.color_map == "None" else args.color_map
            out = pipe(img, color_map=cmap, **common)
            np.save(os.path.join(out_npy, f"{name}_pred.npy"), out.depth_np)
            bw = Image.fromarray(
                image_util.float2int(out.depth_np, 16)
            )
            bw.save(os.path.join(args.output_dir, f"{name}_depth_bw.png"))
            if out.depth_colored is not None:
                out.depth_colored.save(
                    os.path.join(args.output_dir, f"{name}_depth_colored.png")
                )
        elif args.modality == "normals":
            out = pipe(img, **common)
            np.save(os.path.join(out_npy, f"{name}_pred.npy"), out.normals_np)
            out.normals_img.save(
                os.path.join(args.output_dir, f"{name}_normals.png")
            )
        else:
            out = pipe(img, **common)
            for entry in out:
                np.save(
                    os.path.join(out_npy, f"{name}_{entry.name}_pred.npy"),
                    entry.array,
                )
                entry.image.save(
                    os.path.join(args.output_dir, f"{name}_{entry.name}.png")
                )
        logging.info(f"done: {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
