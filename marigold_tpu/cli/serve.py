"""Persistent batched-serving daemon.

The reference's serving story is a one-shot folder CLI
(script/depth/run.py); this daemon is the TPU-native production analog:
a long-lived process that keeps the compiled programs and weights on
device, watches a directory (or processes it once with --once), groups
same-shape images into NI-image fused batches (the configuration
bench.py measures at ~0.75 maps/s/chip), and overlaps host-side
decode/save with device compute by running up to `max_in_flight`
batches on a small thread pool (device readback releases the GIL, so
the next batch's dispatch and the previous batch's PNG/npy writing
overlap device execution).

Batches are grouped by input image shape, so a mixed-resolution stream
compiles at most one fused program per (shape, batch-fill); under-full
groups older than --batch_wait run at their actual size.

Usage:
  python -m marigold_tpu.cli.serve --checkpoint CKPT --modality depth \
      --watch_dir IN --output_dir OUT [--once] [--batch_images 4] ...
"""

from __future__ import annotations

import argparse
import collections
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--modality", type=str, default="depth",
                   choices=("depth", "normals", "iid"))
    p.add_argument("--watch_dir", type=str, required=True,
                   help="Directory to watch for input images")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_images", type=int, default=4,
                   help="Images per fused batch (NI); the denoise batch is "
                        "NI*ensemble rows")
    p.add_argument("--max_in_flight", type=int, default=2,
                   help="Batches processed concurrently (pipelines host "
                        "save/readback with device compute)")
    p.add_argument("--ensemble_size", type=int, default=10)
    p.add_argument("--denoise_steps", type=int, default=None)
    p.add_argument("--processing_res", type=int, default=None)
    p.add_argument("--poll_interval", type=float, default=0.5,
                   help="Seconds between directory scans")
    p.add_argument("--batch_wait", type=float, default=2.0,
                   help="Max seconds to hold an under-full batch before "
                        "running it at its actual size")
    p.add_argument("--read_retry_window", type=float, default=None,
                   help="Seconds an unreadable file (e.g. an upload in "
                        "progress) keeps being retried before it is "
                        "skipped for good (default max(30, 4*batch_wait))")
    p.add_argument("--once", action="store_true",
                   help="Process everything currently present, then exit")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--color_map", type=str, default="Spectral")
    p.add_argument("--full_precision", action="store_true")
    p.add_argument("--no_compact_readback", action="store_true",
                   help="read predictions back as float32 instead of "
                        "uint16 (compact is 4x less device->host traffic "
                        "at the 16-bit-PNG output precision)")
    return p


def _load_pipeline(args):
    import jax.numpy as jnp

    from marigold_tpu import (
        MarigoldDepthPipeline,
        MarigoldIIDPipeline,
        MarigoldNormalsPipeline,
    )

    cls = {
        "depth": MarigoldDepthPipeline,
        "normals": MarigoldNormalsPipeline,
        "iid": MarigoldIIDPipeline,
    }[args.modality]
    dtype = jnp.float32 if args.full_precision else jnp.bfloat16
    return cls.from_pretrained(
        args.checkpoint, dtype=dtype,
        variant=None if args.full_precision else "fp16",
    )


def _scan_new(watch_dir: str, seen: set) -> List[str]:
    out = []
    try:
        names = sorted(os.listdir(watch_dir))
    except FileNotFoundError:
        return out
    for name in names:
        if not name.lower().endswith(EXTENSIONS):
            continue
        path = os.path.join(watch_dir, name)
        if path in seen:
            continue
        seen.add(path)
        out.append(path)
    return out


def save_one(pipe, modality: str, output_dir: str, name: str, out) -> None:
    """Save one pipeline Output in the same layout as cli/run.py."""
    from PIL import Image

    from marigold_tpu.pipelines import image_util

    out_npy = os.path.join(output_dir, f"{modality}_npy")
    os.makedirs(out_npy, exist_ok=True)
    if modality == "depth":
        np.save(os.path.join(out_npy, f"{name}_pred.npy"), out.depth_np)
        bw = Image.fromarray(image_util.float2int(out.depth_np, 16))
        bw.save(os.path.join(output_dir, f"{name}_depth_bw.png"))
        if out.depth_colored is not None:
            out.depth_colored.save(
                os.path.join(output_dir, f"{name}_depth_colored.png")
            )
    elif modality == "normals":
        np.save(os.path.join(out_npy, f"{name}_pred.npy"), out.normals_np)
        out.normals_img.save(os.path.join(output_dir, f"{name}_normals.png"))
    else:
        for entry in out:
            np.save(
                os.path.join(out_npy, f"{name}_{entry.name}_pred.npy"),
                entry.array,
            )
            entry.image.save(
                os.path.join(output_dir, f"{name}_{entry.name}.png")
            )


def serve(args) -> int:
    from PIL import Image

    os.makedirs(args.output_dir, exist_ok=True)
    pipe = _load_pipeline(args)

    seen: set = set()
    # path -> [n_fail, first_fail_t, next_retry_t]: a partially-written
    # upload gets retried on a clock (not a per-poll-iteration counter —
    # a busy server loops in milliseconds and would burn any attempt
    # budget before the copy finishes) and is only skipped for good once
    # it has stayed unreadable for a whole retry window.
    read_failures: dict = {}
    read_retry_window = (
        args.read_retry_window if args.read_retry_window is not None
        else max(30.0, 4 * args.batch_wait)
    )
    # buckets: input (H, W) -> deque of (path, PIL image, t_enqueued)
    buckets: dict = collections.defaultdict(collections.deque)
    n_done = 0
    failures: list = []

    call_kwargs = dict(
        denoising_steps=args.denoise_steps,
        ensemble_size=args.ensemble_size,
        processing_res=args.processing_res,
        match_input_res=True,
        batch_size=args.batch_images * args.ensemble_size,
        seed=args.seed,
        compact_readback=not args.no_compact_readback,
    )
    if args.modality == "depth":
        call_kwargs["color_map"] = (
            None if args.color_map in (None, "None") else args.color_map
        )

    def run_batch(group):
        paths = [g[0] for g in group]
        images = [g[1] for g in group]
        try:
            outs = pipe.batch_call(images, **call_kwargs)
            for path, out in zip(paths, outs):
                stem = os.path.splitext(os.path.basename(path))[0]
                save_one(pipe, args.modality, args.output_dir, stem, out)
                logging.info(f"done: {stem}")
            return len(paths)
        except Exception as e:
            logging.exception(f"batch failed: {paths}")
            failures.append(e)
            return 0

    pool = ThreadPoolExecutor(max_workers=max(1, args.max_in_flight))
    futures: list = []
    try:
        while True:
            for path in _scan_new(args.watch_dir, seen):
                t_scan = time.monotonic()
                rf = read_failures.get(path)
                if rf is not None and t_scan < rf[2]:
                    seen.discard(path)  # retry not due yet; keep pending
                    continue
                try:
                    im = Image.open(path).convert("RGB")
                except Exception as e:
                    n_fail = (rf[0] if rf else 0) + 1
                    first_t = rf[1] if rf else t_scan
                    if t_scan - first_t < read_retry_window:
                        read_failures[path] = [
                            n_fail, first_t,
                            t_scan + max(0.5, args.poll_interval),
                        ]
                        seen.discard(path)
                        logging.warning(f"failed to read {path} "
                                        f"(attempt {n_fail}); will retry")
                    else:
                        read_failures.pop(path, None)
                        failures.append(e)
                        logging.exception(
                            f"failed to read {path}: unreadable for "
                            f"{read_retry_window:.0f}s ({n_fail} attempts); "
                            "skipping permanently")
                    continue
                read_failures.pop(path, None)
                buckets[im.size].append((path, im, time.time()))

            dispatched = False
            now = time.time()
            for shape in list(buckets):
                dq = buckets[shape]
                while len(dq) >= args.batch_images:
                    futures.append(pool.submit(
                        run_batch,
                        [dq.popleft() for _ in range(args.batch_images)],
                    ))
                    dispatched = True
                if dq and (args.once or now - dq[0][2] >= args.batch_wait):
                    futures.append(pool.submit(
                        run_batch, [dq.popleft() for _ in range(len(dq))]
                    ))
                    dispatched = True
                if not dq:
                    del buckets[shape]

            done = [f for f in futures if f.done()]
            for f in done:
                n_done += f.result()
                futures.remove(f)

            # --once drains pending read-retries too: a mid-copy file that
            # failed its first open must get its retry window (it would
            # otherwise be silently dropped with exit code 0)
            if (args.once and not buckets and not futures
                    and not dispatched and not read_failures):
                break
            if not dispatched:
                time.sleep(args.poll_interval)
    finally:
        for f in futures:
            n_done += f.result()
        pool.shutdown(wait=True)

    logging.info(f"served {n_done} images")
    return 1 if failures else 0


def main(argv=None) -> int:
    from marigold_tpu.cli import apply_platform_env

    apply_platform_env()
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    return serve(args)


if __name__ == "__main__":
    raise SystemExit(main())
