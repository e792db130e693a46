"""Measure the training input pipeline against the device step rate
(VERDICT r1 weak #7: single producer thread on a 1-core host).

Builds a synthetic on-disk dataset at the real training geometry
(Hypersim 480x640 PNGs), drives the REAL dataset classes with train
preprocessing + augmentations through data/loader.py, and (optionally,
--device) measures the real jitted train step at the same shape on the
TPU for the comparison.

Usage: python scripts/bench_input_pipeline.py [--device] [--n 24]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_depth_tree(root, n, hw=(480, 640)):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        rgb = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
        depth = rng.integers(500, 65000, hw, dtype=np.uint16)
        Image.fromarray(rgb).save(f"{root}/rgb_{i:04d}.png")
        Image.fromarray(depth).save(f"{root}/depth_{i:04d}.png")
        names.append(f"rgb_{i:04d}.png depth_{i:04d}.png")
    with open(f"{root}/split.txt", "w") as f:
        f.write("\n".join(names))


def build_normals_tree(root, n, hw=(768, 1024)):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        rgb = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
        nrm = rng.standard_normal((3,) + hw).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
        Image.fromarray(rgb).save(f"{root}/rgb_{i:04d}.png")
        np.save(f"{root}/normal_{i:04d}.npy", nrm)
        names.append(f"rgb_{i:04d}.png normal_{i:04d}.npy")
    with open(f"{root}/split.txt", "w") as f:
        f.write("\n".join(names))


def bench_loader(dataset, batch_size, n_batches, num_workers=0):
    from marigold_tpu.data.loader import DataLoader

    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True, seed=0,
                        drop_last=True, num_workers=num_workers)
    it = iter(loader)
    next(it)  # warm caches
    t0 = time.perf_counter()
    got = 1
    for b in it:
        got += 1
        if got >= n_batches:
            break
    dt = time.perf_counter() - t0
    return (got - 1) * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="also measure the real TPU train step")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--workers", type=int, default=0,
                    help="DataLoader num_workers (forked decode/augment "
                         "processes; the shipped configs use 2-4)")
    args = ap.parse_args()

    from marigold_tpu.data.depth_datasets import HypersimDepthDataset
    from marigold_tpu.data.other_datasets import HypersimNormalsDataset
    from marigold_tpu.data.base_depth import DatasetMode
    from marigold_tpu.utils.depth_transform import ScaleShiftDepthNormalizer

    tmp = tempfile.mkdtemp()
    d_depth = os.path.join(tmp, "hs_depth")
    d_norm = os.path.join(tmp, "hs_norm")
    # datasets must exceed the worker submission window (workers +
    # prefetch) by enough batches that the timed loop measures steady
    # production, not warm-up pre-buffering
    build_depth_tree(d_depth, args.n)
    build_normals_tree(d_norm, max(8, args.n // 2))

    aug = dict(lr_flip_p=0.5)
    ds = HypersimDepthDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=f"{d_depth}/split.txt",
        dataset_dir=d_depth,
        disp_name="bench_hypersim",
        augmentation_args=aug,
        depth_transform=ScaleShiftDepthNormalizer(),
        resize_to_hw=[480, 640],
    )
    rate_d = bench_loader(ds, batch_size=2, n_batches=args.n // 2 - 2,
                          num_workers=args.workers)
    print(f"depth train loader (480x640, flip+norm, workers={args.workers}): "
          f"{rate_d:6.2f} samples/s")

    aug_n = dict(  # reference train_marigold_normals.yaml:16-22 values
        lr_flip_p=0.5,
        gaussian_blur_p=0.3, gaussian_blur_sigma=4,
        motion_blur_p=0.3, motion_blur_kernel_size=11,
        motion_blur_angle_range=360,
        color_jitter_p=0.5,
        jitter_brightness_factor=0.1, jitter_contrast_factor=0.1,
        jitter_saturation_factor=0.1, jitter_hue_factor=0.05,
    )
    dsn = HypersimNormalsDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=f"{d_norm}/split.txt",
        dataset_dir=d_norm,
        disp_name="bench_hypersim_normals",
        augmentation_args=aug_n,
    )
    rate_n = bench_loader(dsn, batch_size=2,
                          n_batches=max(8, args.n // 2) // 2 - 2,
                          num_workers=args.workers)
    print(f"normals train loader (768, blur+jitter, workers={args.workers}): "
          f"{rate_n:6.2f} samples/s")

    if args.device:
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        from marigold_tpu.core.scheduler import DiffusionSchedule
        from marigold_tpu.models import unet as unet_lib
        from marigold_tpu.models import vae as vae_lib
        from marigold_tpu.train.lr_schedule import iter_exponential
        from marigold_tpu.train.train_step import (
            create_train_state, make_optimizer, make_train_step,
        )

        unet_cfg = unet_lib.UNetConfig()
        vae_cfg = vae_lib.VAEConfig()
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        unet_params = unet_lib.init_params(k1, unet_cfg, dtype=jnp.bfloat16)
        vae_params = vae_lib.init_params(k2, vae_cfg, dtype=jnp.bfloat16)
        # single-chip full-size config: adafactor (fp32 Adam + accumulation
        # state is ~14 GB and OOMs, measured) + full remat + donated state
        optimizer = make_optimizer(3e-5, iter_exponential(30000, 0.01, 100),
                                   accumulation_steps=16, name="adafactor")
        step = jax.jit(make_train_step(
            unet_cfg, vae_cfg, DiffusionSchedule.create(), optimizer,
            loss_name="mse_loss", multi_res_noise_cfg=None, remat=True,
        ), donate_argnums=(0,))
        # fp32 master params (the real training configuration)
        unet_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), unet_params
        )
        state = create_train_state(unet_params, optimizer)
        text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
        rng = np.random.default_rng(0)
        batch = {
            "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (2, 480, 640, 3)),
                                    jnp.float32),
            "gt_norm": jnp.asarray(rng.uniform(-1, 1, (2, 480, 640, 3)),
                                   jnp.float32),
            "valid_mask": jnp.asarray(rng.uniform(size=(2, 480, 640, 1)) > 0.1),
        }
        state, m = step(state, vae_params, text, batch, jax.random.PRNGKey(1))
        _ = float(m["loss"])  # force
        t0 = time.perf_counter()
        iters = 4
        for i in range(iters):
            state, m = step(state, vae_params, text, batch,
                            jax.random.PRNGKey(2 + i))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        dev_rate = 2 / dt
        print(f"device train step (bs2 @480x640):          {dt*1e3:6.0f} ms "
              f"=> {dev_rate:6.2f} samples/s")
        print(f"verdict: loader {'KEEPS UP' if rate_d >= dev_rate else 'STARVES the device'} "
              f"({rate_d:.1f} vs {dev_rate:.1f} samples/s)")


if __name__ == "__main__":
    main()
