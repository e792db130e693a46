"""Normals + IID trainer end-to-end smoke tests (tiny models, CPU)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from fixtures import make_tiny_checkpoint
from marigold_tpu.config import Config
from marigold_tpu.data import (
    ConcatDataset,
    DataLoader,
    DatasetMode,
    MixedBatchSampler,
    get_dataset,
)


def _base_cfg(trainer_name, max_iter=2, extra=None):
    cfg = Config(
        lr=1e-4,
        lr_scheduler=Config(
            name="IterExponential",
            kwargs=Config(total_iter=100, final_ratio=0.01, warmup_steps=0),
        ),
        loss=Config(name="mse_loss", kwargs=Config(reduction="mean")),
        trainer=Config(
            name=trainer_name, init_seed=2024, save_period=0,
            backup_period=0, validation_period=2, visualization_period=0,
        ),
        multi_res_noise=None,
        gt_mask_type=None,
        max_epoch=100,
        max_iter=max_iter,
        validation=Config(
            denoising_steps=1, ensemble_size=1, processing_res=0,
            match_input_res=True, resample_method="bilinear",
            main_val_metric="mean_angular_error",
            main_val_metric_goal="minimize", init_seed=2024,
        ),
        eval=Config(eval_metrics=["mean_angular_error", "sub11_25_error"]),
    )
    for k, v in (extra or {}).items():
        cfg[k] = v
    return cfg


def test_normals_trainer_end_to_end(tmp_path, rng):
    from marigold_tpu import MarigoldNormalsPipeline
    from marigold_tpu.train.trainer import MarigoldNormalsTrainer

    root = tmp_path / "ds"
    os.makedirs(root)
    names = []
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(root / f"rgb_{i}.png")
        n = rng.normal(size=(64, 64, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        np.save(root / f"n_{i}.npy", n)
        names.append(f"rgb_{i}.png n_{i}.npy")
    (tmp_path / "split.txt").write_text("\n".join(names))

    ds = get_dataset(
        Config(name="nyu_normals", dir=".", filenames=str(tmp_path / "split.txt"),
               disp_name="tiny_normals"),
        base_data_dir=str(root), mode=DatasetMode.TRAIN,
        augmentation_args={"lr_flip_p": 0.5},
    )
    val_ds = get_dataset(
        Config(name="nyu_normals", dir=".", filenames=str(tmp_path / "split.txt"),
               disp_name="tiny_normals"),
        base_data_dir=str(root), mode=DatasetMode.EVAL,
    )
    val_ds.filenames = val_ds.filenames[:2]
    sampler = MixedBatchSampler([ds], batch_size=2, shuffle=True)
    loader = DataLoader(ConcatDataset([ds]), batch_sampler=sampler)

    sd2 = make_tiny_checkpoint(str(tmp_path / "sd2"), mode="sd2")
    pipe = MarigoldNormalsPipeline.from_pretrained(sd2, dtype=jnp.float32)
    cfg = _base_cfg("MarigoldNormalsTrainer", extra={"gt_normals_type": "normals"})
    trainer = MarigoldNormalsTrainer(
        cfg=cfg, model=pipe, train_dataloader=loader,
        out_dir_ckpt=str(tmp_path / "ckpt"), out_dir_eval=str(tmp_path / "ev"),
        out_dir_vis=str(tmp_path / "vis"), accumulation_steps=1,
        val_dataloaders=[DataLoader(val_ds, batch_size=1)],
    )
    assert trainer.core.unet_cfg.in_channels == 8  # surgery applied
    trainer.train()
    assert trainer.effective_iter == 2
    # validation ran + best ckpt written
    assert os.path.isdir(tmp_path / "ckpt" / "best")


def test_iid_trainer_end_to_end(tmp_path, rng):
    from marigold_tpu import MarigoldIIDPipeline
    from marigold_tpu.train.trainer import MarigoldIIDTrainer
    from marigold_tpu.pipelines.base import load_pipeline_components

    # hypersim-iid-style dataset: rgb + albedo/shading/residual npy
    root = tmp_path / "ds"
    os.makedirs(root)
    names = []
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(root / f"rgb_{i}.png")
        for t in ("a", "s", "r"):
            np.save(
                root / f"{t}_{i}.npy",
                rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
            )
        names.append(f"rgb_{i}.png a_{i}.npy s_{i}.npy r_{i}.npy")
    (tmp_path / "split.txt").write_text("\n".join(names))

    ds = get_dataset(
        Config(name="hypersim_iid", dir=".", filenames=str(tmp_path / "split.txt"),
               disp_name="tiny_iid"),
        base_data_dir=str(root), mode=DatasetMode.TRAIN,
        augmentation_args={"lr_flip_p": 0.5},
    )
    val_ds = get_dataset(
        Config(name="hypersim_iid", dir=".", filenames=str(tmp_path / "split.txt"),
               disp_name="tiny_iid"),
        base_data_dir=str(root), mode=DatasetMode.EVAL,
    )
    val_ds.filenames = val_ds.filenames[:1]
    sampler = MixedBatchSampler([ds], batch_size=2, shuffle=True)
    loader = DataLoader(ConcatDataset([ds]), batch_sampler=sampler)

    sd2 = make_tiny_checkpoint(str(tmp_path / "sd2"), mode="sd2")
    core, pipe_cfg = load_pipeline_components(sd2, dtype=jnp.float32)
    target_properties = {
        "target_names": ["albedo", "shading", "residual"],
        "albedo": {"prediction_space": "linear", "up_to_scale": False},
        "shading": {"prediction_space": "linear", "up_to_scale": True},
        "residual": {"prediction_space": "linear", "up_to_scale": True},
    }
    pipe_cfg["target_properties"] = target_properties
    # vanilla SD2 has out=4 -> n inferred 1; set up post-hoc like cli/train
    pipe = MarigoldIIDPipeline(core, dict(pipe_cfg, target_properties=None))
    pipe.target_properties = target_properties
    pipe.target_names = target_properties["target_names"]
    pipe.n_targets = 3

    cfg = _base_cfg(
        "MarigoldIIDTrainer",
        extra={
            "validation": Config(
                denoising_steps=1, ensemble_size=1, processing_res=0,
                match_input_res=True, resample_method="bilinear",
                main_val_metric="psnr", main_val_metric_goal="minimize",
                init_seed=2024, use_mask=True,
            ),
            "eval": Config(eval_metrics=["psnr"]),
        },
    )
    trainer = MarigoldIIDTrainer(
        cfg=cfg, model=pipe, train_dataloader=loader,
        out_dir_ckpt=str(tmp_path / "ckpt"), out_dir_eval=str(tmp_path / "ev"),
        out_dir_vis=str(tmp_path / "vis"), accumulation_steps=1,
        val_dataloaders=[DataLoader(val_ds, batch_size=1)],
    )
    # IID surgery: conv_in 4 -> 16, conv_out 4 -> 12
    assert trainer.core.unet_cfg.in_channels == 16
    assert trainer.core.unet_cfg.out_channels == 12
    w = np.asarray(trainer.state.params["conv_in"]["weight"])
    np.testing.assert_allclose(w[:, :, :4, :] * 4, np.asarray(
        trainer.state.params["conv_in"]["weight"][:, :, 4:8, :] * 4))
    trainer.train()
    assert trainer.effective_iter == 2
    assert os.path.isdir(tmp_path / "ckpt" / "best")
