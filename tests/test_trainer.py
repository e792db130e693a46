"""Trainer end-to-end smoke tests on tiny models + synthetic datasets
(CPU): surgery, accumulation, callbacks, checkpoints, resume — the
reference's debug-config smoke-test role (SURVEY.md §4.3), automated."""

import os

import numpy as np
import jax
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
from marigold_tpu.utils.depth_transform import get_depth_normalizer


def _make_depth_dataset(tmp_path, rng, n=6):
    root = tmp_path / "ds"
    os.makedirs(root, exist_ok=True)
    names = []
    for i in range(n):
        rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        depth_mm = rng.integers(500, 9000, (64, 64), dtype=np.uint16)
        Image.fromarray(rgb).save(root / f"rgb_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"depth_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"filled_{i:05d}.png")
        names.append(f"rgb_{i:05d}.png depth_{i:05d}.png filled_{i:05d}.png")
    split = tmp_path / "split.txt"
    split.write_text("\n".join(names))
    return str(root), str(split)


def _trainer_cfg(max_iter=2):
    return Config(
        lr=1e-4,
        lr_scheduler=Config(
            name="IterExponential",
            kwargs=Config(total_iter=100, final_ratio=0.01, warmup_steps=0),
        ),
        loss=Config(name="mse_loss", kwargs=Config(reduction="mean")),
        trainer=Config(
            name="MarigoldDepthTrainer",
            init_seed=2024,
            save_period=1,
            backup_period=2,
            validation_period=2,
            visualization_period=0,
        ),
        multi_res_noise=Config(
            strength=0.9, annealed=True, downscale_strategy="original"
        ),
        gt_depth_type="depth_raw_norm",
        gt_mask_type="valid_mask_raw",
        max_epoch=100,
        max_iter=max_iter,
        validation=Config(
            denoising_steps=1,
            ensemble_size=1,
            processing_res=0,
            match_input_res=False,
            resample_method="bilinear",
            main_val_metric="abs_relative_difference",
            main_val_metric_goal="minimize",
            init_seed=2024,
        ),
        eval=Config(
            alignment="least_square",
            align_max_res=None,
            eval_metrics=["abs_relative_difference", "delta1_acc"],
        ),
    )


@pytest.fixture(scope="module")
def sd2_ckpt(tmp_path_factory):
    return make_tiny_checkpoint(str(tmp_path_factory.mktemp("sd2")), mode="sd2")


def _build_trainer(sd2_ckpt, tmp_path, rng, max_iter=2):
    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.train.trainer import MarigoldDepthTrainer

    root, split = _make_depth_dataset(tmp_path, rng)
    norm = get_depth_normalizer(
        {"type": "scale_shift_depth", "norm_min": -1.0, "norm_max": 1.0,
         "min_max_quantile": 0.02, "clip": True}
    )
    ds = get_dataset(
        Config(name="nyu_depth", dir=".", filenames=split, disp_name="tiny_nyu",
               eigen_valid_mask=False),
        base_data_dir=root, mode=DatasetMode.TRAIN,
        depth_transform=norm, augmentation_args={"lr_flip_p": 0.5},
    )
    val_ds = get_dataset(
        Config(name="nyu_depth", dir=".", filenames=split, disp_name="tiny_nyu",
               eigen_valid_mask=False),
        base_data_dir=root, mode=DatasetMode.EVAL,
    )
    sampler = MixedBatchSampler([ds], batch_size=2, shuffle=True)
    train_loader = DataLoader(ConcatDataset([ds]), batch_sampler=sampler)
    # val on 2 samples only to keep it quick
    val_ds.filenames = val_ds.filenames[:2]
    val_loader = DataLoader(val_ds, batch_size=1)

    pipe = MarigoldDepthPipeline.from_pretrained(sd2_ckpt, dtype=jnp.float32)
    trainer = MarigoldDepthTrainer(
        cfg=_trainer_cfg(max_iter),
        model=pipe,
        train_dataloader=train_loader,
        out_dir_ckpt=str(tmp_path / "ckpt"),
        out_dir_eval=str(tmp_path / "eval"),
        out_dir_vis=str(tmp_path / "vis"),
        accumulation_steps=2,
        val_dataloaders=[val_loader],
        vis_dataloaders=[],
    )
    return trainer


def test_depth_trainer_end_to_end(sd2_ckpt, tmp_path, rng):
    trainer = _build_trainer(sd2_ckpt, tmp_path, rng, max_iter=2)
    # surgery happened: 4 -> 8 input channels, kernel halved-duplicated
    assert trainer.core.unet_cfg.in_channels == 8
    w = np.asarray(trainer.state.params["conv_in"]["weight"])
    np.testing.assert_allclose(w[:, :, :4, :], w[:, :, 4:, :])

    trainer.train()
    assert trainer.effective_iter == 2
    # checkpoints: latest (with train state), backup at iter 2, best from val
    assert os.path.isdir(tmp_path / "ckpt" / "latest")
    assert os.path.isdir(tmp_path / "ckpt" / "iter_000002")
    assert os.path.isdir(tmp_path / "ckpt" / "best")
    assert os.path.exists(tmp_path / "ckpt" / "latest" / "opt_state.npz")
    # backup has no train state
    assert not os.path.exists(tmp_path / "ckpt" / "iter_000002" / "opt_state.npz")


def test_depth_trainer_resume_restores_state(sd2_ckpt, tmp_path, rng):
    t1 = _build_trainer(sd2_ckpt, tmp_path / "a", rng, max_iter=2)
    t1.train()
    params_after = jax.tree_util.tree_map(np.asarray, t1.state.params)

    t2 = _build_trainer(sd2_ckpt, tmp_path / "b", rng, max_iter=4)
    t2.load_checkpoint(str(tmp_path / "a" / "ckpt" / "latest"))
    assert t2.effective_iter == 2
    assert t2.best_metric == t1.best_metric
    assert len(t2.global_seed_sequence) == len(t1.global_seed_sequence)
    # params identical after round-trip
    leaves1 = jax.tree_util.tree_leaves(params_after)
    leaves2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, t2.state.params)
    )
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)
    # and training continues
    t2.train()
    assert t2.effective_iter == 4


def test_loss_decreases_on_overfit(sd2_ckpt, tmp_path, rng):
    """Sanity: 8 effective iters on 2 samples should reduce the loss."""
    trainer = _build_trainer(sd2_ckpt, tmp_path, rng, max_iter=8)
    trainer.cfg.trainer.validation_period = 0
    trainer.val_period = 0
    trainer.backup_period = 0
    trainer.save_period = 0
    losses = []

    orig_step = trainer.train_step

    def spy_step(*a, **k):
        state, metrics = orig_step(*a, **k)
        losses.append(float(metrics["loss"]))
        return state, metrics

    trainer.train_step = spy_step
    trainer.train()
    assert len(losses) == 16  # 8 effective * 2 accumulation
    assert all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 1.5  # not exploding


def test_depth_trainer_data_parallel_mesh(sd2_ckpt, tmp_path, rng):
    """Trainer-level data parallelism: the same training loop with a
    2-device mesh (sharded batches, replicated params) must run and
    produce a finite decreasing-ish loss; batch%mesh validation errors."""
    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.parallel.mesh import get_mesh
    from marigold_tpu.train.trainer import MarigoldDepthTrainer

    root, split = _make_depth_dataset(tmp_path, rng)
    norm = get_depth_normalizer(
        {"type": "scale_shift_depth", "norm_min": -1.0, "norm_max": 1.0,
         "min_max_quantile": 0.02, "clip": True}
    )
    ds = get_dataset(
        Config(name="nyu_depth", dir=".", filenames=split, disp_name="tiny_nyu",
               eigen_valid_mask=False),
        base_data_dir=root, mode=DatasetMode.TRAIN,
        depth_transform=norm, augmentation_args=None,
    )
    sampler = MixedBatchSampler([ds], batch_size=2, shuffle=True)
    train_loader = DataLoader(ConcatDataset([ds]), batch_sampler=sampler)

    mesh = get_mesh(2)
    pipe = MarigoldDepthPipeline.from_pretrained(sd2_ckpt, dtype=jnp.float32)
    cfg = _trainer_cfg(max_iter=2)
    cfg.trainer.validation_period = 0  # no val loaders in this test
    cfg.trainer.backup_period = 0
    trainer = MarigoldDepthTrainer(
        cfg=cfg,
        model=pipe,
        train_dataloader=train_loader,
        out_dir_ckpt=str(tmp_path / "ckpt"),
        out_dir_eval=str(tmp_path / "eval"),
        out_dir_vis=str(tmp_path / "vis"),
        accumulation_steps=2,
        val_dataloaders=[],
        vis_dataloaders=[],
        mesh=mesh,
    )
    trainer.train()
    assert trainer.effective_iter == 2
    # params came back finite after sharded steps
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(jnp.isfinite(leaf).all()) for leaf in leaves)


def test_trainer_mesh_batch_divisibility_error(sd2_ckpt, tmp_path, rng):
    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.parallel.mesh import get_mesh
    from marigold_tpu.train.trainer import MarigoldDepthTrainer

    root, split = _make_depth_dataset(tmp_path, rng, n=3)
    norm = get_depth_normalizer(
        {"type": "scale_shift_depth", "norm_min": -1.0, "norm_max": 1.0,
         "min_max_quantile": 0.02, "clip": True}
    )
    ds = get_dataset(
        Config(name="nyu_depth", dir=".", filenames=split, disp_name="tiny_nyu",
               eigen_valid_mask=False),
        base_data_dir=root, mode=DatasetMode.TRAIN,
        depth_transform=norm, augmentation_args=None,
    )
    train_loader = DataLoader(ds, batch_size=3)  # 3 % 2 != 0
    cfg = _trainer_cfg(max_iter=1)
    cfg.trainer.validation_period = 0
    cfg.trainer.backup_period = 0
    trainer = MarigoldDepthTrainer(
        cfg=cfg,
        model=MarigoldDepthPipeline.from_pretrained(sd2_ckpt, dtype=jnp.float32),
        train_dataloader=train_loader,
        out_dir_ckpt=str(tmp_path / "c"), out_dir_eval=str(tmp_path / "e"),
        out_dir_vis=str(tmp_path / "v"), accumulation_steps=1,
        val_dataloaders=[], vis_dataloaders=[], mesh=get_mesh(2),
    )
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        trainer.train()


def test_adafactor_remat_training_path(sd2_ckpt, tmp_path, rng):
    """The single-chip full-size configuration (adafactor + remat +
    donated state) must train: overfit a tiny model a few steps."""
    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.train.trainer import MarigoldDepthTrainer

    root, split = _make_depth_dataset(tmp_path, rng)
    norm = get_depth_normalizer(
        {"type": "scale_shift_depth", "norm_min": -1.0, "norm_max": 1.0,
         "min_max_quantile": 0.02, "clip": True}
    )
    ds = get_dataset(
        Config(name="nyu_depth", dir=".", filenames=split, disp_name="tiny_nyu",
               eigen_valid_mask=False),
        base_data_dir=root, mode=DatasetMode.TRAIN,
        depth_transform=norm, augmentation_args=None,
    )
    train_loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0,
                              drop_last=True)
    cfg = _trainer_cfg(max_iter=3)
    cfg.optimizer = Config(name="Adafactor")
    cfg.trainer.remat = True
    cfg.trainer.validation_period = 0
    cfg.trainer.backup_period = 0
    trainer = MarigoldDepthTrainer(
        cfg=cfg,
        model=MarigoldDepthPipeline.from_pretrained(sd2_ckpt, dtype=jnp.float32),
        train_dataloader=train_loader,
        out_dir_ckpt=str(tmp_path / "c"), out_dir_eval=str(tmp_path / "e"),
        out_dir_vis=str(tmp_path / "v"), accumulation_steps=2,
        val_dataloaders=[], vis_dataloaders=[],
    )
    trainer.train()
    assert trainer.effective_iter == 3
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(jnp.isfinite(leaf).all()) for leaf in leaves)


def test_depth_trainer_zero1_sharded_optimizer(sd2_ckpt, tmp_path, rng):
    """Trainer-level ZeRO-1 (optimizer.shard_states): the state must come
    up ALREADY sharded (the init runs under jit with sharded
    out_shardings — the full state never materializes on one device) and
    one training run must complete with finite params."""
    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.parallel.mesh import get_mesh
    from marigold_tpu.train.trainer import MarigoldDepthTrainer

    root, split = _make_depth_dataset(tmp_path, rng)
    norm = get_depth_normalizer(
        {"type": "scale_shift_depth", "norm_min": -1.0, "norm_max": 1.0,
         "min_max_quantile": 0.02, "clip": True}
    )
    ds = get_dataset(
        Config(name="nyu_depth", dir=".", filenames=split, disp_name="tiny_nyu",
               eigen_valid_mask=False),
        base_data_dir=root, mode=DatasetMode.TRAIN,
        depth_transform=norm, augmentation_args=None,
    )
    sampler = MixedBatchSampler([ds], batch_size=2, shuffle=True)
    train_loader = DataLoader(ConcatDataset([ds]), batch_sampler=sampler)

    mesh = get_mesh(2)
    pipe = MarigoldDepthPipeline.from_pretrained(sd2_ckpt, dtype=jnp.float32)
    cfg = _trainer_cfg(max_iter=2)
    cfg.trainer.validation_period = 0
    cfg.trainer.backup_period = 0
    cfg["optimizer"] = Config(name="adam", shard_states=True)
    trainer = MarigoldDepthTrainer(
        cfg=cfg,
        model=pipe,
        train_dataloader=train_loader,
        out_dir_ckpt=str(tmp_path / "ckpt"),
        out_dir_eval=str(tmp_path / "eval"),
        out_dir_vis=str(tmp_path / "vis"),
        accumulation_steps=2,
        val_dataloaders=[],
        vis_dataloaders=[],
        mesh=mesh,
    )
    big = [
        leaf for leaf in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(leaf, "sharding") and leaf.size >= 2
    ]
    assert any(not leaf.sharding.is_fully_replicated for leaf in big), (
        "ZeRO-1 opt state came up fully replicated"
    )
    trainer.train()
    assert trainer.effective_iter == 2
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(jnp.isfinite(leaf).all()) for leaf in leaves)


def test_resume_rejects_mid_epoch_process_count_change(sd2_ckpt, tmp_path, rng):
    """A checkpoint saved mid-epoch stores a LOCAL (process-sharded)
    batch position; resuming at a different process count must fail fast
    instead of silently skipping/duplicating samples."""
    import json

    import pytest

    t1 = _build_trainer(sd2_ckpt, tmp_path / "a", rng, max_iter=2)
    t1.train()
    ckpt = tmp_path / "a" / "ckpt" / "latest"

    # forge a mid-epoch multihost save: n_batch_in_epoch > 0, 2 processes
    state_path = ckpt / "trainer.json"
    st = json.loads(state_path.read_text())
    st["n_batch_in_epoch"] = 1
    st["process_count"] = 2
    state_path.write_text(json.dumps(st))

    t2 = _build_trainer(sd2_ckpt, tmp_path / "b", rng, max_iter=4)
    with pytest.raises(ValueError, match="process"):
        t2.load_checkpoint(str(ckpt))

    # at an epoch boundary the count change is harmless and allowed
    st["n_batch_in_epoch"] = 0
    state_path.write_text(json.dumps(st))
    t3 = _build_trainer(sd2_ckpt, tmp_path / "c", rng, max_iter=4)
    t3.load_checkpoint(str(ckpt))
    assert t3.effective_iter == 2


def test_split_accum_trainer_wiring(sd2_ckpt, tmp_path, rng):
    """optimizer.split_accum: true must build the two-program pair
    (micro + apply), train through accumulation boundaries, update the
    params at each boundary, and checkpoint/resume with the same state
    layout as the fused path. (Exact step-for-step math equivalence of
    the pair vs the fused optimizer is asserted at the function level in
    tests/test_accumulation.py::test_accum_pair_matches_fused — a
    trainer-vs-trainer comparison would need bit-identical data
    streams, which two independently-built synthetic datasets are not.)"""
    t = _build_trainer(sd2_ckpt, tmp_path, rng, max_iter=2)
    cfg = t.cfg
    cfg.optimizer = Config(name="adafactor", split_accum=True)
    tp = type(t)(
        cfg=cfg, model=t.model, train_dataloader=t.train_loader,
        out_dir_ckpt=str(tmp_path / "ckpt2"),
        out_dir_eval=str(tmp_path / "eval2"),
        out_dir_vis=str(tmp_path / "vis2"),
        accumulation_steps=2, val_dataloaders=[], vis_dataloaders=[],
    )
    assert tp.split_accum and tp.apply_step is not None
    params_before = jax.tree_util.tree_map(np.asarray, tp.state.params)
    tp.train()
    assert tp.effective_iter == 2
    # params actually moved (apply_step ran at the boundaries)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(params_before),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, tp.state.params)),
        )
    )
    assert moved, "split-accum trainer never applied an update"
    # the accumulator is zeroed after the final boundary
    acc_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tp.state.opt_state.acc))
    assert all(np.all(a == 0) for a in acc_leaves)
    # checkpoint round-trips into a fresh split-accum trainer
    assert os.path.isdir(tmp_path / "ckpt2" / "latest")
    t2 = type(t)(
        cfg=cfg, model=t.model, train_dataloader=t.train_loader,
        out_dir_ckpt=str(tmp_path / "ckpt3"),
        out_dir_eval=str(tmp_path / "eval3"),
        out_dir_vis=str(tmp_path / "vis3"),
        accumulation_steps=2, val_dataloaders=[], vis_dataloaders=[],
    )
    t2.load_checkpoint(str(tmp_path / "ckpt2" / "latest"))
    assert t2.effective_iter == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, tp.state.params)),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, t2.state.params)),
    ):
        np.testing.assert_array_equal(a, b)
