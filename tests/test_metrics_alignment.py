"""Golden tests for metrics / alignment / losses / utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marigold_tpu.eval import metrics as M
from marigold_tpu.eval.alignment import (
    align_depth_least_square,
    depth2disparity,
)
from marigold_tpu.train.loss import get_loss
from marigold_tpu.train.lr_schedule import iter_exponential
from marigold_tpu.train.multi_res_noise import multi_res_noise_like
from marigold_tpu.utils.depth_transform import ScaleShiftDepthNormalizer
from marigold_tpu.utils.seeding import generate_seed_sequence


def test_abs_rel_golden():
    pred = np.array([[1.1, 2.0], [3.0, 4.0]])
    gt = np.array([[1.0, 2.0], [3.0, 5.0]])
    # |1.1-1|/1 = .1 ; 0 ; 0 ; |4-5|/5 = .2  -> mean = .075
    assert abs(M.abs_relative_difference(pred, gt) - 0.075) < 1e-12


def test_delta1_golden():
    pred = np.array([[1.0, 3.0], [1.0, 1.0]])
    gt = np.array([[1.0, 1.0], [1.0, 1.0]])
    assert M.delta1_acc(pred, gt) == 0.75


def test_masked_metrics_ignore_invalid():
    pred = np.array([[1.0, 100.0]])
    gt = np.array([[1.0, 1.0]])
    mask = np.array([[True, False]])
    assert M.abs_relative_difference(pred, gt, mask) == 0.0
    assert M.rmse_linear(pred, gt, mask) == 0.0
    assert M.delta1_acc(pred, gt, mask) == 1.0


def test_silog_golden():
    # pred = gt * e  ->  log diff constant=1 -> variance 0 -> silog 0
    gt = np.random.default_rng(0).uniform(1, 10, (8, 8))
    pred = gt * np.e
    assert M.silog_rmse(pred, gt) < 1e-6


def test_cosine_error_and_aggregates():
    gt = np.zeros((4, 4, 3))
    gt[..., 2] = 1.0
    pred = gt.copy()
    pred[0, 0] = [1, 0, 0]  # 90 deg error at one pixel
    err = M.compute_cosine_error(pred, gt)
    assert err.shape == (16,)
    assert abs(err.max() - 90.0) < 1e-6
    assert M.median_angular_error(err) == 0.0
    assert M.sub30_error(err) == round(100 * 15 / 16, 4)


def test_cosine_error_masked_zero_gt():
    gt = np.zeros((2, 2, 3))
    gt[0, 0] = [0, 0, 1]
    pred = np.tile([0, 0, 1.0], (2, 2, 1))
    err = M.compute_cosine_error(pred, gt, masked=True)
    assert err.shape == (1,)
    assert err[0] < 1e-6


def test_ls_alignment_recovers_scale_shift():
    rng = np.random.default_rng(1)
    gt = rng.uniform(1, 10, (32, 32))
    pred = (gt - 3.0) / 2.0  # gt = 2*pred + 3
    valid = np.ones_like(gt, bool)
    aligned, s, t = align_depth_least_square(gt, pred, valid)
    assert abs(s - 2.0) < 1e-9 and abs(t - 3.0) < 1e-9
    np.testing.assert_allclose(aligned, gt, atol=1e-9)


def test_ls_alignment_downsampled():
    rng = np.random.default_rng(2)
    gt = rng.uniform(1, 10, (64, 48))
    pred = gt * 0.5 + 1.0
    aligned, s, t = align_depth_least_square(
        gt, pred, np.ones_like(gt, bool), max_resolution=16
    )
    assert abs(s - 2.0) < 1e-6 and abs(t + 2.0) < 1e-6


def test_depth2disparity_roundtrip():
    d = np.array([[0.0, 2.0], [4.0, 0.5]])
    disp = depth2disparity(d)
    np.testing.assert_allclose(disp, [[0.0, 0.5], [0.25, 2.0]])
    back = depth2disparity(disp)
    np.testing.assert_allclose(back, d)


def test_iid_scale_alignment_and_quantile_map():
    rng = np.random.default_rng(3)
    gt = rng.uniform(0.1, 1.0, (16, 16, 3))
    pred = gt / 3.0
    s = M.compute_alignment_scale(pred, gt)
    assert abs(s - 3.0) < 1e-9
    p2, g2 = M.quantile_map(pred * 3.0, gt)
    luma = 0.3 * g2[..., 0] + 0.59 * g2[..., 1] + 0.11 * g2[..., 2]
    assert abs(np.quantile(luma, 0.9) - 0.8) < 0.02


def test_psnr_ssim_sanity():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert M.psnr(img, img) == float("inf")
    assert M.ssim(img, img) > 0.9999
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    assert 15 < M.psnr(noisy, img) < 25
    assert M.ssim(noisy, img) < 0.99


def test_loss_factory_and_masked_mse():
    loss = get_loss("mse_loss")
    a = jnp.ones((2, 4, 4, 4))
    b = jnp.zeros((2, 4, 4, 4))
    assert float(loss(a, b)) == 1.0
    silog = get_loss("silog_rmse")
    assert float(silog(a * 5.0, a * 5.0)) < 1e-3


def test_iter_exponential_schedule():
    sched = iter_exponential(30000, 0.01, warmup_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(50)) - 0.5) < 1e-6
    assert abs(float(sched(100)) - 1.0) < 1e-6
    assert abs(float(sched(30000)) - 0.01) < 1e-4
    assert abs(float(sched(50000)) - 0.01) < 1e-4


def test_multi_res_noise_shapes_and_std():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 48, 4))
    for strategy in ("original", "every_layer", "power_of_two", "random_step"):
        n = multi_res_noise_like(key, x, 0.9, strategy)
        assert n.shape == x.shape
        s = float(jnp.std(n))
        assert abs(s - 1.0) < 0.05, (strategy, s)
    # per-sample strength broadcasting (annealed variant)
    n = multi_res_noise_like(key, x, jnp.asarray([0.9, 0.1]))
    assert n.shape == x.shape


def test_depth_normalizer_quantile_mapping():
    rng = np.random.default_rng(5)
    d = rng.uniform(2.0, 8.0, (64, 64)).astype(np.float32)
    norm = ScaleShiftDepthNormalizer()
    out = norm(d)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # q02 -> -1, q98 -> +1 before clipping
    lo, hi = np.quantile(d, [0.02, 0.98])
    mid = (lo + hi) / 2
    out_mid = norm(np.full((4, 4), mid, np.float32), np.ones((4, 4), bool))
    # normalizing a constant at the midpoint of [lo,hi] of *that* array is
    # degenerate; instead check the linear map on the original array
    expected = (d - lo) / (hi - lo) * 2 - 1
    np.testing.assert_allclose(out, np.clip(expected, -1, 1), atol=1e-5)
    back = norm.scale_back(out)
    assert back.min() >= 0.0 and back.max() <= 1.0


def test_normalizer_jax_matches_numpy():
    rng = np.random.default_rng(6)
    d = rng.uniform(0.5, 5.0, (32, 32)).astype(np.float32)
    mask = rng.uniform(size=(32, 32)) > 0.2
    norm = ScaleShiftDepthNormalizer()
    out_np = norm(d, mask)
    out_j = np.asarray(norm.normalize_jax(jnp.asarray(d), jnp.asarray(mask)))
    np.testing.assert_allclose(out_j, out_np, atol=2e-3)


def test_seed_sequence_deterministic():
    a = generate_seed_sequence(42, 10)
    b = generate_seed_sequence(42, 10)
    c = generate_seed_sequence(43, 10)
    assert a == b and a != c and len(a) == 10


def test_metric_tracker():
    t = M.MetricTracker("a", "b")
    t.update("a", 1.0)
    t.update("a", 3.0)
    assert t.avg("a") == 2.0
    assert t.result()["a"] == 2.0


def test_relative_metrics_propagate_valid_zero_depth():
    """A VALID pixel with GT depth 0 must make the relative metrics
    visibly non-finite (reference propagates inf/nan); only INVALID
    pixels are excluded. Regression: a blanket nan_to_num turned such
    pixels into fake-perfect scores."""
    from marigold_tpu.eval import metrics as M

    pred = np.full((4, 4), 0.5, np.float32)
    gt = np.full((4, 4), 0.5, np.float32)
    gt[0, 0] = 0.0
    mask = np.ones((4, 4), bool)
    assert not np.isfinite(M.abs_relative_difference(pred, gt, mask))
    assert not np.isfinite(M.squared_relative_difference(pred, gt, mask))
    assert not np.isfinite(M.rmse_log(pred, gt, mask))

    # the SAME zero-depth pixel excluded by the mask: finite and exact
    mask[0, 0] = False
    assert M.abs_relative_difference(pred, gt, mask) == 0.0
    assert M.squared_relative_difference(pred, gt, mask) == 0.0
    assert M.rmse_log(pred, gt, mask) == 0.0
