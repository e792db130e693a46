"""Golden tests for the diffusion schedule math.

Golden values are derived analytically from the defining formulas (SD2
scaled_linear betas, the zero-terminal-SNR rescale, trailing spacing) —
the same formulas the reference delegates to diffusers (SURVEY.md §2.7).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from marigold_tpu.core.scheduler import (
    DiffusionSchedule,
    make_betas,
    rescale_zero_terminal_snr,
    trailing_timesteps,
    check_trailing_zero_snr,
)


def test_scaled_linear_betas_endpoints():
    betas = make_betas(1000, 0.00085, 0.012, "scaled_linear")
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # strictly increasing
    assert np.all(np.diff(betas) > 0)


def test_zero_snr_rescale_terminal_and_initial():
    betas = make_betas(1000)
    new = rescale_zero_terminal_snr(betas)
    abar = np.cumprod(1.0 - new)
    # terminal alphā must be exactly (numerically) zero -> SNR 0
    assert abs(abar[-1]) < 1e-12
    # initial alphā preserved
    np.testing.assert_allclose(abar[0], np.cumprod(1.0 - betas)[0], rtol=1e-10)
    # monotone decreasing
    assert np.all(np.diff(abar) < 0)


@pytest.mark.parametrize(
    "steps,expected",
    [
        (1, [999]),
        (2, [999, 499]),
        (4, [999, 749, 499, 249]),
        (10, [999, 899, 799, 699, 599, 499, 399, 299, 199, 99]),
        (50, None),  # just check structure
    ],
)
def test_trailing_timesteps(steps, expected):
    ts = trailing_timesteps(1000, steps)
    assert len(ts) == steps
    assert ts[0] == 999  # trailing always ends at T-1
    if expected is not None:
        np.testing.assert_array_equal(ts, expected)


def test_ddim_one_step_vpred_zero_snr_is_exact_x0():
    """At t=999 with zero-SNR, alphā=0 so x_t == pure noise and the
    v-prediction IS -x0: one trailing DDIM step must return x0 exactly.
    This is the mathematical basis of Marigold v1-1's 1-step protocol."""
    sched = DiffusionSchedule.create(prediction_type="v_prediction")
    assert float(sched.alphas_cumprod[999]) < 1e-12

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)

    t = jnp.asarray(999)
    x_t = sched.add_noise(x0, noise, t)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(noise), atol=1e-6)

    v = sched.velocity(x0, noise, t)
    np.testing.assert_allclose(np.asarray(v), -np.asarray(x0), atol=1e-6)

    prev = sched.ddim_step(v, t, jnp.asarray(-1), x_t)
    # final alpha = alphas_cumprod[0] (set_alpha_to_one=False):
    # prev = sqrt(a0)*x0 + sqrt(1-a0)*eps, with eps == noise here
    a0 = float(sched.alphas_cumprod[0])
    expected = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(prev), expected, atol=1e-5)


def test_ddim_step_epsilon_matches_closed_form():
    sched = DiffusionSchedule.create(
        prediction_type="epsilon", rescale_betas_zero_snr=False
    )
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    t, tp = 499, 249
    a_t = float(sched.alphas_cumprod[t])
    a_p = float(sched.alphas_cumprod[tp])
    x_t = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
    # with a perfect epsilon prediction, DDIM must land on the exact
    # marginal q(x_prev | x0) mean trajectory
    prev = sched.ddim_step(
        jnp.asarray(eps), jnp.asarray(t), jnp.asarray(tp), jnp.asarray(x_t)
    )
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(np.asarray(prev), expected, atol=2e-5)


def test_prediction_type_roundtrip_consistency():
    """x0/eps recovered from the v target must equal the originals."""
    sched = DiffusionSchedule.create(prediction_type="v_prediction")
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((3, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((3, 4, 4, 4)), jnp.float32)
    t = jnp.asarray(499)
    x_t = sched.add_noise(x0, eps, t)
    v = sched.velocity(x0, eps, t)
    x0_hat, eps_hat = sched.pred_x0_and_eps(v, t, x_t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=1e-4)


def test_training_target_dispatch():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    t = jnp.asarray([100, 900])
    s_eps = DiffusionSchedule.create(prediction_type="epsilon")
    s_smp = DiffusionSchedule.create(prediction_type="sample")
    s_v = DiffusionSchedule.create(prediction_type="v_prediction")
    np.testing.assert_array_equal(np.asarray(s_eps.training_target(x0, eps, t)), eps)
    np.testing.assert_array_equal(np.asarray(s_smp.training_target(x0, eps, t)), x0)
    np.testing.assert_allclose(
        np.asarray(s_v.training_target(x0, eps, t)),
        np.asarray(s_v.velocity(x0, eps, t)),
    )


def test_config_roundtrip(tmp_path):
    sched = DiffusionSchedule.create(prediction_type="v_prediction")
    sched.save_pretrained(str(tmp_path / "scheduler"))
    loaded = DiffusionSchedule.from_pretrained(str(tmp_path / "scheduler"))
    np.testing.assert_allclose(
        np.asarray(loaded.alphas_cumprod), np.asarray(sched.alphas_cumprod)
    )
    assert loaded.prediction_type == sched.prediction_type


def test_inference_setting_guardrails():
    good = DiffusionSchedule.create()
    assert check_trailing_zero_snr(good, 1) == []
    assert len(check_trailing_zero_snr(good, 50)) == 1
    bad = DiffusionSchedule.create(
        timestep_spacing="leading", rescale_betas_zero_snr=False
    )
    assert len(check_trailing_zero_snr(bad, 1)) == 1


def test_prev_timesteps():
    sched = DiffusionSchedule.create()
    ts = sched.inference_timesteps(4)
    prev = sched.prev_timesteps(ts)
    np.testing.assert_array_equal(prev, [749, 499, 249, -1])


def test_clip_sample_round_trip_and_effect():
    """clip_sample from diffusers configs must be honored (x0 clamped,
    eps re-derived) and survive the config round-trip — it was silently
    dropped and rewritten as False before."""
    cfg = {
        "num_train_timesteps": 1000, "beta_start": 0.0001,
        "beta_end": 0.02, "beta_schedule": "linear",
        "prediction_type": "epsilon", "timestep_spacing": "leading",
        "steps_offset": 0, "rescale_betas_zero_snr": False,
        "set_alpha_to_one": True, "clip_sample": True,
        "clip_sample_range": 1.0,
    }
    s = DiffusionSchedule.from_config(cfg)
    assert s.clip_sample and s.clip_sample_range == 1.0
    out_cfg = s.to_config()
    assert out_cfg["clip_sample"] is True
    assert out_cfg["clip_sample_range"] == 1.0

    # an extreme epsilon prediction drives |x0| >> 1: clipping must change
    # the step result, and match the clamped-x0 closed form
    t, pt = jnp.asarray(500), jnp.asarray(480)
    x = jnp.full((1, 4, 4, 4), 2.0, jnp.float32)
    eps_pred = jnp.full_like(x, 30.0)
    clipped = s.ddim_step(eps_pred, t, pt, x)

    s0 = DiffusionSchedule.from_config(dict(cfg, clip_sample=False))
    unclipped = s0.ddim_step(eps_pred, t, pt, x)
    assert not np.allclose(np.asarray(clipped), np.asarray(unclipped))

    a_t = float(s.alphas_cumprod[500])
    a_p = float(s.alphas_cumprod[480])
    x0 = (2.0 - np.sqrt(1 - a_t) * 30.0) / np.sqrt(a_t)
    x0c = np.clip(x0, -1.0, 1.0)
    eps_c = (2.0 - np.sqrt(a_t) * x0c) / np.sqrt(1 - a_t)
    expect = np.sqrt(a_p) * x0c + np.sqrt(1 - a_p) * eps_c
    np.testing.assert_allclose(np.asarray(clipped)[0, 0, 0, 0], expect,
                               rtol=1e-5)
