"""gradient_accumulation (train_step.py): the memory-lean MultiSteps
replacement. fp32 mode must match optax.MultiSteps exactly; bf16 mode
must track it to accumulator precision."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from marigold_tpu.train.train_step import gradient_accumulation


def _params():
    return {
        "w": jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)),
                         jnp.float32),
        "b": jnp.zeros((8,), jnp.float32),
    }


def _grads(i):
    rng = np.random.default_rng(100 + i)
    return {
        "w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32) * 0.1,
        "b": jnp.asarray(rng.standard_normal((8,)), jnp.float32) * 0.1,
    }


def _run(opt, params, n_steps):
    state = opt.init(params)
    p = params
    for i in range(n_steps):
        updates, state = opt.update(_grads(i), state, p)
        p = optax.apply_updates(p, updates)
    return p


@pytest.mark.parametrize("inner_name", ["adam", "adafactor"])
def test_fp32_matches_multisteps(inner_name):
    k = 4
    if inner_name == "adam":
        inner = lambda: optax.adam(1e-2)
    else:
        inner = lambda: optax.adafactor(
            1e-2, multiply_by_parameter_scale=False, clipping_threshold=1.0
        )
    p_ms = _run(optax.MultiSteps(inner(), every_k_schedule=k), _params(), 9)
    p_ga = _run(gradient_accumulation(inner(), k), _params(), 9)
    for key in p_ms:
        np.testing.assert_allclose(
            np.asarray(p_ms[key]), np.asarray(p_ga[key]), atol=1e-6,
            err_msg=key,
        )


def test_params_frozen_between_boundaries():
    opt = gradient_accumulation(optax.adam(1e-2), 4)
    params = _params()
    state = opt.init(params)
    p = params
    for i in range(3):  # steps 1..3: no boundary crossed
        updates, state = opt.update(_grads(i), state, p)
        p = optax.apply_updates(p, updates)
        np.testing.assert_array_equal(np.asarray(p["w"]),
                                      np.asarray(params["w"]))
    updates, state = opt.update(_grads(3), state, p)  # step 4: boundary
    p = optax.apply_updates(p, updates)
    assert not np.array_equal(np.asarray(p["w"]), np.asarray(params["w"]))


def test_bf16_accumulator_tracks_fp32():
    k = 8
    inner = lambda: optax.adam(1e-2)
    p32 = _run(gradient_accumulation(inner(), k), _params(), 16)
    pbf = _run(gradient_accumulation(inner(), k, dtype=jnp.bfloat16),
               _params(), 16)
    # Adam normalizes by the second moment so bf16 accumulation noise
    # (~0.4%/add) perturbs the trajectory slightly; it must stay small
    rel = np.max(np.abs(np.asarray(p32["w"]) - np.asarray(pbf["w"]))) / (
        np.max(np.abs(np.asarray(p32["w"]))) + 1e-9
    )
    assert rel < 0.05, rel


def test_bf16_state_dtype_and_jit():
    opt = gradient_accumulation(optax.adam(1e-2), 2, dtype=jnp.bfloat16)
    params = _params()
    state = opt.init(params)
    assert state.acc["w"].dtype == jnp.bfloat16

    @jax.jit
    def step(p, s, g):
        u, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, u), s2

    p, s = step(params, state, _grads(0))
    p, s = step(p, s, _grads(1))
    assert int(s.mini_step) == 2
    assert np.isfinite(np.asarray(p["w"])).all()


def test_grad_dtype_bf16_tracks_fp32():
    """make_train_step(grad_dtype=bf16) must produce a step whose loss
    and parameter update track the fp32-grad step to bf16 precision
    (round 5: bf16 gradient storage frees the HBM that the bf16
    accumulator costs, unlocking the bs8 accumulation geometry)."""
    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib, vae as vae_lib
    from marigold_tpu.train.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    unet_cfg = unet_lib.UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=(2, 4),
        cross_attention_dim=12, norm_num_groups=4,
    )
    vae_cfg = vae_lib.VAEConfig(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32),
        unet_lib.init_params(k1, unet_cfg),
    )
    vae_params = vae_lib.init_params(k2, vae_cfg)
    schedule = DiffusionSchedule.create()
    rng = np.random.default_rng(0)
    batch = {
        "rgb_norm": jnp.asarray(
            rng.standard_normal((2, 16, 16, 3)).clip(-1, 1), jnp.float32),
        "gt_norm": jnp.asarray(
            rng.standard_normal((2, 16, 16, 3)).clip(-1, 1), jnp.float32),
    }
    text = jnp.zeros((1, 2, 12), jnp.float32)
    key = jax.random.PRNGKey(7)

    results = {}
    for label, gd in (("fp32", None), ("bf16", jnp.bfloat16)):
        opt = make_optimizer(1e-3, None, name="adafactor")
        step = jax.jit(make_train_step(
            unet_cfg, vae_cfg, schedule, opt, loss_name="mse_loss",
            compute_dtype=jnp.bfloat16, grad_dtype=gd,
        ))
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, unet_params), opt)
        state, m = step(state, vae_params, text, batch, key)
        results[label] = (state, m)

    m32, mbf = results["fp32"][1], results["bf16"][1]
    # the forward is identical (bf16 compute both ways): same loss
    np.testing.assert_allclose(float(m32["loss"]), float(mbf["loss"]),
                               rtol=1e-5)
    # grad norms agree to bf16 rounding of the stored gradients
    np.testing.assert_allclose(float(m32["grad_norm"]),
                               float(mbf["grad_norm"]), rtol=2e-2)
    # updated params track within bf16 gradient precision
    l32 = jax.tree_util.tree_leaves(results["fp32"][0].params)
    lbf = jax.tree_util.tree_leaves(results["bf16"][0].params)
    for a, b in zip(l32, lbf):
        assert a.dtype == b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-2)


def test_accum_pair_matches_fused():
    """make_accum_pair (two-program accumulation) must match the fused
    gradient_accumulation optimizer step-for-step: same params after
    each boundary, same state structure (so checkpoints interchange)."""
    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib, vae as vae_lib
    from marigold_tpu.train.train_step import (
        create_train_state, gradient_accumulation, make_accum_pair,
        make_train_step,
    )

    unet_cfg = unet_lib.UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=(2, 4),
        cross_attention_dim=12, norm_num_groups=4,
    )
    vae_cfg = vae_lib.VAEConfig(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), unet_lib.init_params(k1, unet_cfg))
    vae_params = vae_lib.init_params(k2, vae_cfg)
    schedule = DiffusionSchedule.create()
    rng = np.random.default_rng(0)
    batches = [
        {"rgb_norm": jnp.asarray(
             rng.standard_normal((2, 16, 16, 3)).clip(-1, 1), jnp.float32),
         "gt_norm": jnp.asarray(
             rng.standard_normal((2, 16, 16, 3)).clip(-1, 1), jnp.float32)}
        for _ in range(4)
    ]
    text = jnp.zeros((1, 2, 12), jnp.float32)
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    K = 2
    inner = lambda: optax.adafactor(
        1e-3, multiply_by_parameter_scale=False, clipping_threshold=1.0)

    # fused path
    opt_f = gradient_accumulation(inner(), K)
    step_f = jax.jit(make_train_step(
        unet_cfg, vae_cfg, schedule, opt_f, loss_name="mse_loss",
        compute_dtype=jnp.bfloat16))
    sf = create_train_state(jax.tree_util.tree_map(jnp.copy, unet_params),
                            opt_f)
    losses_f = []
    for b, kk in zip(batches, keys):
        sf, m = step_f(sf, vae_params, text, b, kk)
        losses_f.append(float(m["loss"]))

    # two-program path
    micro, apply_s, opt_like = make_accum_pair(
        unet_cfg, vae_cfg, schedule, inner(), K, loss_name="mse_loss",
        compute_dtype=jnp.bfloat16)
    micro = jax.jit(micro)
    apply_s = jax.jit(apply_s)
    sp = create_train_state(jax.tree_util.tree_map(jnp.copy, unet_params),
                            opt_like)
    losses_p = []
    for i, (b, kk) in enumerate(zip(batches, keys)):
        sp, m = micro(sp, vae_params, text, b, kk)
        losses_p.append(float(m["loss"]))
        if (i + 1) % K == 0:
            sp = apply_s(sp)

    np.testing.assert_allclose(losses_f, losses_p, rtol=1e-6)
    # identical state trees after the final boundary
    assert (jax.tree_util.tree_structure(sf.opt_state)
            == jax.tree_util.tree_structure(sp.opt_state))
    for a, b in zip(jax.tree_util.tree_leaves(sf.params),
                    jax.tree_util.tree_leaves(sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
