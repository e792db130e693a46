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
