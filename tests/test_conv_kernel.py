"""Pallas nine-tap 3x3 conv kernel vs the XLA convolution (interpret mode
on CPU). Covers the tower shape classes it serves on TPU: MXU-aligned
channels (128/256), the 320-style non-multiple-of-128 case, K-blocking
(KT > 1), W not a multiple of the sublane tile, bf16 and fp32, and the
XLA-gradient custom VJP. Behavioral reference: torch.nn.Conv2d(padding=1)
inside the diffusers UNet/VAE used by the reference pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marigold_tpu.ops import conv as pc


def _rand(key, shape, dtype, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _check(B, H, W, C, K, dtype, tol):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(hash((B, H, W, C, K)) % 2**31), 3)
    x = _rand(k1, (B, H, W, C), dtype)
    w = _rand(k2, (3, 3, C, K), dtype, 0.05)
    b = _rand(k3, (K,), dtype)
    assert pc.supports(x.shape, w.shape, 1, [(1, 1), (1, 1)], dtype)
    ref = pc._xla_conv(
        x.astype(jnp.float32), w.astype(jnp.float32), b.astype(jnp.float32)
    )
    out = pc.conv3x3(x, w, b, True)
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9
    )
    assert rel < tol, rel


@pytest.mark.parametrize(
    "B,H,W,C,K",
    [
        (2, 8, 16, 128, 128),  # aligned, single K panel
        (1, 6, 16, 256, 384),  # unequal C/K
        (1, 12, 12, 128, 128),  # W=12: not a sublane-tile multiple (level-3 W)
        (2, 4, 8, 384, 256),  # unequal multiples of the MXU tile
    ],
)
def test_fwd_matches_xla_fp32(B, H, W, C, K):
    _check(B, H, W, C, K, jnp.float32, 1e-5)


def test_fwd_matches_xla_bf16():
    _check(2, 6, 16, 128, 256, jnp.bfloat16, 0.02)


def test_k_blocking_path():
    # Force KT > 1 by shrinking the weight budget.
    old = pc._W_BUDGET
    pc._W_BUDGET = 9 * 128 * 128 * 4 + 1  # one 128-wide fp32 panel
    try:
        plan = pc._plan((1, 4, 8, 128), (3, 3, 128, 256), 4)
        assert plan is not None and plan[1] == 128  # BK=128 -> KT=2
        _check(1, 4, 8, 128, 256, jnp.float32, 1e-5)
    finally:
        pc._W_BUDGET = old


def test_supports_gating():
    dt = jnp.bfloat16
    ok = pc.supports((2, 8, 8, 128), (3, 3, 128, 128), 1, [(1, 1), (1, 1)], dt)
    assert ok
    # stride-2, 1x1, small channels, VALID padding: all rejected
    assert not pc.supports((2, 8, 8, 128), (3, 3, 128, 128), 2, [(1, 1), (1, 1)], dt)
    assert not pc.supports((2, 8, 8, 128), (1, 1, 128, 128), 1, [(1, 1), (1, 1)], dt)
    assert not pc.supports((2, 8, 8, 8), (3, 3, 8, 128), 1, [(1, 1), (1, 1)], dt)
    assert not pc.supports((2, 8, 8, 128), (3, 3, 128, 128), 1, [(0, 0), (0, 0)], dt)
    # 320 channels: lane dim not a 128 multiple -> Mosaic DMA can't slice it
    assert not pc.supports((2, 8, 8, 320), (3, 3, 320, 320), 1, [(1, 1), (1, 1)], dt)


def test_grads_are_xla_grads():
    key = jax.random.PRNGKey(0)
    x = _rand(key, (1, 4, 8, 128), jnp.float32)
    w = _rand(key, (3, 3, 128, 128), jnp.float32, 0.05)
    b = jnp.zeros((128,))
    gp = jax.grad(lambda *a: pc.conv3x3(*a, True).sum(), argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lambda *a: pc._xla_conv(*a).sum(), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_plan_respects_vmem_budget():
    # Decoder-scale shape: [*, 768, 768, 128] must still plan a tile.
    plan = pc._plan((1, 768, 768, 128), (3, 3, 128, 128), 2)
    assert plan is not None
    th, bk = plan
    assert 768 % th == 0 and 128 % bk == 0
