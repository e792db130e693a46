"""Winograd F(2x2,3x3) Pallas conv vs the XLA convolution (interpret mode
on CPU). Covers the VAE-decoder shape classes it targets on TPU
(128/256/512 channels, even H/W), K-blocking, bf16/fp32, odd-W alignment
columns, and the XLA-gradient custom VJP. Behavioral reference:
torch.nn.Conv2d(padding=1) inside the diffusers VAE used by the reference
pipelines (/root/reference/marigold/marigold_depth_pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marigold_tpu.ops import conv as pc
from marigold_tpu.ops import winograd as wg


def _rand(key, shape, dtype, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _check(B, H, W, C, K, dtype, tol):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(hash((B, H, W, C, K)) % 2**31), 3)
    x = _rand(k1, (B, H, W, C), dtype)
    w = _rand(k2, (3, 3, C, K), dtype, 0.05)
    b = _rand(k3, (K,), dtype)
    assert wg.supports(x.shape, w.shape, 1, [(1, 1), (1, 1)], dtype)
    with jax.default_matmul_precision("float32"):
        ref = pc._xla_conv(
            x.astype(jnp.float32), w.astype(jnp.float32), b.astype(jnp.float32)
        )
        out = wg.winograd3x3(x, w, b, True)
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9
    )
    assert rel < tol, rel


@pytest.mark.parametrize(
    "B,H,W,C,K",
    [
        (2, 8, 16, 128, 128),  # aligned, single K panel
        (1, 6, 16, 256, 384),  # unequal C/K
        (1, 12, 12, 128, 128),  # W=12: phase width gets alignment columns
        (2, 4, 8, 384, 256),  # unequal multiples of the MXU tile
        (1, 8, 10, 128, 128),  # W=10: odd phase width before alignment pad
    ],
)
def test_fwd_matches_xla_fp32(B, H, W, C, K):
    _check(B, H, W, C, K, jnp.float32, 1e-4)


def test_fwd_matches_xla_bf16():
    # F(2x2,3x3) is numerically mild but bf16 V/F sums cost ~1 bit vs the
    # direct conv; bound at 4%.
    _check(2, 6, 16, 128, 256, jnp.bfloat16, 0.04)


def test_k_blocking_path():
    old = wg._U_BUDGET
    wg._U_BUDGET = 16 * 128 * 128 * 4 + 1  # one 128-wide fp32 panel
    try:
        plan = wg._plan((1, 4, 8, 128), (3, 3, 128, 256), 4)
        assert plan is not None and plan[1] == 128  # BK=128 -> KT=2
        _check(1, 4, 8, 128, 256, jnp.float32, 1e-4)
    finally:
        wg._U_BUDGET = old


def test_supports_gating(monkeypatch):
    sh = (1, 8, 16, 128)
    wsh = (3, 3, 128, 128)
    pad = [(1, 1), (1, 1)]
    assert wg.supports(sh, wsh, 1, pad, jnp.bfloat16)
    assert not wg.supports(sh, wsh, 2, pad, jnp.bfloat16)  # stride
    assert not wg.supports(sh, (1, 1, 128, 128), 1, pad, jnp.bfloat16)  # 1x1
    assert not wg.supports((1, 7, 16, 128), wsh, 1, pad, jnp.bfloat16)  # odd H
    assert not wg.supports((1, 8, 16, 64), (3, 3, 64, 128), 1, pad, jnp.bfloat16)
    monkeypatch.setenv("MARIGOLD_TPU_WINO_MAX_HW", str(8 * 16 - 1))
    assert not wg.supports(sh, wsh, 1, pad, jnp.bfloat16)  # H*W cap
    monkeypatch.setenv("MARIGOLD_TPU_WINO_MAX_HW", str(8 * 16))
    assert wg.supports(sh, wsh, 1, pad, jnp.bfloat16)


def test_conv2d_dispatch_routes_and_matches(monkeypatch):
    """MARIGOLD_TPU_CONV=winograd routes eligible convs through the kernel
    (interpret-mode override exercises the real dispatch off-TPU) and the
    result matches the default XLA path."""
    from marigold_tpu.models import layers as L

    monkeypatch.setenv("MARIGOLD_TPU_CONV_INTERPRET", "1")
    monkeypatch.setattr(L, "_CONV_IMPL", "winograd")
    calls = []
    orig = wg.winograd3x3

    def spy(x, w, b, interpret=False):
        calls.append(x.shape)
        return orig(x, w, b, interpret)

    import marigold_tpu.ops.winograd as wmod

    monkeypatch.setattr(wmod, "winograd3x3", spy)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    p = {
        "weight": _rand(k1, (3, 3, 128, 128), jnp.float32, 0.05),
        "bias": _rand(k2, (128,), jnp.float32),
    }
    x = _rand(k1, (1, 4, 8, 128), jnp.float32)
    out = L.conv2d(p, x)
    assert calls == [(1, 4, 8, 128)], calls
    monkeypatch.setattr(L, "_CONV_IMPL", "xla")
    ref = L.conv2d(p, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    # ineligible shape (stride 2) falls back to XLA under winograd mode
    monkeypatch.setattr(L, "_CONV_IMPL", "winograd")
    calls.clear()
    y = L.conv2d(p, x, stride=2)
    assert calls == [] and y.shape == (1, 2, 4, 128)


def test_vjp_is_xla_gradient():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    x = _rand(k1, (1, 4, 8, 128), jnp.float32)
    w = _rand(k2, (3, 3, 128, 128), jnp.float32, 0.05)
    b = _rand(k3, (128,), jnp.float32)
    g = _rand(k4, (1, 4, 8, 128), jnp.float32)

    def f_wino(x, w, b):
        return (wg.winograd3x3(x, w, b, True) * g).sum()

    def f_xla(x, w, b):
        return (pc._xla_conv(x, w, b) * g).sum()

    gw = jax.grad(f_wino, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gw, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_plan_falls_back_to_smaller_k_block():
    """384x384x512 (the 768px-serving VAE decoder level): at BK=256 the
    double-buffered U panel leaves no VMEM for any row tile, so the plan
    must fall back to BK=128 instead of rejecting the shape (pre-fix the
    planner bailed after trying only the largest fitting BK)."""
    plan = wg._plan((1, 384, 384, 512), (3, 3, 512, 512), 2)
    assert plan is not None
    t, bk = plan
    assert bk == 128
    assert 384 // 2 % t == 0
    assert wg.supports(
        (1, 384, 384, 512), (3, 3, 512, 512), 1, [(1, 1), (1, 1)],
        jnp.bfloat16,
    )
    # nine-tap planner: same fallback structure (no shape regression)
    assert pc._plan((1, 48, 48, 640), (3, 3, 640, 640), 2) is not None
