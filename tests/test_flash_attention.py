"""Pallas flash-attention kernel vs the XLA reference path (interpret mode
so it runs on CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marigold_tpu.ops.attention import xla_attention
from marigold_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v):
    """Plain attention on folded [BH,N,D] tensors."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("bnd,bmd->bnm", q, k) * scale
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bnm,bmd->bnd", p, v)


@pytest.mark.parametrize(
    "bh,n,d",
    [
        (2, 256, 64),     # block-aligned
        (1, 300, 64),     # non-multiple of block
        (3, 130, 64),     # tiny, smaller than one block
        (1, 1024, 64),    # multi k-block
    ],
)
def test_flash_matches_reference(bh, n, d, rng):
    q = rng.standard_normal((bh, n, d)).astype(np.float32)
    k = rng.standard_normal((bh, n, d)).astype(np.float32)
    v = rng.standard_normal((bh, n, d)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        block_q=128, block_k=128, interpret=True,
    )
    expected = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=1e-4)


def test_flash_bf16_inputs(rng):
    q = rng.standard_normal((1, 256, 64)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(q, jnp.bfloat16),
        block_q=128, block_k=128, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    expected = _ref(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), expected, atol=0.05, rtol=0.05
    )


def test_flash_extreme_logits_stable(rng):
    """Online softmax must survive large-magnitude logits without overflow."""
    q = (rng.standard_normal((1, 256, 64)) * 30).astype(np.float32)
    k = (rng.standard_normal((1, 256, 64)) * 30).astype(np.float32)
    v = rng.standard_normal((1, 256, 64)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        block_q=128, block_k=128, interpret=True,
    )
    assert bool(jnp.isfinite(out).all())
    # at |logit| ~ 2000, fp32 eps alone perturbs softmax weights by ~1e-4
    np.testing.assert_allclose(
        np.asarray(out), _ref(q, k, v), atol=5e-3, rtol=1e-3
    )


def test_dispatch_equivalence(rng):
    """xla_attention on [B,N,C] must equal folded flash on the same data."""
    b, n, c, h = 2, 256, 128, 2
    q = rng.standard_normal((b, n, c)).astype(np.float32)
    k = rng.standard_normal((b, n, c)).astype(np.float32)
    v = rng.standard_normal((b, n, c)).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h))

    hd = c // h
    def fold(x):
        return (
            x.reshape(b, n, h, hd).transpose(0, 2, 1, 3).reshape(b * h, n, hd)
        )
    out = flash_attention(
        jnp.asarray(fold(q)), jnp.asarray(fold(k)), jnp.asarray(fold(v)),
        block_q=128, block_k=128, interpret=True,
    )
    out = (
        np.asarray(out).reshape(b, h, n, hd).transpose(0, 2, 1, 3).reshape(b, n, c)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


# ---------------- transposed-layout (dt) kernel ---------------- #


from marigold_tpu.ops.flash_attention import flash_attention_dt  # noqa: E402


@pytest.mark.parametrize(
    "bh,n,d",
    [
        (2, 256, 64),     # block-aligned
        (1, 300, 64),     # non-multiple of block (padded K masking)
        (3, 130, 64),     # tiny, smaller than one block
        (1, 1024, 64),    # multi k-block
        (2, 640, 32),     # small head dim (sublane multiple)
    ],
)
def test_flash_dt_matches_reference(bh, n, d, rng):
    q = rng.standard_normal((bh, n, d)).astype(np.float32)
    k = rng.standard_normal((bh, n, d)).astype(np.float32)
    v = rng.standard_normal((bh, n, d)).astype(np.float32)

    def t(x):
        return jnp.asarray(x.transpose(0, 2, 1))

    out_t = flash_attention_dt(
        t(q), t(k), t(v), block_q=128, block_k=128, interpret=True
    )
    out = np.asarray(out_t).transpose(0, 2, 1)
    np.testing.assert_allclose(out, _ref(q, k, v), atol=2e-5, rtol=1e-4)


def test_flash_dt_extreme_logits_stable(rng):
    """Logits in the thousands (30x-scaled q AND k): the online-softmax
    kernel stays exact. (The shifted kernel intentionally trades this
    regime for speed — it stays finite but degrades; see
    test_flash_dt_shifted_spiky_k_graceful for its guarantee.)"""
    q = (rng.standard_normal((1, 256, 64)) * 30).astype(np.float32)
    k = (rng.standard_normal((1, 256, 64)) * 30).astype(np.float32)
    v = rng.standard_normal((1, 256, 64)).astype(np.float32)

    def t(x):
        return jnp.asarray(x.transpose(0, 2, 1))

    out_t = flash_attention_dt(
        t(q), t(k), t(v), block_q=128, block_k=128, interpret=True,
        softmax="online",
    )
    out = np.asarray(out_t).transpose(0, 2, 1)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, _ref(q, k, v), atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("bh,n,d", [(2, 256, 64), (1, 300, 64)])
def test_flash_dt_shifted_matches_online(bh, n, d, rng):
    """The shifted-softmax kernel (per-row subsampled shift + clamp) must
    agree with the online-softmax kernel to output precision."""
    from marigold_tpu.ops.flash_attention import _flash_dt_impl

    qt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    o_on = np.asarray(_flash_dt_impl(
        qt, kt, vt, block_q=128, block_k=128, interpret=True,
        softmax="online"))
    o_sh = np.asarray(_flash_dt_impl(
        qt, kt, vt, block_q=128, block_k=128, interpret=True,
        softmax="shifted"))
    np.testing.assert_allclose(o_sh, o_on, atol=2e-5, rtol=1e-4)


def test_flash_dt_shifted_disparate_row_maxima(rng):
    """Rows whose logit maxima differ wildly (one query scaled 50x) — the
    per-ROW shift must keep every row's softmax in fp32 range (a global
    per-head shift would zero out the weak rows)."""
    n, d = 384, 64
    q = rng.standard_normal((1, n, d)).astype(np.float32)
    q[0, ::7] *= 50.0  # every 7th row has a ~2500x larger logit scale
    k = rng.standard_normal((1, n, d)).astype(np.float32)
    v = rng.standard_normal((1, n, d)).astype(np.float32)

    def t(x):
        return jnp.asarray(x.transpose(0, 2, 1))

    from marigold_tpu.ops.flash_attention import _flash_dt_impl

    out = np.asarray(_flash_dt_impl(
        t(q), t(k), t(v), block_q=128, block_k=128, interpret=True,
        softmax="shifted")).transpose(0, 2, 1)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, _ref(q, k, v), atol=5e-3, rtol=1e-3)


def test_flash_dt_shifted_spiky_k_graceful(rng):
    """A single K column towering over everything (possibly missed by the
    column subsample): the clamp must keep the result finite and close to
    the true attention (which collapses onto the spiky key's value)."""
    n, d = 512, 64
    q = rng.standard_normal((1, n, d)).astype(np.float32)
    k = rng.standard_normal((1, n, d)).astype(np.float32)
    k[0, 137] *= 200.0  # extreme isolated key
    v = rng.standard_normal((1, n, d)).astype(np.float32)

    def t(x):
        return jnp.asarray(x.transpose(0, 2, 1))

    from marigold_tpu.ops.flash_attention import _flash_dt_impl

    out = np.asarray(_flash_dt_impl(
        t(q), t(k), t(v), block_q=128, block_k=128, interpret=True,
        softmax="shifted")).transpose(0, 2, 1)
    assert np.isfinite(out).all()
    ref = _ref(q, k, v)
    # rows dominated by the spike must still pick the spiky value
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)


def test_flash_dt_shifted_kblocked_matches(rng, monkeypatch):
    """The K-blocked variant (wide heads whose K/V rows exceed VMEM — the
    512-wide VAE mid attention) must match the reference. Forced here by
    shrinking the residency threshold so a tiny shape takes that path."""
    import marigold_tpu.ops.flash_attention as F

    monkeypatch.setattr(F, "_KV_RESIDENT_BYTES", 1024)
    F._flash_dt_impl.clear_cache()
    try:
        q = rng.standard_normal((2, 384, 64)).astype(np.float32)
        k = rng.standard_normal((2, 384, 64)).astype(np.float32)
        v = rng.standard_normal((2, 384, 64)).astype(np.float32)

        def t(x):
            return jnp.asarray(x.transpose(0, 2, 1))

        out = np.asarray(F._flash_dt_impl(
            t(q), t(k), t(v), block_q=128, block_k=128, interpret=True,
            softmax="shifted")).transpose(0, 2, 1)
        np.testing.assert_allclose(out, _ref(q, k, v), atol=2e-5, rtol=1e-4)
    finally:
        F._flash_dt_impl.clear_cache()


def test_dt_dispatch_equivalence(rng):
    """The dispatcher's dt fold/unfold must reproduce xla_attention."""
    from marigold_tpu.ops import attention as A

    b, n, c, h = 2, 1100, 128, 2
    q = rng.standard_normal((b, n, c)).astype(np.float32)
    k = rng.standard_normal((b, n, c)).astype(np.float32)
    v = rng.standard_normal((b, n, c)).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h))

    hd = c // h

    def fold_t(x):
        return jnp.asarray(
            x.reshape(b, n, h, hd).transpose(0, 2, 3, 1).reshape(b * h, hd, n)
        )

    out_t = flash_attention_dt(
        fold_t(q), fold_t(k), fold_t(v), block_q=256, block_k=256,
        interpret=True,
    )
    out = (
        np.asarray(out_t).reshape(b, h, hd, n).transpose(0, 3, 1, 2)
        .reshape(b, n, c)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_dt_gradients_match_xla(rng):
    """The custom VJP (Pallas forward + chunked recompute backward) must
    produce the same q/k/v gradients as differentiating plain attention —
    this is the TPU training path (r1 trained only where flash was
    bypassed; the kernel had no JVP rule)."""
    bh, n, d = 2, 300, 64
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)

    def loss_flash(q, k, v):
        out_t = flash_attention_dt(
            q.transpose(0, 2, 1), k.transpose(0, 2, 1), v.transpose(0, 2, 1),
            128, 128, True,
        )
        return jnp.sum(out_t.transpose(0, 2, 1) * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, num_heads=1) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_unet_grad_flows_through_flash_dispatch(rng, monkeypatch):
    """End-to-end: differentiate a tiny UNet with the flash dispatch FORCED
    on (as on TPU) — must not raise and must match the XLA-attention
    gradients."""
    from marigold_tpu.ops import attention as A
    from marigold_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig(
        sample_size=16, in_channels=8, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=(2, 4),
        cross_attention_dim=12, norm_num_groups=4,
    )
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    ctx = jnp.zeros((1, 2, 12), jnp.float32)

    def loss(params):
        out = unet_lib.apply(params, cfg, x, jnp.asarray(10), ctx)
        return jnp.mean(out**2)

    g_ref = jax.grad(loss)(params)

    # force the flash path (interpret mode so it runs on CPU)
    from marigold_tpu.ops.flash_attention import flash_attention_dt as _dt

    monkeypatch.setattr(A, "_FLASH_MIN_SEQ", 1)
    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    import functools as _ft

    monkeypatch.setattr(
        "marigold_tpu.ops.flash_attention.flash_attention_dt",
        _ft.partial(_dt, block_q=128, block_k=128, interpret=True),
    )
    g_flash = jax.grad(loss)(params)

    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = {jax.tree_util.keystr(p): a
              for p, a in jax.tree_util.tree_leaves_with_path(g_flash)}
    for p, gr in flat_r:
        gf = flat_f[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(p),
        )


def test_self_attention_projected_matches_fallback(rng, monkeypatch):
    """The projected path (Q/K/V emitted directly in the kernel's
    [B*H, hd, N] layout, out-projection folded in) must match the
    standard linear+sdpa+linear path."""
    import functools as _ft

    from marigold_tpu.models import layers as L
    from marigold_tpu.ops import attention as A
    from marigold_tpu.ops.flash_attention import flash_attention_dt as _dt

    b, n, c, heads = 2, 192, 32, 4
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    params = {
        "to_q": L.init_linear(ks[0], c, c, jnp.float32, bias=False),
        "to_k": L.init_linear(ks[1], c, c, jnp.float32, bias=False),
        "to_v": L.init_linear(ks[2], c, c, jnp.float32, bias=False),
        "to_out": {"0": L.init_linear(ks[3], c, c, jnp.float32)},
    }
    y = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    monkeypatch.setattr(A, "_PROJECTED_ATTN", False)
    ref = A.self_attention_projected(y, params, num_heads=heads)

    monkeypatch.setattr(A, "_PROJECTED_ATTN", True)
    monkeypatch.setattr(A, "_FLASH_MIN_SEQ", 1)
    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        "marigold_tpu.ops.flash_attention.flash_attention_dt",
        _ft.partial(_dt, block_q=128, block_k=128, interpret=True),
    )
    out = A.self_attention_projected(y, params, num_heads=heads)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_auto_block_k_prefers_divisors():
    from marigold_tpu.ops.flash_attention import _auto_block_k

    assert _auto_block_k(9216) == 1024   # level-0: exact, fewer K iters
    assert _auto_block_k(2304) == 768    # level-1: exact (512 would pad)
    assert _auto_block_k(576) == 768     # least padding wins (768 > 576
    # pads less than 1024); the impl then clamps block_k to the padded row


def test_flash_dt_auto_block_matches_explicit(rng):
    """block_k=None (auto) must be numerically identical to an explicit
    block size at a non-divisible length."""
    from marigold_tpu.ops.flash_attention import flash_attention_dt

    bh, d, n = 2, 16, 300
    qt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    auto = flash_attention_dt(qt, kt, vt, block_q=128, interpret=True)
    explicit = flash_attention_dt(qt, kt, vt, block_q=128, block_k=128,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(explicit),
                               atol=2e-6, rtol=1e-5)


# ---------------- Pallas flash backward (training path) ---------------- #


def test_flash_dt_pallas_bwd_matches_xla_bwd(rng):
    """The Pallas flash backward (dq + dkv kernels recomputing
    probabilities from the forward's saved logsumexp) must match the XLA
    scan fallback backward bit-for-tolerance on the same cotangent —
    both are exact attention gradients."""
    from marigold_tpu.ops import flash_attention as F

    bh, n, d = 2, 384, 64
    qt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    got = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)

    out, lse = F._flash_dt_impl_lse(qt, kt, vt, 128, 128, True)
    dq_p, dk_p, dv_p = F._flash_dt_bwd_pallas(
        qt, kt, vt, out, lse, got, block_q=128, block_k=128, interpret=True
    )
    dq_x, dk_x, dv_x = F._flash_dt_bwd_xla(qt, kt, vt, got)
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_x),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_x),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_x),
                               atol=2e-4, rtol=1e-3)


def test_flash_dt_lse_forward_matches_plain(rng):
    """The lse-emitting forward must produce the same output as the plain
    online kernel, and its lse must equal the true logsumexp of the
    scaled logits."""
    from marigold_tpu.ops import flash_attention as F

    bh, n, d = 2, 300, 64  # non-block-multiple: padding exercised
    qt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)

    out, lse = F._flash_dt_impl_lse(qt, kt, vt, 128, 128, True)
    ref = F._flash_dt_impl(qt, kt, vt, 128, 128, True, "online")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    s = np.einsum("bdq,bdk->bqk", np.asarray(qt), np.asarray(kt))
    s = s / np.sqrt(d)
    lse_ref = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), lse_ref, atol=1e-4,
                               rtol=1e-5)


def test_flash_dt_pallas_bwd_uneven_q_k(rng):
    """nq != nk (both non-block-multiples): padded q columns are killed by
    the +1e30 lse padding, padded k rows by the n_valid mask — gradients
    must match differentiating plain attention."""
    from marigold_tpu.ops import flash_attention as F

    bh, nq, nk, d = 1, 200, 300, 64
    q = jnp.asarray(rng.standard_normal((bh, nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, nk, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((bh, nq, d)), jnp.float32)

    def loss_flash(q, k, v):
        out_t = flash_attention_dt(
            q.transpose(0, 2, 1), k.transpose(0, 2, 1), v.transpose(0, 2, 1),
            128, 128, True,
        )
        return jnp.sum(out_t.transpose(0, 2, 1) * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, num_heads=1) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_flash_dt_bwd_env_fallback(rng, monkeypatch):
    """MARIGOLD_TPU_FLASH_BWD=xla must route the VJP through the scan
    fallback and produce the same gradients."""
    from marigold_tpu.ops import flash_attention as F

    bh, n, d = 1, 256, 64
    q = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, d, n)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention_dt(q, k, v, 128, 128, True) ** 2)

    g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(F, "_FLASH_BWD", "xla")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gp, gx in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=2e-4, rtol=1e-3)


def test_k_resident_gate():
    """The full-K-resident shifted kernel must only be chosen for narrow
    heads with VMEM-fitting K/V — regression pin for the round-5
    dress-rehearsal bug where the d=512 VAE mid-head passed the K+V byte
    test at nk_pad=2048 and compiled to an 18.2 MB scoped-VMEM stack
    allocation (limit 16 MB)."""
    from marigold_tpu.ops.flash_attention import _k_resident

    # the tuned UNet case: d=64, protocol sequence lengths
    assert _k_resident(64, 9216, 2)
    assert _k_resident(64, 2304, 2)
    # the rehearsal bug shape: d=512 VAE mid-head at 384px smoke
    assert not _k_resident(512, 2048, 2)
    # d=512 at 768px was already K-blocked via the byte test
    assert not _k_resident(512, 9216, 2)
    # byte test alone still rejects huge K/V even for narrow heads
    assert not _k_resident(128, 200_000, 2)
