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
    q = (rng.standard_normal((1, 256, 64)) * 30).astype(np.float32)
    k = (rng.standard_normal((1, 256, 64)) * 30).astype(np.float32)
    v = rng.standard_normal((1, 256, 64)).astype(np.float32)

    def t(x):
        return jnp.asarray(x.transpose(0, 2, 1))

    out_t = flash_attention_dt(
        t(q), t(k), t(v), block_q=128, block_k=128, interpret=True
    )
    out = np.asarray(out_t).transpose(0, 2, 1)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, _ref(q, k, v), atol=5e-3, rtol=1e-3)


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
