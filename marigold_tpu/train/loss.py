"""Training losses (JAX), factory-compatible with the reference configs.

Behavioral reference: src/util/loss.py:34-151 — get_loss dispatches on
name to silog_mse / silog_rmse / mse_loss / l1_loss / l1_loss_with_mask /
mean_abs_rel. All shipped configs use `mse_loss` with reduction=mean
(config/train_marigold_depth.yaml:57-60). Losses accept NHWC latents.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "none" or reduction is None:
        return x
    raise ValueError(f"unknown reduction: {reduction}")


def mse_loss(pred, target, reduction="mean", **kwargs):
    return _reduce((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
                   reduction)


def l1_loss(pred, target, reduction="mean", **kwargs):
    return _reduce(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)),
                   reduction)


def l1_loss_with_mask(pred, target, valid_mask=None, **kwargs):
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if valid_mask is not None:
        diff = jnp.where(valid_mask, diff, 0.0)
        n = jnp.maximum(jnp.sum(valid_mask), 1)
    else:
        n = diff.size
    return jnp.sum(diff) / n


def mean_abs_rel(pred, target, valid_mask=None, eps=1e-6, **kwargs):
    rel = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)) / (
        jnp.abs(target.astype(jnp.float32)) + eps
    )
    if valid_mask is not None:
        rel = jnp.where(valid_mask, rel, 0.0)
        n = jnp.maximum(jnp.sum(valid_mask), 1)
    else:
        n = rel.size
    return jnp.sum(rel) / n


def silog_loss(pred, target, valid_mask=None, variance_focus=0.85,
               rmse=False, eps=1e-8, **kwargs):
    """Scale-invariant log loss (SILog). `rmse=True` takes the sqrt."""
    p = jnp.clip(pred.astype(jnp.float32), eps, None)
    t = jnp.clip(target.astype(jnp.float32), eps, None)
    d = jnp.log(p) - jnp.log(t)
    if valid_mask is not None:
        d = jnp.where(valid_mask, d, 0.0)
        n = jnp.maximum(jnp.sum(valid_mask), 1)
    else:
        n = d.size
    first = jnp.sum(d**2) / n
    second = variance_focus * (jnp.sum(d) / n) ** 2
    loss = first - second
    return jnp.sqrt(loss + eps) if rmse else loss


def silog_mse(pred, target, valid_mask=None, **kw):
    return silog_loss(pred, target, valid_mask, rmse=False, **kw)


def silog_rmse(pred, target, valid_mask=None, **kw):
    return silog_loss(pred, target, valid_mask, rmse=True, **kw)


_LOSSES = {
    "mse_loss": mse_loss,
    "l1_loss": l1_loss,
    "l1_loss_with_mask": l1_loss_with_mask,
    "mean_abs_rel": mean_abs_rel,
    "silog_mse": silog_mse,
    "silog_rmse": silog_rmse,
}


def get_loss(loss_name: str, **kwargs):
    """Factory (reference src/util/loss.py:34-58)."""
    if loss_name not in _LOSSES:
        raise ValueError(f"unknown loss: {loss_name}")
    fn = _LOSSES[loss_name]
    if kwargs:
        import functools

        return functools.partial(fn, **kwargs)
    return fn
