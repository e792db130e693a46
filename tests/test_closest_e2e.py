"""E2E coverage for the default normals `closest` reduction (per-pixel
argmax over member-to-mean cosines + gather, reference
marigold/util/ensemble.py:245-248) through the FUSED and SPATIAL
pipeline programs.

Tiny random models make the argmax fp-chaotic (members are uncorrelated,
cosine ties flip between reassociated-but-equal paths), so the UNet
output is bypassed at the decode boundary: `vae.decode_scaled` is
monkeypatched to emit deterministic, well-separated unit-normal members
that depend only on (member index, image column). The expected winner
per column is then computable on the host, and the full pipeline —
encode, scan-denoise, (sharded) decode, ensemble argmax+gather, readback
— still runs as one program around the injection point.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fixtures import make_tiny_checkpoint

E = 3


def _member_normals(n_members: int, width: int) -> np.ndarray:
    """[E, W, 3] unit normals tilted off +z by phase-staggered angles
    alpha_b(w): the member multiset is column-independent (so the mean
    direction is fixed) while each member rotates — every member takes a
    turn being closest to the mean as the column advances (~1/3 of
    columns each at E=3, margins >1e-3 on ~94%)."""
    w = np.arange(width, dtype=np.float64)
    b = np.arange(n_members, dtype=np.float64)
    alpha = 0.8 * np.cos(
        2 * np.pi * w[None, :] / width + 2 * np.pi * b[:, None] / n_members
    )
    return np.stack(
        [np.sin(alpha), np.zeros_like(alpha), np.cos(alpha)], axis=-1
    )


def _expected_closest(members_w: np.ndarray):
    """Host-side reference: per-column argmax winner + top-2 margin."""
    mean = members_w.mean(axis=0)
    mean /= np.linalg.norm(mean, axis=-1, keepdims=True)
    sims = np.einsum("ewc,wc->ew", members_w, mean)
    order = np.sort(sims, axis=0)
    margin = order[-1] - order[-2]
    winner = members_w[np.argmax(sims, axis=0), np.arange(members_w.shape[1])]
    return winner, margin


def _patch_decode(monkeypatch):
    from marigold_tpu.models import vae as vae_mod

    def fake_decode_scaled(vae_params, vae_cfg, z, spatial_axis=None):
        ds = vae_cfg.downscale_factor
        e, hl, wl = z.shape[0], z.shape[1], z.shape[2]
        width = wl * ds
        w = jnp.arange(width, dtype=jnp.float32)
        b = jnp.arange(e, dtype=jnp.float32)
        alpha = 0.8 * jnp.cos(
            2 * jnp.pi * w[None, :] / width + 2 * jnp.pi * b[:, None] / e
        )
        v = jnp.stack(
            [jnp.sin(alpha), jnp.zeros_like(alpha), jnp.cos(alpha)], axis=-1
        )
        return jnp.broadcast_to(v[:, None, :, :], (e, hl * ds, width, 3))

    monkeypatch.setattr(vae_mod, "decode_scaled", fake_decode_scaled)


def _check(out_np: np.ndarray, width: int):
    members = _member_normals(E, width)  # [E, W, 3]
    winner, margin = _expected_closest(members)
    # confident columns (vast majority): the e2e output IS the argmax
    # member, bit-near-exactly (decode clip+renorm are no-ops on units)
    confident = margin > 1e-3
    assert confident.mean() > 0.9
    np.testing.assert_allclose(
        out_np[:, confident, :],
        np.broadcast_to(winner[confident], (out_np.shape[0],) + winner[confident].shape),
        atol=1e-5,
    )
    # every pixel (ties included) equals SOME member — the gather never
    # interpolates, which is exactly what distinguishes closest from mean
    dists = np.linalg.norm(
        out_np[None, :, :, :] - members[:, None, :, :], axis=-1
    ).min(axis=0)
    assert dists.max() < 1e-4
    # and the winner map is non-constant => the argmax genuinely varies
    sims = np.einsum("ewc,wc->ew", members,
                     members.mean(0) / np.linalg.norm(members.mean(0), axis=-1, keepdims=True))
    assert len(np.unique(np.argmax(sims, axis=0)[confident])) > 1


def test_closest_reduction_fused_e2e(tmp_path_factory, rng, monkeypatch):
    from marigold_tpu import MarigoldNormalsPipeline

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("ncl")), mode="normals"
    )
    _patch_decode(monkeypatch)
    img = Image.fromarray(
        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8), "RGB"
    )
    pipe = MarigoldNormalsPipeline.from_pretrained(ckpt, dtype=jnp.float32)
    out = pipe(
        img, denoising_steps=1, ensemble_size=E, processing_res=0, seed=5,
        show_progress_bar=False,  # default reduction: "closest"
    )
    assert out.normals_np.shape == (64, 96, 3)
    _check(out.normals_np, 96)
    assert out.uncertainty is not None


def test_closest_reduction_spatial_e2e(tmp_path_factory, rng, monkeypatch):
    from marigold_tpu import MarigoldNormalsPipeline
    from marigold_tpu.parallel.mesh import get_mesh

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("ncls")), mode="normals"
    )
    _patch_decode(monkeypatch)
    img = Image.fromarray(
        rng.integers(0, 255, (512, 64, 3), dtype=np.uint8), "RGB"
    )
    pipe = MarigoldNormalsPipeline.from_pretrained(
        ckpt, dtype=jnp.float32, mesh=get_mesh(8)
    )
    out = pipe(
        img, spatial=True, denoising_steps=1, ensemble_size=E,
        processing_res=0, seed=5, show_progress_bar=False,
    )
    assert out.normals_np.shape == (512, 64, 3)
    _check(out.normals_np, 64)
