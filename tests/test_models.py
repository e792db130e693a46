"""Model stack tests: tiny-config shapes, layer-level parity against torch
(our only offline numerical oracle for conv/GN/attention layouts), weight
save/load roundtrip through the diffusers safetensors format."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from marigold_tpu.models import layers as L
from marigold_tpu.models import unet as unet_lib
from marigold_tpu.models import vae as vae_lib
from marigold_tpu.models import clip_text as clip_lib
from marigold_tpu.models import weights as W

TINY_UNET = unet_lib.UNetConfig(
    sample_size=16,
    in_channels=8,
    out_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=2,
    attention_head_dim=(2, 4),
    cross_attention_dim=12,
    norm_num_groups=4,
)

TINY_VAE = vae_lib.VAEConfig(
    block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
    norm_num_groups=4,
)

TINY_CLIP = clip_lib.CLIPTextConfig(
    vocab_size=100, hidden_size=16, intermediate_size=32,
    num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=20,
)


# ---------------- layer parity vs torch ---------------- #


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 5)).astype(np.float32)
    w_oihw = rng.standard_normal((7, 5, 3, 3)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    ours = L.conv2d(
        {"weight": jnp.asarray(w_oihw.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)},
        jnp.asarray(x),
    )
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w_oihw),
        torch.from_numpy(b), padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_strided_conv_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    ours = L.conv2d(
        {"weight": jnp.asarray(w.transpose(2, 3, 1, 0))}, jnp.asarray(x),
        stride=2, padding=1,
    )
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
    wt = rng.standard_normal(8).astype(np.float32)
    bs = rng.standard_normal(8).astype(np.float32)
    ours = L.group_norm(
        {"weight": jnp.asarray(wt), "bias": jnp.asarray(bs)}, jnp.asarray(x),
        num_groups=4,
    )
    theirs = F.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2), 4, torch.from_numpy(wt),
        torch.from_numpy(bs), eps=1e-6,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_attention_matches_torch_sdpa(rng):
    b, n, c, h = 2, 10, 16, 4
    q = rng.standard_normal((b, n, c)).astype(np.float32)
    k = rng.standard_normal((b, n, c)).astype(np.float32)
    v = rng.standard_normal((b, n, c)).astype(np.float32)
    ours = L.attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h)

    def split(x):
        return torch.from_numpy(x).reshape(b, n, h, c // h).permute(0, 2, 1, 3)

    theirs = (
        F.scaled_dot_product_attention(split(q), split(k), split(v))
        .permute(0, 2, 1, 3).reshape(b, n, c).numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(t, 320, flip_sin_to_cos=True,
    # downscale_freq_shift=0): exponent = -ln(10000)*arange(half)/half
    t = jnp.asarray([0.0, 1.0, 999.0])
    emb = L.timestep_embedding(t, 8)
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, atol=1e-5)


def test_geglu_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6)).astype(np.float32)
    w = rng.standard_normal((24, 6)).astype(np.float32)
    b = rng.standard_normal(24).astype(np.float32)
    ours = L.geglu(
        {"weight": jnp.asarray(w.T), "bias": jnp.asarray(b)}, jnp.asarray(x)
    )
    proj = torch.from_numpy(x) @ torch.from_numpy(w).T + torch.from_numpy(b)
    val, gate = proj.chunk(2, dim=-1)
    theirs = (val * F.gelu(gate)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


# ---------------- tiny model shapes ---------------- #


def test_unet_forward_shapes():
    key = jax.random.PRNGKey(0)
    params = unet_lib.init_params(key, TINY_UNET)
    x = jax.random.normal(key, (2, 16, 16, 8))
    t = jnp.asarray([10, 500])
    ctx = jax.random.normal(key, (1, 2, 12))
    out = unet_lib.apply(params, TINY_UNET, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_unet_odd_spatial_dims():
    """KITTI-style non-square, non-power-of-two latents (e.g. 44x152 in the
    real model; here scaled down) must survive down/up round-trips."""
    cfg = TINY_UNET
    key = jax.random.PRNGKey(1)
    params = unet_lib.init_params(key, cfg)
    x = jax.random.normal(key, (1, 12, 20, 8))
    out = unet_lib.apply(params, cfg, x, jnp.asarray(999), jnp.zeros((1, 2, 12)))
    assert out.shape == (1, 12, 20, 4)


def test_unet_jit_and_determinism():
    key = jax.random.PRNGKey(2)
    params = unet_lib.init_params(key, TINY_UNET)
    fn = jax.jit(lambda p, x, t, c: unet_lib.apply(p, TINY_UNET, x, t, c))
    x = jax.random.normal(key, (1, 16, 16, 8))
    ctx = jnp.zeros((1, 2, 12))
    a = fn(params, x, jnp.asarray(1), ctx)
    b = fn(params, x, jnp.asarray(1), ctx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vae_roundtrip_shapes():
    key = jax.random.PRNGKey(3)
    params = vae_lib.init_params(key, TINY_VAE)
    x = jax.random.normal(key, (2, 32, 32, 3))
    mean, logvar = vae_lib.encode(params, TINY_VAE, x)
    assert mean.shape == (2, 16, 16, 4) and logvar.shape == (2, 16, 16, 4)
    rec = vae_lib.decode(params, TINY_VAE, mean)
    assert rec.shape == (2, 32, 32, 3)


def test_vae_odd_input():
    key = jax.random.PRNGKey(4)
    params = vae_lib.init_params(key, TINY_VAE)
    x = jax.random.normal(key, (1, 34, 30, 3))
    mean, _ = vae_lib.encode(params, TINY_VAE, x)
    assert mean.shape == (1, 17, 15, 4)


def test_clip_empty_prompt_embedding():
    key = jax.random.PRNGKey(5)
    params = clip_lib.init_params(key, TINY_CLIP)
    emb = clip_lib.encode_empty_prompt(params, TINY_CLIP)
    assert emb.shape == (1, 2, 16)
    # causality: embedding of BOS must not depend on the token after it
    ids1 = jnp.asarray([[TINY_CLIP.bos_token_id % 100, 5]], jnp.int32)
    ids2 = jnp.asarray([[TINY_CLIP.bos_token_id % 100, 7]], jnp.int32)
    h1 = clip_lib.apply(params, TINY_CLIP, ids1)
    h2 = clip_lib.apply(params, TINY_CLIP, ids2)
    np.testing.assert_allclose(
        np.asarray(h1[:, 0]), np.asarray(h2[:, 0]), atol=1e-5
    )
    assert not np.allclose(np.asarray(h1[:, 1]), np.asarray(h2[:, 1]))


# ---------------- weights roundtrip ---------------- #


def test_weights_roundtrip_unet(tmp_path):
    key = jax.random.PRNGKey(6)
    params = unet_lib.init_params(key, TINY_UNET)
    W.save_unet(TINY_UNET, params, str(tmp_path / "unet"))
    cfg2, params2 = W.load_unet(str(tmp_path / "unet"))
    assert cfg2 == TINY_UNET
    flat1 = {
        jax.tree_util.keystr(p): a
        for p, a in jax.tree_util.tree_leaves_with_path(params)
    }
    flat2 = {
        jax.tree_util.keystr(p): a
        for p, a in jax.tree_util.tree_leaves_with_path(params2)
    }
    assert set(flat1) == set(flat2)
    for key_ in flat1:
        a1, a2 = flat1[key_], flat2[key_]
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # and the loaded params must run
    out = unet_lib.apply(
        params2, cfg2, jnp.zeros((1, 16, 16, 8)), jnp.asarray(0),
        jnp.zeros((1, 2, 12)),
    )
    assert out.shape == (1, 16, 16, 4)


def test_weights_roundtrip_vae_and_text(tmp_path):
    key = jax.random.PRNGKey(7)
    vp = vae_lib.init_params(key, TINY_VAE)
    W.save_vae(TINY_VAE, vp, str(tmp_path / "vae"))
    cfg2, vp2 = W.load_vae(str(tmp_path / "vae"))
    assert cfg2 == TINY_VAE
    x = jax.random.normal(key, (1, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(vae_lib.encode(vp, TINY_VAE, x)[0]),
        np.asarray(vae_lib.encode(vp2, cfg2, x)[0]),
        atol=1e-6,
    )

    tp = clip_lib.init_params(key, TINY_CLIP)
    W.save_text_encoder(TINY_CLIP, tp, str(tmp_path / "text_encoder"))
    cfg3, tp2 = W.load_text_encoder(str(tmp_path / "text_encoder"))
    np.testing.assert_allclose(
        np.asarray(clip_lib.encode_empty_prompt(tp, TINY_CLIP)),
        np.asarray(clip_lib.encode_empty_prompt(tp2, cfg3)),
        atol=1e-6,
    )


def test_torch_layout_checkpoint_loads(tmp_path):
    """Write a checkpoint with *torch*-layout tensors (as a real diffusers
    export would) and check our loader transposes them correctly by
    comparing a conv output against torch."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    w_oihw = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    save_file(
        {"conv_in.weight": w_oihw, "conv_in.bias": b},
        str(tmp_path / "model.safetensors"),
    )
    flat = W.load_safetensors_flat(str(tmp_path))
    tree = W.torch_to_tree(flat)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ours = L.conv2d(tree["conv_in"], jnp.asarray(x))
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w_oihw),
        torch.from_numpy(b), padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_old_vae_attention_names_aliased():
    flat = {
        "encoder.mid_block.attentions.0.query.weight": np.zeros((4, 4), np.float32),
        "encoder.mid_block.attentions.0.proj_attn.bias": np.zeros(4, np.float32),
    }
    tree = W.torch_to_tree(flat)
    att = tree["encoder"]["mid_block"]["attentions"]["0"]
    assert "to_q" in att and "0" in att["to_out"]


def test_weight_variant_selection(tmp_path):
    """HF checkpoints can ship plain + fp16 weight-variant files with
    identical keys (diffusers variant="fp16"; reference --half_precision,
    script/depth/run.py:203-215). variant=None must read only the plain
    file, variant="fp16" only the variant, and a variant-only dir must
    fall back regardless of the requested variant."""
    from safetensors.numpy import save_file

    plain = {"w": np.full((2, 2), 1.0, np.float32)}
    fp16 = {"w": np.full((2, 2), 2.0, np.float16)}
    save_file(plain, str(tmp_path / "model.safetensors"))
    save_file(fp16, str(tmp_path / "model.fp16.safetensors"))

    assert W.load_safetensors_flat(str(tmp_path))["w"][0, 0] == 1.0
    assert W.load_safetensors_flat(str(tmp_path), variant="fp16")["w"][0, 0] == 2.0

    only_var = tmp_path / "only_variant"
    only_var.mkdir()
    save_file(fp16, str(only_var / "model.fp16.safetensors"))
    assert W.load_safetensors_flat(str(only_var))["w"][0, 0] == 2.0
    assert W.load_safetensors_flat(str(only_var), variant="fp16")["w"][0, 0] == 2.0

    # HF sharded naming: model.fp16-00001-of-00002.safetensors must be
    # classified as a variant too (sorted() would otherwise let the fp16
    # shards overwrite the plain weights)
    sharded = tmp_path / "sharded"
    sharded.mkdir()
    a = {"w1": np.full((2, 2), 1.0, np.float32)}
    b = {"w2": np.full((2, 2), 1.0, np.float32)}
    a16 = {"w1": np.full((2, 2), 2.0, np.float16)}
    b16 = {"w2": np.full((2, 2), 2.0, np.float16)}
    save_file(a, str(sharded / "model-00001-of-00002.safetensors"))
    save_file(b, str(sharded / "model-00002-of-00002.safetensors"))
    save_file(a16, str(sharded / "model.fp16-00001-of-00002.safetensors"))
    save_file(b16, str(sharded / "model.fp16-00002-of-00002.safetensors"))
    plain = W.load_safetensors_flat(str(sharded))
    assert plain["w1"][0, 0] == 1.0 and plain["w2"][0, 0] == 1.0
    var = W.load_safetensors_flat(str(sharded), variant="fp16")
    assert var["w1"][0, 0] == 2.0 and var["w2"][0, 0] == 2.0


def test_weight_variant_fallback_never_mixes_groups(tmp_path, caplog):
    """Requesting an absent variant with plain+OTHER-variant files present
    must load exactly ONE group (plain preferred) and warn — the old
    fallback loaded every file and let filename sort order pick the
    winner of identical keys."""
    import logging

    from safetensors.numpy import save_file

    plain = {"w": np.full((2, 2), 1.0, np.float32)}
    bf16 = {"w": np.full((2, 2), 3.0, np.float32)}
    save_file(plain, str(tmp_path / "model.safetensors"))
    save_file(bf16, str(tmp_path / "model.bf16.safetensors"))

    with caplog.at_level(logging.WARNING):
        got = W.load_safetensors_flat(str(tmp_path), variant="fp16")
    assert got["w"][0, 0] == 1.0  # plain group, not a sort-order accident
    assert any("fp16" in r.message for r in caplog.records)

    # variant-only dir (single group) also warns instead of silently
    # loading whatever sorts last
    only = tmp_path / "only"
    only.mkdir()
    save_file(bf16, str(only / "model.bf16.safetensors"))
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        got = W.load_safetensors_flat(str(only), variant="fp16")
    assert got["w"][0, 0] == 3.0
    assert any("bf16" in r.message for r in caplog.records)


def test_transformer_conv_projection_matches_linear(rng):
    """use_linear_projection=False checkpoints (SD1.x-class) store
    proj_in/proj_out as 1x1 convs; the [1,1,C,C] HWIO kernel must apply
    identically to the [C,C] linear form."""
    import jax

    from marigold_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig(
        block_out_channels=(32,), attention_head_dim=(4,),
        down_block_types=("CrossAttnDownBlock2D",),
        up_block_types=("CrossAttnUpBlock2D",),
        layers_per_block=1, cross_attention_dim=32, in_channels=4,
        out_channels=4, norm_num_groups=8,
    )
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray(500)
    ctx = jnp.asarray(rng.standard_normal((1, 2, 32)), jnp.float32)
    ref = unet_lib.apply(params, cfg, x, t, ctx)

    def conv_form(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k in ("proj_in", "proj_out"):
                    out[k] = dict(v, weight=v["weight"][None, None])
                else:
                    out[k] = conv_form(v)
            return out
        return tree

    got = unet_lib.apply(conv_form(params), cfg, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_surgery_rejects_non_multiple_conv_out():
    """Re-running IID surgery on an already-widened UNet must fail fast
    instead of silently desyncing cfg.out_channels from the weights."""
    import jax
    import pytest

    from marigold_tpu.models import surgery, unet as unet_lib

    cfg = unet_lib.UNetConfig(
        block_out_channels=(32,), attention_head_dim=(4,),
        down_block_types=("DownBlock2D",), up_block_types=("UpBlock2D",),
        layers_per_block=1, in_channels=4, out_channels=8,
        norm_num_groups=8,
    )
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="multiple"):
        surgery.replace_conv_in_out_multimodal(cfg, params, n_targets=3)
