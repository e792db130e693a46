"""Multi-device (8 virtual CPU devices) sharding tests — the TPU analog of
multi-node testing without a cluster (SURVEY.md §4 implication d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from fixtures import make_tiny_checkpoint
from marigold_tpu.parallel.mesh import get_mesh, shard_batch, replicate


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


def test_mesh_creation_and_sharding():
    mesh = get_mesh(8)
    assert mesh.shape["data"] == 8
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    # leading dim split over 8 devices
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))
    r = replicate(mesh, x)
    assert len(r.sharding.device_set) == 8


@pytest.fixture(scope="module")
def depth_ckpt(tmp_path_factory):
    return make_tiny_checkpoint(str(tmp_path_factory.mktemp("m")), mode="depth")


def test_sharded_ensemble_inference_matches_single_device(depth_ckpt, rng):
    """The mesh-sharded fused pipeline must produce the same depth map as
    the single-device path (same key -> same noise; sharding is layout,
    not math)."""
    from marigold_tpu import MarigoldDepthPipeline

    img = Image.fromarray(
        rng.integers(0, 255, (40, 48, 3), dtype=np.uint8), "RGB"
    )
    # alignment disabled: the BFGS solver chaotically amplifies reduction
    # -order float differences on uncorrelated tiny-model members; the
    # sharding contract is about the denoise/decode/reduce math
    kw = dict(
        denoising_steps=1, ensemble_size=8, processing_res=32, seed=5,
        show_progress_bar=False, color_map=None,
        ensemble_kwargs=dict(scale_invariant=False, shift_invariant=False),
    )

    pipe1 = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    a = pipe1(img, batch_size=8, **kw).depth_np

    mesh = get_mesh(8)
    pipe8 = MarigoldDepthPipeline.from_pretrained(
        depth_ckpt, dtype=jnp.float32, mesh=mesh
    )
    b = pipe8(img, **kw).depth_np
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_sharded_inference_uneven_ensemble(depth_ckpt, rng):
    """E=10 on 8 devices: padded to 16, cropped back — must still work."""
    from marigold_tpu import MarigoldDepthPipeline

    img = Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8), "RGB"
    )
    mesh = get_mesh(8)
    pipe = MarigoldDepthPipeline.from_pretrained(
        depth_ckpt, dtype=jnp.float32, mesh=mesh
    )
    out = pipe(
        img, denoising_steps=1, ensemble_size=10, processing_res=32, seed=1,
        show_progress_bar=False, color_map=None,
    )
    assert out.depth_np.shape == (32, 32)
    assert np.isfinite(out.depth_np).all()
    assert out.uncertainty is not None


def test_train_step_gradients_match_across_device_counts(rng):
    """Data-parallel training on 8 devices must produce (numerically) the
    same update as single-device on the same global batch — XLA's psum from
    sharding annotations is semantically an exact mean."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib, vae as vae_lib
    from marigold_tpu.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    unet_cfg = unet_lib.UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=2, attention_head_dim=(2, 4),
        cross_attention_dim=12, norm_num_groups=4,
    )
    vae_cfg = vae_lib.VAEConfig(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4,
    )
    schedule = DiffusionSchedule.create()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    up = unet_lib.init_params(k1, unet_cfg)
    vp = vae_lib.init_params(k2, vae_cfg)
    opt = make_optimizer(1e-4)
    # fp32 compute: this test pins the EXACTNESS of the sharded mean/psum;
    # the production bf16 compute path makes reduction order visible at
    # ~1e-5, which is a precision property, not a sharding one
    step = make_train_step(unet_cfg, vae_cfg, schedule, opt,
                           compute_dtype=None)

    B, H, W = 8, 16, 16
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
    }
    text = jnp.zeros((1, 2, 12), jnp.float32)
    k_step = jax.random.PRNGKey(3)

    # single device
    s1 = create_train_state(up, opt)
    s1b, m1 = jax.jit(step)(s1, vp, text, batch, k_step)

    # 8-device dp
    mesh = get_mesh(8)
    repl = NamedSharding(mesh, P())
    dp = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))
    s8 = jax.device_put(create_train_state(up, opt), repl)
    batch8 = {k: jax.device_put(v, dp(v.ndim)) for k, v in batch.items()}
    with mesh:
        s8b, m8 = jax.jit(step)(
            s8, jax.device_put(vp, repl), jax.device_put(text, repl), batch8,
            k_step,
        )

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(s1b.params)
    l8 = jax.tree_util.tree_leaves(s8b.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_zero1_sharded_adam_matches_replicated(rng):
    """ZeRO-1 (optimizer state sharded over the mesh) must produce the
    same parameters as the replicated update, and must actually shard the
    Adam moments (that is the memory win that lets reference-parity Adam
    run at SD2 scale on >=2 chips)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib, vae as vae_lib
    from marigold_tpu.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
        zero1_state_shardings,
    )

    unet_cfg = unet_lib.UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=2, attention_head_dim=(2, 4),
        cross_attention_dim=12, norm_num_groups=4,
    )
    vae_cfg = vae_lib.VAEConfig(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4,
    )
    schedule = DiffusionSchedule.create()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    up = unet_lib.init_params(k1, unet_cfg)
    vp = vae_lib.init_params(k2, vae_cfg)
    # accumulation included: the MultiSteps grad buffer is part of the
    # sharded state
    opt = make_optimizer(1e-3, accumulation_steps=2)
    step = make_train_step(unet_cfg, vae_cfg, schedule, opt,
                           compute_dtype=None)

    B, H, W = 8, 16, 16
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
    }
    text = jnp.zeros((1, 2, 12), jnp.float32)

    mesh = get_mesh(8)
    repl = NamedSharding(mesh, P())
    dp = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))
    batch8 = {k: jax.device_put(v, dp(v.ndim)) for k, v in batch.items()}
    vp8 = jax.device_put(vp, repl)
    text8 = jax.device_put(text, repl)

    # replicated reference: two steps (crosses the accumulation boundary)
    s_ref = jax.device_put(create_train_state(up, opt), repl)
    with mesh:
        jstep = jax.jit(step)
        for i in (3, 4):
            s_ref, _ = jstep(s_ref, vp8, text8, batch8, jax.random.PRNGKey(i))

    # ZeRO-1: same steps with sharded opt state
    s_z = create_train_state(up, opt)
    shardings = zero1_state_shardings(mesh, s_z)
    s_z = jax.device_put(s_z, shardings)
    with mesh:
        jstep_z = jax.jit(step, out_shardings=(shardings, repl))
        for i in (3, 4):
            s_z, mz = jstep_z(s_z, vp8, text8, batch8, jax.random.PRNGKey(i))

    # the moments are genuinely partitioned (not replicated)
    mu_leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(s_z.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size >= 8
    ]
    n_sharded = sum(
        1 for leaf in mu_leaves if not leaf.sharding.is_fully_replicated
    )
    assert n_sharded > len(mu_leaves) // 2, (
        f"only {n_sharded}/{len(mu_leaves)} opt leaves sharded"
    )
    # params stay replicated
    for leaf in jax.tree_util.tree_leaves(s_z.params):
        assert leaf.sharding.is_fully_replicated

    # and the update is numerically the replicated one
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_z.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.opt_state),
        jax.tree_util.tree_leaves(s_z.opt_state),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )


def test_spatial_sharded_attention_matches_single_device(rng):
    """Token-sharded attention over 8 devices must equal unsharded
    attention — the >1k-res long-context path (no reference counterpart)."""
    from marigold_tpu.ops.attention import xla_attention
    from marigold_tpu.ops.sharded_attention import spatial_sharded_attention

    b, n, c, heads = 2, 1024, 64, 4
    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    ref = np.asarray(xla_attention(q, k, v, heads))
    mesh = get_mesh(8)
    out = np.asarray(
        spatial_sharded_attention(q, k, v, heads, mesh, use_flash=False)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_spatial_sharded_attention_rejects_indivisible(rng):
    from marigold_tpu.ops.sharded_attention import spatial_sharded_attention

    q = jnp.zeros((1, 100, 16), jnp.float32)  # 100 % 8 != 0
    mesh = get_mesh(8)
    with pytest.raises(ValueError, match="must divide"):
        spatial_sharded_attention(q, q, q, 2, mesh, use_flash=False)


def test_global_batch_from_local_single_process():
    """Single-process, global_batch_from_local == shard_batch; and the
    multi-host init helper is a safe no-op here."""
    from marigold_tpu.parallel.mesh import (
        global_batch_from_local,
        init_distributed,
    )

    mesh = get_mesh(8)
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    out = global_batch_from_local(mesh, batch)
    assert len(out["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

    # no cluster env: initialize either auto-detects nothing or raises a
    # clean error about missing coordination — both acceptable no-ops
    try:
        n = init_distributed()
        assert n == 1
    except Exception:
        pass


def test_spatial_unet_forward_matches_single_device(rng):
    """The H-sharded UNet forward (halo-exchange convs, psum GroupNorm,
    gather-KV attention under shard_map) must match the plain forward —
    the full >1k-res spatial-parallel path, wired through every layer."""
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.parallel.spatial import spatial_unet_apply

    cfg = unet_lib.UNetConfig(
        sample_size=64,
        in_channels=8,
        out_channels=4,
        block_out_channels=(32, 32, 32, 32),
        attention_head_dim=(2, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=4,
    )
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # H=64 = 8 shards x 8 local rows; deepest level 64/8=8 global, 1 local
    x = jnp.asarray(rng.standard_normal((1, 64, 24, 8)), jnp.float32)
    t = jnp.asarray(3, jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 2, 16)), jnp.float32)

    ref = np.asarray(unet_lib.apply(params, cfg, x, t, ctx))
    mesh = get_mesh(8)
    out = np.asarray(spatial_unet_apply(params, cfg, x, t, ctx, mesh))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_spatial_unet_rejects_indivisible_height(rng):
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.parallel.spatial import spatial_unet_apply

    cfg = unet_lib.UNetConfig(
        block_out_channels=(32, 32, 32, 32),
        attention_head_dim=(2, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=4,
    )
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jnp.zeros((1, 40, 24, 8), jnp.float32)  # 40 % 64 != 0
    with pytest.raises(ValueError, match="divisible"):
        spatial_unet_apply(
            params, cfg, x, jnp.asarray(0), jnp.zeros((1, 2, 16)), get_mesh(8)
        )


def test_spatial_pipeline_inference_matches_single_device(depth_ckpt, rng):
    """pipe(..., spatial=True): the whole fused program (encode -> denoise
    -> decode -> reduce) with the image's H axis sharded over the mesh
    must match the unsharded pipeline — the >1k-res serving mode, scaled
    down to test geometry."""
    from marigold_tpu import MarigoldDepthPipeline

    img = Image.fromarray(
        rng.integers(0, 255, (512, 64, 3), dtype=np.uint8), "RGB"
    )
    kw = dict(
        denoising_steps=1, ensemble_size=2, processing_res=0, seed=7,
        show_progress_bar=False, color_map=None,
        ensemble_kwargs=dict(scale_invariant=False, shift_invariant=False),
    )
    pipe1 = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    a = pipe1(img, **kw).depth_np

    mesh = get_mesh(8)
    pipe8 = MarigoldDepthPipeline.from_pretrained(
        depth_ckpt, dtype=jnp.float32, mesh=mesh
    )
    b = pipe8(img, spatial=True, **kw).depth_np
    assert a.shape == b.shape == (512, 64)
    np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-3)


def test_spatial_pipeline_requires_mesh(depth_ckpt, rng):
    from marigold_tpu import MarigoldDepthPipeline

    img = Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
    )
    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    with pytest.raises(ValueError, match="mesh"):
        pipe(img, spatial=True, processing_res=0, denoising_steps=1,
             show_progress_bar=False, color_map=None)


def test_spatial_pipeline_normals_matches_single_device(tmp_path_factory, rng):
    """Spatial mode through the normals decode (clip + L2-normalize runs
    on H-sharded rows; unit norms are per-pixel so sharding is layout)."""
    from fixtures import make_tiny_checkpoint
    from marigold_tpu import MarigoldNormalsPipeline

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("nsp")), mode="normals"
    )
    img = Image.fromarray(
        rng.integers(0, 255, (512, 64, 3), dtype=np.uint8), "RGB"
    )
    # reduction="mean": the default "closest" is a per-pixel argmax over
    # member cosines, which flips chaotically between fp-reassociated but
    # mathematically equal paths when tiny-model members are uncorrelated
    # (same caveat as the sharded depth test above)
    kw = dict(
        denoising_steps=1, ensemble_size=2, processing_res=0, seed=9,
        show_progress_bar=False, ensemble_kwargs=dict(reduction="mean"),
    )
    a = MarigoldNormalsPipeline.from_pretrained(ckpt, dtype=jnp.float32)(
        img, **kw
    ).normals_np
    pipe8 = MarigoldNormalsPipeline.from_pretrained(
        ckpt, dtype=jnp.float32, mesh=get_mesh(8)
    )
    b = pipe8(img, spatial=True, **kw).normals_np
    np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-3)
    norms = np.linalg.norm(b, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_spatial_pipeline_with_h_padding(depth_ckpt, rng):
    """Spatial mode where the input H (300) is NOT on the 64*n grid: the
    pipeline pads H to 512 (edge mode), the mask keeps the padding out of
    the ensemble statistics, and the crop-back returns the original
    geometry. Width is odd-ish (56) to exercise the W-local crop path.

    Output VALUES differ from the unsharded run by construction — the
    extra padded rows join global self-attention at every level (the same
    documented property as shape bucketing, pipelines/base.py) — so this
    asserts the padding-path mechanics, not pixel equivalence (which
    tests the grid-aligned case above).."""
    from marigold_tpu import MarigoldDepthPipeline

    img = Image.fromarray(
        rng.integers(0, 255, (300, 56, 3), dtype=np.uint8), "RGB"
    )
    kw = dict(
        denoising_steps=1, ensemble_size=2, processing_res=0, seed=3,
        show_progress_bar=False, color_map=None,
        ensemble_kwargs=dict(scale_invariant=False, shift_invariant=False),
    )
    pipe8 = MarigoldDepthPipeline.from_pretrained(
        depth_ckpt, dtype=jnp.float32, mesh=get_mesh(8)
    )
    out = pipe8(img, spatial=True, **kw)
    b = out.depth_np
    assert b.shape == (300, 56)
    assert np.isfinite(b).all() and 0.0 <= b.min() and b.max() <= 1.0
    assert out.uncertainty is not None and out.uncertainty.shape == (300, 56)


def test_zero1_checkpoint_roundtrip(rng, tmp_path):
    """ZeRO-1 resume: save the SHARDED optimizer state through
    train/checkpoints.py mid-run, reload it, re-shard onto the mesh, and
    take the next step — parameters and optimizer state must be
    bit-identical to the uninterrupted run (the crash-safe resume
    contract, reference marigold_depth_trainer.py:614-696, extended to
    the sharded-optimizer configuration the reference lacks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import unet as unet_lib, vae as vae_lib
    from marigold_tpu.train.checkpoints import (
        load_train_state, save_train_state,
    )
    from marigold_tpu.train.train_step import (
        TrainState,
        create_train_state,
        make_optimizer,
        make_train_step,
        zero1_state_shardings,
    )

    unet_cfg = unet_lib.UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=2, attention_head_dim=(2, 4),
        cross_attention_dim=12, norm_num_groups=4,
    )
    vae_cfg = vae_lib.VAEConfig(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4,
    )
    schedule = DiffusionSchedule.create()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    up = unet_lib.init_params(k1, unet_cfg)
    vp = vae_lib.init_params(k2, vae_cfg)
    # accumulation=2: the MultiSteps grad buffer is part of the sharded,
    # checkpointed state and the save lands mid-accumulation-window
    opt = make_optimizer(1e-3, accumulation_steps=2)
    step = make_train_step(unet_cfg, vae_cfg, schedule, opt,
                           compute_dtype=None)

    B, H, W = 8, 16, 16
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32),
    }
    text = jnp.zeros((1, 2, 12), jnp.float32)

    mesh = get_mesh(8)
    repl = NamedSharding(mesh, P())
    dp = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))
    batch8 = {k: jax.device_put(v, dp(v.ndim)) for k, v in batch.items()}
    vp8 = jax.device_put(vp, repl)
    text8 = jax.device_put(text, repl)

    s = create_train_state(up, opt)
    shardings = zero1_state_shardings(mesh, s)
    s = jax.device_put(s, shardings)
    with mesh:
        jstep = jax.jit(step, out_shardings=(shardings, repl))
        s, _ = jstep(s, vp8, text8, batch8, jax.random.PRNGKey(3))

        # --- save mid-run (sharded leaves gathered to host npz) ---
        ckpt = str(tmp_path / "ckpt" / "latest")
        save_train_state(
            ckpt, unet_cfg, s.params, schedule,
            {"effective_iter": int(s.step)}, opt_state=s.opt_state,
        )

        # uninterrupted continuation = ground truth
        s_cont, _ = jstep(s, vp8, text8, batch8, jax.random.PRNGKey(4))

        # --- reload, re-shard, resume ---
        cfg2, params2, sched2, tstate2, opt2 = load_train_state(
            ckpt, opt_state_template=create_train_state(up, opt).opt_state,
        )
        assert cfg2.to_dict() == unet_cfg.to_dict()
        assert tstate2["effective_iter"] == int(s.step)
        s2 = TrainState(
            step=jnp.asarray(tstate2["effective_iter"], jnp.int32),
            params=params2, opt_state=opt2,
        )
        s2 = jax.device_put(s2, shardings)
        # restored state matches the live sharded state bit-for-bit
        for a, b in zip(jax.tree_util.tree_leaves(s),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        s2_cont, _ = jstep(s2, vp8, text8, batch8, jax.random.PRNGKey(4))

    for a, b in zip(jax.tree_util.tree_leaves(s_cont),
                    jax.tree_util.tree_leaves(s2_cont)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the resumed moments are still genuinely partitioned
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(s2_cont.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size >= 8
        and not leaf.sharding.is_fully_replicated
    )
    assert n_sharded > 0
