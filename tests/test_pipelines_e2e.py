"""End-to-end pipeline tests on tiny checkpoints (CPU, fp32): the full
from_pretrained -> __call__ -> Output path for all three modalities,
matching the reference's API contract (SURVEY.md §2.1)."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from fixtures import make_tiny_checkpoint


@pytest.fixture(scope="module")
def depth_ckpt(tmp_path_factory):
    return make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("ckpt_depth")), mode="depth"
    )


@pytest.fixture(scope="module")
def iid_ckpt(tmp_path_factory):
    return make_tiny_checkpoint(str(tmp_path_factory.mktemp("ckpt_iid")), mode="iid")


@pytest.fixture
def rgb_image(rng):
    return Image.fromarray(
        rng.integers(0, 255, (40, 56, 3), dtype=np.uint8), "RGB"
    )


def test_depth_pipeline_e2e(depth_ckpt, rgb_image):
    from marigold_tpu import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    out = pipe(
        rgb_image, denoising_steps=2, ensemble_size=3, processing_res=32,
        seed=1234, show_progress_bar=False,
    )
    assert out.depth_np.shape == (40, 56)
    assert out.depth_np.dtype == np.float32
    assert 0.0 <= out.depth_np.min() and out.depth_np.max() <= 1.0
    assert out.uncertainty is not None and out.uncertainty.shape == (40, 56)
    assert out.depth_colored is not None and out.depth_colored.size == (56, 40)


def test_depth_pipeline_deterministic_in_seed(depth_ckpt, rgb_image):
    from marigold_tpu import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    kw = dict(
        denoising_steps=1, ensemble_size=2, processing_res=32,
        show_progress_bar=False, color_map=None,
    )
    a = pipe(rgb_image, seed=7, **kw).depth_np
    b = pipe(rgb_image, seed=7, **kw).depth_np
    c = pipe(rgb_image, seed=8, **kw).depth_np
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_depth_pipeline_seed_none_fresh_noise(depth_ckpt, rgb_image):
    """Reference semantics (marigold_depth_pipeline.py:430-435):
    generator=None draws fresh noise per invocation — two un-seeded calls
    on the same image must NOT share a noise stream."""
    from marigold_tpu import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    kw = dict(
        denoising_steps=1, ensemble_size=2, processing_res=32,
        show_progress_bar=False, color_map=None,
    )
    a = pipe(rgb_image, seed=None, **kw).depth_np
    b = pipe(rgb_image, seed=None, **kw).depth_np
    assert not np.array_equal(a, b)


def test_depth_pipeline_native_res_and_single_member(depth_ckpt, rgb_image):
    from marigold_tpu import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    out = pipe(
        rgb_image, denoising_steps=1, ensemble_size=1, processing_res=0,
        seed=0, show_progress_bar=False, color_map=None,
    )
    assert out.depth_np.shape == (40, 56)
    assert out.uncertainty is None
    # single member passes through (clip to [0,1] only — reference E=1
    # semantics, marigold_depth_pipeline.py:301-321; no min-max stretch)
    assert 0.0 <= out.depth_np.min() and out.depth_np.max() <= 1.0


def test_normals_pipeline_e2e(depth_ckpt, rgb_image):
    from marigold_tpu import MarigoldNormalsPipeline

    pipe = MarigoldNormalsPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    out = pipe(
        rgb_image, denoising_steps=2, ensemble_size=3, processing_res=32,
        seed=1, show_progress_bar=False,
    )
    assert out.normals_np.shape == (40, 56, 3)
    norms = np.linalg.norm(out.normals_np, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert out.uncertainty.shape == (40, 56)
    assert out.normals_img.size == (56, 40)


def test_iid_pipeline_e2e(iid_ckpt, rgb_image):
    from marigold_tpu import MarigoldIIDPipeline

    pipe = MarigoldIIDPipeline.from_pretrained(iid_ckpt, dtype=jnp.float32)
    out = pipe(
        rgb_image, denoising_steps=2, ensemble_size=2, processing_res=32,
        seed=1, show_progress_bar=False,
    )
    assert out.is_complete
    assert out.target_names == ["albedo", "material"]
    for entry in out:
        assert entry.array.shape == (3, 40, 56)
        assert entry.array.min() >= 0 and entry.array.max() <= 1
        assert entry.image.size == (56, 40)
        assert entry.uncertainty is not None
    # dict-style access
    assert out["albedo"].name == "albedo"


def test_pipeline_back_compat_alias():
    import marigold_tpu

    assert marigold_tpu.MarigoldPipeline is marigold_tpu.MarigoldDepthPipeline


def test_depth_chunking_invariance(depth_ckpt, rgb_image):
    """Raw member predictions must not depend on the batch-size chunking
    (our noise is drawn for all members at once — stronger determinism than
    the reference, whose noise stream depends on the split). Asserted on
    raw members: the downstream BFGS alignment is chaotically sensitive on
    *uncorrelated* tiny-model outputs (the reference's scipy solver is
    too), which would mask this contract."""
    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.pipelines.base import image_to_array
    from marigold_tpu.pipelines import image_util

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    rgb = image_to_array(rgb_image)
    nh, nw = image_util.resize_max_res_shape(*rgb.shape[:2], 32)
    rgb = image_util.resize_np(rgb, (nh, nw))
    a = np.asarray(pipe._run_ensemble(rgb, 1, 4, batch_size=4, seed=3))
    b = np.asarray(pipe._run_ensemble(rgb, 1, 4, batch_size=1, seed=3))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_depth_batch_call(depth_ckpt, rng):
    """Batched serving: N images in one fused program; per-image outputs
    must match the single-image path's raw math (same seed => same noise
    per image index is NOT guaranteed across paths, so check contract:
    shapes, ranges, determinism, and that different images differ)."""
    from marigold_tpu import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    outs = pipe.batch_call(
        imgs, denoising_steps=1, ensemble_size=2, processing_res=32, seed=4,
    )
    assert len(outs) == 3
    for o in outs:
        assert o.depth_np.shape == (40, 56)
        assert 0 <= o.depth_np.min() and o.depth_np.max() <= 1
        assert o.uncertainty is not None
    assert not np.array_equal(outs[0].depth_np, outs[1].depth_np)
    outs2 = pipe.batch_call(
        imgs, denoising_steps=1, ensemble_size=2, processing_res=32, seed=4,
    )
    np.testing.assert_array_equal(outs[1].depth_np, outs2[1].depth_np)


def test_shape_bucketing_bounds_compiles(depth_ckpt, rng):
    """Mixed-resolution folder inference (processing_res=0) must compile at
    most one fused program per 64-px bucket, not one per image shape
    (VERDICT r1 weak #4: remote compiles cost minutes per shape)."""
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt)
    sizes = [(40, 48), (44, 52), (62, 50), (60, 70)]  # first 3 share bucket
    for h, w in sizes:
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        out = pipe(
            img, denoising_steps=1, ensemble_size=2, processing_res=0,
            match_input_res=True, seed=1, color_map=None,
            show_progress_bar=False, shape_bucketing=True,
        )
        assert out.depth_np.shape == (h, w)
        assert np.isfinite(out.depth_np).all()
        assert 0.0 <= out.depth_np.min() and out.depth_np.max() <= 1.0
    fused_keys = [k for k in pipe.core._jit_cache if k[0] == "fused"]
    # buckets: (64,64) for the first three, (64,128) for the last
    assert len(fused_keys) == 2, fused_keys


def test_uint8_serving_equals_float(depth_ckpt, rng):
    """The uint8 device-side normalization path (u/127.5 - 1) must produce
    exactly the float path's results — it is the same arithmetic moved
    on-device to quarter the host->device upload."""
    from marigold_tpu.pipelines.base import image_to_array
    from marigold_tpu.pipelines.depth import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt)
    imgs = [rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
            for _ in range(2)]
    u8 = np.stack(imgs)
    f32 = np.stack([image_to_array(im) for im in imgs])

    pu8, _ = pipe._infer_fused_batch(
        u8, denoising_steps=1, ensemble_size=2, seed=7, out_hw=(40, 48)
    )
    pf32, _ = pipe._infer_fused_batch(
        f32, denoising_steps=1, ensemble_size=2, seed=7, out_hw=(40, 48)
    )
    np.testing.assert_allclose(np.asarray(pu8), np.asarray(pf32), atol=1e-5)


def test_normals_batch_call(tmp_path_factory, rng):
    """Batched serving for normals: unit-norm outputs per image."""
    from fixtures import make_tiny_checkpoint
    from marigold_tpu.pipelines.normals import MarigoldNormalsPipeline

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("nck")), mode="normals"
    )
    pipe = MarigoldNormalsPipeline.from_pretrained(ckpt)
    imgs = [rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
            for _ in range(2)]
    outs = pipe.batch_call(
        imgs, denoising_steps=1, ensemble_size=2, processing_res=32, seed=3
    )
    assert len(outs) == 2
    for o in outs:
        assert o.normals_np.shape == (40, 48, 3)
        norms = np.linalg.norm(o.normals_np, axis=-1)
        assert np.isfinite(norms).all()
        np.testing.assert_allclose(norms, 1.0, atol=2e-2)
        assert o.uncertainty.shape == (40, 48)


def test_iid_batch_call(tmp_path_factory, rng):
    from fixtures import make_tiny_checkpoint
    from marigold_tpu.pipelines.iid import MarigoldIIDPipeline

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("ick")), mode="iid", n_targets=2
    )
    pipe = MarigoldIIDPipeline.from_pretrained(ckpt)
    imgs = [rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
            for _ in range(2)]
    outs = pipe.batch_call(
        imgs, denoising_steps=1, ensemble_size=1, processing_res=32, seed=3
    )
    assert len(outs) == 2
    for out in outs:
        assert out.is_complete
        for entry in out:
            assert entry.array.shape == (3, 40, 48)  # CHW like reference
            assert np.isfinite(entry.array).all()


def test_depth_compact_output_matches_float(depth_ckpt, rng):
    """compact_output=True (uint16 device->host readback) must equal the
    float path to 1/65535 — it is a transport encoding, not a different
    computation."""
    import jax.numpy as jnp
    import numpy as np

    from marigold_tpu import MarigoldDepthPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(depth_ckpt, dtype=jnp.float32)
    rgb = rng.integers(0, 255, (2, 40, 48, 3), dtype=np.uint8)
    kw = dict(denoising_steps=1, ensemble_size=3, batch_size=6, seed=11,
              out_hw=(40, 48))
    p_f, u_f = pipe._infer_fused_batch(rgb, **kw)
    p_c, u_c = pipe._infer_fused_batch(rgb, compact_output=True, **kw)
    assert p_c.dtype == np.float32
    np.testing.assert_allclose(p_c, np.clip(p_f, 0, 1), atol=1.01 / 65535)
    np.testing.assert_allclose(u_c, np.clip(u_f, 0, 1), atol=1.01 / 65535)


def test_normals_compact_readback_matches_float(tmp_path_factory, rng):
    """Compact uint16 readback for normals maps [-1,1] through (x+1)/2;
    batch_call(compact_readback=True) must equal the float path to one
    16-bit quantum."""
    from marigold_tpu import MarigoldNormalsPipeline

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("nck_c")), mode="normals"
    )
    pipe = MarigoldNormalsPipeline.from_pretrained(ckpt, dtype=jnp.float32)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    kw = dict(denoising_steps=1, ensemble_size=3, processing_res=32, seed=5)
    a = pipe.batch_call(imgs, **kw)
    b = pipe.batch_call(imgs, compact_readback=True, **kw)
    for oa, ob in zip(a, b):
        np.testing.assert_allclose(
            ob.normals_np, oa.normals_np, atol=2.02 / 65535
        )
        np.testing.assert_allclose(
            ob.uncertainty, oa.uncertainty, atol=1.01 / 65535
        )


def test_iid_compact_readback_matches_float(iid_ckpt, rng):
    """Compact uint16 readback for IID targets (all in [0,1])."""
    from marigold_tpu import MarigoldIIDPipeline

    pipe = MarigoldIIDPipeline.from_pretrained(iid_ckpt, dtype=jnp.float32)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    kw = dict(denoising_steps=1, ensemble_size=2, processing_res=32, seed=5)
    a = pipe.batch_call(imgs, **kw)
    b = pipe.batch_call(imgs, compact_readback=True, **kw)
    for oa, ob in zip(a, b):
        for ea, eb in zip(oa, ob):
            np.testing.assert_allclose(
                eb.array, ea.array, atol=1.01 / 65535
            )


def test_decode_chunking_counts_decoded_images():
    """The decode-stage chunk cap must count decoded IMAGES, not rows:
    IID decodes n_targets latent groups per row and XLA overlaps their
    activations (a 24-row 640px 3-target chunk compiled to 21.1 GB HBM
    and OOMed on v5e)."""
    from marigold_tpu.pipelines.base import DiffusionCore

    # depth at 768px: cap 20 rows -> 40 rows split in 2
    assert DiffusionCore.decode_chunking(40, (768, 768), "depth", 1) == (2, 20)
    # iid 3-target at 640px: cap is 28 decoded images -> 9 rows; the
    # 24-row OOM geometry must split (not run as one chunk)
    n_dec, rows = DiffusionCore.decode_chunking(24, (640, 640), "iid", 3)
    assert rows * 3 <= 28 and n_dec * rows >= 24
    # 16-row serving geometry: 2 chunks of 8
    assert DiffusionCore.decode_chunking(16, (640, 640), "iid", 3) == (2, 8)
    # normals at 768px behaves like depth (single decode per row)
    assert DiffusionCore.decode_chunking(30, (768, 768), "normals", 1) == (2, 15)
    # tiny totals never produce empty chunks
    assert DiffusionCore.decode_chunking(1, (768, 768), "iid", 3) == (1, 1)


def test_decode_cap_env_override(monkeypatch):
    """MARIGOLD_DECODE_CAP overrides the 20-image decode cap (round-5
    geometry-sweep knob for the 1-step protocols); unset keeps the
    measured default."""
    from marigold_tpu.pipelines.base import DiffusionCore

    monkeypatch.setenv("MARIGOLD_DECODE_CAP", "10")
    assert DiffusionCore.decode_chunking(30, (768, 768), "depth", 1) == (3, 10)
    monkeypatch.setenv("MARIGOLD_DECODE_CAP", "30")
    assert DiffusionCore.decode_chunking(30, (768, 768), "depth", 1) == (1, 30)
    monkeypatch.delenv("MARIGOLD_DECODE_CAP")
    assert DiffusionCore.decode_chunking(30, (768, 768), "depth", 1) == (2, 15)
