"""fastload (slab + on-device unpack ingest) vs the baseline per-tensor
host path: both must build bit-identical trees, for every component and
dtype policy the pipelines use."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from marigold_tpu.models import fastload
from marigold_tpu.models import weights as W
from tests.fixtures import make_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("fastload_ckpt")
    return make_tiny_checkpoint(str(d), mode="depth")


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, (ta, tb)
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype
        assert x.shape == y.shape
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("sub,strip", [
    ("unet", ""), ("vae", ""), ("text_encoder", "text_model."),
])
@pytest.mark.parametrize("dtype", [None, jnp.bfloat16, jnp.float32])
def test_matches_baseline(ckpt, sub, strip, dtype):
    subdir = os.path.join(ckpt, sub)
    base = W.torch_to_tree(
        W.load_safetensors_flat(subdir), dtype=dtype, strip_prefix=strip
    )
    fast = fastload.load_tree_ondevice(subdir, dtype=dtype, strip_prefix=strip)
    _trees_equal(base, fast)


def test_fp16_variant_and_sharded_files(tmp_path):
    """fp16 variant selection + multi-shard dirs + small-slab packing all
    route through the same plan; force tiny slabs to exercise slab
    boundaries, and cover conv/linear/embedding/bias layouts + int64."""
    rng = np.random.default_rng(0)
    d = tmp_path / "m"
    d.mkdir()
    t1 = {
        "blk.conv.weight": rng.standard_normal((4, 6, 3, 3)).astype(np.float16),
        "blk.conv.bias": rng.standard_normal((4,)).astype(np.float16),
        "blk.lin.weight": rng.standard_normal((8, 5)).astype(np.float16),
    }
    t2 = {
        "emb.token_embedding.weight": rng.standard_normal((7, 5)).astype(np.float16),
        "pos.position_ids": np.arange(7, dtype=np.int64)[None],
    }
    save_file(t1, str(d / "model.fp16-00001-of-00002.safetensors"))
    save_file(t2, str(d / "model.fp16-00002-of-00002.safetensors"))

    old = fastload._SLAB_TARGET_BYTES
    fastload._SLAB_TARGET_BYTES = 64  # force multiple slabs
    try:
        fast = fastload.load_tree_ondevice(
            str(d), dtype=jnp.float32, variant="fp16"
        )
    finally:
        fastload._SLAB_TARGET_BYTES = old
    base = W.torch_to_tree(
        W.load_safetensors_flat(str(d), variant="fp16"), dtype=jnp.float32
    )
    _trees_equal(base, fast)


def test_component_loaders_use_fastload(ckpt, monkeypatch):
    """load_unet / load_vae / load_text_encoder produce identical trees
    with the flag on and off (the default path IS fastload)."""
    for loader, sub in [
        (W.load_unet, "unet"), (W.load_vae, "vae"),
        (W.load_text_encoder, "text_encoder"),
    ]:
        monkeypatch.setenv("MARIGOLD_TPU_FASTLOAD", "0")
        cfg_a, tree_a = loader(os.path.join(ckpt, sub), dtype=jnp.bfloat16)
        monkeypatch.setenv("MARIGOLD_TPU_FASTLOAD", "1")
        cfg_b, tree_b = loader(os.path.join(ckpt, sub), dtype=jnp.bfloat16)
        assert cfg_a == cfg_b
        _trees_equal(tree_a, tree_b)
