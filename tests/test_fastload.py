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


def test_bf16_stored_tensors(tmp_path):
    """BF16-stored safetensors ingest bit-exactly on BOTH paths: the
    fastload bitcast branch, and the framework="numpy" kill-switch
    fallback (which handles BF16 on the pinned safetensors>=0.8 via
    ml_dtypes). Compare against hand-built expected arrays so neither
    path is 'the oracle'."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file as save_torch

    rng = np.random.default_rng(1)
    conv_f32 = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)
    lin_f32 = rng.standard_normal((8, 5)).astype(np.float32)
    d = tmp_path / "m"
    d.mkdir()
    save_torch(
        {
            "blk.conv.weight": torch.from_numpy(conv_f32).bfloat16(),
            "blk.lin.weight": torch.from_numpy(lin_f32).bfloat16(),
        },
        str(d / "model.safetensors"),
    )
    expected = {
        ("blk", "conv", "weight"): jnp.asarray(conv_f32, jnp.bfloat16)
        .transpose(2, 3, 1, 0),
        ("blk", "lin", "weight"): jnp.asarray(lin_f32, jnp.bfloat16).T,
    }

    fast = fastload.load_tree_ondevice(str(d), dtype=None)
    base = W.torch_to_tree(W.load_safetensors_flat(str(d)), dtype=None)
    for tree in (fast, base):
        for (a, b, c), want in expected.items():
            got = tree[a][b][c]
            assert got.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(want, np.float32)
            )


def test_malformed_header_rejected(tmp_path):
    """Truncated or inconsistent checkpoints must fail at plan time with
    a descriptive error naming the tensor, not inside the jitted unpack."""
    import json as _json

    d = tmp_path / "m"
    d.mkdir()
    f = d / "model.safetensors"

    def write(header: dict, data: bytes):
        hb = _json.dumps(header).encode()
        f.write_bytes(len(hb).to_bytes(8, "little") + hb + data)

    # offsets beyond the data region
    write({"t": {"dtype": "F32", "shape": [4], "data_offsets": [0, 16]}},
          b"\0" * 8)
    with pytest.raises(ValueError, match="t.*data region"):
        fastload.load_tree_ondevice(str(d))

    # nbytes inconsistent with shape*itemsize
    write({"t": {"dtype": "F32", "shape": [4], "data_offsets": [0, 8]}},
          b"\0" * 8)
    with pytest.raises(ValueError, match="needs 16"):
        fastload.load_tree_ondevice(str(d))

    # overlapping tensors
    write({
        "a": {"dtype": "F32", "shape": [2], "data_offsets": [0, 8]},
        "b": {"dtype": "F32", "shape": [2], "data_offsets": [4, 12]},
    }, b"\0" * 12)
    with pytest.raises(ValueError, match="overlaps"):
        fastload.load_tree_ondevice(str(d))


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
