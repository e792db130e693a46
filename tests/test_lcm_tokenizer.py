"""LCM scheduler + CLIP tokenizer tests."""

import json

import numpy as np
import jax.numpy as jnp

from marigold_tpu.core.lcm import LCMSchedule
from marigold_tpu.core.scheduler import DiffusionSchedule
from marigold_tpu.models.tokenizer import CLIPTokenizer
from marigold_tpu.models.clip_text import BOS_TOKEN_ID, EOS_TOKEN_ID


def test_lcm_timesteps_grid():
    lcm = LCMSchedule.create()
    ts = lcm.inference_timesteps(4)
    assert len(ts) == 4
    assert ts[0] == 999  # grid ends at k*50-1 = 999
    assert all(np.diff(ts) < 0)
    # all on the 50-point training grid: t % 20 == 19
    assert all(t % 20 == 19 for t in ts)
    ts1 = lcm.inference_timesteps(1)
    assert list(ts1) == [999]


def test_lcm_boundary_conditions():
    lcm = LCMSchedule.create()
    c_skip, c_out = lcm.boundary_scalings(jnp.asarray(0))
    # at t=0 the consistency function must be the identity
    assert abs(float(c_skip) - 1.0) < 1e-6 and abs(float(c_out)) < 1e-6
    c_skip999, c_out999 = lcm.boundary_scalings(jnp.asarray(999))
    assert float(c_skip999) < 1e-4 and abs(float(c_out999) - 1.0) < 1e-4


def test_lcm_step_last_returns_denoised():
    lcm = LCMSchedule.create()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray(499)
    x_t = lcm.base.add_noise(x0, eps, t)
    # perfect epsilon prediction -> denoised ~= c_out*x0 + c_skip*x_t
    prev, denoised = lcm.step(
        eps, t, jnp.asarray(479), x_t, jnp.zeros_like(x_t),
        is_last=jnp.asarray(True),
    )
    c_skip, c_out = lcm.boundary_scalings(t)
    expected = float(c_out) * np.asarray(x0) + float(c_skip) * np.asarray(x_t)
    np.testing.assert_allclose(np.asarray(denoised), expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(denoised), atol=1e-6)


def _toy_tokenizer():
    # vocab: byte symbols + merged tokens
    vocab = {}
    # minimal: single chars with </w>, plus merges for "lo" "low</w>"
    for tok in ["l", "o", "w", "e", "r", "l</w>", "o</w>", "w</w>", "e</w>",
                "r</w>", "lo", "low</w>", "er</w>", "a", "a</w>"]:
        vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = BOS_TOKEN_ID
    vocab["<|endoftext|>"] = EOS_TOKEN_ID
    merges = [("l", "o"), ("lo", "w</w>"), ("e", "r</w>")]
    return CLIPTokenizer(vocab, merges)


def test_tokenizer_empty_prompt_is_bos_eos():
    tok = _toy_tokenizer()
    batch = tok("", padding="do_not_pad")
    assert batch.input_ids == [[BOS_TOKEN_ID, EOS_TOKEN_ID]]


def test_tokenizer_bpe_merges():
    tok = _toy_tokenizer()
    ids = tok.encode("low")
    assert ids == [tok.encoder["low</w>"]]
    ids = tok.encode("lower")
    assert ids == [tok.encoder["lo"], tok.encoder["w"], tok.encoder["er</w>"]]


def test_tokenizer_padding_and_files(tmp_path):
    tok = _toy_tokenizer()
    b = tok("low", padding="max_length", max_length=6)
    assert len(b.input_ids[0]) == 6
    assert b.input_ids[0][0] == BOS_TOKEN_ID
    assert b.input_ids[0][-1] == EOS_TOKEN_ID
    # from_pretrained roundtrip
    d = tmp_path / "tokenizer"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(tok.encoder))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in
                                     [("l", "o"), ("lo", "w</w>"), ("e", "r</w>")])
    )
    tok2 = CLIPTokenizer.from_pretrained(str(d))
    assert tok2.encode("low") == tok.encode("low")


def test_phase_timer():
    from marigold_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer(sync=False)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_lcm_checkpoint_pipeline(tmp_path, rng):
    """A checkpoint whose scheduler_config declares LCMScheduler must run
    the LCM sampling path in the depth pipeline and be rejected by
    normals/IID."""
    import json, os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_tiny_checkpoint
    from PIL import Image

    d = make_tiny_checkpoint(str(tmp_path / "ck"), mode="depth")
    cfg_path = os.path.join(d, "scheduler", "scheduler_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["_class_name"] = "LCMScheduler"
    cfg["original_inference_steps"] = 50
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from marigold_tpu import MarigoldDepthPipeline, MarigoldNormalsPipeline

    pipe = MarigoldDepthPipeline.from_pretrained(d, dtype=jnp.float32)
    assert pipe.core.lcm is not None
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    )
    out = pipe(img, denoising_steps=2, ensemble_size=2, processing_res=32,
               seed=1, show_progress_bar=False, color_map=None)
    assert out.depth_np.shape == (32, 32)
    assert np.isfinite(out.depth_np).all()

    npipe = MarigoldNormalsPipeline.from_pretrained(d, dtype=jnp.float32)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="LCM"):
        npipe(img, denoising_steps=2, processing_res=32, show_progress_bar=False)


def test_lcm_batched_serving(tmp_path, rng, monkeypatch):
    """Batched multi-image serving must drive the LCM consistency sampler
    (not DDIM) for v1-0 LCM checkpoints: deterministic in seed, distinct
    across images, and the LCM step is actually traced into the program
    (reference accepts LCMScheduler in the depth pipeline,
    marigold_depth_pipeline.py:368-377; batching it is a serving-side
    capability the reference runs one image at a time)."""
    import json, os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_tiny_checkpoint

    d = make_tiny_checkpoint(str(tmp_path / "ck"), mode="depth")
    cfg_path = os.path.join(d, "scheduler", "scheduler_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["_class_name"] = "LCMScheduler"
    cfg["original_inference_steps"] = 50
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.core.lcm import LCMSchedule

    calls = {"n": 0}
    orig_step = LCMSchedule.step

    def counting_step(self, *a, **kw):
        calls["n"] += 1
        return orig_step(self, *a, **kw)

    monkeypatch.setattr(LCMSchedule, "step", counting_step)

    pipe = MarigoldDepthPipeline.from_pretrained(d, dtype=jnp.float32)
    assert pipe.core.lcm is not None
    imgs = [
        np.random.default_rng(i).integers(0, 255, (40, 48, 3), dtype=np.uint8)
        for i in range(3)
    ]
    # batch_size=2 forces the chunked lax.map path (3 img x 2 members = 6
    # rows in chunks of 2) whose fresh-noise keys must be chunk-distinct
    outs = pipe.batch_call(
        imgs, denoising_steps=2, ensemble_size=2, processing_res=32,
        batch_size=2, seed=11,
    )
    assert calls["n"] >= 1  # the consistency sampler was traced, not DDIM
    assert len(outs) == 3
    for o in outs:
        assert o.depth_np.shape == (40, 48)
        assert np.isfinite(o.depth_np).all()
        assert 0.0 <= o.depth_np.min() and o.depth_np.max() <= 1.0
    assert not np.array_equal(outs[0].depth_np, outs[1].depth_np)
    outs2 = pipe.batch_call(
        imgs, denoising_steps=2, ensemble_size=2, processing_res=32,
        batch_size=2, seed=11,
    )
    np.testing.assert_array_equal(outs[2].depth_np, outs2[2].depth_np)


def test_sampler_toggle_invalidates_program_cache(tmp_path, rng):
    """Setting `core.lcm` AFTER a DDIM run must not reuse the cached DDIM
    program: the sampler is baked into the traced program, so the program
    cache key carries a sampler fingerprint (round-5 regression — without
    it, toggling lcm on a shared core silently served DDIM results)."""
    import os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_tiny_checkpoint

    from marigold_tpu import MarigoldDepthPipeline
    from marigold_tpu.core.lcm import LCMSchedule

    d = make_tiny_checkpoint(str(tmp_path / "ck"), mode="depth")
    pipe = MarigoldDepthPipeline.from_pretrained(d, dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    kw = dict(denoising_steps=2, ensemble_size=2, processing_res=32,
              seed=1, show_progress_bar=False, color_map=None)
    a = pipe(img, **kw).depth_np  # DDIM, fills the program cache
    pipe.core.lcm = LCMSchedule.create(
        base=pipe.core.schedule, original_inference_steps=8
    )
    b = pipe(img, **kw).depth_np  # must trace a NEW program with LCM
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-6, (
        "LCM run reproduced the DDIM output bit-for-bit: the cached DDIM "
        "program was reused despite core.lcm being set"
    )
    pipe.core.lcm = None
    c = pipe(img, **kw).depth_np  # toggling back must restore DDIM
    assert np.abs(a - c).max() == 0.0
